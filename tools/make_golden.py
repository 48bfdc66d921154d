"""Generate the committed golden outputs for the reference-parity
pipeline (SURVEY §5.2 item 2): build the warehouse from the deterministic
fixtures and dump each table as canonical sorted JSON.

Usage: python tools/make_golden.py   (writes tests/golden/*.json)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from logistream_data_pipeline_aws_spark.session import get_spark  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def canonical_rows(df) -> list[dict]:
    rows = [r.asDict(recursive=True) for r in df.collect()]
    for r in rows:
        for k, v in r.items():
            if hasattr(v, "isoformat"):
                r[k] = v.isoformat()
            elif hasattr(v, "quantize"):  # Decimal
                r[k] = str(v)
            elif isinstance(v, float):
                r[k] = round(v, 9)
    return sorted(rows, key=lambda r: json.dumps(r, sort_keys=True, default=str))


def main() -> None:
    from pathlib import Path

    from logistream_data_pipeline_aws_spark.plans import reference_pipeline as RP
    from logistream_data_pipeline_aws_spark.sources.geojson import (
        flatten_geojson_routes,
        read_geojson,
    )
    from tests.fixtures import make_rawdata, write_routes_geojson

    spark = get_spark("make-golden", master="local[4]", shuffle_partitions=4)
    raw = make_rawdata(spark)
    routes = flatten_geojson_routes(
        read_geojson(spark, write_routes_geojson(Path(tempfile.mkdtemp())))
    )
    wh = RP.build_warehouse(raw, routes)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, df in wh.items():
        out = df.drop("fact_id") if name == "fact_supplychain_events" else df
        rows = canonical_rows(out)
        path = os.path.join(GOLDEN_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(rows, f, indent=1, sort_keys=True, default=str)
        print(f"wrote {path}: {len(rows)} rows")


# -- query goldens: small-output queries() snapshots at sf0.001 -------------
# (cross-round drift protection that needs no DuckDB; regenerate after an
# INTENTIONAL semantic change)

QUERY_GOLDENS = [
    "dedup_embedding", "geojson_routes", "dim_route_shapes",
    "corpus_length_histogram", "sql_customer_order_distribution",
    "sql_large_volume_orders", "events_salted_user_stats",
    "fact_bucket_profile", "dedup_minhash_lsh",
]


def make_query_goldens() -> None:
    import __spark_entry__ as E

    spark = get_spark("make-golden-q", master="local[4]", shuffle_partitions=4)
    qs = E.queries()
    out = {}
    for name in QUERY_GOLDENS:
        out[name] = canonical_rows(qs[name](spark, "/root/testdata/sf0.001"))
        print(f"{name}: {len(out[name])} rows")
    path = os.path.join(GOLDEN_DIR, "queries_sf0001.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True, default=str)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
    make_query_goldens()
