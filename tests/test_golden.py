"""Golden-output regression test: the reference-parity warehouse built
from the deterministic fixtures must match the committed goldens exactly
(tests/golden/*.json, regenerate with tools/make_golden.py after an
intentional semantic change).

``fact_id`` is excluded: ``monotonically_increasing_id`` is
plan/partitioning-dependent by design (SURVEY §4.3); its uniqueness is
asserted in test_reference_pipeline.py instead.
"""

from __future__ import annotations

import json
import os

import pytest

from logistream_data_pipeline_aws_spark.plans import reference_pipeline as RP
from logistream_data_pipeline_aws_spark.sources.geojson import (
    flatten_geojson_routes,
    read_geojson,
)
from tests.fixtures import make_rawdata, write_routes_geojson

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    raw = make_rawdata(spark)
    routes = flatten_geojson_routes(
        read_geojson(spark, write_routes_geojson(tmp_path_factory.mktemp("geo")))
    )
    return RP.build_warehouse(raw, routes)


@pytest.mark.parametrize(
    "table",
    [
        "dim_department", "dim_category", "dim_product", "dim_customer",
        "dim_geography", "dim_execution_status", "dim_date",
        "dim_route_shapes", "fact_supplychain_events",
    ],
)
def test_matches_golden(warehouse, table):
    from tools.make_golden import canonical_rows

    with open(os.path.join(GOLDEN_DIR, f"{table}.json")) as f:
        golden = json.load(f)
    df = warehouse[table]
    if table == "fact_supplychain_events":
        df = df.drop("fact_id")
    got = json.loads(json.dumps(canonical_rows(df), sort_keys=True, default=str))
    assert got == golden


def test_query_goldens(spark):
    """Cross-round drift protection for selected queries() outputs at
    sf0.001 (regenerate via tools/make_golden.py after an INTENTIONAL
    semantic change)."""
    import __spark_entry__ as E
    from tools.make_golden import canonical_rows

    with open(os.path.join(GOLDEN_DIR, "queries_sf0001.json")) as f:
        golden = json.load(f)
    qs = E.queries()
    for name, want in golden.items():
        got = canonical_rows(qs[name](spark, "/root/testdata/sf0.001"))
        assert got == want, f"{name}: output drifted from golden"
