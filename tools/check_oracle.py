"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names/types,
and order-insensitive values (exact for ints/strings, tight tolerance
reported for floats so rounding-policy bugs surface before the driver sees
them).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from logistream_data_pipeline_aws_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and df[c].map(
            lambda v: v is None or hasattr(v, "toordinal"), na_action=None
        ).all():
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, (str, bytes)) else v
            )
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(sort_cols, na_position="first", kind="mergesort")
    except TypeError:
        df = df.sort_values(
            sort_cols, na_position="first", kind="mergesort", key=lambda s: s.astype(str)
        )
    return df.reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(sdf) != len(ddf):
        problems.append(f"row count: spark={len(sdf)} duckdb={len(ddf)}")
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    if scols != dcols:
        problems.append(f"columns: spark={scols} duckdb={dcols}")
        return problems
    if problems:
        return problems
    s, d = normalize(sdf), normalize(ddf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if str(sv.dtype) != str(dv.dtype):
            problems.append(f"dtype[{c}]: spark={sv.dtype} duckdb={dv.dtype}")
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            a = pd.to_numeric(sv, errors="coerce")
            b = pd.to_numeric(dv, errors="coerce")
            both_nan = a.isna() & b.isna()
            diff = (a - b).abs()
            rel = diff / b.abs().clip(lower=1.0)
            bad = (~both_nan) & ((a.isna() != b.isna()) | (rel > 1e-12))
            exact_mismatch = (~both_nan) & ((a != b) & ~(a.isna() & b.isna()))
            if bad.any():
                i = bad.idxmax()
                problems.append(f"float[{c}]: {int(bad.sum())} rows differ >1e-12 rel; e.g. {a[i]!r} vs {b[i]!r}")
            elif exact_mismatch.any():
                i = exact_mismatch.idxmax()
                problems.append(
                    f"float[{c}] WARNING {int(exact_mismatch.sum())} rows not bit-equal (hash would fail); e.g. {a[i]!r} vs {b[i]!r}"
                )
        else:
            eq = (sv == dv) | (sv.isna() & dv.isna())
            if not eq.all():
                i = (~eq).idxmax()
                problems.append(f"value[{c}]: {int((~eq).sum())} rows differ; e.g. {sv[i]!r} vs {dv[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duck_connect(sf_dir)
    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        hard = [p for p in problems if "WARNING" not in p]
        status = "FAIL" if hard else ("WARN" if problems else "OK  ")
        if hard:
            failures += 1
        print(f"{status} {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
        for p in problems:
            print(f"     - {p}")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
