"""Smoke the driver contract: entry() + every queries() entry runs at
sf0.001 and yields a stable non-degenerate result.  (Full DuckDB oracle
equivalence runs via tools/check_oracle.py at sf0.01.)"""

from __future__ import annotations

import __spark_entry__ as E
from tests.conftest import SF_SMALL


def test_entry_runs(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert "revenue" in df.columns


def test_oracle_keys_subset_of_queries():
    q, o = E.queries(), E.oracle_sql()
    assert set(o) <= set(q)


def test_all_queries_run_small(spark):
    for name, fn in E.queries().items():
        df = fn(spark, SF_SMALL)
        n = df.count()
        assert n >= 0, name
        assert df.columns, name
