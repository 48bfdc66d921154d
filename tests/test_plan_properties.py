"""Physical-plan regression tests: the properties that decide 100 TB
behavior must hold in CI, not just in PLAN_AUDIT.md.

- filters reach the parquet scan (PushedFilters non-empty),
- scans are column-pruned (ReadSchema narrower than the table),
- dimension lookups broadcast; no sort-merge join anywhere in the
  headline plans.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as E
from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    df = E.queries()[name](spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    pushed = re.search(r"PushedFilters: \[([^\]]+)\]", plan)
    assert pushed and "l_shipdate" in pushed.group(1)
    scan_cols = re.search(r"FileScan parquet \[([^\]]*)\]", plan).group(1)
    # 7 of 11 lineitem columns: pruning reached the scan
    assert len(scan_cols.split(",")) == 7


def test_a8_filter_pushdown(spark):
    plan = _plan(spark, "a8_returns_by_nation")
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(l_returnflag,R\)", plan)


@pytest.mark.parametrize(
    "name",
    ["fact_lineitem", "a5_profit_rollup", "a8_returns_by_nation",
     "top_customers", "sql_local_supplier_volume", "customer_rank_in_nation"],
)
def test_no_sort_merge_joins(spark, name):
    plan = _plan(spark, name)
    assert "SortMergeJoin" not in plan, f"{name} regressed to a shuffle join"
    assert "BroadcastHashJoin" in plan


def test_fact_scans_each_side_table_once(spark):
    plan = _plan(spark, "fact_lineitem")
    assert plan.count("part.parquet") == 1
    assert plan.count("customer.parquet") == 1
