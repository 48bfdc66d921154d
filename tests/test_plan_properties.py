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


def test_fact_bucketed_join_zero_exchange(spark):
    """The bucketed variant's lineitem⋈orders must be a sort-merge join
    over two bucketed scans with NO shuffle on the order key — the
    pre-paid-shuffle plan this variant exists to demonstrate."""
    plan = _plan(spark, "fact_lineitem_bucketed")
    assert plan.count("SortMergeJoin") == 1
    assert plan.count("Bucketed: true") == 2
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line and "orderkey" in line:
            assert "returnflag" in line, f"orderkey shuffle crept back: {line.strip()[:140]}"


def test_fact_side_table_scans_are_narrow(spark):
    """The ranged keygen references each side table in several roles
    (data, min/max stats, bucket counts; the ref count varies with
    whether the staged key-map cache is already materialized, so it is
    not asserted).  What must hold: every part/customer scan is pruned to
    the key column only, and the staged key-map cache the fact probes is
    never wider than (natural key, surrogate key).  The duplicated
    stats/counts exchanges collapse at runtime (AQE ReuseExchange), so
    the executed cost is the data scan plus key-column passes — never a
    single-partition window."""
    plan = _plan(spark, "fact_lineitem")
    scans = list(
        re.finditer(
            r"FileScan parquet \[([^\]]*)\][^\n]*(part|customer)\.parquet", plan
        )
    )
    assert scans, "expected part/customer scans under the key maps"
    for scan in scans:
        cols = [c for c in scan.group(1).split(",") if c.strip()]
        assert len(cols) == 1, f"side-table scan not key-pruned: {scan.group(0)[:120]}"
    for m in re.finditer(r"InMemoryTableScan \[([^\]]*)\]", plan):
        cols = [c for c in m.group(1).split(",") if c.strip()]
        if any("status_key" in c for c in cols):
            # the staged junk dimension is (status_key + 3 flag columns)
            # by definition — tiny (distinct flag combos), not a key map
            assert len(cols) <= 4, (
                f"staged junk dim wider than key + 3 flags: {m.group(0)[:120]}"
            )
            continue
        assert len(cols) <= 2, (
            f"staged key-map scan wider than (key, surrogate): {m.group(0)[:120]}"
        )


@pytest.mark.parametrize("name", ["fact_lineitem", "dim_customer", "dim_product"])
def test_no_unpartitioned_window(spark, name):
    """No WindowExec may funnel the whole table through one task: every
    window in the keygen-bearing plans must be partitioned (the ranged
    keygen's per-bucket row_number)."""
    plan = _plan(spark, name)
    windows = [l for l in plan.splitlines() if "Window [" in l]
    assert windows, f"{name}: expected at least the keygen window"
    for line in windows:
        # an unpartitioned spec starts with the sort column directly:
        # windowspecdefinition(col ASC ...); partitioned specs lead with
        # partition columns (no ASC/DESC before the first comma)
        assert not re.search(r"windowspecdefinition\([^,()]*(ASC|DESC)", line), (
            f"{name}: unpartitioned window: {line.strip()[:160]}"
        )


def test_pii_scrub_is_exchange_free(spark):
    """The scrub pass is an embarrassingly parallel scan: any Exchange in
    this plan means a shuffle crept into a per-row operation."""
    plan = _plan(spark, "pii_scrub_stats")
    assert "Exchange" not in plan
    # '*(n)' is executedPlan toString's whole-stage-codegen marker
    assert plan.lstrip().startswith("*("), plan.splitlines()[0]


def test_contamination_eval_grams_broadcast(spark):
    """The eval n-gram set must broadcast (it is the small benchmark
    suite); a sort-merge/shuffle join here re-shuffles the whole corpus
    against a tiny set."""
    plan = _plan(spark, "contamination_check")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_mixture_sample_rate_table_broadcast(spark):
    plan = _plan(spark, "corpus_mixture_sample")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sequence_packing_window_is_partitioned(spark):
    """The running token sum must window per source — a global window is
    the single-task packing straggler."""
    plan = _plan(spark, "sequence_packing")
    windows = [l for l in plan.splitlines() if "Window [" in l]
    assert windows
    for line in windows:
        assert not re.search(r"windowspecdefinition\([^,()]*(ASC|DESC)", line), (
            f"unpartitioned window: {line.strip()[:160]}"
        )


def test_forecast_revenue_all_filters_pushed(spark):
    """Q6 is the canonical pushdown probe: date range, discount band and
    quantity cap must all reach the parquet scan.  executedPlan toString
    truncates long PushedFilters lists, so use formatted explain."""
    df = E.queries()["sql_forecast_revenue"](spark, SF_SMALL)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    pushed = re.search(r"PushedFilters: \[([^\]]+)\]", plan)
    assert pushed, "no pushed filters on the lineitem scan"
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in pushed.group(1), f"{frag} not pushed: {pushed.group(1)}"


def test_promo_revenue_broadcasts_part(spark):
    plan = _plan(spark, "sql_promo_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    pushed = re.search(r"PushedFilters: \[([^\]]+)\]", plan)
    assert pushed and "l_shipdate" in pushed.group(1)


def test_fact_date_slice_prunes_partitions(spark):
    """VERDICT r3 #5: the time-partitioned fact layout must prove its
    point — a date-band readback scans only the banded month directories
    (PartitionFilters non-empty on order_month), not the whole table."""
    plan = _plan(spark, "fact_date_slice")
    part = re.search(r"PartitionFilters: \[([^\]]+)\]", plan)
    assert part, "no PartitionFilters in the readback scan"
    assert "order_month" in part.group(1)
    # the band is 6 months: the pruned scan reads at most 6 partitions
    m = re.search(r"partition count: (\d+)", plan)
    if m:  # Spark prints this in the scan metadata when known
        assert int(m.group(1)) <= 6


def test_runtime_bloom_filter_prunes_selective_join(spark):
    """Spark's runtime Bloom-filter injection — the row-level pruning
    that saves a big-big shuffle join at warehouse scale: the selective
    side aggregates a bloom_filter_agg and the probe side gains a
    might_contain filter BELOW its shuffle.  Default thresholds target
    cluster scale (10 GB application side), so the test tunes them to
    testdata size; the capability, not the threshold, is what's
    pinned."""
    import re

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1MB",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        from pyspark.sql import functions as F

        li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        orders = spark.read.parquet("/root/testdata/sf0.1/orders.parquet").where(
            F.col("o_totalprice") > 450000
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert re.search(r"might_contain|BloomFilterMightContain", plan), plan[:500]
        # correctness unchanged by the filter
        with_bloom = {(r.o_orderpriority, r["count"]) for r in j.collect()}
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        without = {(r.o_orderpriority, r["count"]) for r in j.collect()}
        assert with_bloom == without
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_prefix_filter_merge_insurance_gate(spark):
    """The 100x probe watched Catalyst statically broadcast the
    shingle-frequency aggregate / prefix self-join / item-set verify
    sides off garbage size estimates and OOM the driver (r5); the
    clean-box A/B then measured the forced sorts costing +1.7 s at
    sf-scale where broadcast is definitionally safe (r6).  Both gate
    arms must hold: with ``prefer_merge=True`` (the registered path
    above 100k docs) every corpus-scaled build side is a spillable
    sort-merge join and broadcast appears nowhere; the registered entry
    at test scale (gate OFF) is free to broadcast."""
    from logistream_data_pipeline_aws_spark.catalog import load_table
    from logistream_data_pipeline_aws_spark.operators.dedup_family import (
        prefix_filter_pairs,
    )

    docs = load_table(spark, "documents", SF_SMALL)
    insured = prefix_filter_pairs(
        docs, "doc_id", "text", threshold=0.5, k_shingle=5, prefer_merge=True
    )
    plan = insured._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("SortMergeJoin") >= 4  # dfreq, cap keep-join, 2x verify
    # the registered entry's gate is corpus-size-driven: at test scale
    # it must take the cheap broadcast arm (the A/B-measured form)
    gated = _plan(spark, "dedup_prefix_filter")
    assert "BroadcastHashJoin" in gated


def test_bounded_blocks_keep_join_is_sort_merge(spark):
    """Every block-capped operator routes its keep-join through the
    spillable strategy — the cap frame scales with the block-key
    vocabulary and must never be a broadcast build side."""
    plan = _plan(spark, "dedup_ngram_jaccard")
    assert "BroadcastHashJoin" not in plan


def test_upsert_timetravel_is_shuffle_free(spark):
    """events_upsert_timetravel's whole plan is two manifest-resolved
    bucket scans + a union: no Exchange, no join — the 100 TB cost is
    exactly the parquet read of the snapshots' live buckets."""
    plan = _plan(spark, "events_upsert_timetravel")
    assert "Exchange" not in plan, "time travel grew a shuffle"
    assert "Join" not in plan
