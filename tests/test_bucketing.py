"""Bucketed-table staging: identically-bucketed tables must join with
ZERO exchanges (the pre-paid-shuffle pattern for the fact⋈orders join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logistream_data_pipeline_aws_spark.catalog import load_table
from logistream_data_pipeline_aws_spark.sources.io import stage_bucketed_table
from tests.conftest import SF_SMALL


def test_bucketed_join_has_no_exchange(spark):
    lineitem = load_table(spark, "lineitem", SF_SMALL)
    orders = load_table(spark, "orders", SF_SMALL)
    stage_bucketed_table(lineitem, "t_li_bucketed", "l_orderkey", 8)
    stage_bucketed_table(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "t_ord_bucketed", "l_orderkey", 8,
    )
    # force the non-broadcast path so the exchange question is real
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_li_bucketed").join(
            spark.table("t_ord_bucketed"), "l_orderkey"
        )
        n = joined.count()
        assert n == lineitem.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # bucketing makes both sides pre-partitioned: no shuffle at all
        # (a cheap LOCAL Sort remains: Spark 3+ doesn't trust bucket sort
        # order without the legacy outputOrdering flag)
        assert "Exchange hashpartitioning" not in plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_ord_bucketed")
