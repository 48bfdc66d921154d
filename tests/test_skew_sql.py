"""Skew operators (result-equivalence with unsalted plans) + the
spark.sql view surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from logistream_data_pipeline_aws_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from logistream_data_pipeline_aws_spark.plans import sql_views as V
from tests.conftest import SF_SMALL


def _skewed_df(spark):
    # key "hot" holds 90% of rows — the aggregation-skew shape
    hot = spark.range(900).select(
        F.lit("hot").alias("k"), F.col("id").alias("v"), F.col("id").alias("rowid")
    )
    cold = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") % 10).cast("string")).alias("k"),
        F.col("id").alias("v"),
        (F.col("id") + 1000).alias("rowid"),
    )
    return hot.union(cold)


def test_salted_aggregate_matches_direct(spark):
    df = _skewed_df(spark)
    direct = {
        (r.k): (r.total, r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r.k): (r.total, r.n)
        for r in salted_aggregate(
            df, ["k"], {"total": F.col("v"), "n": F.lit(1)}, salt_source="rowid"
        ).collect()
    }
    assert salted == direct


def test_salted_join_matches_direct(spark):
    probe = _skewed_df(spark)
    build = spark.createDataFrame(
        [("hot", "H"), ("c1", "C1"), ("c2", "C2")], ["k", "label"]
    )
    direct = {(r.rowid, r.label) for r in probe.join(build, "k").collect()}
    salted = {
        (r.rowid, r.label)
        for r in salted_join(probe, build, ["k"], salt_source="rowid").collect()
    }
    assert salted == direct


def test_salted_join_rejects_outer(spark):
    import pytest

    df = _skewed_df(spark)
    build = spark.createDataFrame([("hot", "H")], ["k", "label"])
    with pytest.raises(ValueError, match="outer"):
        salted_join(df, build, ["k"], salt_source="rowid", how="full")


def test_sql_surface_matches_dataframe_plan(spark):
    from logistream_data_pipeline_aws_spark.plans.analytics import (
        a5_profit_by_hierarchy,
    )

    sql_out = {
        (r.p_brand, r.p_type): (r.total_revenue, r.n_items)
        for r in V.sql_profit_by_hierarchy(spark, SF_SMALL).collect()
    }
    df_out = {
        (r.p_brand, r.p_type): (r.total_revenue, r.n_items)
        for r in a5_profit_by_hierarchy(spark, SF_SMALL).collect()
    }
    assert sql_out == df_out  # SQL front door == DataFrame plan, bit-exact


def test_sql_joins_run(spark):
    assert V.sql_shipping_priority(spark, SF_SMALL).count() <= 10
    vol = V.sql_local_supplier_volume(spark, SF_SMALL)
    assert vol.count() > 0
    assert vol.columns == ["nation_name", "revenue"]


def test_aqe_splits_skewed_join(spark):
    """AQE's runtime skew handling (enabled in session.py) must actually
    split a hot-key partition: one key holding ~90% of the probe side
    gets marked isSkew in the final sort-merge join.  Thresholds are
    lowered for test scale and restored after."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        probe = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("v"),
        )
        build = spark.range(0, 200_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = probe.join(build, "k")
        n = len(joined._jdf.collect())
        assert n == 200_000  # hot key k=1 matches exactly one build row
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in final
        assert "isSkew=true" in final or "skew=true" in final, (
            "AQE did not mark the hot partition as skewed:\n" + final[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
