"""Dimension builders + fact key pipeline on tiny in-memory frames
(reference shapes: GE:109-241 dims, GE:294-348 fact)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logistream_data_pipeline_aws_spark.operators.dimensions import (
    build_date_dimension,
    build_dimension,
    build_junk_dimension,
)
from logistream_data_pipeline_aws_spark.operators.fact import KeyLookup, assemble_fact


def test_build_dimension_with_hierarchy(spark):
    raw = spark.createDataFrame(
        [
            (1, "Fitness", 10, "Electronics"),
            (1, "Fitness", 10, "Electronics"),  # dup row
            (2, "Footwear", 10, "Electronics"),
            (3, "Apparel", 20, "Fan Shop"),
        ],
        ["cat_id", "cat_name", "dept_id", "dept_name"],
    )
    depts = build_dimension(
        raw, {"dept_id": "dept_id", "dept_name": "dept_name"}, ["dept_id"], "dept_key"
    )
    assert {(r.dept_id, r.dept_key) for r in depts.collect()} == {(10, 1), (20, 2)}

    cats = build_dimension(
        raw,
        {"cat_id": "cat_id", "cat_name": "cat_name", "dept_id": "dept_id"},
        ["cat_id"],
        "cat_key",
        parent=depts.select("dept_id", "dept_key"),
        parent_on=["dept_id"],
    )
    got = {(r.cat_id, r.cat_key, r.dept_key) for r in cats.collect()}
    assert got == {(1, 1, 1), (2, 2, 1), (3, 3, 2)}


def test_junk_dimension_normalizes(spark):
    raw = spark.createDataFrame(
        [(" first class ", "Late"), ("FIRST CLASS", "late"), ("Same Day", "On time")],
        ["mode", "status"],
    )
    dim = build_junk_dimension(raw, {"mode": "mode", "status": "status"}, "k")
    got = {(r.mode, r.status, r.k) for r in dim.collect()}
    assert got == {
        ("FIRST CLASS", "LATE", 1),
        ("SAME DAY", "ON TIME", 2),
    }


def test_date_dimension_union_distinct(spark):
    import datetime

    a = spark.createDataFrame(
        [(datetime.date(2018, 1, 31),), (datetime.date(2018, 2, 1),), (None,)], ["d1"]
    )
    b = spark.createDataFrame([(datetime.date(2018, 2, 1),)], ["d2"])
    dim = build_date_dimension([(a, "d1"), (b, "d2")])
    rows = {r.date_key: r for r in dim.collect()}
    assert set(rows) == {20180131, 20180201}
    assert rows[20180131].month_name == "January"
    assert rows[20180201].quarter == 1


def test_assemble_fact_left_join_and_broadcast(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "b"), (3, "zz")], ["id", "nat"])
    dim = spark.createDataFrame([("a", 100), ("b", 200)], ["nat_key", "sk"])
    out = assemble_fact(
        fact,
        [KeyLookup(dim, ["nat"], ["nat_key"], ["sk"])],
        derived={"doubled": F.col("id") * 2},
    )
    got = {(r.id, r.sk, r.doubled) for r in out.collect()}
    assert got == {(1, 100, 2), (2, 200, 4), (3, None, 6)}  # left join keeps misses
    # the lookup must be planned as a broadcast join (no fact-side shuffle)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
