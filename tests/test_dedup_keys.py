"""Deterministic dedup + surrogate keys (SURVEY §4.3 / §7 hard parts)."""

from __future__ import annotations

from logistream_data_pipeline_aws_spark.functions.keys import (
    with_sequential_key,
    with_surrogate_key,
)
from logistream_data_pipeline_aws_spark.operators.dedup import dedup_first


def test_dedup_first_is_deterministic(spark):
    rows = [("a", 3, "z"), ("a", 1, "y"), ("a", 2, "x"), ("b", 9, "q")]
    df = spark.createDataFrame(rows, ["k", "ord", "payload"])
    for _ in range(3):
        out = {(r.k, r.ord, r.payload) for r in dedup_first(df, ["k"], ["ord"]).collect()}
        assert out == {("a", 1, "y"), ("b", 9, "q")}


def test_sequential_key_contiguous_and_stable(spark):
    df = spark.createDataFrame([("c",), ("a",), ("b",)], ["name"])
    out = dict(
        (r.name, r.key) for r in with_sequential_key(df, "key", ["name"]).collect()
    )
    assert out == {"a": 1, "b": 2, "c": 3}  # IDENTITY(1,1) parity: 1..N by natural key


def test_surrogate_key_unique(spark):
    df = spark.range(1000).repartition(8)
    out = with_surrogate_key(df, "sk")
    assert out.select("sk").distinct().count() == 1000
