"""As-of / range join operator semantics: inclusive vs strict boundaries,
per-key isolation, deterministic tie handling, nested-loop refusal."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from logistream_data_pipeline_aws_spark.operators.asof import as_of_join, range_join


def _t(m):
    return datetime.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", _t(10)), (2, "u1", _t(20)), (3, "u1", _t(5)), (4, "u2", _t(30))],
        ["event_id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [("u1", _t(10), 100.0), ("u1", _t(15), 150.0), ("u2", _t(40), 400.0)],
        ["k", "ts", "price"],
    )
    return left, right


def test_asof_inclusive(frames):
    left, right = frames
    out = {
        r.event_id: r.asof_price
        for r in as_of_join(left, right, ["k"], "ts", "ts", ["price"]).collect()
    }
    assert out[1] == 100.0  # exact-ts match included (at-or-before)
    assert out[2] == 150.0  # most recent of the two earlier rows
    assert out[3] is None   # nothing at-or-before 00:05
    assert out[4] is None   # u2's only right row is later; keys isolated


def test_asof_strict(frames):
    left, right = frames
    out = {
        r.event_id: r.asof_price
        for r in as_of_join(left, right, ["k"], "ts", "ts", ["price"], strict=True).collect()
    }
    assert out[1] is None   # equal ts excluded under strict
    assert out[2] == 150.0


def test_asof_dedups_right_ties(spark):
    left = spark.createDataFrame([(1, "k", _t(10))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [("k", _t(5), 1.0), ("k", _t(5), 9.0)], ["k", "ts", "v"]
    )
    out = as_of_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    assert out[0].asof_v == 9.0  # deterministic: max value per (key, ts)


def test_range_join_requires_equality_key(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="equality key"):
        range_join(df, df, on=[], band=F.lit(True))


def test_asof_rejects_column_collisions(spark):
    left = spark.createDataFrame([(1, "k", _t(1), 5.0)], ["id", "k", "ts", "price"])
    right = spark.createDataFrame([("k", _t(0), 1.0)], ["k", "ts", "price"])
    with pytest.raises(ValueError, match="collide"):
        as_of_join(left, right, ["k"], "ts", "ts", ["price"])


def test_asof_tie_keeps_one_row_not_blend(spark):
    """Multiple right rows at the same (key, ts) must resolve to ONE row
    (max under right_vals order), never a per-column blend."""
    left = spark.createDataFrame([(1, "k", _t(10))], ["id", "k", "ts"])
    right = spark.createDataFrame(
        [("k", _t(5), 1.0, 9.0), ("k", _t(5), 9.0, 1.0)], ["k", "ts", "v", "w"]
    )
    out = as_of_join(left, right, ["k"], "ts", "ts", ["v", "w"]).collect()[0]
    assert (out.asof_v, out.asof_w) == (9.0, 1.0)  # the v=9 ROW, not (9, 9)


def test_asof_null_payload_value_not_backfilled(spark):
    """Regression (round-6 NULL probe, via scd2_daily_snapshot): a build
    row whose payload value is genuinely NULL must surface AS NULL —
    the per-column last(ignorenulls=True) carry blended the newer row's
    non-null columns with an OLDER row's value for the null one."""
    import datetime

    from logistream_data_pipeline_aws_spark.operators.asof import as_of_join

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)  # noqa: E731
    right = spark.createDataFrame(
        [(1, t(0), "error", 11), (1, t(10), None, 12), (1, t(20), "view", 13)],
        "k int, ts timestamp, state string, version int",
    )
    left = spark.createDataFrame(
        [(1, t(5)), (1, t(15)), (1, t(25))], "k int, pts timestamp"
    )
    out = {
        r.pts.minute: (r.asof_state, r.asof_version)
        for r in as_of_join(
            left, right, on=["k"], left_ts="pts", right_ts="ts",
            right_vals=["state", "version"],
        ).collect()
    }
    assert out[5] == ("error", 11)
    assert out[15] == (None, 12)   # NOT ("error", 12): no cross-row blend
    assert out[25] == ("view", 13)
