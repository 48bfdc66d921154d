"""Property-based tests (hypothesis): parsing and dedup invariants hold
for arbitrary inputs, not just fixtures."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from logistream_data_pipeline_aws_spark.functions.dates import parse_raw_date
from logistream_data_pipeline_aws_spark.operators.dedup import dedup_first

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_slow
@given(
    st.lists(
        st.datetimes(
            min_value=datetime.datetime(1990, 1, 1),
            max_value=datetime.datetime(2035, 12, 31),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_parse_raw_date_roundtrip(spark, dts):
    raws = [(f"{d.month}/{d.day}/{d.year} {d.hour}:{d.minute}",) for d in dts]
    df = spark.createDataFrame(raws, ["raw"])
    out = [r.d for r in df.select(parse_raw_date("raw").alias("d")).collect()]
    assert out == [d.date() for d in dts]


@_slow
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # key
            st.integers(min_value=-100, max_value=100),  # tiebreak/payload
        ),
        min_size=1,
        max_size=40,
    )
)
def test_dedup_first_invariants(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {(r.k, r.v) for r in dedup_first(df, ["k"], ["v"]).collect()}
    expected = {}
    for k, v in rows:
        if k not in expected or v < expected[k]:
            expected[k] = v
    # exactly one survivor per key, and it's the minimum under the tiebreak
    assert out == {(k, v) for k, v in expected.items()}


@_slow
@given(
    st.lists(
        st.integers(min_value=-(10**12), max_value=10**12),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_ranged_keygen_equals_global_rank(spark, keys):
    """with_sequential_key_ranged must assign EXACTLY the global
    1..N rank by key — for arbitrary unique numeric key sets, including
    negatives, extremes, singletons, and heavy range skew."""
    from logistream_data_pipeline_aws_spark.functions.keys import (
        with_sequential_key_ranged,
    )

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r.k: r.seq for r in with_sequential_key_ranged(df, "seq", "k", n_buckets=7).collect()
    }
    want = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == want


@_slow
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # bucket
            st.integers(min_value=0, max_value=25),  # doc id
        ),
        min_size=1,
        max_size=60,
    )
)
def test_capped_bucket_pairs_equals_uncapped_restricted(spark, rows):
    """capped_bucket_pairs must equal the uncapped pair expansion
    restricted to buckets of size 2..cap — for arbitrary bucket shapes,
    including duplicates, singletons, and every-doc-in-one-bucket."""
    from collections import defaultdict

    from logistream_data_pipeline_aws_spark.operators.dedup_family import (
        capped_bucket_pairs,
    )

    df = spark.createDataFrame([(f"b{b}", i) for b, i in rows], ["band", "doc_id"])
    cap = 4
    got = {
        (r.id_a, r.id_b)
        for r in capped_bucket_pairs(
            df, "band", "doc_id", max_bucket_size=cap
        ).collect()
    }
    buckets = defaultdict(set)
    for b, i in rows:
        buckets[b].add(i)
    want = set()
    for ids in buckets.values():
        if 2 <= len(ids) <= cap:
            s = sorted(ids)
            want.update((s[x], s[y]) for x in range(len(s)) for y in range(x + 1, len(s)))
    assert got == want


@_slow
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user
            st.integers(min_value=0, max_value=50),  # ts offset (seconds)
            st.sampled_from(["A", "B", None]),  # state (NULL is a state)
        ),
        min_size=1,
        max_size=30,
    )
)
def test_scd2_history_invariants(spark, rows):
    """For arbitrary change feeds: per-user intervals chain without gaps
    (effective_to == next effective_from), exactly one open (current)
    interval per user, n_events sums to the feed size, and adjacent
    intervals never share a state (null-safe)."""
    from logistream_data_pipeline_aws_spark.operators.dimensions import scd2_history

    data = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=off), u, s)
        for i, (u, off, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, state string"
    )
    out = sorted(
        scd2_history(df, "user_id", "state", "ts", "event_id").collect(),
        key=lambda r: (r.user_id, r.version),
    )
    assert sum(r.n_events for r in out) == len(rows)
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert set(by_user) == {u for u, _, _ in rows}
    for intervals in by_user.values():
        assert [r.version for r in intervals] == list(range(1, len(intervals) + 1))
        assert sum(1 for r in intervals if r.is_current) == 1
        assert intervals[-1].is_current and intervals[-1].effective_to is None
        for a, b in zip(intervals, intervals[1:]):
            assert a.effective_to == b.effective_from
            assert a.state != b.state or (a.state is None) != (b.state is None)


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_zorder_key_property(spark, pts):
    """zorder_key == the textbook Morton interleave for arbitrary 16-bit
    points, stays within 32 bits, and is injective on distinct points."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from logistream_data_pipeline_aws_spark.functions.keys import zorder_key

    def morton(x: int, y: int) -> int:
        out = 0
        for i in range(16):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    df = spark.createDataFrame([Row(x=x, y=y) for x, y in pts])
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == morton(x, y)
        assert 0 <= got[(x, y)] < (1 << 32)
    assert len(set(got.values())) == len(pts)
