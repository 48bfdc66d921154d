"""As-of and range joins — time-series operators Spark lacks natively
(named in the build brief; the reference has no joins beyond equi-lookups,
SURVEY §2.3, but any event/fact timeline analysis needs these).

``as_of_join`` uses the merge-based formulation, NOT a range cross join:
union both sides, one window pass per key carrying the most recent right
row forward (``last(..., ignorenulls)`` over rows preceding).  Cost is one
shuffle on the key + a per-key sort — linear in rows, no quadratic pair
blowup, skew-bounded by the hottest key's row count.  A 100 TB timeline
joins in one pass.

``range_join`` keeps an equality key plus a time-band predicate, so
Catalyst plans a hash join on the key with the band as a post-filter —
never a broadcast-nested-loop.  Callers must supply the equality key; a
pure inequality join does not scale and is refused.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__side"  # 0 = right (build), 1 = left (probe): right sorts first on ties


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` (or ``<`` when ``strict``) per join key.

    Right rows are first reduced to one *row* per (key, ts), the maximum
    under the ordering of ``right_vals`` — deterministic ties without
    blending values across rows.  Left columns may not collide with
    ``right_vals`` names (raises instead of silently shadowing).
    """
    reserved = (
        set(right_vals)
        | {f"asof_{v}" for v in right_vals}
        | {"asof_ts", "__ts", _SIDE}
    )
    collisions = set(left.columns) & reserved
    if collisions:
        raise ValueError(
            f"left columns {sorted(collisions)} collide with right_vals/"
            "output/internal names; rename before joining"
        )
    w_tie = Window.partitionBy(*on, "__ts").orderBy(
        *[F.col(v).desc() for v in right_vals]
    )
    r = (
        right.select(*on, F.col(right_ts).alias("__ts"), *right_vals)
        .withColumn("__rn", F.row_number().over(w_tie))
        .where(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn(_SIDE, F.lit(0))
    )
    left_cols = [c for c in left.columns]
    l = left.withColumn("__ts", F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    # align schemas for the union
    for v in right_vals:
        l = l.withColumn(v, F.lit(None).cast(dict(r.dtypes)[v]))
    for c in left_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l.select(*left_cols, "__ts", _SIDE, *right_vals).union(
        r.select(*left_cols, "__ts", _SIDE, *right_vals)
    )
    # on a tie (right_ts == left_ts): inclusive -> right first (side 0);
    # strict -> right row must be strictly earlier, so exclude equal ts
    # by ordering left first
    side_order = F.col(_SIDE).asc() if not strict else F.col(_SIDE).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ROW-ATOMIC carry: all right values + the build ts travel in ONE
    # struct, NULL only on probe rows.  Carrying each column with its
    # own last(ignorenulls=True) blended values ACROSS build rows when a
    # payload value was genuinely NULL (the newer row's non-null columns
    # with an older row's fill-in for the null one) — found by the
    # events NULL probe on scd2_daily_snapshot (a NULL-state version
    # surfaced with the previous version's state).
    payload = F.when(
        F.col(_SIDE) == 0,
        F.struct(
            F.col("__ts").alias("__t"),
            *[F.col(v).alias(v) for v in right_vals],
        ),
    )
    carried = unioned.select(
        *left_cols,
        "__ts",
        _SIDE,
        F.last(payload, ignorenulls=True).over(w).alias("__p"),
    )
    return (
        carried.where(F.col(_SIDE) == 1)
        .select(
            *left_cols,
            "__ts",
            *[F.col(f"__p.{v}").alias(f"asof_{v}") for v in right_vals],
            F.col("__p.__t").alias("asof_ts"),
        )
        .drop("__ts")
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    band: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` plus an arbitrary band predicate (time window,
    numeric range).  The equality key keeps it a hash join; the band is
    evaluated as the join residual."""
    if not on:
        raise ValueError(
            "range_join requires at least one equality key: a pure "
            "inequality join degenerates to a nested-loop cross product "
            "and will not scale"
        )
    cond = None
    for k in on:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    return left.join(right, cond & band, how)
