"""Skew mitigation operators.

AQE's skew-join splitting (on in ``session.py``) handles sort-merge join
skew at runtime, but two cases still need plan-level help at 100 TB:

- **Aggregation skew** — a hot group key (one customer with 1% of all
  rows) makes one reduce task the straggler.  ``salted_aggregate`` runs
  the classic two-stage pattern: partial aggregate on (keys + salt), then
  final aggregate on keys.  Only works for decomposable aggregates
  (sum/count/min/max — avg as sum+count), which is exactly what the
  analytics surface uses.
- **Broadcast-impossible skewed join** — when the skewed side's hot keys
  meet a too-large-to-broadcast build side, ``salted_join`` replicates
  the build side ``n_salts`` ways and scatters the probe side by a
  deterministic salt, so a hot key spreads over ``n_salts`` tasks.

Salts are deterministic (``pmod(hash(salt_source), n)``), never
``rand()`` — plans stay replayable and testable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column],
    salt_source: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation: SUM/COUNT expressions in ``sums``
    (output name -> expression to sum) are partially aggregated per
    (keys, salt) and recombined per keys.  Result is identical to a
    direct groupBy — the shuffle skew is what changes."""
    salted = df.withColumn(_SALT, F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts)))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[F.sum(expr).alias(name) for name, expr in sums.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in sums]
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    salt_source: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-scattered equi-join: the probe side is salted by a
    deterministic hash of ``salt_source``; the build side is replicated
    across all salt values (explode of a literal range — n_salts x |build|
    rows, so keep the build side dimension-sized).  Join keys become
    (on..., salt); hot probe keys fan out over n_salts tasks.

    Only ``inner``/``left`` joins are supported: under right/full outer,
    unmatched build-side replicas would each surface as a NULL-padded
    row (n_salts duplicates).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: outer "
            "joins would emit one NULL-padded row per salt replica of an "
            "unmatched build row"
        )
    p = probe.withColumn(_SALT, F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts)))
    b = build.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return p.join(b, [*on, _SALT], how).drop(_SALT)
