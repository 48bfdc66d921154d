"""Row deduplication with pinned-down semantics.

The reference leans on ``dropDuplicates([keys])`` eleven times
(etl_jobs/glue_master_etl.py GE:112, 122, 134, 147, 215, 232, 249, 252,
266, 278, 289), whose surviving row is nondeterministic — in Glue *and* in
stock Spark.  Golden tests and the DuckDB oracle need reproducible output,
so the engine standardizes (SURVEY §4.3):

- ``dedup_first`` — keep the minimum row per key under an explicit
  tiebreak ordering: ``row_number() OVER (PARTITION BY keys ORDER BY
  tiebreak) == 1``.  Deterministic; one shuffle on the keys; the window
  is per-key (no global sort) so it scales to any key cardinality.
- ``dedup_any`` — raw ``dropDuplicates`` for when any representative is
  acceptable; slightly cheaper (partial aggregation map-side combine,
  no window sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RN = "__dedup_rn"


def dedup_first(
    df: DataFrame, keys: Sequence[str], tiebreak: Sequence[str]
) -> DataFrame:
    """Keep exactly one row per ``keys``, the first under ``tiebreak``.

    ``keys + tiebreak`` should uniquely order rows within a key group,
    otherwise survivors are still ambiguous.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        *[F.col(t) for t in tiebreak]
    )
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .where(F.col(_RN) == 1)
        .drop(_RN)
    )


def dedup_any(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """Reference-parity ``dropDuplicates`` (arbitrary survivor)."""
    return df.dropDuplicates(list(keys)) if keys else df.dropDuplicates()
