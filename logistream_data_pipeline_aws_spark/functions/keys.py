"""Surrogate-key generation and hash bucketing.

The reference outsources surrogate keys to Redshift ``IDENTITY(1,1)``
columns (data_warehouse/ddl_snowflake_schema.sql DS:3, DS:10, DS:18, DS:28,
DS:41, DS:64, DS:72, DS:82): rows are written without keys and read back to
learn them (etl_jobs/glue_master_etl.py GE:114, GE:117-128).  A Spark-native
engine generates keys in-plan, killing the write→read-back round trip.

Two strategies, chosen by table size:

- ``with_sequential_key`` — ``row_number() OVER (ORDER BY natural key)``;
  exact 1..N contiguity matching IDENTITY semantics and fully deterministic
  (testable).  The global window implies a single-partition sort of the
  *deduplicated dimension*, which is small by construction — fine for dims,
  wrong for facts.
- ``with_surrogate_key`` — scale-safe: ``monotonically_increasing_id`` is
  unique and parallel (partition-id in the high bits) but non-contiguous
  and plan-dependent.  Use for fact-grain ids at 100 TB where a global sort
  is unacceptable and nobody needs contiguity.

Hash bucketing reproduces the reference's manual bucketed-write predicate
``pmod(hash(col), N) == b`` (GE:151-153, GE:353-355) as a *column*, so one
``repartition(N, bucket)`` + one write replaces N sequential filtered jobs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_sequential_key(
    df: DataFrame, key_name: str, order_by: Sequence[str]
) -> DataFrame:
    """Add a deterministic 1..N surrogate key (IDENTITY parity, dims only).

    ``order_by`` must be a unique natural key of ``df`` or the assignment
    is nondeterministic between runs.
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(key_name, F.row_number().over(w).cast("long"))


def with_surrogate_key(df: DataFrame, key_name: str) -> DataFrame:
    """Add a unique, parallel, non-contiguous surrogate key (fact scale)."""
    return df.withColumn(key_name, F.monotonically_increasing_id())


def with_hash_bucket(df: DataFrame, key_col: str, n_buckets: int, bucket_name: str = "bucket") -> DataFrame:
    """Murmur3 hash bucket, same function family as the reference's
    ``pmod(hash(col), N)`` predicate (GE:152, GE:354)."""
    return df.withColumn(bucket_name, F.pmod(F.hash(F.col(key_col)), F.lit(n_buckets)))


def write_bucketed(df: DataFrame, key_col: str, n_buckets: int, path: str, mode: str = "overwrite") -> None:
    """The Spark-idiomatic replacement for the reference's N sequential
    bucket-filtered writes (GE:150-162, GE:352-362): one shuffle, one job,
    per-partition parallel writes."""
    df.repartition(n_buckets, F.col(key_col)).write.mode(mode).parquet(path)
