"""Array-expression helpers with scale-safe physical behavior."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_once(df: DataFrame, array: Column | str, alias: str, *keep) -> DataFrame:
    """``explode`` an expensive computed array WITHOUT re-evaluating it.

    Plain ``F.explode`` makes Catalyst infer a ``size(arr) > 0 AND
    isnotnull(arr)`` pruning filter (InferFiltersFromGenerate) which
    predicate-pushdown then sinks below any Exchange into the file-scan
    Filter — textually inlining the whole array expression, which
    interpreted higher-order exprs re-evaluate per row with no common
    subexpression elimination.  For a CPU-heavy array (char-gram hashes,
    shingles, token hashes) that triples the work AND runs it in the
    pre-repartition single-task scan stage of a small file.

    ``explode_outer`` infers no such filter; dropping the null rows
    afterwards filters on the generator OUTPUT, which cannot be pushed
    below the Generate — so the array expression is evaluated exactly
    once, after any ``parallelize_cpu_stage`` repartition.

    Caveat: also drops genuine NULL *elements* of the array — fine for
    every caller here (hash/gram arrays never contain nulls).
    """
    arr = F.col(array) if isinstance(array, str) else array
    out = df.select(*keep, F.explode_outer(arr).alias(alias))
    return out.where(F.col(alias).isNotNull())
