"""Exact heavy hitters at unbounded key cardinality.

A plain ``GROUP BY key HAVING count > t`` is already distributed, but its
shuffle carries EVERY distinct key — at 100 TB with billions of distinct
keys the aggregation state itself is the bottleneck.  The classic fix is
two-phase: a per-partition Misra-Gries pass (bounded memory: at most
``capacity`` counters per task, no shuffle) proposes a candidate superset,
then an exact recount of ONLY the candidates confirms.  The MG guarantee
makes the result exact, not approximate: any key with global count
> n/(capacity+1) survives the decrement process in at least one partition
(pigeonhole over the per-partition guarantee), so candidates ⊇ every true
heavy hitter and the recount discards the rest.

Python runs only in the Arrow-batched ``mapInPandas`` candidate pass, on
the narrow key projection; the recount is a keys-only broadcast semi-join
plus one small aggregation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_candidates_fn(key_cols: Sequence[str], capacity: int):
    # closure (NOT a module-level function): the driver harness's Python
    # workers run from a cwd where this package may not be importable, so
    # the function must cloudpickle by value (see verify skill).
    cols = list(key_cols)

    def mg(batches):
        import pandas as pd

        counters: dict[tuple, int] = {}
        for pdf in batches:
            for key in zip(*(pdf[c] for c in cols)):
                if key in counters:
                    counters[key] += 1
                elif len(counters) < capacity:
                    counters[key] = 1
                else:
                    # decrement step: all counters drop by 1, zeros evicted
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        if counters:
            yield pd.DataFrame(list(counters.keys()), columns=cols)

    return mg


def exact_heavy_hitters(
    df: DataFrame,
    key_cols: Sequence[str],
    threshold_denom: int,
    capacity: int | None = None,
) -> DataFrame:
    """Keys whose exact count exceeds ``total_rows / threshold_denom``.

    ``capacity`` defaults to ``threshold_denom``: MG(c) per partition
    covers every key with global count > n/(c+1), and
    n/denom > n/(denom+1), so capacity = denom preserves the superset
    guarantee.  NULL keys are excluded up front (a NULL "heavy hitter"
    is a data-quality finding, not a frequency one — and NaN identity
    inside the pandas pass would silently undercount it).
    """
    cols = list(key_cols)
    if capacity is None:
        capacity = threshold_denom
    keys = df.select(*cols).na.drop(subset=cols)
    schema = keys.schema
    candidates = keys.mapInPandas(
        _mg_candidates_fn(cols, capacity), schema=schema
    ).distinct()
    total = keys.agg(F.count(F.lit(1)).alias("_total"))
    return (
        keys.join(F.broadcast(candidates), cols, "left_semi")
        .groupBy(*cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n_rows") > F.col("_total") / float(threshold_denom))
        .drop("_total")
    )
