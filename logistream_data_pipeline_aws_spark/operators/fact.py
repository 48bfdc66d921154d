"""Fact assembly — the surrogate-key lookup pipeline (SURVEY §7 phase 3).

The reference's fact build (etl_jobs/glue_master_etl.py GE:294-348) derives
normalized/composite/date key columns, then chains five *left outer*
equi-joins against small key maps (J3-J7, GE:314-327) and projects the
final measure+key set.  At scale the only physical plan worth having is:
fact scan -> narrow derivations -> N **broadcast** hash joins (zero
shuffle on the fact side) -> projection.  ``assemble_fact`` asserts that
plan by wrapping every lookup side in ``F.broadcast``.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class KeyLookup:
    """One surrogate-key join: fact[left_on...] = dim[right_on...] -> take."""

    dim: DataFrame
    left_on: Sequence[str]
    right_on: Sequence[str]
    take: Sequence[str]  # key columns to pull in from the dim
    how: str = "left"


def assemble_fact(
    fact: DataFrame,
    lookups: Sequence[KeyLookup],
    derived: dict[str, Column] | None = None,
    project: Sequence[Column | str] | None = None,
) -> DataFrame:
    """Derive key columns, run the broadcast-join key pipeline, project.

    All lookups are dimension-sized -> broadcast-hash join, streamed probe
    on the fact side; the 100 TB fact never shuffles here (SURVEY §4.4).
    """
    out = fact.withColumns(derived) if derived else fact
    for lk in lookups:
        dim_side = lk.dim.select(
            *[F.col(r).alias(f"__k{i}") for i, r in enumerate(lk.right_on)],
            *lk.take,
        )
        cond = None
        for i, l in enumerate(lk.left_on):
            c = out[l] == dim_side[f"__k{i}"]
            cond = c if cond is None else (cond & c)
        out = out.join(F.broadcast(dim_side), cond, lk.how).drop(
            *[f"__k{i}" for i in range(len(lk.right_on))]
        )
    if project is not None:
        out = out.select(*[F.col(c) if isinstance(c, str) else c for c in project])
    return out
