"""Join-key normalization and composite keys.

Mirrors the reference's case/whitespace-insensitive key matching
(``upper(trim(col))`` on both sides of every status/geography join,
etl_jobs/glue_master_etl.py GE:263-265, GE:286-288, GE:305-310) and its
composite route key (``concat_ws("_", lat1, lon1, lat2, lon2)``,
GE:212-214, GE:275-277, GE:296-299).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_key(col: Column | str) -> Column:
    """Case- and edge-whitespace-insensitive join key: ``upper(trim(x))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.trim(c))


def composite_key(*cols: Column | str, sep: str = "_") -> Column:
    """Multi-column natural key folded to one string (``concat_ws``).

    NULL components are dropped by concat_ws (same as the reference);
    prefer multi-column join key lists when NULLs are possible.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.concat_ws(sep, *cs)
