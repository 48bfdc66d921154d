"""WKT geometry builders via higher-order functions (no UDF).

Replaces the reference Lambda's per-feature Python loop
(etl_jobs/lambda_geojson_processor.py LJ:29-40): coordinates
``[[lon, lat], ...]`` -> ``LINESTRING(lon lat, lon lat, ...)``.

Note the reference's LJ:40 bug — it emits ``dest_long`` as a duplicate of
``end_lat`` — is *not* replicated; `origin_dest_columns` extracts the
intended four values (SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fmt_num(c: Column) -> Column:
    # Render doubles the way Python's f-string does for typical coords:
    # strip a trailing ".0" that Spark's double->string cast produces for
    # integral values.
    s = c.cast("string")
    return F.regexp_replace(s, r"\.0$", "")


def linestring_wkt(coords: Column | str) -> Column:
    """``array<array<double>>`` of [lon, lat] pairs -> WKT LINESTRING string.

    Pure Catalyst: transform + array_join inside whole-stage codegen
    (SURVEY §2.7 F9).
    """
    c = F.col(coords) if isinstance(coords, str) else coords
    pair = lambda xy: F.concat_ws(" ", _fmt_num(xy[0]), _fmt_num(xy[1]))  # noqa: E731
    return F.concat(
        F.lit("LINESTRING("),
        F.array_join(F.transform(c, pair), ", "),
        F.lit(")"),
    )


def origin_dest_columns(coords: Column | str) -> dict[str, Column]:
    """First/last coordinate pair -> origin/dest lat+long columns.

    Coordinates arrive [longitude, latitude] (LJ:33-34).  Emits the
    *intended* dest_long (the reference's LJ:40 emits end_lat twice).
    """
    c = F.col(coords) if isinstance(coords, str) else coords
    first = F.element_at(c, 1)
    last = F.element_at(c, -1)
    return {
        "origin_lat": F.element_at(first, 2).cast("double"),
        "origin_long": F.element_at(first, 1).cast("double"),
        "dest_lat": F.element_at(last, 2).cast("double"),
        "dest_long": F.element_at(last, 1).cast("double"),
    }
