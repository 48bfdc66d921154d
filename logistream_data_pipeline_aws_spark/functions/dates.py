"""Date-dimension helpers.

The reference parses ``"M/d/yyyy H:m"`` strings (etl_jobs/glue_master_etl.py
GE:183, GE:186), renders ``yyyyMMdd`` int keys (GE:192, GE:302-304), and
declares — but never populates — the calendar attribute columns
``year, month, month_name, day_of_week, quarter``
(data_warehouse/ddl_snowflake_schema.sql DS:55-59).  This engine implements
the full DDL intent (SURVEY §1.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The reference's raw timestamp format, e.g. "1/31/2018 22:56" (GE:183).
RAW_DATETIME_FORMAT = "M/d/yyyy H:m"


def parse_raw_date(col: Column | str, fmt: str = RAW_DATETIME_FORMAT) -> Column:
    """``to_date`` under the reference's format; invalid/missing -> NULL.

    ``try_to_timestamp`` keeps Spark 3+'s strict parser from throwing on
    malformed rows (the legacy SimpleDateFormat silently NULLed them).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(F.try_to_timestamp(c, F.lit(fmt)))


def date_key(col: Column | str) -> Column:
    """Date -> yyyymmdd int key (GE:192: date_format + cast int)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd").cast("int")


def calendar_columns(date_col: str) -> dict[str, Column]:
    """The DS:55-59 calendar attributes for a DateType column."""
    c = F.col(date_col)
    return {
        "year": F.year(c),
        "month": F.month(c),
        "month_name": F.date_format(c, "MMMM"),
        "day_of_week": F.date_format(c, "EEEE"),
        "quarter": F.quarter(c),
    }


def with_calendar(df: DataFrame, date_col: str) -> DataFrame:
    return df.withColumns(calendar_columns(date_col))
