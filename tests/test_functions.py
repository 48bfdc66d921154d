"""Unit tests for the scalar-function layer (SURVEY §2.7 F1-F8).

Covers the reference's date-parsing edge cases (1-digit month/day/hour/
minute under "M/d/yyyy H:m", GE:183) and key normalization (GE:305-310).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from logistream_data_pipeline_aws_spark.functions.dates import (
    calendar_columns,
    date_key,
    parse_raw_date,
)
from logistream_data_pipeline_aws_spark.functions.normalize import composite_key, norm_key


def test_parse_raw_date_formats(spark):
    df = spark.createDataFrame(
        [
            ("1/31/2018 22:56",),
            ("12/1/2017 5:3",),
            ("2/9/2016 0:0",),
            (None,),
            ("not a date",),
        ],
        ["raw"],
    )
    out = df.select(parse_raw_date("raw").alias("d")).collect()
    assert out[0].d == datetime.date(2018, 1, 31)
    assert out[1].d == datetime.date(2017, 12, 1)
    assert out[2].d == datetime.date(2016, 2, 9)
    assert out[3].d is None
    assert out[4].d is None  # malformed -> NULL, never throw (legacy parity)


def test_date_key_and_calendar(spark):
    df = spark.createDataFrame([(datetime.date(2018, 1, 31),)], ["d"])
    row = df.select(
        date_key("d").alias("k"), *[v.alias(k) for k, v in calendar_columns("d").items()]
    ).collect()[0]
    assert row.k == 20180131
    assert (row.year, row.month, row.quarter) == (2018, 1, 1)
    assert row.month_name == "January"
    assert row.day_of_week == "Wednesday"


def test_norm_key(spark):
    df = spark.createDataFrame([("  standard Class ",), ("STANDARD CLASS",)], ["s"])
    vals = {r.v for r in df.select(norm_key("s").alias("v")).collect()}
    assert vals == {"STANDARD CLASS"}


def test_composite_key(spark):
    df = spark.createDataFrame([Row(a=1.5, b=-2.0, c=3.25, d=4.0)])
    v = df.select(composite_key("a", "b", "c", "d").alias("k")).collect()[0].k
    assert v == "1.5_-2.0_3.25_4.0"


def test_hash_bucket_matches_pmod(spark):
    from logistream_data_pipeline_aws_spark.functions.keys import with_hash_bucket

    df = spark.range(100)
    out = with_hash_bucket(df, "id", 20)
    chk = out.withColumn("expect", F.pmod(F.hash(F.col("id")), F.lit(20)))
    assert chk.where(F.col("bucket") != F.col("expect")).count() == 0
    assert out.select("bucket").distinct().count() <= 20
