"""GeoJSON route flattening — the Lambda, as three DataFrame operators.

Reference: ``etl_jobs/lambda_geojson_processor.py`` (LJ:9-49) fetches a
GeoJSON FeatureCollection from S3, loops over ``features[]`` in Python and
emits a 5-column CSV ``origin_lat, origin_long, dest_lat, dest_long,
shape_wkt``.  Here: ``spark.read.json(multiLine)`` -> ``explode(features)``
-> nested field access -> higher-order WKT fold (SURVEY §2.8 N1-N5) — fully
distributed, no driver loop, no UDF.

The reference's LJ:40 bug (dest_long emitted as a copy of end_lat) is fixed;
see ``functions.wkt.origin_dest_columns``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# FeatureCollection -> features[].geometry.coordinates[][] (LJ:19-30).
GEOJSON_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField(
            "features",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", T.StringType()),
                        T.StructField(
                            "geometry",
                            T.StructType(
                                [
                                    T.StructField("type", T.StringType()),
                                    T.StructField(
                                        "coordinates",
                                        T.ArrayType(T.ArrayType(T.DoubleType())),
                                    ),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """One row per Feature, with its coordinates array (N1-N3)."""
    raw = spark.read.option("multiLine", "true").schema(GEOJSON_SCHEMA).json(path)
    return raw.select(F.explode("features").alias("feature")).select(
        F.col("feature.geometry.type").alias("geometry_type"),
        F.col("feature.geometry.coordinates").alias("coordinates"),
    )


def flatten_geojson_routes(features: DataFrame) -> DataFrame:
    """Features -> the 5-column processed_routes table (LJ:24 layout,
    intended semantics)."""
    from logistream_data_pipeline_aws_spark.functions.wkt import (
        linestring_wkt,
        origin_dest_columns,
    )

    od = origin_dest_columns("coordinates")
    return features.select(
        od["origin_lat"].alias("origin_lat"),
        od["origin_long"].alias("origin_long"),
        od["dest_lat"].alias("dest_lat"),
        od["dest_long"].alias("dest_long"),
        linestring_wkt("coordinates").alias("shape_wkt"),
    )
