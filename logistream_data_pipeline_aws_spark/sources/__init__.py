"""Sources & sinks: parquet/csv/json readers with fixed schemas, the
GeoJSON route flattener, and overwrite/append sinks replacing the
reference's TRUNCATE+JDBC-append pattern."""

from logistream_data_pipeline_aws_spark.sources.io import (  # noqa: F401
    read_csv,
    read_json,
    read_parquet,
    write_table,
)
from logistream_data_pipeline_aws_spark.sources.geojson import (  # noqa: F401
    flatten_geojson_routes,
    read_geojson,
)
