"""Column-level helpers. Everything here compiles to built-in Catalyst
expressions (``pyspark.sql.functions``) — zero row-at-a-time Python UDFs,
matching the reference's own zero-UDF surface (SURVEY §2.10)."""

from logistream_data_pipeline_aws_spark.functions.dates import (  # noqa: F401
    calendar_columns,
    date_key,
)
from logistream_data_pipeline_aws_spark.functions.keys import (  # noqa: F401
    with_hash_bucket,
    with_sequential_key,
    with_surrogate_key,
)
from logistream_data_pipeline_aws_spark.functions.normalize import (  # noqa: F401
    composite_key,
    norm_key,
)
from logistream_data_pipeline_aws_spark.functions.wkt import (  # noqa: F401
    linestring_wkt,
)
