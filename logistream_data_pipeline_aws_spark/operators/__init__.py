"""Dataflow operators: deterministic dedup, dimension builder, fact key
pipeline, large-scale dedup family, similarity search, multimodal plumbing."""

from logistream_data_pipeline_aws_spark.operators.dedup import (  # noqa: F401
    dedup_any,
    dedup_first,
)
from logistream_data_pipeline_aws_spark.operators.dimensions import (  # noqa: F401
    build_date_dimension,
    build_dimension,
    build_junk_dimension,
)
