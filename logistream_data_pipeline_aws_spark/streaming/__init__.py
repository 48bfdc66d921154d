"""Structured Streaming surface (SURVEY §2.9 / §7 phase S)."""

from logistream_data_pipeline_aws_spark.streaming.pipeline import (  # noqa: F401
    foreach_batch_append,
    read_events_stream,
    run_available_now,
    sessionize,
    stream_static_join,
    windowed_aggregate,
)
