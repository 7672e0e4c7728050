"""Structured Streaming ingestion (feast StreamFeatureView analogue)."""

from feast_spark.streaming.processor import (  # noqa: F401
    stream_window_agg,
    streaming_materialize,
)
