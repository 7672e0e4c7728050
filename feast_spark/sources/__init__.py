"""Sources & sinks: scans with pushdown, offline/online/logging writes."""

from feast_spark.sources.sinks import (  # noqa: F401
    feature_logging_sink,
    offline_append,
    remote_storage_export,
    saved_dataset_persist,
)
