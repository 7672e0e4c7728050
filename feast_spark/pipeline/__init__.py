"""The transcript quality-filter pipeline (Spark) and its pandas oracle."""

from feast_spark.pipeline.quality import (  # noqa: F401
    QualityConfig,
    conversation_features,
    run_quality_pipeline,
    score_transcripts,
)
