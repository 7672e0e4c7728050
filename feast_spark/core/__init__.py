"""Core data-model abstractions — feast's declarative layer on Spark."""

from feast_spark.core.model import (  # noqa: F401
    Aggregation,
    BatchFeatureView,
    Entity,
    FeatureService,
    FeatureView,
    Field,
    OnDemandFeatureView,
    ParquetSource,
    RequestSource,
    SparkSqlSource,
)
from feast_spark.core.registry import Registry  # noqa: F401
from feast_spark.core.store import FeatureStore  # noqa: F401
