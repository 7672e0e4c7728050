"""Relational operators: PIT join, latest-per-key, aggregations, dedup,
similarity search, salting. Each module cites the reference semantics it
re-expresses (feast-dev/feast @ /root/reference)."""

from feast_spark.operators.pit_join import point_in_time_join  # noqa: F401
from feast_spark.operators.latest import (  # noqa: F401
    latest_per_key,
    pull_all,
    pull_latest,
)
from feast_spark.operators.aggregate import (  # noqa: F401
    Aggregation,
    apply_aggregations,
    categorical_stats,
    numeric_stats,
)
from feast_spark.operators.salting import salted_repartition  # noqa: F401
