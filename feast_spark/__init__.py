"""feast_spark — a PySpark-native feature/quality-filter engine.

A from-scratch re-expression of feast-dev/feast's query and data-processing
capabilities (point-in-time joins, latest-per-key materialization, windowed
aggregations, row transformations) as idiomatic PySpark, plus the
training-data operators (dedup, similarity search, text quality scoring)
needed by a web-scale transcript quality-filter pipeline.

Reference semantics are cited per module as ``/root/reference/<path>:<lines>``
(feast-dev/feast @ 2026-08-07). Architecture is Spark-first: DataFrame/SQL
plans optimized by Catalyst, Arrow-vectorized pandas UDFs on the slow path,
no per-row Python anywhere.
"""

__version__ = "0.1.0"
