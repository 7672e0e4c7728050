"""Label views with conflict resolution — feast's labeling subsystem.

Reference: ``sdk/python/feast/labeling/label_view.py:28`` (LabelView) and
``labeling/conflict_resolver.py:19-102`` — strategies for multiple label
rows per entity:

- last-write-wins: latest (ts, created) row per key -> latest_per_key
- labeler-priority: highest-priority labeler per key, ties by recency
- majority-vote: modal label value per key, deterministic tie-break
  (lexicographically smallest — same discipline as the pipeline's
  language mode)

All strategies are single hash-aggregations (map-side partial combine) —
no window sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feast_spark.operators.latest import latest_per_key


def resolve_last_write_wins(
    df: DataFrame, keys: list[str], ts_col: str, created_ts_col: str | None = None
) -> DataFrame:
    return latest_per_key(df, keys, ts_col, created_ts_col, strategy="agg")


def resolve_labeler_priority(
    df: DataFrame,
    keys: list[str],
    label_col: str,
    priority_col: str,
    ts_col: str,
) -> DataFrame:
    """Highest priority wins; recency breaks priority ties."""
    payload = [c for c in df.columns if c not in keys]
    out = df.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(F.col(priority_col), F.col(ts_col)),
        ).alias("__row")
    )
    return out.select(*keys, *[F.col(f"__row.{c}").alias(c) for c in payload])


def resolve_majority_vote(
    df: DataFrame, keys: list[str], label_col: str
) -> DataFrame:
    """Modal label per key; count ties break to the exact lexicographically
    smallest label (deterministic under any partitioning).

    Two hash aggregations, no window sorts: per-(key,label) counts, then
    min_by on (-cnt, label) — min over the struct is exactly (max count,
    then smallest label) because struct comparison is field-ordered.
    -cnt keeps the whole comparison a single MIN (no translate tricks —
    the round-1 reverse-alphabet tie-break was wrong for prefix pairs and
    non-letter labels)."""
    counts = df.groupBy(*keys, label_col).agg(F.count(F.lit(1)).alias("cnt"))
    out = counts.groupBy(*keys).agg(
        F.min_by(
            label_col, F.struct((-F.col("cnt")).alias("neg"), F.col(label_col))
        ).alias(label_col),
        F.sum("cnt").alias("n_votes"),
    )
    return out
