"""Aggregations: feast's fixed aggregation set + monitoring statistics.

- :class:`Aggregation` mirrors ``sdk/python/feast/aggregation/__init__.py:
  15-120``: (column, function, time_window, slide_interval), name
  ``{fn}_{col}_{window_secs}s``; supported functions sum/max/min/count/
  avg(mean)/count_distinct/stddev/var.
- :func:`apply_aggregations` == the Spark aggregation DAG node
  (``infra/compute_engines/spark/nodes.py:364-396``): plain
  ``groupBy(keys)`` or tumbling/sliding ``F.window(ts, w, s)``.
  Spark's partial (map-side) aggregation makes hot keys a non-issue here —
  the salting helper is for joins, not aggs.
- :func:`numeric_stats` / :func:`categorical_stats` == the monitoring
  jobs (``spark_offline_store/spark.py:777-963``; Arrow impl
  ``dask.py:804-900``): one-pass COUNT/AVG/STDDEV/MIN/MAX/percentiles +
  bucketed histogram; categorical row/null/unique + top-N value counts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FUNCTIONS = {
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "count": F.count,
    "avg": F.avg,
    "mean": F.avg,
    "count_distinct": F.countDistinct,
    "approx_count_distinct": F.approx_count_distinct,
    "stddev": F.stddev_samp,
    "var": F.var_samp,
}


@dataclass(frozen=True)
class Aggregation:
    """One aggregation spec (aggregation/__init__.py:15-120)."""

    column: str
    function: str
    time_window_seconds: int | None = None
    slide_interval_seconds: int | None = None

    @property
    def name(self) -> str:
        if self.time_window_seconds:
            return f"{self.function}_{self.column}_{self.time_window_seconds}s"
        return f"{self.function}_{self.column}"

    def expr(self) -> Column:
        fn = _FUNCTIONS.get(self.function)
        if fn is None:
            raise ValueError(f"unsupported aggregation function: {self.function}")
        return fn(self.column).alias(self.name)


def apply_aggregations(
    df: DataFrame,
    group_keys: list[str],
    aggregations: list[Aggregation],
    ts_col: str | None = None,
) -> DataFrame:
    """groupBy(keys [+ time window]).agg(...) (spark/nodes.py:364-396).

    If any aggregation carries a time window, all must share the same
    (window, slide) — feast's StreamFeatureView has one window spec per
    view — and ``ts_col`` is required; output gains ``window_start`` /
    ``window_end`` columns.
    """
    windowed = [a for a in aggregations if a.time_window_seconds]
    exprs = [a.expr() for a in aggregations]
    if not windowed:
        return df.groupBy(*group_keys).agg(*exprs)
    if ts_col is None:
        raise ValueError("windowed aggregations require ts_col")
    spec = {(a.time_window_seconds, a.slide_interval_seconds) for a in windowed}
    if len(spec) != 1:
        raise ValueError("all windowed aggregations must share one (window, slide)")
    win_s, slide_s = next(iter(spec))
    win = (
        F.window(F.col(ts_col), f"{win_s} seconds", f"{slide_s} seconds")
        if slide_s
        else F.window(F.col(ts_col), f"{win_s} seconds")
    )
    out = df.groupBy(*group_keys, win.alias("__w")).agg(*exprs)
    return out.select(
        *group_keys,
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *[a.name for a in aggregations],
    )


def apply_aggregations_to_response(
    df: DataFrame,
    aggregations: list[Aggregation],
    group_keys: list[str] | None = None,
) -> DataFrame:
    """Post-retrieval aggregation over a (historical/online) response
    frame — ``utils._apply_aggregations_to_response`` (utils.py:671-726):
    the retrieval result is grouped by ``group_keys`` (or aggregated
    whole) with the view's aggregation specs; time windows are rejected
    exactly like the reference ("Time window aggregation is not supported
    in online serving")."""
    if any(a.time_window_seconds for a in aggregations):
        raise ValueError(
            "Time window aggregation is not supported in online serving."
        )
    return apply_aggregations(df, group_keys or [], aggregations)


def numeric_stats(
    df: DataFrame,
    column: str,
    percentiles: list[float] = (0.5, 0.9, 0.95, 0.99),
) -> DataFrame:
    """One-row stats frame (spark.py:777-905). Exact percentiles so the
    result is engine-portable (the reference uses PERCENTILE_APPROX; exact
    keeps the DuckDB oracle comparable)."""
    c = F.col(column)
    exprs = [
        F.count(c).alias("cnt"),
        F.avg(c).alias("avg_val"),
        F.stddev_samp(c).alias("stddev_val"),
        F.min(c).alias("min_val"),
        F.max(c).alias("max_val"),
    ]
    for p in percentiles:
        exprs.append(
            F.expr(f"percentile({column}, {p})").alias(f"p{int(p * 100)}")
        )
    return df.agg(*exprs)


def histogram(
    df: DataFrame,
    column: str,
    bins: int = 10,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Fixed-width histogram via FLOOR((x-min)/w)+1 with LEAST/GREATEST
    clamping — the reference's exact bucketing (spark.py:879-881).

    Two passes are semantically required (bounds, then counts). Pass
    ``bounds=(lo, hi)`` when the range is already known to keep the
    operator fully lazy and composable; otherwise the bounds pass runs as
    an eager min/max job over ``df`` (round-1 finding #5 — the eager scan
    is now avoidable, not mandatory)."""
    if bounds is not None:
        lo, hi = bounds
    else:
        mm = df.agg(F.min(column).alias("lo"), F.max(column).alias("hi")).first()
        lo, hi = mm["lo"], mm["hi"]
    width = (hi - lo) / bins if hi is not None and hi != lo else 1.0
    bucket = F.least(
        F.greatest(
            (F.floor((F.col(column) - F.lit(lo)) / F.lit(width)) + 1).cast("int"),
            F.lit(1),
        ),
        F.lit(bins),
    )
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket")
    )


def categorical_stats(df: DataFrame, column: str, top_n: int = 10) -> DataFrame:
    """Top-N value counts (spark.py:908-963)."""
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(column)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col(column))
        .limit(top_n)
    )
