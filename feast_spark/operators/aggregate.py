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


def grouped_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probe_units: list[int],
    units: int = 1 << 20,
) -> DataFrame:
    """Exact discrete quantiles per group, global-sort-free — the
    distributional sibling of :func:`numeric_stats` (one global row,
    driver-side percentile list) for GROUPED integer statistics at
    corpus scale (words-per-turn by role, latency by tool, doc length
    by source).

    For each group and each probe ``p`` (a ``units``-denominated
    fraction, ``0 < p <= units``) the answer is the lower discrete
    quantile: the smallest value ``v`` in the group such that at least
    ``ceil(p * n / units)`` of the group's rows have ``value <= v``
    (``n`` = group row count). Rows whose value is NULL are EXCLUDED —
    from ``n_rows`` and from the ranks: a missing measurement is not a
    smallest value (and Spark's NULLS FIRST vs DuckDB's NULLS LAST
    window conventions would otherwise diverge); callers wanting NULLs
    counted must coalesce first. All arithmetic is integer — the rank
    threshold runs in DECIMAL(38,0) (Spark IntegralDivide -> BIGINT /
    DuckDB HUGEINT) so ``p * n`` cannot wrap int64 at 10^12 rows — and
    the result is therefore bit-identical cross-engine (GENUINE SQL
    oracle; no float percentile interpolation anywhere).

    One row per (group, probe): ``(group..., probe_units, n_rows,
    rank, q_value)`` where ``rank`` is the threshold rank the quantile
    satisfied. Groups are never dropped: every group emits every probe.

    Plan at 10^12 input rows: ONE (group, value) map-side-combined hash
    agg collapses the input to distinct-value cardinality (words-per-
    turn has a few thousand distinct values regardless of corpus size);
    the cumulative and total counts are two window frames over the SAME
    (group, value-order) exchange — partition size = distinct values
    per group, never input rows; probes enter as a broadcast literal
    dimension (len(probe_units) rows); the final (group, probe) hash
    agg is dimension-sized. No global sort, no per-input-row window,
    nothing driver-side.

    Reference: feast's monitoring percentiles are per-column global
    scalars (``spark_offline_store/spark.py:777-905``, PERCENTILE_APPROX
    driver-collected); the grouped, exact, integer form is this repo's
    scale restatement.
    """
    from pyspark.sql import Window

    if not probe_units:
        raise ValueError("probe_units must be non-empty")
    bad = [p for p in probe_units if not (0 < int(p) <= units)]
    if bad:
        raise ValueError(f"probe_units out of (0, {units}]: {bad}")
    if len(set(probe_units)) != len(probe_units):
        raise ValueError(f"duplicate probe_units: {probe_units}")

    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, F.col(value_col).cast("long").alias("__v"))
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = counts.select(
        *group_cols,
        "__v",
        F.sum("__cnt").over(w_cum).cast("long").alias("__cum"),
        F.sum("__cnt").over(w_all).cast("long").alias("__n"),
    )
    spark = df.sparkSession
    probes = spark.createDataFrame(
        [(int(p),) for p in probe_units], "probe_units long"
    )
    # rank = ceil(p * n / units), >= 1 (p > 0 guarantees it); the
    # multiply runs in DECIMAL(38,0): 2^20 * 10^12 ~ 2^60 fits int64
    # today, but the discipline here is that corpus-scale numerators
    # never ride int64 (temperature_sample_rates' alpha=1.0 lesson)
    rank = F.expr(
        "CAST((CAST(probe_units AS DECIMAL(38,0)) * __n"
        f" + {units - 1}) DIV {units} AS BIGINT)"
    )
    hit = (
        cum.crossJoin(F.broadcast(probes))
        .withColumn("__rank", rank)
        .filter(F.col("__cum") >= F.col("__rank"))
    )
    return (
        hit.groupBy(*group_cols, "probe_units")
        .agg(
            F.max("__n").alias("n_rows"),
            F.max("__rank").alias("rank"),
            F.min("__v").alias("q_value"),
        )
        .select(*group_cols, "probe_units", "n_rows", "rank", "q_value")
    )
