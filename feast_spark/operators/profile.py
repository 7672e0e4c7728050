"""Data-quality-monitoring profiles — the reference's ValidationReference
flow (``dqm/profilers/ge_profiler.py:77-161``, ``saved_dataset.py:259``)
without the Great Expectations dependency.

Reference flow: profile a reference dataset into an expectation suite,
persist it, validate later retrieval results against it, surface a report
of validation errors. Here the "suite" is a :class:`DatasetProfile` built
in ONE Spark aggregation pass (count / null-fraction / min / max /
approx-quantiles / capped category sets), JSON-serializable for the
registry, and :func:`validate_dataset` re-profiles a candidate frame and
checks it against tolerance-expanded envelopes — the same three
expectation families feast's canonical GE profiles use
(values-between, null-fraction, value-set membership).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NUMERIC_PREFIXES = ("int", "bigint", "smallint", "tinyint", "float", "double", "decimal")


def _is_numeric(dtype: str) -> bool:
    return dtype.startswith(_NUMERIC_PREFIXES)


@dataclass
class ColumnProfile:
    name: str
    dtype: str
    null_fraction: float
    min: float | None = None
    max: float | None = None
    p05: float | None = None
    p50: float | None = None
    p95: float | None = None
    categories: list[str] | None = None  # None = unbounded / not tracked


@dataclass
class DatasetProfile:
    row_count: int
    columns: dict[str, ColumnProfile] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "row_count": self.row_count,
                "columns": {k: asdict(v) for k, v in self.columns.items()},
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "DatasetProfile":
        d = json.loads(s)
        return cls(
            row_count=d["row_count"],
            columns={k: ColumnProfile(**v) for k, v in d["columns"].items()},
        )


@dataclass(frozen=True)
class ValidationError:
    column: str
    check: str
    expected: str
    observed: str


@dataclass
class ValidationReport:
    ok: bool
    errors: list[ValidationError]

    def __bool__(self) -> bool:
        return self.ok


def profile_dataset(
    df: DataFrame, cols: list[str] | None = None, max_categories: int = 25
) -> DatasetProfile:
    """One aggregation pass over the frame -> per-column profile.

    String columns collect a category set CAPPED at ``max_categories + 1``
    values (one extra to detect unboundedness) — a column with more
    distinct values than the cap is recorded as unbounded rather than
    shipping a giant set through the driver."""
    dtypes = dict(df.dtypes)
    cols = cols or list(dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.avg(F.col(c).isNull().cast("double")).alias(f"{c}__nf"))
        if _is_numeric(dtypes[c]):
            aggs += [
                F.min(c).alias(f"{c}__min"),
                F.max(c).alias(f"{c}__max"),
                F.percentile_approx(c, [0.05, 0.5, 0.95]).alias(f"{c}__q"),
            ]
        elif dtypes[c] == "string":
            aggs.append(
                F.slice(
                    F.sort_array(F.collect_set(c)), 1, max_categories + 1
                ).alias(f"{c}__cats")
            )
    row = df.agg(*aggs).first()
    prof = DatasetProfile(row_count=row["__n"])
    for c in cols:
        cp = ColumnProfile(
            name=c, dtype=dtypes[c], null_fraction=float(row[f"{c}__nf"] or 0.0)
        )
        if _is_numeric(dtypes[c]):
            q = row[f"{c}__q"] or [None, None, None]
            cp.min = None if row[f"{c}__min"] is None else float(row[f"{c}__min"])
            cp.max = None if row[f"{c}__max"] is None else float(row[f"{c}__max"])
            cp.p05, cp.p50, cp.p95 = [None if x is None else float(x) for x in q]
        elif dtypes[c] == "string":
            cats = row[f"{c}__cats"]
            cp.categories = (
                sorted(cats) if cats is not None and len(cats) <= max_categories else None
            )
        prof.columns[c] = cp
    return prof


def validate_dataset(
    df: DataFrame,
    reference: DatasetProfile,
    null_tolerance: float = 0.05,
    range_tolerance: float = 0.10,
    allow_new_categories: bool = False,
) -> ValidationReport:
    """Validate ``df`` against a reference profile.

    Checks per column (tolerance-expanded envelopes):
    - null fraction <= reference + null_tolerance;
    - numeric min/max within [min - tol*range, max + tol*range];
    - median within the reference [p05, p95] band (range-tol expanded);
    - no categories outside the reference set (when it was bounded).
    Missing columns and an empty frame are errors. One aggregation pass.
    """
    errors: list[ValidationError] = []
    have = set(df.columns)
    for c in reference.columns:
        if c not in have:
            errors.append(ValidationError(c, "column_present", "present", "missing"))
    cand = profile_dataset(df, [c for c in reference.columns if c in have])
    if cand.row_count == 0:
        errors.append(ValidationError("*", "row_count", "> 0", "0"))
    for c, ref in reference.columns.items():
        if c not in cand.columns:
            continue
        got = cand.columns[c]
        if got.null_fraction > ref.null_fraction + null_tolerance:
            errors.append(
                ValidationError(
                    c, "null_fraction",
                    f"<= {ref.null_fraction + null_tolerance:.4f}",
                    f"{got.null_fraction:.4f}",
                )
            )
        if ref.min is not None and ref.max is not None and got.min is not None:
            span = max(ref.max - ref.min, 1e-12)
            lo = ref.min - range_tolerance * span
            hi = ref.max + range_tolerance * span
            if got.min < lo or got.max > hi:
                errors.append(
                    ValidationError(
                        c, "values_between",
                        f"[{lo:.6g}, {hi:.6g}]",
                        f"[{got.min:.6g}, {got.max:.6g}]",
                    )
                )
            if (
                got.p50 is not None
                and ref.p05 is not None
                and ref.p95 is not None
                and not (
                    ref.p05 - range_tolerance * span
                    <= got.p50
                    <= ref.p95 + range_tolerance * span
                )
            ):
                errors.append(
                    ValidationError(
                        c, "median_in_band",
                        f"[{ref.p05:.6g}, {ref.p95:.6g}] (+/- tol)",
                        f"{got.p50:.6g}",
                    )
                )
        if not allow_new_categories and ref.categories is not None:
            if got.categories is None:
                # bounded reference exploding past max_categories distinct
                # values is the STRONGEST categorical drift — an error,
                # not a skip (round-2 ADVICE, medium)
                errors.append(
                    ValidationError(
                        c, "value_set", f"subset of {ref.categories}",
                        "unbounded (> max_categories distinct)",
                    )
                )
            else:
                new = sorted(set(got.categories) - set(ref.categories))
                if new:
                    errors.append(
                        ValidationError(
                            c, "value_set", f"subset of {ref.categories}",
                            f"new: {new}",
                        )
                    )
    return ValidationReport(ok=not errors, errors=errors)


def drift_psi(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of the same
    dataset, per numeric column — the monitoring step AFTER
    :func:`validate_dataset`'s envelope checks: envelopes catch outright
    violations (a value outside the historical range), PSI catches mass
    MOVING between buckets while every individual value stays legal —
    the quiet upstream change (a new traffic mix, a prompt rollout, a
    collector bug) that reshapes a feature before any rule fires. The
    credit-scoring convention applies unchanged: PSI < 0.1 stable,
    0.1-0.25 investigate, > 0.25 shifted.

    Buckets are ``bins`` equal-width intervals over the REFERENCE
    column's [min, max] (the standard formulation — the reference frame
    defines the space, current-snapshot values outside it clamp into the
    edge buckets); both snapshots' non-null values are bucketed and
    ``psi = sum((p - q) * ln(p / q))`` over buckets with per-bucket
    fractions floored at ``eps`` so an empty bucket contributes a large
    finite term instead of infinity. NULLs are excluded from bucketing
    and reported via the count columns (validate_dataset already
    envelopes null fractions).

    Returns one row per column: ``(column, psi, n_ref, n_cur)`` with
    counts = non-null rows on each side.

    Scale shape: each snapshot is scanned ONCE regardless of how many
    columns are profiled — a map-side explode melts the row into
    (column, value) pairs (rows x |cols|, map-only), reference bounds
    (|cols| rows) broadcast back onto both sides, and the only
    exchanges are two (column, bucket) hash-aggs whose output is
    bounded by |cols| x bins. Everything after the first agg is
    dimension-sized.
    """
    if not cols:
        raise ValueError("cols must be non-empty")

    def _melt(df: DataFrame) -> DataFrame:
        pairs = F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(c).cast("double").alias("v"),
                )
                for c in cols
            ]
        )
        return (
            df.select(F.explode(pairs).alias("s"))
            .select("s.column", "s.v")
            .filter(F.col("v").isNotNull())
        )

    mref, mcur = _melt(ref), _melt(cur)
    bounds = mref.groupBy("column").agg(
        F.min("v").alias("__lo"), F.max("v").alias("__hi")
    )

    def _bucketed(m: DataFrame) -> DataFrame:
        b = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("v") - F.col("__lo"))
                        / (F.col("__hi") - F.col("__lo"))
                        * F.lit(bins)
                    ).cast("int"),
                ),
            )
        )
        return (
            m.join(F.broadcast(bounds), "column")
            .select("column", b.alias("bucket"))
            .groupBy("column", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    return _psi_from_counts(_bucketed(mref), _bucketed(mcur), eps)


def _psi_from_counts(cref: DataFrame, ccur: DataFrame, eps: float) -> DataFrame:
    """PSI tail shared by the numeric and categorical fronts: both sides
    arrive as (column, bucket, cnt) — |cols| x buckets rows, dimension-
    sized. Totals come from a WINDOW over the joined counts (not a second
    agg over cref/ccur): each melted snapshot appears exactly once in the
    DAG, so Catalyst never re-scans an input to total it."""
    joined = cref.withColumnRenamed("cnt", "cnt_ref").join(
        ccur.withColumnRenamed("cnt", "cnt_cur"), ["column", "bucket"], "full_outer"
    )
    w = Window.partitionBy("column")
    t = joined.select(
        "column",
        "bucket",
        "cnt_ref",
        "cnt_cur",
        # a column with zero non-null rows on one side: that side's
        # fraction floors to eps in every bucket (all mass "missing"),
        # instead of a NULL psi from a 0/0 division
        F.sum(F.coalesce("cnt_ref", F.lit(0))).over(w).alias("n_ref"),
        F.sum(F.coalesce("cnt_cur", F.lit(0))).over(w).alias("n_cur"),
    )

    def _frac(cnt: str, n: str):
        return F.when(F.col(n) == 0, F.lit(eps)).otherwise(
            F.greatest(F.coalesce(F.col(cnt), F.lit(0)) / F.col(n), F.lit(eps))
        )

    p, q = _frac("cnt_ref", "n_ref"), _frac("cnt_cur", "n_cur")
    return (
        t.select(
            "column",
            "n_ref",
            "n_cur",
            ((p - q) * F.log(p / q)).alias("__c"),
        )
        .groupBy("column")
        .agg(
            F.sum("__c").alias("psi"),
            F.first("n_ref").alias("n_ref"),
            F.first("n_cur").alias("n_cur"),
        )
        .select("column", "psi", "n_ref", "n_cur")
    )


def drift_psi_categorical(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    top_k: int = 50,
    eps: float = 1e-6,
) -> DataFrame:
    """:func:`drift_psi` for CATEGORICAL columns — the transcript
    monitoring case is exactly this: a fleet rollout that shifts the
    language mix or the tool/source distribution moves categorical mass
    long before any numeric envelope trips. Buckets are the REFERENCE
    side's ``top_k`` most frequent categories per column (count desc,
    category asc tie-break — deterministic); everything else, including
    categories the reference never saw, folds into ``<OTHER>``, and NULL
    is its own ``<NULL>`` category (unlike numeric PSI, a missing label
    IS a distribution change worth seeing).

    Returns the same shape as :func:`drift_psi`: ``(column, psi, n_ref,
    n_cur)``, directly unionable with it for a mixed-type drift report.

    Scale shape: one melt scan per snapshot; per-column category counts
    are one (column, value) hash-agg each; the reference's top-k table
    (<= |cols| x top_k rows) broadcasts back onto the CURRENT side's
    count relation (already aggregated — the broadcast join touches
    dimension-sized data, never the melted input); the shared PSI tail
    is window + tiny agg. The ``<OTHER>`` fold bounds state at
    |cols| x (top_k + 2) buckets no matter how many distinct values the
    live corpus develops — the property that keeps the monitor alive
    when a collector bug floods a column with unique garbage.
    """
    if not cols:
        raise ValueError("cols must be non-empty")

    def _melt(df: DataFrame) -> DataFrame:
        pairs = F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.coalesce(F.col(c).cast("string"), F.lit("<NULL>")).alias(
                        "v"
                    ),
                )
                for c in cols
            ]
        )
        return df.select(F.explode(pairs).alias("s")).select("s.column", "s.v")

    # per-column category counts: ONE hash-agg per snapshot
    cntr = _melt(ref).groupBy("column", "v").agg(F.count(F.lit(1)).alias("cnt"))
    cntc = _melt(cur).groupBy("column", "v").agg(F.count(F.lit(1)).alias("cnt"))
    wk = Window.partitionBy("column").orderBy(
        F.col("cnt").desc(), F.col("v").asc()
    )
    topk = (
        cntr.withColumn("__rk", F.row_number().over(wk))
        .filter(F.col("__rk") <= int(top_k))
        .select("column", "v")
        .withColumn("__keep", F.lit(True))
    )

    def _folded(cnt: DataFrame) -> DataFrame:
        return (
            cnt.join(F.broadcast(topk), ["column", "v"], "left")
            .select(
                "column",
                F.when(F.col("__keep"), F.col("v"))
                .otherwise(F.lit("<OTHER>"))
                .alias("bucket"),
                "cnt",
            )
            .groupBy("column", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )

    return _psi_from_counts(_folded(cntr), _folded(cntc), eps)


_CARD_UNITS = 1 << 20  # fixed: the probe names (words_p50/p90/p99) are
# 2^-20-denominated constants, so the card's unit scale is part of its
# metric CONTRACT, not a parameter


def dataset_profile(
    turns: DataFrame,
    pre_deduped: bool = False,
    top_r: int = 256,
) -> DataFrame:
    """Integer data card for a transcript corpus — ONE melted
    ``(metric, value)`` frame carrying the standard release-manifest
    numbers every corpus card publishes (counts, role mix, length
    quantiles, vocabulary health, script mix, PII density, Zipf shape),
    each bit-identical cross-engine so two snapshots diff exactly.
    :func:`drift_psi` compares FEATURE distributions between runs; this
    is the corpus-grain summary those runs are ABOUT, and the natural
    left/right input for an ingest-batch diff (profile batch A, profile
    batch B, join on metric).

    Metrics (all int64):

    - ``n_turns_raw`` / ``n_turns`` / ``n_convs`` — delivered rows,
      latest-per-key deduped turns, distinct conversations
    - ``n_words`` / ``n_chars`` — explicit-ASCII-class token count and
      codepoint count over deduped turns
    - ``turns_role_<role>`` — deduped turns per role
    - ``words_p50`` / ``words_p90`` / ``words_p99`` — exact lower
      discrete words-per-turn quantiles (the
      :func:`feast_spark.operators.aggregate.grouped_quantiles`
      contract, single global group)
    - ``ttr_units`` — global type-token ratio in 2^-20 units
    - ``script_chars_<kind>`` — codepoints per writing-script class
      (only classes with hits emit rows)
    - ``pii_<kind>_hits`` — total matches per SCRUB pattern (every
      pattern emits a row, zero included — a vanished pattern is drift)
    - ``zipf_slope_units`` — global Zipf slope (omitted when the rank
      curve is degenerate, i.e. fewer than two distinct log2 ranks)

    Plan at 10^12 turns: dedup feeds ONE global hash agg computing
    counts, chars, words, every script-class count and every PII count
    as parallel sums in the same pass (single-row result), plus one
    role-grain agg and one bounded (value)-grain agg for the quantiles
    — all map-side combined; the vocabulary metrics reuse ONE (term)
    hash agg shared by ttr and the Zipf top-R (map-side
    WindowGroupLimit). Everything melted is literal- or
    dimension-sized; nothing corpus-sized crosses a union.

    The global quantile and Zipf windows are single-partition (Spark
    warns), but their INPUT is bounded by construction: the quantile
    window sees one row per DISTINCT word count (thousands at any
    corpus size) and the Zipf window is fed <= top_r rows per map task
    by the map-side WindowGroupLimit — the same bounded-funnel argument
    as TakeOrderedAndProject.
    """
    from feast_spark.operators.aggregate import grouped_quantiles
    from feast_spark.operators.conversation import _deduped
    from feast_spark.operators.lexical import zipf_from_counts
    from feast_spark.operators.textqa import SCRIPT_CLASSES
    from feast_spark.rules import SCRUB_PATTERNS

    units = _CARD_UNITS

    spark = turns.sparkSession
    d = turns if pre_deduped else _deduped(turns)
    t = F.coalesce(F.col("text"), F.lit(""))
    toks = F.filter(
        F.split(t, "[ \t\n\x0B\f\r]+"), lambda x: F.length(x) > 0
    )

    def _row(metric: str, col) -> list:
        return [F.struct(F.lit(metric).alias("metric"), col.alias("value"))]

    # pass 1: one global agg — counts + chars + words + scripts + pii
    base_exprs = (
        _row("n_turns", F.count(F.lit(1)).cast("long"))
        + _row("n_convs", F.countDistinct("conv_id").cast("long"))
        + _row(
            "n_words",
            F.coalesce(F.sum(F.size(toks)), F.lit(0)).cast("long"),
        )
        + _row(
            "n_chars",
            F.coalesce(F.sum(F.length(t)), F.lit(0)).cast("long"),
        )
        + [
            F.struct(
                F.lit(f"script_chars_{k}").alias("metric"),
                F.sum(
                    F.length(t) - F.length(F.regexp_replace(t, pat, ""))
                ).cast("long").alias("value"),
            )
            for k, pat in SCRIPT_CLASSES
        ]
        + [
            F.struct(
                F.lit(f"pii_{k}_hits").alias("metric"),
                F.coalesce(F.sum(F.regexp_count(t, F.lit(pat))), F.lit(0))
                .cast("long").alias("value"),
            )
            for k, pat, _ in SCRUB_PATTERNS
        ]
    )
    global_rows = (
        d.agg(F.array(*base_exprs).alias("__m"))
        .select(F.explode("__m").alias("__s"))
        .select("__s.metric", "__s.value")
        # zero-hit script classes are absent by CONTRACT (mirrors
        # script_mix_stats); zero-hit PII patterns stay (drift signal)
        .filter(
            ~F.col("metric").startswith("script_chars_")
            | (F.col("value") > 0)
        )
    )
    raw_rows = turns.agg(
        F.count(F.lit(1)).cast("long").alias("value")
    ).select(F.lit("n_turns_raw").alias("metric"), "value")
    role_rows = d.groupBy("role").agg(
        F.count(F.lit(1)).cast("long").alias("value")
    ).select(
        F.concat(F.lit("turns_role_"), F.col("role")).alias("metric"),
        "value",
    )

    # pass 2: words-per-turn quantiles (bounded distinct-value grain)
    wc = d.select(
        F.lit("all").alias("__g"), F.size(toks).cast("long").alias("__wc")
    )
    qname = {524288: "words_p50", 943718: "words_p90", 1038090: "words_p99"}
    q_rows = grouped_quantiles(
        wc, ["__g"], "__wc", list(qname), units=units
    ).select(
        F.element_at(
            F.create_map(
                *[x for p, n in qname.items() for x in (F.lit(p), F.lit(n))]
            ),
            F.col("probe_units"),
        ).alias("metric"),
        F.col("q_value").alias("value"),
    )

    # pass 3: vocabulary — ttr and zipf share ONE (group, term) hash
    # agg: both branches reference the IDENTICAL aggregation subtree
    # (same literal group key), so AQE's ReuseExchange deduplicates the
    # tokenize+shuffle instead of running it once per branch
    tf = (
        d.select(F.lit("all").alias("group"), F.explode(toks).alias("term"))
        .groupBy("group", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    ttr_rows = (
        tf.agg(
            F.count(F.lit(1)).cast("long").alias("__types"),
            F.sum("tf").cast("long").alias("__toks"),
        )
        .select(
            F.lit("ttr_units").alias("metric"),
            F.expr(
                f"CAST((CAST(__types AS DECIMAL(38,0)) * {units})"
                " DIV __toks AS BIGINT)"
            ).alias("value"),
        )
        # empty corpus: zero tokens -> NULL division -> no row (matches
        # the oracle's HAVING guard)
        .filter(F.col("value").isNotNull())
    )
    zipf_rows = (
        zipf_from_counts(tf, top_r=top_r, units=units)
        .filter(F.col("slope_units").isNotNull())
        .select(
            F.lit("zipf_slope_units").alias("metric"),
            F.col("slope_units").alias("value"),
        )
    )
    return (
        raw_rows.unionByName(global_rows)
        .unionByName(role_rows)
        .unionByName(q_rows)
        .unionByName(ttr_rows)
        .unionByName(zipf_rows)
    )


def profile_drift(
    turns_a: DataFrame,
    turns_b: DataFrame,
    **profile_kwargs,
) -> DataFrame:
    """Diff two :func:`dataset_profile` data cards — the ingest-batch /
    release-to-release corpus drift report: one row per metric with
    both values, the integer delta, and a relative-change figure.
    :func:`drift_psi` compares FEATURE DISTRIBUTIONS bucket-by-bucket;
    this compares the corpus-grain manifest numbers themselves (did the
    role mix shift, did p99 turn length jump, did a PII pattern vanish,
    did the Zipf slope flatten) — the first screen a fleet operator
    reads before reaching for the distributional lenses.

    Output per metric present in EITHER card: ``(metric, value_a,
    value_b, delta, rel_units)``. A metric absent from one side keeps
    that side NULL (and NULL delta) — absence is itself the signal
    (e.g. a script class appearing for the first time). ``rel_units =
    (value_b - value_a) * 2^20 div value_a`` (the card's fixed unit
    scale) only when ``value_a > 0``
    (relative change against a negative or zero base is not
    meaningful); DECIMAL(38,0) numerator, truncation toward zero on
    both engines.

    Plan: two card plans (each bounded as documented on
    :func:`dataset_profile`) + one full-outer join on a metric
    dimension of a few dozen rows — nothing corpus-sized.
    """
    return card_drift(
        dataset_profile(turns_a, **profile_kwargs),
        dataset_profile(turns_b, **profile_kwargs),
    )


def card_drift(card_a: DataFrame, card_b: DataFrame) -> DataFrame:
    """The diff half of :func:`profile_drift` over two ALREADY-COMPUTED
    ``(metric, value)`` cards — e.g. cards persisted per ingest batch by
    the incremental pipeline, diffed long after the turns that produced
    them are gone. Same output contract as :func:`profile_drift`."""
    units = _CARD_UNITS
    a = card_a.select("metric", F.col("value").alias("value_a"))
    b = card_b.select("metric", F.col("value").alias("value_b"))
    j = a.join(b, "metric", "full_outer")
    return j.select(
        "metric",
        "value_a",
        "value_b",
        (F.col("value_b") - F.col("value_a")).cast("long").alias("delta"),
        F.when(
            F.col("value_a") > 0,
            F.expr(
                f"CAST((CAST(value_b - value_a AS DECIMAL(38,0)) * {units})"
                " DIV value_a AS BIGINT)"
            ),
        ).cast("long").alias("rel_units"),
    )
