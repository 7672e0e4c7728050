"""Lexical-diversity statistics per document — the vocabulary-grain
quality signals (type/token ratio, hapax fraction, unigram entropy) that
complement the repetition family (``operators/repetition.py``): low
diversity catches template/boilerplate text that n-gram repetition rules
miss when the repeats are non-contiguous.

Per document over lowercased whitespace tokens:

- ``n_tokens``, ``n_types`` — token and distinct-token counts
- ``type_token_ratio`` — ``n_types / n_tokens``
- ``hapax_frac`` — fraction of types occurring exactly once
- ``mean_word_len`` — total token chars / ``n_tokens``
- ``unigram_entropy`` — Shannon entropy (bits) of the token frequency
  distribution.

Bit-exactness strategy (shared with the naive oracle in
``feast_spark.oracles.lexical_stats_pdf``): the ratio columns are single
IEEE divisions of exact integers. Entropy is a multi-term float sum,
whose value would depend on summation order — so each term
``-(c/n)*log2(c/n)`` (identical numpy elementwise ops on both sides) is
quantized to integer units of 2^-40 bits via ``floor(term * 2**40)``;
those integer-valued doubles sum EXACTLY in any order (total < 2^53), and
the final ``/ 2**40`` is one division. The kernel and the oracle
therefore agree bit-for-bit without agreeing on iteration order.

Implementation: one vectorized map-only kernel per Arrow batch —
factorize + lexsort run-length grouping (no per-doc python loop), zero
shuffles at any corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from feast_spark.operators.repetition import _group_runs

__all__ = [
    "lexical_stats_pdf_batch",
    "lexical_stats",
    "source_top_terms",
    "source_vocab_stats",
    "compression_stats_pdf_batch",
    "compression_stats",
    "zipf_profile",
    "zipf_from_counts",
    "frequent_terms",
    "kmv_sketch",
    "kmv_merge",
    "kmv_resketch",
    "kmv_estimate",
]

_QUANT = float(2**40)  # entropy quantization: integer units of 2^-40 bits


def lexical_stats_pdf_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized kernel: all lexical stats for a batch of texts,
    index-aligned 0..n-1 with ``texts``."""
    s = texts.fillna("").astype(str).reset_index(drop=True)
    n = len(s)
    zeros = lambda: np.zeros(n)  # noqa: E731
    out = {
        "n_tokens": np.zeros(n, dtype=np.int64),
        "n_types": np.zeros(n, dtype=np.int64),
        "type_token_ratio": zeros(),
        "hapax_frac": zeros(),
        "mean_word_len": zeros(),
        "unigram_entropy": zeros(),
    }
    toks = s.str.lower().str.findall(r"\S+")
    flat = toks.explode().dropna()
    if not len(flat):
        return pd.DataFrame(out)
    rows = flat.index.to_numpy(dtype=np.int64)
    codes, _ = pd.factorize(flat)
    tlen = flat.str.len().to_numpy(dtype=np.int64)

    n_tok = np.bincount(rows, minlength=n).astype(np.int64)
    tok_chars = np.bincount(rows, weights=tlen, minlength=n)
    order, starts = _group_runs([rows, codes.astype(np.int64)])
    cnt = np.diff(np.append(starts, len(order))).astype(np.int64)
    grp_rows = rows[order][starts]
    n_typ = np.bincount(grp_rows, minlength=n).astype(np.int64)
    n_hapax = np.bincount(grp_rows, weights=(cnt == 1), minlength=n)

    # entropy terms, quantized (see module docstring)
    p = cnt / n_tok[grp_rows]
    q = np.floor(-(p * np.log2(p)) * _QUANT)
    ent_q = np.bincount(grp_rows, weights=q, minlength=n)

    nz = n_tok > 0
    out["n_tokens"] = n_tok
    out["n_types"] = n_typ
    out["type_token_ratio"][nz] = n_typ[nz] / n_tok[nz]
    out["mean_word_len"][nz] = tok_chars[nz] / n_tok[nz]
    tz = n_typ > 0
    out["hapax_frac"][tz] = n_hapax[tz] / n_typ[tz]
    out["unigram_entropy"][nz] = ent_q[nz] / _QUANT
    return pd.DataFrame(out)


_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("n_types", LongType()),
        StructField("type_token_ratio", DoubleType()),
        StructField("hapax_frac", DoubleType()),
        StructField("mean_word_len", DoubleType()),
        StructField("unigram_entropy", DoubleType()),
    ]
)


def lexical_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Lexical-diversity stats per document — map-only ``mapInPandas``
    (zero shuffles at any scale)."""
    sel = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )

    def _run(batches):
        for pdf in batches:
            stats = lexical_stats_pdf_batch(pdf["text"])
            stats.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield stats

    return sel.mapInPandas(_run, schema=_SCHEMA)


def source_top_terms(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 10,
    quant_bits: int = 20,
) -> DataFrame:
    """Distinctive terms per group — class-based TF-IDF (the public
    BERTopic c-TF-IDF formulation): rank terms within each group by
    ``tf(term, group) * ln(1 + n_groups / df_groups(term))``, where
    ``df_groups`` counts GROUPS containing the term (a term every source
    uses scores idf ~ ln 2; a source-exclusive term gets the full boost).
    The corpus-analysis dual of :func:`feast_spark.operators.selection
    .top_ngrams`: what characterizes each slice, not what repeats.

    Ranking is on the ``2^-quant_bits`` floor-quantized score
    (``score_units``) with the term as tie-break, one fixed association
    order (tf * idf, then quantize), so a SQL oracle replays selection
    integer-exactly. Returns ``(group, term, tf, df_groups, score_units,
    rank)`` with ``rank`` 1-based per group.

    Scale shape: tokenization is map-only; ``tf`` is one
    map-side-combined hash agg on (group, term); ``df_groups`` re-aggs
    the (already unique) tf relation on term; ``n_groups`` is a driver
    scalar (sources are dimension-sized). The top-k is a per-group
    ``row_number`` Spark rewrites to ``WindowGroupLimit`` — each map task
    keeps ≤ k rows per group before the exchange, so a mega-group never
    funnels through one sort.

    Reference: feast has only numeric/categorical profiling
    (``dqm/profilers``); term profiling follows the public c-TF-IDF
    formulation.
    """
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    tf = (
        docs.select(F.col(group_col).alias("group"), toks.alias("_t"))
        .select("group", F.explode("_t").alias("term"))
        .groupBy("group", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfg = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_groups")
    )
    n_groups = docs.select(group_col).distinct().count()
    scored = tf.join(dfg, "term").select(
        "group",
        "term",
        "tf",
        "df_groups",
        F.floor(
            F.col("tf").cast("double")
            * F.log(
                F.lit(1.0)
                + F.lit(float(n_groups)) / F.col("df_groups").cast("double")
            )
            * F.lit(float(1 << quant_bits))
        ).cast("long").alias("score_units"),
    )
    win = Window.partitionBy("group").orderBy(
        F.col("score_units").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= int(k))
    )


def source_vocab_stats(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    units: int = 1 << 20,
) -> DataFrame:
    """Vocabulary health per group: type count, token count, hapax count
    and the integer type-token ratio ``ttr_units = n_types * units div
    n_tokens``. The corpus-monitoring dual of per-doc lexical_stats —
    synthetic or template-flooded slices show it first: machine-generated
    text collapses TTR (few types re-drawn endlessly) and drives the
    hapax fraction toward zero, while OCR/garbage slices inflate both.
    Tracking (ttr_units, n_hapax/n_types) per source per ingest batch is
    the cheapest drift alarm the vocabulary itself can raise (Heaps'-law
    lens; cf. the Gopher/C4 corpus analyses).

    One row per group: ``(group, n_docs, n_tokens, n_types, n_hapax,
    ttr_units)``; groups whose docs are all blank carry zero counts and
    NULL ttr_units. Tokens are non-empty EXPLICIT-ASCII-whitespace
    splits (``[ \\t\\n\\x0B\\f\\r]+`` — Java ``\\s`` includes vertical
    tab, RE2's does not, so the class is spelled out on both engines;
    the conv_pack-oracle lesson) with NO case fold (Java vs Unicode
    casefold divergence — turn_dedup's normalization notes).

    Scale shape: tokenization is map-only; (group, term) counts are one
    map-side-combined hash agg; the group rollup re-aggs that (already
    unique) relation; doc counts ride a dimension-sized second agg
    joined at the end (groups are dimension-sized — broadcast). The
    (group, term) exchange carries each DISTINCT term once per group,
    not the token stream; at 10^12 turns swap the term string for
    xxhash64(term) upstream of the exchange (8 B/term, collisions
    ~n²/2^64 — negligible for type COUNTS) exactly as span_dedup's hash
    arm does; string form kept here because the oracle compares real
    vocabularies.

    Reference: feast profiles numeric/categorical columns only
    (``dqm/profilers``); vocabulary profiling is a public-corpus-analysis
    operator.
    """
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), "[ \t\n\x0B\f\r]+"),
        lambda x: F.length(x) > 0,
    )
    tf = (
        docs.select(F.col(group_col).alias("group"), toks.alias("_t"))
        .select("group", F.explode("_t").alias("term"))
        .groupBy("group", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("_tf"))
    )
    vocab = tf.groupBy("group").agg(
        F.sum("_tf").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("_tf") == 1).cast("long")).alias("n_hapax"),
    )
    n_docs = docs.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return (
        n_docs.join(F.broadcast(vocab), "group", "left")
        .select(
            "group",
            "n_docs",
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("n_types", F.lit(0).cast("long")).alias("n_types"),
            F.coalesce("n_hapax", F.lit(0).cast("long")).alias("n_hapax"),
            F.expr(f"(n_types * cast({units} as bigint)) div n_tokens")
            .alias("ttr_units"),
        )
    )


def compression_stats_pdf_batch(
    texts: pd.Series, level: int = 6, units: int = 1 << 20
) -> pd.DataFrame:
    """Per-text zlib compressibility over one Arrow batch. The oracle
    (``oracles.compressibility_pdf``) deliberately does NOT share this
    kernel — it is an independent plain-python loop; the single zlib C
    library in this environment is the only common dependency, so
    compressed lengths agree while the surrounding arithmetic is
    re-derived on both sides."""
    import zlib

    raw = [t.encode("utf-8") for t in texts.fillna("")]
    raw_len = np.array([len(b) for b in raw], dtype=np.int64)
    comp_len = np.array(
        [len(zlib.compress(b, level)) for b in raw], dtype=np.int64
    )
    # pure int64 arithmetic; divisor clamped, no float path
    ratio = (comp_len * units) // np.maximum(raw_len, 1)
    return pd.DataFrame(
        {
            "raw_len": raw_len,
            "comp_len": comp_len,
            "ratio_units": np.where(raw_len > 0, ratio, -1),
        }
    )


_COMPRESSION_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("raw_len", LongType()),
        StructField("comp_len", LongType()),
        StructField("ratio_units", LongType()),
    ]
)


def compression_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
    units: int = 1 << 20,
) -> DataFrame:
    """zlib compressibility per document: ``ratio_units = comp_len *
    units div max(raw_len, 1)`` over the UTF-8 bytes (``-1`` sentinel for
    empty/NULL text so the column stays integer through the driver
    round-trip). The Dolma/DCLM-style compression filter: highly
    compressible text (ratio well under ~0.3) is repeated boilerplate or
    template spam that n-gram repetition rules undercount, and
    INcompressible "text" (ratio near 1.0) is binary/garbage/encrypted
    payload that character-class heuristics pass. One number catches
    both tails.

    Scale shape: map-only ``mapInPandas`` — zero shuffles at any corpus
    size; the zlib pass is C-speed per Arrow batch and the operator
    never widens the row (stats only, text is not re-emitted). Level 6
    is the zlib default; the verdict is level-dependent, so pin it
    per-corpus-release. Determinism: the oracle replay
    (``oracles.compressibility_pdf``) re-derives everything in an
    independent plain-python loop; only zlib itself (one C build in
    this environment) is shared, so compressed lengths — and nothing
    else — are common by construction.

    Reference: feast profiles numeric/categorical columns only; the
    compression lens is a public pretraining-curation heuristic (Dolma,
    DCLM, RefinedWeb ancestry).
    """
    sel = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )

    def _run(batches):
        for pdf in batches:
            stats = compression_stats_pdf_batch(pdf["text"], level, units)
            stats.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield stats

    return sel.mapInPandas(_run, schema=_COMPRESSION_SCHEMA)


def readability_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    units: int = 1 << 20,
) -> DataFrame:
    """Flesch-Kincaid-style readability per document, integer-quantized
    — the classic web-filter lens orthogonal to stop-word/perplexity
    gates (C4-era corpora filtered on it; extreme grade levels on BOTH
    tails mark boilerplate/listicle text and run-on machine output).

    Syllables use the standard deterministic approximation: the number
    of ``[aeiouy]+`` vowel groups in the lowercased text ("syllable
    nuclei"; hyphenation dictionaries are neither portable nor needed
    for a relative filter). Sentences count ``[.!?]+`` terminator
    GROUPS ("Stop!!" is one sentence), clamped to >= 1; words are
    non-empty ASCII-whitespace splits.

    One row per doc with at least one word: ``(doc_id, n_words,
    n_sentences, n_syllables, fk_units)`` where ``fk_units =
    floor((0.39*(w/s) + 11.8*(syl/w) - 15.59) * units)`` — the FK
    grade-level formula with its published constants, evaluated in ONE
    fixed float op order (two divisions, two multiplies, two adds, one
    final multiply) so DuckDB reproduces the exact double, then floored
    to an exact integer (the cross-engine float discipline used by
    ``source_top_terms``).

    Scale shape: map-only — three ``regexp_count``/split expressions
    per row, no exchange, no Python. Scan-bound at any corpus size.

    Reference: feast has no text-quality surface; public formula
    (Kincaid et al. 1975) and public filter practice.
    """
    from feast_spark.operators.conversation import _ASCII_WS

    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.size(
        F.filter(F.split(t, _ASCII_WS), lambda x: F.length(x) > 0)
    ).cast("long")
    sents = F.greatest(
        F.regexp_count(t, F.lit("[.!?]+")).cast("long"), F.lit(1).cast("long")
    )
    syls = F.regexp_count(F.lower(t), F.lit("[aeiouy]+")).cast("long")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        words.alias("n_words"),
        sents.alias("n_sentences"),
        syls.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    u = float(int(units))
    return d.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(
            "CAST(FLOOR((0.39D * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))"
            " + 11.8D * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))"
            f" - 15.59D) * {u!r}D) AS BIGINT)"
        ).alias("fk_units"),
    )


def zipf_profile(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_r: int = 256,
    units: int = 1 << 20,
) -> DataFrame:
    """Zipf rank-frequency slope per group — the third vocabulary-health
    lens alongside :func:`source_vocab_stats` (type/token/hapax mass)
    and :func:`source_top_terms` (which terms): natural prose follows
    ``freq ~ rank^-s`` with s near 1 (Zipf's law); template/synthetic
    floods FLATTEN the head (a few canned terms at near-equal high
    counts drive s toward 0 only after the flood dominates, but the
    planted-head deviation moves first), while concatenated-garbage
    slices steepen it. The slope of the top-``top_r`` rank curve per
    source per ingest batch is a one-number corpus-shape alarm the
    count aggregates alone cannot raise.

    Integer-exact contract: both axes are EXACT integer log2 via
    ``length(bin(x)) - 1`` (the minimal-binary-string trick
    tool_latency_histogram established — no float ``ln`` whose last ulp
    differs between Java's Math.log and libm). The ordinary
    least-squares slope of ``ly`` on ``lx`` over the top-R points then
    has integer numerator/denominator::

        num = R * sum(lx*ly) - sum(lx) * sum(ly)
        den = R * sum(lx^2)  - sum(lx)^2

    Both are emitted exactly, plus ``slope_units = num * units DIV
    den`` — Spark ``div`` and DuckDB ``//`` BOTH truncate toward zero
    (verified ``-7 div 2 = -3`` on each), so the signed quantized slope
    is bit-identical cross-engine. Healthy prose lands near ``-units``;
    the log2 bucketing costs under a bit of resolution per decade,
    irrelevant for a drift alarm. ``den = 0`` (a group with one ranked
    term) yields NULL ``slope_units``.

    One row per group: ``(group, n_terms, top_term, top_tf, slope_num,
    slope_den, slope_units)``; ``n_terms = min(top_r, vocabulary)``.

    Scale shape (10^12 turns): tokenization map-only; (group, term)
    counts one map-side-combined hash agg; the per-group top-R
    ``row_number`` rewrites to ``WindowGroupLimit`` (each map task keeps
    <= top_r rows per group BEFORE the exchange — a mega-source never
    funnels its whole vocabulary through one sort); everything after is
    a top_r-bounded per-group agg. Bound ints: lx, ly <= 63, R <= top_r,
    so every OLS sum fits int64 with > 20 bits to spare.

    Tokens are explicit-ASCII-class splits, no case fold (the
    source_vocab_stats cross-engine contract). Reference: feast has no
    corpus-shape profiling; Zipf-curve monitoring follows the public
    corpus-statistics literature (Zipf 1949; Gopher/C4 corpus analyses).
    """
    from pyspark.sql import Window

    if top_r < 1:
        raise ValueError(f"top_r must be >= 1, got {top_r}")
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), "[ \t\n\x0B\f\r]+"),
        lambda x: F.length(x) > 0,
    )
    tf = (
        docs.select(F.col(group_col).alias("group"), toks.alias("_t"))
        .select("group", F.explode("_t").alias("term"))
        .groupBy("group", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return zipf_from_counts(tf, top_r=top_r, units=units)


def zipf_from_counts(
    tf: DataFrame,
    top_r: int = 256,
    units: int = 1 << 20,
) -> DataFrame:
    """The rank/log2/OLS half of :func:`zipf_profile` over an existing
    ``(group, term, tf)`` count relation — so a caller that already
    holds the vocabulary aggregation (e.g. ``dataset_profile``, which
    shares one (group, term) agg between TTR and the slope) does not
    tokenize and shuffle the corpus a second time. Contract and plan
    shape are exactly :func:`zipf_profile`'s from the counts onward."""
    from pyspark.sql import Window

    if top_r < 1:
        raise ValueError(f"top_r must be >= 1, got {top_r}")
    win = Window.partitionBy("group").orderBy(F.col("tf").desc(), F.col("term"))
    ranked = (
        tf.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= int(top_r))
        .select(
            "group",
            "term",
            "tf",
            "rank",
            (F.length(F.bin("rank")) - 1).cast("long").alias("__lx"),
            (F.length(F.bin("tf")) - 1).cast("long").alias("__ly"),
        )
    )
    agg = ranked.groupBy("group").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.min(F.when(F.col("rank") == 1, F.col("term"))).alias("top_term"),
        F.max(F.when(F.col("rank") == 1, F.col("tf"))).alias("top_tf"),
        F.sum("__lx").alias("__sx"),
        F.sum("__ly").alias("__sy"),
        F.sum(F.col("__lx") * F.col("__ly")).alias("__sxy"),
        F.sum(F.col("__lx") * F.col("__lx")).alias("__sxx"),
    )
    num = (F.col("n_terms") * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
    den = (F.col("n_terms") * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
    nd = agg.select(
        "group",
        "n_terms",
        "top_term",
        "top_tf",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
    )
    return nd.withColumn(
        "slope_units",
        F.when(
            F.col("slope_den") != 0,
            F.expr(f"(slope_num * CAST({units} AS BIGINT)) div slope_den"),
        ).cast("long"),
    )


def frequent_terms(
    docs: DataFrame,
    k: int = 1024,
    text_col: str = "text",
    units: int = 1 << 20,
) -> DataFrame:
    """All terms whose EXACT corpus count exceeds ``n_tokens / k``, with
    exact counts — the threshold form of heavy hitters, and the
    scale-sound dual of :func:`feast_spark.operators.selection
    .top_ngrams` (which hash-aggregates the FULL gram table: correct,
    but its exchange carries the whole vocabulary; a 10^12-turn corpus
    with adversarial unique garbage makes that vocabulary corpus-sized).

    Two passes, sketch-then-verify:

    1. **Candidates** — one Arrow ``mapInPandas`` pass runs a
       Misra-Gries summary of capacity ``k`` per partition (merged
       batch-at-a-time by the mergeable-summaries rule: add the batch's
       exact counts, then subtract the (k+1)-th largest counter from
       all and drop non-positives — Agarwal et al., PODS 2012). The
       classical guarantee survives the merge: any term with partition
       count > (partition tokens)/(k+1) is in that partition's summary,
       so by averaging any term with GLOBAL count > n/k is in the union
       — the candidate set is a provable superset of every qualifying
       term. Output is <= k rows per partition (+1 token-count row), so
       the driver collect is model-sized and bounded by construction.
    2. **Verify** — tokens explode map-side, a BROADCAST semi join
       against the candidate set drops every non-candidate occurrence
       BEFORE the exchange, and a map-side-combined hash agg counts the
       survivors exactly; the strict threshold ``cnt * k > n_tokens``
       runs in DECIMAL(38,0) (int64 wraps past cnt ~ 2^43 * k).

    The OUTPUT is therefore exact and deterministic even though the
    sketch is not: whatever extra near-heavy candidates a particular
    partitioning lets survive pass 1, pass 2 counts them exactly and
    the threshold filter keeps only true qualifiers — so the result is
    independent of partitioning, batch sizes, and dict iteration order,
    and a DuckDB oracle can replay it as plain GROUP BY ... HAVING
    (GENUINE SQL; the sketch is pure mechanism, invisible in the
    contract).

    One row per qualifying term: ``(term, cnt, n_tokens, ratio_units)``
    with ``ratio_units = cnt * units div n_tokens``. Tokens are
    explicit-ASCII-class splits, no case fold (the source_vocab_stats
    contract). Ties AT the threshold (cnt * k == n_tokens) are
    excluded — the inequality is strict on both engines.

    Reference: feast's categorical profiling is exact global top-N
    (``dqm/profilers``-shaped); the sketch-verify composition follows
    the public heavy-hitters literature (Misra-Gries 1982; Agarwal et
    al. 2012 mergeable summaries).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    kk = int(k)

    def mg_pass(batches):
        state = pd.Series(dtype="int64")
        n_tok = 0
        for pdf in batches:
            flat = (
                pdf[text_col]
                .fillna("")
                .str.split(r"[ \t\n\x0b\f\r]+", regex=True)
                .explode()
            )
            flat = flat[flat.notna() & (flat != "")]
            n_tok += len(flat)
            if len(flat) == 0:
                continue
            state = state.add(flat.value_counts(), fill_value=0).astype(
                "int64"
            )
            if len(state) > kk:
                # mergeable-summaries decrement: subtract the (k+1)-th
                # largest value, drop non-positives -> <= k survivors
                kth = np.partition(state.to_numpy(), -(kk + 1))[-(kk + 1)]
                state = state - int(kth)
                state = state[state > 0]
        yield pd.DataFrame(
            {
                "term": list(state.index) + [None],
                "n": [0] * len(state) + [n_tok],
            }
        )

    summary = docs.select(text_col).mapInPandas(
        mg_pass, "term string, n long"
    ).collect()
    n_tokens = sum(r["n"] for r in summary if r["term"] is None)
    cand = sorted({r["term"] for r in summary if r["term"] is not None})
    spark = docs.sparkSession
    if not cand or n_tokens == 0:
        return spark.createDataFrame(
            [],
            "term string, cnt long, n_tokens long, ratio_units long",
        )
    cand_df = spark.createDataFrame([(t,) for t in cand], "term string")
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), "[ \t\n\x0B\f\r]+"),
        lambda x: F.length(x) > 0,
    )
    exploded = docs.select(F.explode(toks).alias("term"))
    counted = (
        exploded.join(F.broadcast(cand_df), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        counted.filter(
            F.expr(f"CAST(cnt AS DECIMAL(38,0)) * {kk}")
            > F.lit(int(n_tokens)).cast("decimal(38,0)")
        )
        .select(
            "term",
            "cnt",
            F.lit(int(n_tokens)).cast("long").alias("n_tokens"),
            F.expr(
                f"CAST((CAST(cnt AS DECIMAL(38,0)) * {units})"
                f" DIV {int(n_tokens)} AS BIGINT)"
            ).alias("ratio_units"),
        )
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 1024,
) -> DataFrame:
    """K-minimum-values distinct-count sketch per group (Bar-Yossef et
    al. 2002 — the cardinality member of this module's
    sketch-then-verify family, next to :func:`frequent_terms`'
    Misra-Gries): the ``k`` smallest DISTINCT md5-48 hashes of
    ``value_col`` per group. Returns ``(group..., kmv_hash)`` — at most
    ``k`` rows per group, NULL values excluded.

    Why a sketch when ``groupBy(value).count()`` is already
    distributed: the sketch is a bounded, MERGEABLE summary —
    ``sketch(A ∪ B) == resketch(sketch(A) ∪ sketch(B))``
    (:func:`kmv_merge`; the k smallest of a union are a subset of the
    two k-smallest sets) — so committed batches keep a ``k``-row-per-
    group state relation and incremental ingest never re-reads the
    corpus to re-count vocabulary (the ``minhash_dedup_incremental``
    state argument at the cardinality grain). The hash is the portable
    md5-48 (deterministic: the estimate is bit-reproducible and the
    DuckDB oracle is GENUINE SQL); swap ``xxhash64 & (2^48-1)`` at
    10^12 rows exactly as span_dedup's hash arm.

    Plan: ONE (group, hash)-keyed map-side-combined distinct agg, then
    the rank-<=k window prunes MAP-SIDE via WindowGroupLimit before its
    group-keyed exchange — per-task state is k rows/group, the
    zipf_profile top-R funnel argument.
    """
    if k < 16:
        raise ValueError(f"k must be >= 16: {k}")
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 12), 16, 10
    ).cast("long")
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, h.alias("kmv_hash")
    )
    # dedup + rank<=k prune shared with merge/resketch — one place to
    # hold the WindowGroupLimit shape
    return kmv_resketch(hashed, group_cols, k)


def kmv_resketch(
    sketches: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """Re-sketch a union of KMV sketch relations (same ``k``): dedup
    hashes, keep the k smallest per group — exactly a sketch of the
    concatenated original inputs (the k smallest of a union are a
    subset of the per-part k-smallest sets). Input is sketch-sized
    (<= parts x k rows/group), so every stage is too."""
    from pyspark.sql import Window

    u = sketches.groupBy(*group_cols, "kmv_hash").agg(
        F.count(F.lit(1)).alias("__c")
    ).drop("__c")
    w = Window.partitionBy(*group_cols).orderBy("kmv_hash")
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """Merge two KMV sketches (same ``k``) — :func:`kmv_resketch` of
    their union."""
    return kmv_resketch(a.unionByName(b), group_cols, k)


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: per group,
    ``n_sketch`` (rows), ``max_hash`` (the k-th minimum when the sketch
    is full), and ``est_distinct`` — EXACT ``n_sketch`` when the group
    holds fewer than ``k`` distinct values (the sketch saw everything),
    else the unbiased ``(k-1) * 2^48 div max_hash`` (integer, so the
    estimate is bit-reproducible cross-engine). One sketch-sized hash
    agg; nothing driver-side."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_sketch"),
        F.max("kmv_hash").cast("long").alias("max_hash"),
    )
    full = F.col("n_sketch") >= k
    return agg.select(
        *group_cols,
        "n_sketch",
        "max_hash",
        F.when(
            full,
            F.expr(
                f"(CAST({int(k) - 1} AS DECIMAL(38,0)) * {1 << 48})"
                " div max_hash"
            ).cast("long"),
        )
        .otherwise(F.col("n_sketch"))
        .alias("est_distinct"),
    )
