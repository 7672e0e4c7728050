"""Corpus curation pipeline: the document-side analogue of the
transcript quality pipeline (``pipeline/quality.py``), composing the
training-data selection operators into one staged filter chain:

    1. span_dedup        — C4-style corpus-wide span dedup (a fully
                           duplicated document drops here)
    2. quality           — heuristic keep/drop on the DEDUPED text
                           (shared ``rules`` kernel — same scorer as the
                           transcript pipeline)
    3. decontamination   — drop documents overlapping the benchmark
    4. DSIR selection    — drop documents whose hashed-bigram importance
                           score (estimated over the documents that
                           survived stages 1-3) falls below the cutoff
    5. stratified sample — deterministic md5 sampling by strata

Two outputs with different cost contracts:

- ``kept`` — the production path: a pure filter chain over the corpus.
  Stage predicates are map-side (quality, contamination flag, sampling)
  or a LEFT SEMI join against an id-only table (DSIR pass set — one
  shuffle of ``(doc_id)`` longs, never a corpus x corpus row join).
- ``decisions`` — the audit table: one row per INPUT document with the
  stage that dropped it and the stage metrics. This path is allowed
  diagnostic left joins; it is what the correctness oracle checks.

Reference analogy: feast's materialization is also a staged
source->filter->transform->sink chain driven by a config object
(``batch_materialization_engine.py``); here the stages are corpus-level
selection operators instead of per-row transforms.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from feast_spark.operators.selection import (
    contamination_check,
    deterministic_sample,
    dsir_weights,
    span_dedup,
)

STAGES = ["span_dup", "quality", "lm_ppl", "contaminated", "dsir",
          "classifier", "sampled_out"]


@dataclass
class CurationConfig:
    span_words: int = 10
    contamination_n: int = 8
    # DSIR target mask: documents whose source is in this set define the
    # target distribution; the cutoff keeps docs at least this target-like
    target_sources: tuple = ("src1", "src2", "src3")
    min_dsir: int = 0
    # per-strata sampling rates on the 'source' column; sources whose
    # numeric suffix is even keep even_rate, odd keep odd_rate
    even_rate: float = 0.7
    odd_rate: float = 0.3
    # override the shared quality-rule thresholds (None = rules defaults);
    # e.g. a synthetic-vocab corpus needs allowed_langs=None and relaxed
    # stopword/perplexity gates or stage 2 drops everything
    rule_config: object | None = None
    # 'md5' = oracle-portable hashing; 'xxhash64' = the scale path (one
    # 8-byte JVM hash per gram — use it when no DuckDB oracle re-runs it)
    dsir_method: str = "md5"
    # OPT-IN stage 4b (DCLM-style model-based filtering): train the
    # hashed-bigram classifier ON the DSIR-surviving corpus (labels =
    # target_sources membership — distilling the domain signal into a
    # text model) and keep documents it scores target-like
    # (margin_units > min_margin; 0 == the classifier's own decision
    # boundary). Off by default: the oracle-checked five-stage chain is
    # unchanged unless requested.
    use_classifier: bool = False
    clf_buckets: int = 1024
    clf_iters: int = 6
    clf_method: str = "xxhash64"
    min_margin: int = 0
    # OPT-IN stage 2b (CCNet-style perplexity filtering): train the
    # stupid-backoff n-gram LM on the quality survivors whose source is
    # in target_sources, score every survivor, and drop the
    # high-perplexity tail above the corpus lm_keep_quantile. Off by
    # default — the oracle-checked default chain is unchanged.
    use_lm: bool = False
    lm_order: int = 5
    lm_method: str = "xxhash64"
    lm_keep_quantile: float = 0.7
    # Hash-bucket bound on the LM's count tables. train_ngram_lm collects
    # one row per DISTINCT gram key to the driver (lm.py builds the
    # broadcast model there); unbounded (None) that is the corpus
    # 1..order-gram vocabulary — billions of rows at corpus scale → driver
    # OOM. The pipeline therefore ALWAYS trains bucketed; 2^22 buckets ×
    # 2 tables/order × order 5 ≈ 300 MB of int64 worst case, and CCNet-
    # grade filtering tolerates the collision noise (the raw operator
    # keeps n_buckets=None available for exact small-corpus use).
    lm_buckets: int = 1 << 22
    # OPT-IN stage 0p (Dolma-style exact paragraph dedup) on the
    # INCREMENTAL/STREAMING path: rewrite each batch's documents to their
    # first-occurrence paragraphs (vs the batch itself and every
    # committed prior batch's paragraph-hash state) before span dedup.
    # Real transcript corpora dup at the paragraph/turn grain (boilerplate
    # headers, repeated tool outputs) — doc-grain near-dup misses those.
    use_paragraph_dedup: bool = False
    paragraph_sep: str = "\n\n"
    paragraph_min_chars: int = 1
    # OPT-IN stage 0 (C4-style line cleaning, operators/lines.py): rewrite
    # each document to its "good" lines before any doc-grain stage, and
    # drop documents left with fewer than line_min_kept survivors
    # ('line_clean' in the audit). Off by default — the oracle-checked
    # chain is unchanged. Defaults are curation-friendly (no terminal-
    # punctuation demand; blocklist + blank-line removal only).
    use_line_clean: bool = False
    line_min_words: int = 1
    line_blocklist: tuple = ("lorem ipsum", "javascript")
    line_require_terminal: bool = False
    line_min_kept: int = 1
    # OPT-IN stage 0b (literal-phrase blocklist gate,
    # operators/blocklist.py): ONE broadcast trie-regex pass over the
    # (possibly line-cleaned) text; documents with more than
    # blocklist_max_hits phrase-start positions drop here ('blocklist'
    # in the audit, position count carried as blocklist_hits). The
    # line_blocklist above is substring-per-LINE rewriting; this is the
    # document-grain kill switch for large enumerated phrase lists.
    use_blocklist: bool = False
    blocklist_phrases: tuple = ()
    blocklist_max_hits: int = 0
    # OPT-IN stage 1a (fuzzy doc-grain near-dup): MinHash-LSH pairs over
    # the RAW text + connected components; only each duplicate
    # component's min-id representative proceeds ('near_dup' in the
    # audit). Runs BEFORE span dedup: exact span dedup would strip the
    # shared spans from the later copy and hide the pair. The doc-grain
    # analogue of conv_curation's stage 3.
    use_neardup: bool = False
    neardup_threshold: float = 0.5
    neardup_max_bucket: int | None = 200
    # OPT-IN verify arm of stage 1a (Lee et al. 2022's confirmation
    # step): when set, LSH candidate pairs must also pass character
    # edit similarity >= this fraction (neardup_verify's integer
    # verdict) before entering connected components — shingle-set
    # matches that are order-scrambles, not clones, stop dropping
    # documents. Cost is pair-bounded (two id-keyed joins bring
    # ``neardup_verify_max_chars``-capped text to the pair relation).
    neardup_verify_threshold: float | None = None
    neardup_verify_max_chars: int | None = 2000


def _sample_rate(cfg: CurationConfig) -> Column:
    # TRY_CAST: sources without a numeric suffix (e.g. 'web', 'wiki')
    # yield NULL and fall to odd_rate — a plain cast throws under ANSI
    return F.when(
        F.expr("TRY_CAST(substring(source, 4, 10) AS INT)") % 2 == 0,
        F.lit(cfg.even_rate),
    ).otherwise(F.lit(cfg.odd_rate))


def _quality_keep(
    spark: SparkSession, deduped: DataFrame, rule_cfg=None
) -> DataFrame:
    """Score the deduped text with the SAME rules kernel the transcript
    pipeline uses (``rules.score_turns``, vectorized Arrow batches),
    carrying the curation columns through; returns
    (doc_id, source, dedup_text, n_spans_kept, quality_keep)."""
    import pandas as pd

    from feast_spark import rules

    rule_cfg = rule_cfg or rules.RuleConfig()

    def score_batches(batches):
        for pdf in batches:
            out = pdf[["doc_id", "source", "dedup_text", "n_spans_kept"]].reset_index(
                drop=True
            )
            out["quality_keep"] = rules.score_turns(pdf["dedup_text"], rule_cfg)[
                "keep"
            ]
            yield out

    return deduped.mapInPandas(
        score_batches,
        "doc_id long, source string, dedup_text string, "
        "n_spans_kept long, quality_keep boolean",
    )


@dataclass
class CurationResult:
    kept: DataFrame
    decisions: DataFrame
    config: CurationConfig = field(default_factory=CurationConfig)
    _cached: list = field(default_factory=list)

    def release(self) -> None:
        for df in self._cached:
            df.unpersist()


def run_curation(
    spark: SparkSession,
    docs: DataFrame,
    benchmark: DataFrame,
    cfg: CurationConfig | None = None,
    materialize: bool = True,
) -> CurationResult:
    """Run the five-stage curation chain over ``docs`` (``doc_id``,
    ``text``, ``source``). ``benchmark`` carries one ``bench_text`` row
    per evaluation item.

    ``materialize`` persists the scored table (the fan-out point: four
    downstream branches would otherwise re-run span dedup + scoring
    each) with an eager count() barrier — persist alone is not enough,
    because a branch whose broadcast subquery fires before the cache
    fills re-executes the whole subtree (the double-execution trap the
    transcript pipeline documents). Call ``result.release()`` after
    consuming the outputs."""
    cfg = cfg or CurationConfig()

    # ---- stage 0 (opt-in): C4 line cleaning — a pure map pass (JVM
    # higher-order lambdas, no UDF, no shuffle) that rewrites text to its
    # surviving lines; docs below line_min_kept drop here. line_flags is
    # one tiny bool row per doc for the audit.
    line_flags = None
    if cfg.use_line_clean:
        from feast_spark.operators.lines import clean_lines

        lc = clean_lines(
            docs,
            min_words=cfg.line_min_words,
            blocklist=cfg.line_blocklist,
            require_terminal=cfg.line_require_terminal,
            min_kept_lines=cfg.line_min_kept,
        )
        line_flags = lc.select("doc_id", "doc_ok", "kept_frac")
        docs_in = (
            lc.filter("doc_ok")
            .select("doc_id", F.col("text_clean").alias("text"))
            .join(docs.select("doc_id", "source"), "doc_id")
        )
    else:
        docs_in = docs

    # ---- stage 0b (opt-in): blocklist gate — broadcast trie scan
    # (map-only, no shuffle); flagged docs drop BEFORE span dedup so
    # their spans never claim first-occurrence slots from clean docs
    block_flags = None
    if cfg.use_blocklist:
        from feast_spark.operators.blocklist import blocklist_hits

        bh = blocklist_hits(
            docs_in, list(cfg.blocklist_phrases),
            id_col="doc_id", text_col="text",
        )
        block_flags = bh.select(F.col("id").alias("doc_id"), "n_hits")
        docs_in = docs_in.join(
            bh.filter(F.col("n_hits") <= cfg.blocklist_max_hits).select(
                F.col("id").alias("doc_id")
            ),
            "doc_id",
            "left_semi",
        )

    # ---- stage 1a (opt-in): fuzzy doc near-dup — LSH pairs + CC, keep
    # each component's min-id representative. The drop set is
    # pair-table-sized: localCheckpoint it eagerly, then release the LSH
    # scoped caches (the bm25/para_neardup pattern)
    nd_drop = None
    if cfg.use_neardup:
        from feast_spark.operators.dedup import (
            connected_components,
            minhash_lsh_pairs,
            release_dedup_caches,
        )

        nd_pairs = minhash_lsh_pairs(
            docs_in, "doc_id", "text",
            jaccard_threshold=cfg.neardup_threshold,
            max_bucket_size=cfg.neardup_max_bucket,
        )
        if cfg.neardup_verify_threshold is not None:
            from feast_spark.operators.dedup import neardup_verify

            # banded early-exit arm: the pipeline consumes only is_dup,
            # which is parity-pinned to the exact (oracle-checked) arm
            nd_pairs = neardup_verify(
                nd_pairs, docs_in, "doc_id", "text",
                threshold=cfg.neardup_verify_threshold,
                max_chars=cfg.neardup_verify_max_chars,
                early_exit=True,
            ).filter("is_dup")
        nd_drop = (
            connected_components(nd_pairs.select("id_a", "id_b"))
            .filter(F.col("id") != F.col("component"))
            .select(F.col("id").alias("doc_id"))
            .localCheckpoint()
        )
        release_dedup_caches()
        docs_in = docs_in.join(nd_drop, "doc_id", "left_anti")

    # ---- stage 1: corpus span dedup (keeps source via join on the
    # surviving ids — span_dedup's 2-shuffle shape, then one id join to
    # re-attach the strata column)
    deduped = span_dedup(docs_in, span_words=cfg.span_words).join(
        docs_in.select("doc_id", "source"), "doc_id"
    )

    # ---- stage 2: quality on the deduped text (map-side Arrow scoring)
    scored = _quality_keep(spark, deduped, cfg.rule_config)
    cached: list = []
    if materialize:
        scored = scored.persist()
        scored.count()  # cache-fill barrier
        cached.append(scored)
    q_pass = scored.filter(F.col("quality_keep"))

    # ---- stage 2b (opt-in): CCNet-style perplexity filter — train the
    # stupid-backoff n-gram LM on the in-domain survivors (one bounded
    # counting shuffle), score every survivor map-side (broadcast model),
    # and keep documents at or below the corpus perplexity quantile (one
    # scalar aggregate broadcast back). The pass set is an id-only LEFT
    # SEMI join, like every model stage here.
    lm_flags = None
    if cfg.use_lm:
        from feast_spark.operators.lm import lm_perplexity, train_ngram_lm

        lm_model = train_ngram_lm(
            q_pass.where(F.col("source").isin(*cfg.target_sources)),
            text_col="dedup_text",
            order=cfg.lm_order,
            method=cfg.lm_method,
            n_buckets=cfg.lm_buckets,
        )
        lm_scores = lm_perplexity(q_pass, lm_model, text_col="dedup_text")
        thr = lm_scores.agg(
            F.percentile(F.col("ppl"), F.lit(cfg.lm_keep_quantile)).alias(
                "lm_thr"
            )
        )
        lm_flags = lm_scores.crossJoin(F.broadcast(thr)).select(
            "doc_id", "ppl", "lm_thr"
        )
        if materialize:
            lm_flags = lm_flags.persist()
            lm_flags.count()
            cached.append(lm_flags)
        lm_pass_ids = lm_flags.where(
            F.col("ppl") <= F.col("lm_thr")
        ).select("doc_id")
        q_pass = q_pass.join(lm_pass_ids, "doc_id", "left_semi")

    # ---- stage 3: decontamination (benchmark grams + hit set broadcast).
    # contam fans into both the kept chain and the audit table — persist
    # it (it is one bool per q_pass doc) or both branches re-run the
    # gram-overlap join.
    contam = contamination_check(
        q_pass, benchmark, n=cfg.contamination_n, text_col="dedup_text"
    ).select("doc_id", "contaminated")
    if materialize:
        contam = contam.persist()
        contam.count()
        cached.append(contam)
    c_pass = q_pass.join(F.broadcast(contam.filter("contaminated")),
                         "doc_id", "left_anti")

    # ---- stage 4: DSIR over the cleaned corpus; the pass set is an
    # id-only table -> LEFT SEMI join (one long-key shuffle, no row join).
    # dsir is read by the kept chain AND the audit table — unpersisted,
    # the two-pass gram scan would run once per consumer.
    dsir = dsir_weights(
        c_pass,
        F.col("source").isin(*cfg.target_sources),
        text_col="dedup_text",
        method=cfg.dsir_method,
        center=True,  # 0-cutoff = "more target-like than the average gram"
    )
    if materialize:
        dsir = dsir.persist()
        dsir.count()
        cached.append(dsir)
    dsir_pass_ids = dsir.filter(F.col("dsir_score") >= cfg.min_dsir).select("doc_id")
    d_pass = c_pass.join(dsir_pass_ids, "doc_id", "left_semi")

    # ---- stage 4b (opt-in): model-based filter — train the hashed-bigram
    # classifier on the surviving corpus (feature build = 2 hash-agg
    # shuffles once; each iteration = one Arrow map pass, no shuffle) and
    # keep documents scored target-like. The pass set is again an id-only
    # LEFT SEMI join.
    clf_scores = None
    if cfg.use_classifier:
        from feast_spark.operators.classifier import (
            hashed_bigram_features,
            score_with_classifier,
            train_quality_classifier,
        )

        feats = hashed_bigram_features(
            d_pass,
            F.col("source").isin(*cfg.target_sources),
            n_buckets=cfg.clf_buckets,
            text_col="dedup_text",
            method=cfg.clf_method,
        )
        model = train_quality_classifier(
            spark, feats, n_buckets=cfg.clf_buckets, n_iter=cfg.clf_iters
        )
        cached.append(feats)  # train() persisted it; release() frees it
        clf_scores = score_with_classifier(model, feats).select(
            "doc_id", "margin_units"
        )
        if materialize:
            clf_scores = clf_scores.persist()
            clf_scores.count()
            cached.append(clf_scores)
        clf_pass_ids = clf_scores.filter(
            F.col("margin_units") > cfg.min_margin
        ).select("doc_id")
        e_pass = d_pass.join(clf_pass_ids, "doc_id", "left_semi")
    else:
        e_pass = d_pass

    # ---- stage 5: deterministic stratified sampling (map-only)
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source"))
    kept = deterministic_sample(e_pass, key, _sample_rate(cfg)).select(
        "doc_id", "source", "dedup_text", "n_spans_kept", "sample_bucket"
    )

    # ---- audit table: one row per input doc, first-failing stage wins.
    # With the classifier stage enabled the table gains a margin_units
    # column and a 'classifier' drop_stage value; the default five-stage
    # schema (what the oracle checks) is unchanged.
    audit = (
        docs.select("doc_id", "source")
        .join(scored.select("doc_id", "n_spans_kept", "quality_keep"),
              "doc_id", "left")
        .join(F.broadcast(contam.filter("contaminated")), "doc_id", "left")
        .join(dsir.select("doc_id", "dsir_score"), "doc_id", "left")
        .join(kept.select("doc_id", F.lit(True).alias("__sampled")),
              "doc_id", "left")
    )
    extra_cols = []
    stage = None

    def _chain(prev, cond, name):
        return F.when(cond, name) if prev is None else prev.when(cond, name)

    if cfg.use_line_clean:
        audit = audit.join(line_flags, "doc_id", "left")
        stage = _chain(stage, ~F.col("doc_ok"), "line_clean")
        extra_cols.append(
            F.coalesce("kept_frac", F.lit(0.0)).alias("line_kept_frac")
        )
    if cfg.use_blocklist:
        audit = audit.join(block_flags, "doc_id", "left")
        # a doc that reached stage 0b always has n_hits; NULL means
        # line_clean dropped it first, which the prior when caught
        stage = _chain(
            stage, F.col("n_hits") > cfg.blocklist_max_hits, "blocklist"
        )
        extra_cols.append(
            F.coalesce("n_hits", F.lit(0)).alias("blocklist_hits")
        )
    if cfg.use_neardup:
        audit = audit.join(
            F.broadcast(nd_drop.withColumn("__nd", F.lit(True))),
            "doc_id",
            "left",
        )
        stage = _chain(stage, F.coalesce("__nd", F.lit(False)), "near_dup")
    stage = _chain(stage, F.col("n_spans_kept").isNull(), "span_dup")
    stage = stage.when(~F.col("quality_keep"), "quality")
    if cfg.use_lm:
        audit = audit.join(lm_flags, "doc_id", "left")
        # a doc that reached stage 2b always has a ppl; NULL can only
        # mean an earlier stage dropped it, which the prior whens caught
        stage = stage.when(
            F.col("ppl").isNull() | (F.col("ppl") > F.col("lm_thr")),
            "lm_ppl",
        )
        extra_cols.append(F.coalesce("ppl", F.lit(0.0)).alias("lm_ppl"))
    stage = stage.when(F.col("contaminated"), "contaminated").when(
        F.col("dsir_score").isNull() | (F.col("dsir_score") < cfg.min_dsir),
        "dsir",
    )
    if cfg.use_classifier:
        audit = audit.join(clf_scores, "doc_id", "left")
        # a doc that reached stage 4b always has a score; NULL here can
        # only mean an earlier stage dropped it, which the prior whens
        # already caught — the <= branch is the real classifier drop
        stage = stage.when(
            F.col("margin_units").isNull()
            | (F.col("margin_units") <= cfg.min_margin),
            "classifier",
        )
        extra_cols.append(
            F.coalesce("margin_units", F.lit(0)).alias("margin_units")
        )
    stage = stage.when(~F.coalesce("__sampled", F.lit(False)), "sampled_out")
    decisions = audit.select(
        "doc_id",
        F.coalesce("n_spans_kept", F.lit(0)).alias("n_spans_kept"),
        F.coalesce("dsir_score", F.lit(0)).alias("dsir_score"),
        F.coalesce("__sampled", F.lit(False)).alias("kept"),
        *extra_cols,
        stage.alias("drop_stage"),
    )
    return CurationResult(kept=kept, decisions=decisions, config=cfg,
                          _cached=cached)


def stage_counts(decisions: DataFrame) -> DataFrame:
    """Per-stage drop counters (the curation analogue of the transcript
    pipeline's rule_hit_counters lineage field)."""
    return (
        decisions.groupBy(F.coalesce("drop_stage", F.lit("kept")).alias("stage"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("stage")
    )
