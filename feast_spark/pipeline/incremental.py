"""Incremental curation: process a GROWING corpus batch-by-batch with
append-only dedup state and frozen calibration artifacts.

This is feast's ``materialize_incremental`` shape
(``feature_store.py:2546``, ``feature_view.py:795-804`` — process only
the new interval, resume from registry checkpoints) applied to corpus
curation: the "interval" is a batch of new documents (monotonic ids —
the snapshot-ingest case), the "checkpoint" is a state directory of

- ``spans/batch=<id>/``  — append-only xxhash64 span hashes, one
  disjoint partition per committed batch (``_SUCCESS``-marked, so a
  crashed batch is invisible and a re-run is idempotent);
- ``dsir/``              — the FROZEN DSIR bucket table
  (:func:`~feast_spark.operators.selection.dsir_bucket_table`), built
  once from the first batch's cleaned survivors and reused verbatim so
  scores stay comparable across batches (the production contract:
  calibration is versioned, not drifting per batch);
- ``lm_model.npz`` / ``lm_thr.json`` / ``clf_model.npz`` — the opt-in
  frozen models (stage 2b perplexity LM + its frozen keep threshold,
  stage 4b classifier weights), trained on the first batch's survivors
  and loaded verbatim by every later batch;
- ``runs/``              — one lineage row per committed batch
  (batch id, per-stage counts, wall, timestamp) — the registry-style
  audit trail the north rule requires.

Stage semantics per batch: span dedup against ALL prior spans
(:func:`span_dedup_incremental` — exact equivalence with a single full
run when batch order follows id order, pinned in
``tests/test_incremental.py``), then the map-side stages exactly as
:func:`~feast_spark.pipeline.curation.run_curation` runs them (quality
rules, decontamination against the fixed benchmark, deterministic
sampling are all per-doc/per-batch deterministic — no cross-batch state
needed), with DSIR scored against the frozen table.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feast_spark.operators.selection import (
    contamination_check,
    deterministic_sample,
    dsir_bucket_table,
    dsir_score_with_table,
    span_dedup_incremental,
)
from feast_spark.pipeline.curation import (
    CurationConfig,
    _quality_keep,
    _sample_rate,
)


@dataclass
class IncrementalResult:
    batch_id: str
    kept: DataFrame
    stage_counts: dict
    resumed: bool = False
    _cached: list = field(default_factory=list)

    def release(self) -> None:
        for df in self._cached:
            df.unpersist()


def _spans_dir(state_dir: str) -> str:
    return os.path.join(state_dir, "spans")


def _paras_dir(state_dir: str) -> str:
    return os.path.join(state_dir, "paras")


def _minhash_dir(state_dir: str) -> str:
    return os.path.join(state_dir, "minhash")


# signature parameters baked into committed MinHash state. Recorded as a
# sidecar at first commit and ASSERTED on every later batch: signatures
# under different (num_hashes, bands, shingle_k, seed) are silently
# incomparable (zip_with over different-length arrays yields NULL
# estimates -> every cross-batch match vanishes without an error), so a
# parameter drift must fail fast instead.
_MH_PARAMS = {"num_hashes": 32, "bands": 8, "shingle_k": 5, "seed": 42}


def _load_prior_minhash(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """MinHash signature state (id, sig) of every COMMITTED batch — the
    same commit-order contract as :func:`_load_prior_paras`: signature
    partitions are written before the spans ``_SUCCESS`` gate, so a
    listed batch always has its partition when the stage was enabled."""
    paths = [
        p
        for b in _committed_batches(state_dir)
        if os.path.exists(
            p := os.path.join(_minhash_dir(state_dir), f"batch={b}")
        )
    ]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def _load_prior_paras(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Paragraph-hash state of every COMMITTED batch. Commit order makes
    the spans partition's ``_SUCCESS`` the single commit point: paras are
    written first, so a batch listed by :func:`_committed_batches` always
    has its paras partition when the stage was enabled (a batch run with
    the stage disabled simply has none — skipped here)."""
    paths = [
        p
        for b in _committed_batches(state_dir)
        if os.path.exists(
            p := os.path.join(_paras_dir(state_dir), f"batch={b}")
        )
    ]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def _committed_batches(state_dir: str) -> list[str]:
    root = _spans_dir(state_dir)
    if not os.path.isdir(root):
        return []
    return sorted(
        d.split("=", 1)[1]
        for d in os.listdir(root)
        if d.startswith("batch=")
        and os.path.exists(os.path.join(root, d, "_SUCCESS"))
    )


def _load_prior_spans(spark: SparkSession, state_dir: str) -> DataFrame | None:
    batches = _committed_batches(state_dir)
    if not batches:
        return None
    paths = [
        os.path.join(_spans_dir(state_dir), f"batch={b}") for b in batches
    ]
    return spark.read.parquet(*paths)


def run_curation_incremental(
    spark: SparkSession,
    new_docs: DataFrame,
    benchmark: DataFrame,
    state_dir: str,
    batch_id: str,
    cfg: CurationConfig | None = None,
) -> IncrementalResult:
    """Curate one batch of new documents against the accumulated state.

    Idempotent: a batch whose span partition already carries a
    ``_SUCCESS`` marker is NOT reprocessed — the lineage row is looked
    up and the committed ``kept`` output is re-read (crash-after-commit
    resume; crash-before-commit leaves no marker, so the re-run starts
    clean). The ``kept`` table is persisted under
    ``{state_dir}/kept/batch=<id>/`` at commit.
    """
    cfg = cfg or CurationConfig()
    kept_dir = os.path.join(state_dir, "kept", f"batch={batch_id}")
    if batch_id in _committed_batches(state_dir):
        with open(
            os.path.join(state_dir, "runs", f"{batch_id}.json")
        ) as f:
            lineage = json.load(f)
        return IncrementalResult(
            batch_id=batch_id,
            kept=spark.read.parquet(kept_dir),
            stage_counts=lineage["stage_counts"],
            resumed=True,
        )

    t0 = time.time()
    os.makedirs(state_dir, exist_ok=True)
    extra_cached: list = []
    deferred_artifacts: list = []  # frozen-model writes, run at commit
    prior = _load_prior_spans(spark, state_dir)

    # stage 0p (opt-in): paragraph dedup vs self + all committed prior
    # batches' paragraph-hash state — the turn/paragraph-grain pass doc
    # near-dup can't make (Dolma's motivation). Runs BEFORE span dedup on
    # the raw text; its append-only state commits alongside the span
    # state under the same _SUCCESS gate, so the streaming composition
    # (curate_stream) is exactly-once for BOTH grains.
    new_paras = None
    n_after_paragraph = None
    if cfg.use_paragraph_dedup:
        from feast_spark.operators.selection import (
            paragraph_dedup_incremental,
        )

        prior_paras = _load_prior_paras(spark, state_dir)
        p_out, new_paras, p_winners = paragraph_dedup_incremental(
            new_docs,
            prior_paras,
            sep=cfg.paragraph_sep,
            min_chars=cfg.paragraph_min_chars,
            persist_winners=True,
        )
        extra_cached.append(p_winners)
        # docs whose every paragraph was already seen drop here entirely
        docs_in = p_out.select(
            "doc_id", F.col("dedup_text").alias("text")
        )
        n_after_paragraph = docs_in.count()
    else:
        docs_in = new_docs

    # stage 1f (opt-in, shares the batch path's cfg.use_neardup knobs):
    # fuzzy doc near-dup vs self + ALL committed batches' signature
    # state — the tolerant grain the exact span/paragraph states can't
    # cover (a crawl re-snapshot with small edits). Runs BEFORE span
    # dedup for the batch path's reason: span dedup would strip the
    # shared spans from the later copy and hide the near-pair. Both
    # outputs are materialized eagerly (localCheckpoint) so the
    # operator's scoped signature cache can be released here.
    new_mh = None
    n_after_neardup = None
    if cfg.use_neardup:
        from feast_spark.operators.dedup import (
            minhash_dedup_incremental,
            release_dedup_caches,
        )

        mh_params_path = os.path.join(state_dir, "minhash_params.json")
        if os.path.exists(mh_params_path):
            with open(mh_params_path) as f:
                on_disk = json.load(f)
            if on_disk != _MH_PARAMS:
                raise ValueError(
                    "committed MinHash state was built with different "
                    f"signature parameters ({on_disk} != {_MH_PARAMS}); "
                    "rebuild the state or restore the parameters"
                )
        else:
            deferred_artifacts.append(
                lambda p=mh_params_path: json.dump(
                    _MH_PARAMS, open(p, "w")
                )
            )
        prior_mh = _load_prior_minhash(spark, state_dir)
        kept_nd, new_mh = minhash_dedup_incremental(
            docs_in,
            prior_mh,
            jaccard_threshold=cfg.neardup_threshold,
            max_bucket_size=cfg.neardup_max_bucket,
            **_MH_PARAMS,
        )
        new_mh = new_mh.localCheckpoint()
        nd_kept_ids = kept_nd.select("doc_id").localCheckpoint()
        release_dedup_caches()
        docs_in = docs_in.join(nd_kept_ids, "doc_id", "left_semi")
        n_after_neardup = nd_kept_ids.count()

    # stage 1: span dedup vs self + all prior batches. persist_winners
    # caches the first-occurrence window (the batch's widest shuffle) so
    # the new-span state write at commit reuses it instead of re-running
    deduped, new_spans, winners = span_dedup_incremental(
        docs_in, prior, span_words=cfg.span_words, persist_winners=True
    )
    extra_cached.append(winners)
    deduped = deduped.join(new_docs.select("doc_id", "source"), "doc_id")

    # stage 2: quality (map-side Arrow scoring, shared rules kernel)
    scored = _quality_keep(spark, deduped, cfg.rule_config).persist()
    n_after_span = scored.count()  # cache-fill barrier (fan-out point)
    q_pass_rules = scored.filter(F.col("quality_keep"))
    q_pass = q_pass_rules

    lm_pass_ids = None
    clf_pass_ids = None

    # stage 2b (opt-in): perplexity filter against a FROZEN LM — trained
    # on the FIRST batch's in-domain survivors with the keep threshold
    # (the corpus quantile) frozen alongside it, so later batches face
    # the SAME bar instead of a per-batch drifting quantile
    if cfg.use_lm:
        from feast_spark.operators.lm import (
            lm_perplexity,
            load_ngram_lm,
            save_ngram_lm,
            train_ngram_lm,
        )

        lm_path = os.path.join(state_dir, "lm_model.npz")
        thr_path = os.path.join(state_dir, "lm_thr.json")
        if not os.path.exists(thr_path):
            lm_model = train_ngram_lm(
                q_pass.where(F.col("source").isin(*cfg.target_sources)),
                text_col="dedup_text",
                order=cfg.lm_order,
                method=cfg.lm_method,
                n_buckets=cfg.lm_buckets,
            )
        else:
            lm_model = load_ngram_lm(lm_path)
        # ONE scoring pass per batch: persisted, so the threshold
        # percentile (first batch), the pass-id filter, and the lineage
        # agg all read the cache
        lm_scores = (
            lm_perplexity(q_pass, lm_model, text_col="dedup_text")
            .select("doc_id", "ppl")
            .persist()
        )
        extra_cached.append(lm_scores)
        if not os.path.exists(thr_path):
            thr = lm_scores.agg(
                F.percentile(F.col("ppl"), F.lit(cfg.lm_keep_quantile))
            ).collect()[0][0]
            # persisted at COMMIT time (below), not here — a crashed
            # batch must leave no calibration state behind
            deferred_artifacts.append(
                lambda m=lm_model, t=thr: (
                    save_ngram_lm(m, lm_path),
                    json.dump({"lm_thr": t}, open(thr_path, "w")),
                )
            )
        else:
            with open(thr_path) as f:
                thr = json.load(f)["lm_thr"]
        lm_pass_ids = lm_scores.where(F.col("ppl") <= F.lit(thr)).select(
            "doc_id"
        )
        q_pass = q_pass.join(lm_pass_ids, "doc_id", "left_semi")

    # stage 3: decontamination against the fixed benchmark. Persisted
    # with a fill barrier (the run_curation lesson): the gram-overlap
    # join fans into the kept chain, the dsir table/score subtrees, and
    # the lineage agg — unpersisted it would re-run per consumer
    contam = contamination_check(
        q_pass, benchmark, n=cfg.contamination_n, text_col="dedup_text"
    ).select("doc_id", "contaminated").persist()
    contam.count()
    extra_cached.append(contam)
    c_pass = q_pass.join(
        F.broadcast(contam.filter("contaminated")), "doc_id", "left_anti"
    )

    # stage 4: DSIR against the FROZEN bucket table — built once, from
    # the first batch's cleaned survivors, then reused verbatim
    dsir_dir = os.path.join(state_dir, "dsir")
    if not os.path.exists(os.path.join(dsir_dir, "_SUCCESS")):
        # build into a batch-scoped staging dir; promoted to ``dsir/``
        # only at commit (rename onto a missing target = free CAS) so a
        # crashed first batch freezes nothing. Scoring below reads the
        # staged parquet, so batch 1 scores against the EXACT artifact
        # later batches will read.
        stage_dir = os.path.join(state_dir, f"dsir.tmp-{batch_id}")
        dsir_bucket_table(
            c_pass,
            F.col("source").isin(*cfg.target_sources),
            text_col="dedup_text",
            method=cfg.dsir_method,
            center=True,
        ).coalesce(1).write.mode("overwrite").parquet(stage_dir)
        table = spark.read.parquet(stage_dir)
        deferred_artifacts.append(
            lambda s=stage_dir, d=dsir_dir: os.path.exists(d) or os.rename(s, d)
        )
    else:
        table = spark.read.parquet(dsir_dir)
    dsir_pass_ids = (
        dsir_score_with_table(
            c_pass, table, text_col="dedup_text", method=cfg.dsir_method
        )
        .filter(F.col("dsir_score") >= cfg.min_dsir)
        .select("doc_id")
        .persist()
    )
    extra_cached.append(dsir_pass_ids)
    d_pass_dsir = c_pass.join(dsir_pass_ids, "doc_id", "left_semi")
    d_pass = d_pass_dsir

    # stage 4b (opt-in): model-based filter against a FROZEN classifier —
    # trained once on the first batch's DSIR survivors, weights persisted
    # (32 KB .npz), later batches scored map-side against the same model
    if cfg.use_classifier:
        from feast_spark.operators.classifier import (
            hashed_bigram_features,
            load_classifier,
            save_classifier,
            score_with_classifier,
            train_quality_classifier,
        )

        clf_path = os.path.join(state_dir, "clf_model.npz")
        # train() persists feats (materialization barrier); register it
        # for release() so executor blocks drain with the result
        feats = hashed_bigram_features(
            d_pass,
            F.col("source").isin(*cfg.target_sources),
            n_buckets=cfg.clf_buckets,
            text_col="dedup_text",
            method=cfg.clf_method,
        )
        if not os.path.exists(clf_path):
            clf_model = train_quality_classifier(
                spark, feats, n_buckets=cfg.clf_buckets, n_iter=cfg.clf_iters
            )
            deferred_artifacts.append(
                lambda m=clf_model: save_classifier(m, clf_path)
            )
            extra_cached.append(feats)
        else:
            clf_model = load_classifier(clf_path)
        clf_pass_ids = (
            score_with_classifier(clf_model, feats)
            .filter(F.col("margin_units") > cfg.min_margin)
            .select("doc_id")
            .persist()
        )
        extra_cached.append(clf_pass_ids)
        d_pass = d_pass.join(clf_pass_ids, "doc_id", "left_semi")

    # stage 5: deterministic stratified sampling (map-only, key-stable —
    # a doc's verdict is independent of which batch carried it)
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source"))
    kept = deterministic_sample(d_pass, key, _sample_rate(cfg)).select(
        "doc_id", "source", "dedup_text", "n_spans_kept", "sample_bucket"
    )

    # ---- commit: kept output, then lineage, then the span partition
    # LAST (its _SUCCESS marker IS the commit point — a crash anywhere
    # earlier leaves the batch uncommitted and the re-run starts clean)
    kept.write.mode("overwrite").parquet(kept_dir)
    kept_out = spark.read.parquet(kept_dir)

    # ---- lineage counts in ONE aggregation pass. Flag columns are
    # left-joined id sets (each pass-id subtree executes exactly once
    # here; the expensive span+quality base is the persisted ``scored``);
    # the cumulative ANDs rebuild the staged funnel, so every count comes
    # from a single job instead of one action per stage.
    flags = scored.select("doc_id", "quality_keep")
    q_ok = F.col("quality_keep")
    funnel = [q_ok]
    if lm_pass_ids is not None:
        flags = flags.join(
            lm_pass_ids.withColumn("__lm", F.lit(True)), "doc_id", "left"
        )
        funnel.append(F.coalesce("__lm", F.lit(False)))
    flags = flags.join(
        contam.filter("contaminated").select(
            "doc_id", F.col("contaminated").alias("__contam")
        ),
        "doc_id",
        "left",
    )
    funnel.append(~F.coalesce("__contam", F.lit(False)))
    flags = flags.join(
        dsir_pass_ids.withColumn("__dsir", F.lit(True)), "doc_id", "left"
    )
    funnel.append(F.coalesce("__dsir", F.lit(False)))
    if clf_pass_ids is not None:
        flags = flags.join(
            clf_pass_ids.withColumn("__clf", F.lit(True)), "doc_id", "left"
        )
        funnel.append(F.coalesce("__clf", F.lit(False)))

    def upto(n: int):
        cond = funnel[0]
        for c in funnel[1:n]:
            cond = cond & c
        return F.sum(cond.cast("long"))

    i = 1
    aggs = [F.count(F.lit(1)).alias("n"), upto(i).alias("q")]
    if lm_pass_ids is not None:
        i += 1
        aggs.append(upto(i).alias("lm"))
    i += 1
    aggs.append(upto(i).alias("c"))
    i += 1
    aggs.append(upto(i).alias("d"))
    if clf_pass_ids is not None:
        i += 1
        aggs.append(upto(i).alias("clf"))
    row = flags.agg(*aggs).collect()[0]
    stage_counts = {
        "input": new_docs.count(),
        **(
            {"after_paragraph_dedup": n_after_paragraph}
            if n_after_paragraph is not None
            else {}
        ),
        **(
            {"after_neardup": n_after_neardup}
            if n_after_neardup is not None
            else {}
        ),
        "after_span_dedup": n_after_span,
        "after_quality": int(row["q"]),
        "after_decontamination": int(row["c"]),
        "after_dsir": int(row["d"]),
        "kept": kept_out.count(),
    }
    if lm_pass_ids is not None:
        stage_counts["after_lm"] = int(row["lm"])
    if clf_pass_ids is not None:
        stage_counts["after_classifier"] = int(row["clf"])
    os.makedirs(os.path.join(state_dir, "runs"), exist_ok=True)
    lineage = {
        "batch_id": batch_id,
        "stage_counts": stage_counts,
        "wall_sec": round(time.time() - t0, 3),
        "committed_at": datetime.now(timezone.utc).isoformat(),
        "prior_batches": _committed_batches(state_dir),
    }
    with open(os.path.join(state_dir, "runs", f"{batch_id}.json"), "w") as f:
        json.dump(lineage, f)
    for commit_artifact in deferred_artifacts:
        commit_artifact()
    # minhash/paras BEFORE spans: the spans partition's _SUCCESS is the
    # batch's single commit point, so a crash between the writes leaves
    # the batch uncommitted and the retry overwrites all partitions
    # cleanly
    if new_mh is not None:
        new_mh.write.mode("overwrite").parquet(
            os.path.join(_minhash_dir(state_dir), f"batch={batch_id}")
        )
    if new_paras is not None:
        new_paras.write.mode("overwrite").parquet(
            os.path.join(_paras_dir(state_dir), f"batch={batch_id}")
        )
    new_spans.write.mode("overwrite").parquet(
        os.path.join(_spans_dir(state_dir), f"batch={batch_id}")
    )
    return IncrementalResult(
        batch_id=batch_id,
        kept=kept_out,
        stage_counts=stage_counts,
        _cached=[scored, *extra_cached],
    )


def curate_stream(
    spark: SparkSession,
    stream_docs: DataFrame,
    benchmark: DataFrame,
    state_dir: str,
    checkpoint: str,
    cfg: CurationConfig | None = None,
):
    """Run the incremental curation pipeline under Structured Streaming:
    every micro-batch becomes one :func:`run_curation_incremental` batch
    (id ``s<micro_batch_id>``), so a stream of arriving document files
    is curated continuously with the SAME state, lineage, and frozen
    calibration as the batch path.

    Exactly-once composition: ``foreachBatch`` may re-deliver a
    micro-batch id after a failure, and the incremental commit protocol
    absorbs that — a batch whose span partition carries ``_SUCCESS`` is
    returned from state without reprocessing, and a half-written batch
    left no marker, so the retry runs clean. The streaming checkpoint
    guarantees each source file maps to one micro-batch id; the state
    dir guarantees each micro-batch id commits once.

    Returns the started ``StreamingQuery`` (caller stops it /
    ``processAllAvailable``).
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        res = run_curation_incremental(
            spark,
            batch_df,
            benchmark,
            state_dir,
            f"s{batch_id:08d}",
            cfg,
        )
        res.release()

    return (
        stream_docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .start()
    )
