"""Behavioral tests for the corpus curation pipeline
(pipeline/curation.py) — oracle parity lives in test_entry_oracle.py
(`doc_curation`); these pin the staged-filter contract on the fixture
corpus."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_spark.pipeline.curation import (
    CurationConfig,
    run_curation,
    stage_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("bench_text")
    )
    res = run_curation(spark, docs, bench)
    yield res
    res.release()


def test_kept_equals_decisions_kept_ids(spark, result):
    kept_ids = sorted(r["doc_id"] for r in result.kept.select("doc_id").collect())
    dec_ids = sorted(
        r["doc_id"]
        for r in result.decisions.filter("kept").select("doc_id").collect()
    )
    # the production filter chain and the audit table agree exactly
    assert kept_ids == dec_ids and len(kept_ids) > 0


def test_every_input_doc_gets_exactly_one_decision(spark, result):
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    dec = result.decisions
    assert dec.count() == n_docs
    assert dec.select("doc_id").distinct().count() == n_docs
    # kept rows have no drop stage; dropped rows name exactly one
    assert dec.filter("kept AND drop_stage IS NOT NULL").count() == 0
    assert dec.filter("NOT kept AND drop_stage IS NULL").count() == 0


def test_stage_counts_partition_the_corpus(spark, result):
    counts = {r["stage"]: r["n_docs"] for r in stage_counts(result.decisions).collect()}
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(counts.values()) == n_docs
    # the fixture corpus exercises dedup, quality, and dsir at minimum
    assert counts.get("span_dup", 0) > 0
    assert counts.get("quality", 0) > 0
    assert counts.get("kept", 0) > 0


def test_dropped_doc_is_absent_from_kept(spark, result):
    a_drop = result.decisions.filter("NOT kept").select("doc_id").first()["doc_id"]
    assert result.kept.filter(F.col("doc_id") == a_drop).count() == 0


def test_curation_is_deterministic_across_runs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("bench_text")
    )
    r1 = run_curation(spark, docs, bench, materialize=False)
    r2 = run_curation(spark, docs, bench, materialize=False)
    d1 = r1.decisions.toPandas().sort_values("doc_id").reset_index(drop=True)
    d2 = r2.decisions.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(d1, d2)


def test_classifier_stage_filters_and_audits(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("bench_text")
    )
    base_cfg = CurationConfig()
    clf_cfg = CurationConfig(use_classifier=True, clf_iters=4)
    base = run_curation(spark, docs, bench, base_cfg, materialize=False)
    res = run_curation(spark, docs, bench, clf_cfg)
    try:
        kept_ids = {r["doc_id"] for r in res.kept.select("doc_id").collect()}
        base_ids = {r["doc_id"] for r in base.kept.select("doc_id").collect()}
        # stage 4b only ever removes documents relative to the default chain
        assert kept_ids <= base_ids
        dec = res.decisions
        # audit schema gains margin_units; every input doc still has a row
        assert "margin_units" in dec.columns
        assert dec.count() == docs.count()
        counts = {
            r["stage"]: r["n_docs"] for r in stage_counts(dec).collect()
        }
        assert sum(counts.values()) == docs.count()
        # classifier drops are attributed to their own stage, and each
        # such doc scored at or below the margin and survived dsir
        clf_dropped = dec.filter("drop_stage = 'classifier'")
        if counts.get("classifier", 0):
            bad = clf_dropped.filter(
                (F.col("margin_units") > clf_cfg.min_margin)
                | (F.col("dsir_score") < clf_cfg.min_dsir)
            ).count()
            assert bad == 0
        # kept docs all cleared the margin
        kept_dec = dec.filter("kept")
        assert kept_dec.filter(
            F.col("margin_units") <= clf_cfg.min_margin
        ).count() == 0
    finally:
        res.release()


def test_config_min_dsir_tightens_selection(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("bench_text")
    )
    loose = run_curation(
        spark, docs, bench, CurationConfig(min_dsir=-(10**9)), materialize=False
    )
    tight = run_curation(
        spark, docs, bench, CurationConfig(min_dsir=10**9), materialize=False
    )
    n_loose = loose.kept.count()
    n_tight = tight.kept.count()
    assert n_tight == 0 and n_loose > 0


def test_lm_stage_filters_and_audits(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("bench_text")
    )
    lm_cfg = CurationConfig(use_lm=True, lm_method="xxhash64")
    res = run_curation(spark, docs, bench, lm_cfg)
    try:
        dec = res.decisions
        assert "lm_ppl" in dec.columns
        assert dec.count() == docs.count()
        counts = {r["stage"]: r["n_docs"] for r in stage_counts(dec).collect()}
        assert sum(counts.values()) == docs.count()
        # the 0.7 quantile gate must actually drop a tail on this corpus
        assert counts.get("lm_ppl", 0) > 0
        # every kept doc carries a real (scored) perplexity
        kept_dec = dec.filter("kept")
        assert kept_dec.filter(F.col("lm_ppl") <= 0).count() == 0
        # lm-dropped docs score strictly above every kept doc's ppl floor?
        # no — the threshold is a corpus quantile; assert the weaker exact
        # invariant: max kept ppl <= min lm-dropped ppl
        max_kept = kept_dec.agg(F.max("lm_ppl")).first()[0]
        min_drop = (
            dec.filter("drop_stage = 'lm_ppl'").agg(F.min("lm_ppl")).first()[0]
        )
        assert max_kept <= min_drop
    finally:
        res.release()


def test_lm_stage_always_trains_bucketed(spark, monkeypatch):
    # At corpus scale an UNBOUNDED LM train collects one driver row per
    # distinct 1..order-gram (operators/lm.py builds the broadcast model
    # with a toPandas of the counts) — billions of rows at 100 TB. The
    # pipeline must therefore always pass its lm_buckets bound through;
    # this spy pins the call site so the bound can't silently regress.
    import feast_spark.operators.lm as lm_mod

    captured = {}
    real = lm_mod.train_ngram_lm

    def spy(df, **kw):
        captured.update(kw)
        return real(df, **kw)

    monkeypatch.setattr(lm_mod, "train_ngram_lm", spy)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("bench_text")
    )
    cfg = CurationConfig(use_lm=True, lm_method="xxhash64", lm_buckets=1 << 10)
    res = run_curation(spark, docs, bench, cfg, materialize=False)
    res.kept.count()
    assert captured.get("n_buckets") == 1 << 10
    # and the shipped default is a real bound, not None
    assert CurationConfig().lm_buckets is not None


def test_line_clean_stage_filters_and_audits(spark):
    # corpus where line cleaning does real work: doc text gains newline
    # structure, one doc becomes all-blocklist lines
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 97 == 0,
            F.lit("all javascript here\nmore javascript lines"),
        )
        .otherwise(F.expr("replace(text, ' merge ', chr(10))"))
        .alias("text"),
    )
    bench = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias(
            "bench_text"
        )
    )
    cfg = CurationConfig(use_line_clean=True)
    res = run_curation(spark, docs, bench, cfg)
    try:
        dec = res.decisions
        assert "line_kept_frac" in dec.columns
        assert dec.count() == docs.count()
        counts = {r["stage"]: r["n_docs"] for r in stage_counts(dec).collect()}
        assert sum(counts.values()) == docs.count()
        # every %97 doc was dropped at the line_clean stage
        n_block = docs.filter(F.col("doc_id") % 97 == 0).count()
        assert counts.get("line_clean", 0) == n_block
        blocked = {
            r["doc_id"]
            for r in dec.filter("drop_stage = 'line_clean'").collect()
        }
        assert all(i % 97 == 0 for i in blocked) and len(blocked) == n_block
        # kept docs' dedup_text derives from the CLEANED text: no empty
        # lines, no blocklist phrase anywhere
        kept = res.kept.collect()
        assert kept, "line-clean chain kept nothing"
        for r in kept:
            assert "javascript" not in r["dedup_text"]
    finally:
        res.release()


def test_line_clean_default_off_schema_unchanged(spark, result):
    assert "line_kept_frac" not in result.decisions.columns


def test_conversation_curation_stages(spark):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.conv_curation import (
        ConvCurationConfig,
        curate_conversations,
    )

    t = transcripts_spark(spark, 60, seed=9, mega_every=30, mega_turns=100)
    # plant whole-conversation clones: near_dup stage must catch them
    idx = F.substring("conv_id", 2, 9).cast("int")
    clones = (
        t.filter(F.pmod(idx, F.lit(6)) == 0)
        .withColumn("conv_id", F.concat("conv_id", F.lit("d")))
    )
    res = curate_conversations(spark, t.unionByName(clones))
    try:
        dec = res.decisions.collect()
        n_convs = len({r["conv_id"] for r in dec})
        assert len(dec) == n_convs  # one row per conversation
        stages = {r["conv_id"]: r for r in dec}
        # exact clones: one of each (base, clone) pair drops as near_dup
        # with the other as representative — unless an earlier stage
        # already dropped both
        clone_ids = [c for c in stages if c.endswith("d")]
        assert clone_ids
        for c in clone_ids:
            base = c[:-1]
            pair_stages = {stages[c]["drop_stage"], stages[base]["drop_stage"]}
            if pair_stages <= {"near_dup", "kept", "sampled_out"}:
                dup_rows = [
                    r for r in (stages[c], stages[base])
                    if r["drop_stage"] == "near_dup"
                ]
                assert len(dup_rows) == 1, (c, pair_stages)
                assert dup_rows[0]["dup_of"] == min(c, base)
        # kept rows appear in the kept table exactly
        kept_ids = {r["conv_id"] for r in res.kept.collect()}
        assert kept_ids == {
            r["conv_id"] for r in dec if r["kept"]
        }
        # a structure-failed conv never reaches later stages
        for r in dec:
            if not r["structure_ok"]:
                assert r["drop_stage"] == "structure"
    finally:
        res.release()


def test_blocklist_stage_filters_and_audits(spark):
    # plant a unique phrase into every %89 doc; those docs must drop at
    # the blocklist stage AND their spans must not claim first-occurrence
    # slots (a clean doc sharing a span with a blocked doc keeps it)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 89 == 0,
            F.concat(F.lit("forbidden utterance here "), "text"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    bench = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias(
            "bench_text"
        )
    )
    cfg = CurationConfig(
        use_blocklist=True,
        blocklist_phrases=("forbidden utterance",),
        blocklist_max_hits=0,
    )
    res = run_curation(spark, docs, bench, cfg)
    try:
        dec = res.decisions
        assert "blocklist_hits" in dec.columns
        assert dec.count() == docs.count()
        n_flag = docs.filter(F.col("doc_id") % 89 == 0).count()
        blocked = dec.filter("drop_stage = 'blocklist'").collect()
        assert len(blocked) == n_flag
        assert all(r["doc_id"] % 89 == 0 and r["blocklist_hits"] >= 1
                   for r in blocked)
        # span slots: doc 0 is blocked; its raw spans must survive in the
        # first clean doc that repeats them — i.e. span-dedup ran on the
        # blocklist survivors only. Weaker structural check: every kept
        # doc has n_spans_kept > 0 and no kept doc is %89.
        kept = dec.filter("kept").collect()
        assert kept and all(r["doc_id"] % 89 != 0 for r in kept)
    finally:
        res.release()


def test_blocklist_default_off_schema_unchanged(spark, result):
    assert "blocklist_hits" not in result.decisions.columns


def test_neardup_stage_keeps_min_id_representative(spark):
    # plant whole-doc near-copies: every %71 doc re-appears (3% of words
    # changed would need a mutator; verbatim copy under a HIGHER id is
    # enough for LSH) — copies must drop at 'near_dup', originals survive
    # that stage, and dropped copies claim no span slots
    base = spark.read.parquet(f"{SF}/documents.parquet")
    copies = base.filter(F.col("doc_id") % 71 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "source",
        "text",
    )
    docs = base.select("doc_id", "source", "text").unionByName(copies)
    bench = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias(
            "bench_text"
        )
    )
    res = run_curation(
        spark, docs, bench, CurationConfig(use_neardup=True)
    )
    try:
        dec = res.decisions
        assert dec.count() == docs.count()
        nd = {r["doc_id"] for r in dec.filter("drop_stage = 'near_dup'").collect()}
        planted = {r["doc_id"] for r in copies.select("doc_id").collect()}
        # every planted copy drops as near_dup (min-id rep = the original)
        assert planted <= nd
        # no original with a planted copy was sacrificed for it
        assert not any(p - 1_000_000 in nd for p in planted)
        # span slots: originals keep their spans (copies claimed none) —
        # each original with a planted copy still has n_spans_kept > 0
        originals = {p - 1_000_000 for p in planted}
        kept_spans = {
            r["doc_id"]: r["n_spans_kept"]
            for r in dec.filter(F.col("doc_id").isin(originals)).collect()
        }
        assert all(v > 0 for v in kept_spans.values())
    finally:
        res.release()


def test_neardup_verify_arm_rescues_order_scrambles(spark):
    # two docs with near-identical char-shingle SETS but wholly different
    # order (blocked vs alternating word layout) form an LSH pair that
    # edit-similarity verification must reject; a verbatim clone must
    # still be confirmed and dropped. Same plant grammar as the
    # min-id-representative test, plus the scramble.
    base = spark.read.parquet(f"{SF}/documents.parquet")
    blocked = " ".join(["alphabet"] * 30 + ["umbrella"] * 30)
    alternating = " ".join(["alphabet", "umbrella"] * 30)
    extra = spark.createDataFrame(
        [
            (2_000_000, "src1", blocked),
            (2_000_001, "src1", alternating),
            (2_000_002, "src1", blocked),  # verbatim clone of 2_000_000
        ],
        "doc_id long, source string, text string",
    )
    docs = base.select("doc_id", "source", "text").unionByName(extra)
    bench = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias(
            "bench_text"
        )
    )

    def near_dup_drops(cfg):
        res = run_curation(spark, docs, bench, cfg)
        try:
            return {
                r["doc_id"]
                for r in res.decisions.filter(
                    "drop_stage = 'near_dup'"
                ).collect()
            }
        finally:
            res.release()

    # sanity: without the verify arm the scramble IS dropped (shingle
    # sets match), proving the pair reaches connected components at all
    plain = near_dup_drops(CurationConfig(use_neardup=True))
    assert 2_000_001 in plain and 2_000_002 in plain

    verified = near_dup_drops(
        CurationConfig(use_neardup=True, neardup_verify_threshold=0.8)
    )
    assert 2_000_002 in verified  # verbatim clone confirmed
    assert 2_000_001 not in verified  # order-scramble rescued
    assert 2_000_000 not in verified  # representative untouched


def test_conv_neardup_verify_arm_rescues_scrambles(spark):
    # two structurally identical conversations whose turns share char
    # shingles (same two words, blocked vs alternating layout) but
    # differ entirely in order: LSH pairs them, edit-similarity must
    # reject; a verbatim conversation clone must still drop.
    from feast_spark.pipeline.conv_curation import (
        ConvCurationConfig,
        curate_conversations,
    )

    from datetime import datetime, timezone

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    blocked = " ".join(["alphabet"] * 24 + ["umbrella"] * 24)
    alternating = " ".join(["alphabet", "umbrella"] * 24)

    def conv(cid, text):
        return [
            (cid, 0, "user", text, None, ts0),
            (cid, 1, "assistant", text, None, ts0),
            (cid, 2, "user", text, None, ts0),
            (cid, 3, "assistant", text, None, ts0),
        ]

    rows = conv("ca", blocked) + conv("cb", alternating) + conv("cc", blocked)
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    from feast_spark import rules

    # relax the quality gate (two-word vocab fails stopword/repetition
    # rules) and sample nothing out — the near-dup stage is the subject
    cfg_kw = dict(
        rule_config=rules.RuleConfig(
            min_words=1, max_top2gram_frac=1.0, min_stopword_ratio=0.0,
            allowed_langs=None, max_perplexity=1e9,
        ),
        min_keep_frac=0.0,
        sample_rate=1.0,
    )

    def stage_of(cfg):
        res = curate_conversations(spark, t, cfg)
        try:
            return {
                r["conv_id"]: r["drop_stage"]
                for r in res.decisions.collect()
            }
        finally:
            res.release()

    plain = stage_of(ConvCurationConfig(**cfg_kw))
    # sanity: without verify, BOTH cb (scramble) and cc (clone) collapse
    # into ca's component
    assert plain["ca"] == "kept"
    assert plain["cb"] == "near_dup" and plain["cc"] == "near_dup"

    verified = stage_of(
        ConvCurationConfig(neardup_verify_threshold=0.8, **cfg_kw)
    )
    assert verified["ca"] == "kept"
    assert verified["cc"] == "near_dup"  # verbatim clone confirmed
    assert verified["cb"] == "kept"  # order-scramble rescued


def test_conv_fork_mask_stage_masks_sibling_prefixes(spark):
    # opt-in stage 5: fork SIBLINGS (shared 2-turn prefix, genuinely
    # distinct tails) survive near-dup by design; kept_turns must mask
    # exactly the non-rep members' prefix turns
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.conv_curation import (
        ConvCurationConfig,
        curate_conversations,
    )

    t = transcripts_spark(spark, 40, seed=21, mega_every=0)
    idx = F.substring("conv_id", 2, 9).cast("int")
    # fork plant: clone every 4th conv, REWRITE the tail entirely so the
    # sibling is nowhere near a near-dup of its original
    siblings = (
        t.filter(F.pmod(idx, F.lit(4)) == 0)
        .withColumn("conv_id", F.concat("conv_id", F.lit("f")))
        .withColumn(
            "text",
            F.when(
                F.col("turn_idx") >= 2,
                F.concat(
                    F.lit("completely different continuation branch "),
                    F.md5(F.concat("conv_id", F.col("turn_idx").cast("string"))),
                ),
            ).otherwise(F.col("text")),
        )
    )
    cfg = ConvCurationConfig(sample_rate=1.0, fork_mask_k=2)
    res = curate_conversations(spark, t.unionByName(siblings), cfg)
    try:
        assert res.kept_turns is not None
        kt = res.kept_turns.persist()
        kept_ids = {r["conv_id"] for r in res.kept.collect()}
        # kept_turns covers exactly the kept conversations
        assert {r["conv_id"] for r in kt.select("conv_id").distinct().collect()} == kept_ids
        masked = kt.filter("NOT keep_turn").collect()
        # masking only hits non-rep fork members' first-k turns
        for r in masked:
            assert r["turn_idx"] is not None and not r["is_rep"]
            assert r["fork_md5"] is not None
        # every kept (orig, sibling) pair with >=2 turns forms a group:
        # the sibling ('f' suffix sorts after digits) carries exactly 2
        # masked turns
        masked_by_conv = {}
        for r in masked:
            masked_by_conv.setdefault(r["conv_id"], 0)
            masked_by_conv[r["conv_id"]] += 1
        pairs = [
            c for c in kept_ids
            if c.endswith("f") and c[:-1] in kept_ids
        ]
        assert pairs, "plant produced no kept fork pairs"
        for c in pairs:
            assert masked_by_conv.get(c) == 2, (c, masked_by_conv.get(c))
        kt.unpersist()
    finally:
        res.release()


def test_conv_fork_mask_default_off(spark):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.conv_curation import curate_conversations

    t = transcripts_spark(spark, 10, seed=3, mega_every=0)
    res = curate_conversations(spark, t)
    try:
        assert res.kept_turns is None
    finally:
        res.release()


def test_conv_training_turns_repair_and_fit(spark):
    # opt-in stages 6/7: kept conversations flow through alternation
    # repair (same-role runs merge) then context fit (system pinned,
    # suffix budget) — the training turn table
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.conv_curation import (
        ConvCurationConfig,
        curate_conversations,
    )
    from feast_spark.operators.conversation import _deduped

    t = transcripts_spark(spark, 30, seed=11, mega_every=0)
    # drop a deterministic turn subset so same-role runs exist
    idx = F.substring("conv_id", 2, 9).cast("long")
    t = t.filter(F.pmod(idx * 3 + F.col("turn_idx"), F.lit(5)) != 2)
    cfg = ConvCurationConfig(
        sample_rate=1.0, repair_alternation_sep=" | ", context_budget=32
    )
    res = curate_conversations(spark, t, cfg)
    try:
        tt = res.training_turns
        assert tt is not None
        rows = tt.collect()
        kept_ids = {r["conv_id"] for r in res.kept.collect()}
        assert {r["conv_id"] for r in rows} == kept_ids
        # repaired: no two consecutive same-role turns remain
        by_conv = {}
        for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
            by_conv.setdefault(r["conv_id"], []).append(r)
        merged_any = False
        for conv, rs in by_conv.items():
            roles = [r["role"] for r in rs]
            assert all(a != b for a, b in zip(roles, roles[1:])), conv
            merged_any |= any(r["n_merged"] > 1 for r in rs)
            # fit: system turns always kept; kept non-system tokens fit
            # the remaining budget
            sys_tot = sum(r["n_tokens"] for r in rs if r["role"] == "system")
            for r in rs:
                if r["role"] == "system":
                    assert r["keep_turn"], r
            kept_rest = sum(
                r["n_tokens"]
                for r in rs
                if r["keep_turn"] and r["role"] != "system"
            )
            assert kept_rest <= max(32 - sys_tot, 0), (conv, kept_rest, sys_tot)
        assert merged_any  # the filter plant produced real merges
        # repair conserves the kept deduped turn count
        n_src = (
            _deduped(t)
            .join(res.kept.select("conv_id"), "conv_id", "left_semi")
            .count()
        )
        assert sum(r["n_merged"] for r in rows) == n_src
    finally:
        res.release()


def test_conv_training_turns_fit_only_and_default_off(spark):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.conv_curation import (
        ConvCurationConfig,
        curate_conversations,
    )

    t = transcripts_spark(spark, 12, seed=5, mega_every=0)
    res0 = curate_conversations(spark, t)
    try:
        assert res0.training_turns is None
    finally:
        res0.release()
    res = curate_conversations(
        spark, t, ConvCurationConfig(sample_rate=1.0, context_budget=16)
    )
    try:
        tt = res.training_turns
        assert tt is not None
        # fit-only: original turn schema + n_tokens/keep_turn, no merge cols
        assert "n_merged" not in tt.columns and "keep_turn" in tt.columns
        bad = tt.filter((F.col("role") == "system") & ~F.col("keep_turn"))
        assert bad.count() == 0
    finally:
        res.release()
