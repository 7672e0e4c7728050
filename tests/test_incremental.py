"""Incremental curation: cross-batch span-dedup state equivalence,
frozen-DSIR scoring, commit/resume idempotence."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_spark.operators.selection import (
    dsir_bucket_table,
    dsir_score_with_table,
    dsir_weights,
    span_dedup,
    span_dedup_incremental,
)


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _random_rows(seed, n_docs=60, vocab=8, max_words=30, base=0):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    return [
        (base + i, " ".join(rng.choice(words, size=rng.integers(1, max_words + 1))))
        for i in range(n_docs)
    ]


# ---------------------------------------------------------------------------
# span_dedup_incremental
# ---------------------------------------------------------------------------


def test_incremental_spans_equal_full_run_when_batches_follow_id_order(spark):
    rows1 = _random_rows(1, base=0)
    rows2 = _random_rows(2, base=1000)
    full = {
        r["doc_id"]: tuple(r)
        for r in span_dedup(
            _docs(spark, rows1 + rows2), span_words=3, method="xxhash64"
        ).collect()
    }
    out1, spans1 = span_dedup_incremental(_docs(spark, rows1), None, span_words=3)
    state = spans1.localCheckpoint()
    out2, _ = span_dedup_incremental(_docs(spark, rows2), state, span_words=3)
    inc = {r["doc_id"]: tuple(r) for r in out1.collect()}
    inc.update({r["doc_id"]: tuple(r) for r in out2.collect()})
    assert inc == full


def test_incremental_drops_cross_batch_duplicate(spark):
    rows1 = [(0, "a b c d e f")]
    rows2 = [(10, "a b c d e f"), (11, "x y z p q r")]
    _, spans1 = span_dedup_incremental(_docs(spark, rows1), None, span_words=3)
    state = spans1.localCheckpoint()
    out2, spans2 = span_dedup_incremental(_docs(spark, rows2), state, span_words=3)
    got = {r["doc_id"]: r["dedup_text"] for r in out2.collect()}
    # doc 10 duplicates batch-1 spans -> fully cut, vanishes
    assert got == {11: "x y z p q r"}
    # batch-2 new spans are DISJOINT from batch-1 state
    s1 = {r["h"] for r in state.collect()}
    s2 = {r["h"] for r in spans2.collect()}
    assert s1.isdisjoint(s2) and len(s2) == 2


# ---------------------------------------------------------------------------
# frozen DSIR table
# ---------------------------------------------------------------------------


def test_dsir_table_split_matches_monolithic(spark):
    # build+score in one call == build table then score with it
    rows = [(i, t, "src1" if i % 2 else "web") for i, (_, t) in enumerate(_random_rows(3))]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    )
    tgt = F.col("source") == "src1"
    mono = {
        r["doc_id"]: (r["n_bigrams"], r["dsir_score"])
        for r in dsir_weights(docs, tgt, center=True).collect()
    }
    table = dsir_bucket_table(docs, tgt, center=True)
    split = {
        r["doc_id"]: (r["n_bigrams"], r["dsir_score"])
        for r in dsir_score_with_table(docs, table).collect()
    }
    assert mono == split


def test_dsir_frozen_table_scores_unseen_buckets_neutral(spark):
    base = spark.createDataFrame(
        pd.DataFrame([(0, "a b a b", "src1")], columns=["doc_id", "text", "source"])
    )
    table = dsir_bucket_table(base, F.lit(True))
    new = spark.createDataFrame(
        pd.DataFrame([(1, "zz qq zz qq")], columns=["doc_id", "text"])
    )
    out = dsir_score_with_table(new, table).collect()[0]
    assert out["n_bigrams"] == 3 and out["dsir_score"] == 0


# ---------------------------------------------------------------------------
# run_curation_incremental
# ---------------------------------------------------------------------------


def _corpus_batches(spark):
    # the sf0.001 documents table (rule-passing text, srcN sources) split
    # into two id-ordered batches — the monotonic-snapshot-ingest case
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    b1 = docs.filter(F.col("doc_id") <= mid)
    b2 = docs.filter(F.col("doc_id") > mid)
    bench = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("bench_text")
    )
    return b1, b2, bench


def test_incremental_pipeline_two_batches_commit_and_resume(spark, tmp_path):
    from feast_spark.pipeline.curation import CurationConfig
    from feast_spark.pipeline.incremental import run_curation_incremental

    b1, b2, bench = _corpus_batches(spark)
    state = str(tmp_path / "state")
    cfg = CurationConfig()

    r1 = run_curation_incremental(spark, b1, bench, state, "b1", cfg)
    assert not r1.resumed
    assert r1.stage_counts["kept"] > 0
    assert os.path.exists(os.path.join(state, "dsir", "_SUCCESS"))
    assert os.path.exists(
        os.path.join(state, "spans", "batch=b1", "_SUCCESS")
    )
    r1.release()

    r2 = run_curation_incremental(spark, b2, bench, state, "b2", cfg)
    assert not r2.resumed
    # cross-batch dedup actually bit: batch-2 docs lost spans to batch 1
    # OR kept fewer than input (the fixture plants duplicates)
    assert r2.stage_counts["kept"] <= r2.stage_counts["input"]
    lineage = json.load(open(os.path.join(state, "runs", "b2.json")))
    assert lineage["prior_batches"] == ["b1"]
    assert lineage["stage_counts"] == r2.stage_counts
    kept2 = {r["doc_id"] for r in r2.kept.collect()}
    r2.release()

    # resume: same batch id returns the COMMITTED result, no recompute
    r2b = run_curation_incremental(spark, b2, bench, state, "b2", cfg)
    assert r2b.resumed
    assert {r["doc_id"] for r in r2b.kept.collect()} == kept2
    assert r2b.stage_counts == r2.stage_counts


def test_incremental_span_stage_matches_full_run(spark, tmp_path):
    # the span stage of the incremental pipeline is EXACTLY the full-run
    # span dedup restricted per batch (id order == batch order)
    from feast_spark.fixtures import documents_spark

    docs = documents_spark(spark, 400, seed=9).localCheckpoint()
    full = {
        r["doc_id"]: r["dedup_text"]
        for r in span_dedup(docs, span_words=10, method="xxhash64").collect()
    }
    b1 = docs.filter(F.col("doc_id") < 200)
    b2 = docs.filter(F.col("doc_id") >= 200)
    out1, s1 = span_dedup_incremental(b1, None, span_words=10)
    state = s1.localCheckpoint()
    out2, _ = span_dedup_incremental(b2, state, span_words=10)
    inc = {r["doc_id"]: r["dedup_text"] for r in out1.collect()}
    inc.update({r["doc_id"]: r["dedup_text"] for r in out2.collect()})
    assert inc == full


def test_incremental_frozen_lm_and_classifier_models(spark, tmp_path):
    from feast_spark.pipeline.curation import CurationConfig
    from feast_spark.pipeline.incremental import run_curation_incremental

    b1, b2, bench = _corpus_batches(spark)
    state = str(tmp_path / "state")
    cfg = CurationConfig(use_lm=True, use_classifier=True, clf_iters=3)

    r1 = run_curation_incremental(spark, b1, bench, state, "b1", cfg)
    lm_path = os.path.join(state, "lm_model.npz")
    clf_path = os.path.join(state, "clf_model.npz")
    assert os.path.exists(lm_path) and os.path.exists(clf_path)
    assert os.path.exists(os.path.join(state, "lm_thr.json"))
    m1 = (os.path.getmtime(lm_path), os.path.getmtime(clf_path))
    r1.release()

    r2 = run_curation_incremental(spark, b2, bench, state, "b2", cfg)
    # batch 2 LOADED the frozen models — files untouched
    assert (os.path.getmtime(lm_path), os.path.getmtime(clf_path)) == m1
    assert r2.stage_counts["kept"] <= r2.stage_counts["after_dsir"]
    kept2 = {r["doc_id"] for r in r2.kept.collect()}
    r2.release()

    # determinism under resume
    r2b = run_curation_incremental(spark, b2, bench, state, "b2", cfg)
    assert r2b.resumed
    assert {r["doc_id"] for r in r2b.kept.collect()} == kept2


def test_incremental_lm_stage_trains_bucketed(spark, tmp_path, monkeypatch):
    # same bound-pinning spy as test_curation: the incremental pipeline's
    # first-batch LM train must pass cfg.lm_buckets through (unbounded
    # would collect the corpus gram vocabulary to the driver at scale)
    import feast_spark.operators.lm as lm_mod
    from feast_spark.pipeline.curation import CurationConfig
    from feast_spark.pipeline.incremental import run_curation_incremental

    captured = {}
    real = lm_mod.train_ngram_lm

    def spy(df, **kw):
        captured.update(kw)
        return real(df, **kw)

    monkeypatch.setattr(lm_mod, "train_ngram_lm", spy)
    b1, _, bench = _corpus_batches(spark)
    cfg = CurationConfig(use_lm=True, lm_buckets=1 << 10)
    r1 = run_curation_incremental(
        spark, b1, bench, str(tmp_path / "state"), "b1", cfg
    )
    r1.release()
    assert captured.get("n_buckets") == 1 << 10


def test_lm_save_load_roundtrip(spark):
    from feast_spark.operators.lm import (
        lm_perplexity,
        load_ngram_lm,
        save_ngram_lm,
        train_ngram_lm,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    model = train_ngram_lm(docs, order=3)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.npz")
        save_ngram_lm(model, p)
        loaded = load_ngram_lm(p)
    assert loaded.order == model.order and loaded.method == model.method
    assert loaded.n_tokens == model.n_tokens and loaded.alpha == model.alpha
    assert set(loaded.tables) == set(model.tables)
    a = {r["doc_id"]: r["ppl"] for r in lm_perplexity(docs, model).collect()}
    b = {r["doc_id"]: r["ppl"] for r in lm_perplexity(docs, loaded).collect()}
    assert a == b


def test_classifier_save_load_roundtrip():
    import tempfile

    import numpy as np

    from feast_spark.operators.classifier import (
        QualityClassifier,
        load_classifier,
        save_classifier,
    )

    m = QualityClassifier(
        weights_micro=np.arange(64, dtype=np.int64) - 32,
        n_buckets=64, n_iter=5, lr=0.5, n_docs=123,
    )
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "c.npz")
        save_classifier(m, p)
        l = load_classifier(p)
    assert (l.weights_micro == m.weights_micro).all()
    assert (l.n_buckets, l.n_iter, l.lr, l.n_docs) == (64, 5, 0.5, 123)


def test_dsir_frozen_center_table_unseen_buckets_still_neutral(spark):
    # with center=True (the incremental default) an unmatched gram must
    # contribute 0 to the FINAL centered score — not -center_units each
    base = spark.createDataFrame(
        pd.DataFrame(
            [(0, "a b a b c a", "src1"), (1, "c a c b", "web")],
            columns=["doc_id", "text", "source"],
        )
    )
    table = dsir_bucket_table(base, F.col("source") == "src1", center=True)
    new = spark.createDataFrame(
        pd.DataFrame([(9, "zz qq rr zz qq")], columns=["doc_id", "text"])
    )
    out = dsir_score_with_table(new, table).collect()[0]
    assert out["n_bigrams"] == 4 and out["dsir_score"] == 0


def test_dsir_empty_table_scores_all_zero_not_null(spark):
    empty = spark.createDataFrame(
        [], "bucket string, bscore bigint, center_units bigint"
    )
    docs = spark.createDataFrame(
        pd.DataFrame([(0, "a b c")], columns=["doc_id", "text"])
    )
    out = dsir_score_with_table(docs, empty).collect()[0]
    assert out["dsir_score"] == 0 and out["n_bigrams"] == 2


def _para_batches(spark):
    # paragraph structure synthesized on the sf0.001 docs (single-line
    # fixture text): ' merge ' becomes a paragraph break, and EVERY doc
    # gains one shared boilerplate footer paragraph — the cross-batch
    # duplicate the paragraph stage must catch (doc-grain dedup can't:
    # every doc body differs)
    b1, b2, bench = _corpus_batches(spark)

    def tx(df):
        return df.withColumn(
            "text",
            F.concat(
                F.expr("replace(text, ' merge ', '\n\n')"),
                F.lit("\n\nshared boilerplate footer paragraph"),
            ),
        )

    return tx(b1), tx(b2), bench


FOOTER = "shared boilerplate footer paragraph"


def test_incremental_paragraph_stage_dedups_across_batches(spark, tmp_path):
    from feast_spark.pipeline.curation import CurationConfig
    from feast_spark.pipeline.incremental import run_curation_incremental

    b1, b2, bench = _para_batches(spark)
    state = str(tmp_path / "state")
    cfg = CurationConfig(use_paragraph_dedup=True)

    r1 = run_curation_incremental(spark, b1, bench, state, "b1", cfg)
    assert "after_paragraph_dedup" in r1.stage_counts
    assert (
        r1.stage_counts["after_paragraph_dedup"]
        <= r1.stage_counts["input"]
    )
    assert os.path.exists(os.path.join(state, "paras", "batch=b1"))
    r1.release()

    r2 = run_curation_incremental(spark, b2, bench, state, "b2", cfg)
    kept2 = r2.kept.collect()
    r2.release()
    # the footer paragraph was claimed by batch 1: NO batch-2 doc keeps it
    assert all(FOOTER not in (r["dedup_text"] or "") for r in kept2)
    # and the state never stores a hash twice across batches
    paras = spark.read.parquet(f"{state}/paras/*")
    assert paras.count() == paras.select("h").distinct().count()
    # the footer's hash is in state exactly once
    fh = spark.sql(f"SELECT xxhash64('{FOOTER}') AS h").collect()[0]["h"]
    assert paras.filter(F.col("h") == fh).count() == 1

    # resume returns the committed result without recompute
    r2b = run_curation_incremental(spark, b2, bench, state, "b2", cfg)
    assert r2b.resumed and r2b.stage_counts == r2.stage_counts


def test_curate_stream_paragraph_state_matches_manual_and_resumes(
    spark, tmp_path
):
    # VERDICT r4 #6: the STREAMING path dedups paragraphs incrementally —
    # a streamed two-batch run equals the manual incremental run, and the
    # paragraph state is resumed across stream RESTARTS (third file,
    # fresh query object, same checkpoint/state)
    from feast_spark.pipeline.curation import CurationConfig
    from feast_spark.pipeline.incremental import (
        _committed_batches,
        curate_stream,
        run_curation_incremental,
    )

    b1, b2, bench = _para_batches(spark)
    src = tmp_path / "src"
    src.mkdir()
    b1.coalesce(1).write.parquet(str(src / "f0"))
    b2.coalesce(1).write.parquet(str(src / "f1"))
    schema = b1.schema
    cfg = CurationConfig(use_paragraph_dedup=True)
    s_state = str(tmp_path / "s_state")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = curate_stream(spark, stream, bench, s_state, ckpt, cfg)
    q.processAllAvailable()
    q.stop()
    assert _committed_batches(s_state) == ["s00000000", "s00000001"]

    m_state = str(tmp_path / "m_state")
    for bid, b in (("b1", b1), ("b2", b2)):
        run_curation_incremental(spark, b, bench, m_state, bid, cfg).release()
    kept_stream = {
        r["doc_id"] for r in spark.read.parquet(f"{s_state}/kept/*").collect()
    }
    kept_manual = {
        r["doc_id"] for r in spark.read.parquet(f"{m_state}/kept/*").collect()
    }
    assert kept_stream == kept_manual
    # identical paragraph-hash state (set equality, not just counts)
    hs = {r["h"] for r in spark.read.parquet(f"{s_state}/paras/*").collect()}
    hm = {r["h"] for r in spark.read.parquet(f"{m_state}/paras/*").collect()}
    assert hs == hm

    # restart: new file arrives while the query is DOWN; a fresh query on
    # the same checkpoint + state must resume the paragraph state (the
    # footer paragraph is NOT re-claimed by batch 3)
    b3 = b2.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "text", F.concat(F.lit("fresh batch three body\n\n"), F.col("text"))
    )
    b3.coalesce(1).write.parquet(str(src / "f2"))
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q2 = curate_stream(spark, stream2, bench, s_state, ckpt, cfg)
    q2.processAllAvailable()
    q2.stop()
    assert _committed_batches(s_state)[-1] == "s00000002"
    fh = spark.sql(f"SELECT xxhash64('{FOOTER}') AS h").collect()[0]["h"]
    paras = spark.read.parquet(f"{s_state}/paras/*")
    assert paras.filter(F.col("h") == fh).count() == 1
    # batch 3's own new paragraph DID enter the state
    nh = spark.sql(
        "SELECT xxhash64('fresh batch three body') AS h"
    ).collect()[0]["h"]
    assert paras.filter(F.col("h") == nh).count() == 1


def test_curate_stream_micro_batches_match_manual_incremental(spark, tmp_path):
    # stream two parquet files (id-ordered, one file per micro-batch)
    # through curate_stream; the committed state and kept sets must
    # equal a manual two-batch incremental run over the same splits
    from feast_spark.pipeline.curation import CurationConfig
    from feast_spark.pipeline.incremental import (
        _committed_batches,
        curate_stream,
        run_curation_incremental,
    )

    b1, b2, bench = _corpus_batches(spark)
    src = tmp_path / "src"
    src.mkdir()
    # file names chosen so listing order == id order
    b1.coalesce(1).write.parquet(str(src / "f0"))
    b2.coalesce(1).write.parquet(str(src / "f1"))
    schema = b1.schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    cfg = CurationConfig()
    s_state = str(tmp_path / "s_state")
    q = curate_stream(
        spark, stream, bench, s_state, str(tmp_path / "ckpt"), cfg
    )
    q.processAllAvailable()
    q.stop()

    assert _committed_batches(s_state) == ["s00000000", "s00000001"]
    kept_stream = {
        r["doc_id"]
        for r in spark.read.parquet(f"{s_state}/kept/*").collect()
    }

    m_state = str(tmp_path / "m_state")
    r1 = run_curation_incremental(spark, b1, bench, m_state, "b1", cfg)
    r1.release()
    r2 = run_curation_incremental(spark, b2, bench, m_state, "b2", cfg)
    r2.release()
    kept_manual = {
        r["doc_id"]
        for r in spark.read.parquet(f"{m_state}/kept/*").collect()
    }
    assert kept_stream == kept_manual


# ---------------------------------------------------------------------------
# minhash_dedup_incremental (fuzzy doc-grain state)
# ---------------------------------------------------------------------------


def _mh_vocab():
    import random, string

    rng = random.Random(9)
    return [
        "".join(rng.choices(string.ascii_lowercase, k=rng.randint(3, 9)))
        for _ in range(5000)
    ]


def _mh_doc(i, vocab, base=None, mutate=0):
    import random

    if base is None:
        return " ".join(random.Random(i).choices(vocab, k=60))
    toks = base.split()
    r = random.Random(1000 + i)
    for _ in range(mutate):
        toks[r.randrange(len(toks))] = r.choice(vocab)
    return " ".join(toks)


def test_minhash_incremental_cross_and_in_batch(spark):
    from feast_spark.operators.dedup import (
        minhash_dedup_incremental,
        release_dedup_caches,
    )

    v = _mh_vocab()
    b1 = [(i, _mh_doc(i, v)) for i in range(20)] + [(101, _mh_doc(3, v))]
    kept1, sigs1 = minhash_dedup_incremental(
        _docs(spark, b1), None, jaccard_threshold=0.5
    )
    assert sorted(r.doc_id for r in kept1.collect()) == list(range(20))
    sigs1 = sigs1.localCheckpoint()
    release_dedup_caches()

    b2 = [
        (201, _mh_doc(201, v)),                                  # fresh
        (202, _mh_doc(202, v, base=_mh_doc(7, v), mutate=3)),    # ~ prior 7
        (203, _mh_doc(5, v)),                                    # == prior 5
        (204, ""),                                               # blank
        (205, _mh_doc(205, v)),                                  # fresh
        (206, _mh_doc(206, v, base=_mh_doc(205, v), mutate=2)),  # ~ 205 in-batch
    ]
    kept2, sigs2 = minhash_dedup_incremental(
        _docs(spark, b2), sigs1, jaccard_threshold=0.5
    )
    assert sorted(r.doc_id for r in kept2.collect()) == [201, 204, 205]
    # blank doc survives but leaves NO signature in state
    assert sorted(r.id for r in sigs2.collect()) == [201, 205]
    release_dedup_caches()


def test_minhash_incremental_component_rep_cross_drop(spark):
    # A ~ B in-batch (A the min-id rep), A ~ prior, B NOT ~ prior:
    # the whole component drops — the corpus already holds its content
    from feast_spark.operators.dedup import (
        minhash_dedup_incremental,
        release_dedup_caches,
    )

    v = _mh_vocab()
    prior = [(1, _mh_doc(1, v))]
    _, sigs1 = minhash_dedup_incremental(
        _docs(spark, prior), None, jaccard_threshold=0.5
    )
    sigs1 = sigs1.localCheckpoint()
    release_dedup_caches()

    a = _mh_doc(301, v, base=_mh_doc(1, v), mutate=2)   # ~ prior 1
    b = _mh_doc(302, v, base=a, mutate=3)               # ~ a (chained)
    fresh = _mh_doc(303, v)
    kept, _ = minhash_dedup_incremental(
        _docs(spark, [(301, a), (302, b), (303, fresh)]),
        sigs1,
        jaccard_threshold=0.5,
    )
    assert sorted(r.doc_id for r in kept.collect()) == [303]
    release_dedup_caches()


def test_incremental_pipeline_neardup_stage(spark, tmp_path):
    from feast_spark.pipeline.curation import CurationConfig
    from feast_spark.pipeline.incremental import run_curation_incremental

    b1, b2, bench = _corpus_batches(spark)
    state = str(tmp_path / "state")
    cfg = CurationConfig(use_neardup=True)

    r1 = run_curation_incremental(spark, b1, bench, state, "b1", cfg)
    assert "after_neardup" in r1.stage_counts
    assert os.path.exists(os.path.join(state, "minhash", "batch=b1"))
    r1.release()

    # plant near-clones of three batch-1 docs into batch 2 (two word
    # swaps each) under fresh max ids
    max_id = b2.agg(F.max("doc_id")).collect()[0][0]
    seeds = b1.orderBy("doc_id").limit(3).collect()
    planted = []
    for k, row in enumerate(seeds):
        toks = row["text"].split()
        toks[min(2, len(toks) - 1)] = "zzzq"
        planted.append(
            (max_id + 1 + k, " ".join(toks), row["source"])
        )
    b2p = b2.select("doc_id", "text", "source").unionByName(
        spark.createDataFrame(planted, "doc_id long, text string, source string")
    )
    planted_ids = {p[0] for p in planted}

    r2 = run_curation_incremental(spark, b2p, bench, state, "b2", cfg)
    kept2 = {r["doc_id"] for r in r2.kept.collect()}
    assert not (kept2 & planted_ids)  # every planted near-clone dropped
    assert r2.stage_counts["after_neardup"] <= r2.stage_counts["input"] - len(planted)
    r2.release()

    # state committed for both batches; signatures unique per id
    mh = spark.read.parquet(f"{state}/minhash/*")
    assert mh.count() == mh.select("id").distinct().count()

    # resume returns the committed result without recompute
    r2b = run_curation_incremental(spark, b2p, bench, state, "b2", cfg)
    assert r2b.resumed and r2b.stage_counts == r2.stage_counts


def test_minhash_incremental_nonrep_member_match_kills_component(spark):
    # rule (c) with the prior match landing on a NON-rep member: the
    # whole component must drop, including the min-id representative
    # (half-overlap construction: wide est margins around threshold 0.3)
    from feast_spark.operators.dedup import (
        minhash_dedup_incremental,
        release_dedup_caches,
    )

    # 2/3-word-overlap chain P ~ B ~ A with A vs P disjoint-dominant
    # (measured signature estimates 12 / 17 / 5 of 32 against the
    # threshold-0.3 cut at 10); bands=16 makes the 2-row band collision
    # probability near-certain at these similarities
    v = _mh_vocab()
    x1 = [v[i] for i in range(30)]
    x2 = [v[30 + i] for i in range(30)]     # the only P <-> A overlap
    r3 = [v[100 + i] for i in range(30)]
    r4 = [v[130 + i] for i in range(30)]
    p_text = " ".join(x1 + x2 + [v[60 + i] for i in range(30)])
    b_text = " ".join(x1 + x2 + r3)         # ~2/3 vs P
    a_text = " ".join(x2 + r3 + r4)         # ~2/3 vs B, ~1/3 vs P

    _, sigs1 = minhash_dedup_incremental(
        _docs(spark, [(1, p_text)]), None, jaccard_threshold=0.3, bands=16
    )
    sigs1 = sigs1.localCheckpoint()
    release_dedup_caches()

    kept, _ = minhash_dedup_incremental(
        _docs(
            spark,
            [(400, a_text), (401, b_text), (402, " ".join(v[1000:1060]))],
        ),
        sigs1,
        jaccard_threshold=0.3,
        bands=16,
    )
    assert sorted(r_.doc_id for r_ in kept.collect()) == [402]
    release_dedup_caches()


def test_minhash_incremental_param_drift_fails_fast(spark, tmp_path):
    import json as _json

    import pytest as _pytest

    from feast_spark.pipeline.curation import CurationConfig
    from feast_spark.pipeline.incremental import run_curation_incremental

    b1, b2, bench = _corpus_batches(spark)
    state = str(tmp_path / "state")
    cfg = CurationConfig(use_neardup=True)
    run_curation_incremental(spark, b1, bench, state, "b1", cfg).release()
    sidecar = os.path.join(state, "minhash_params.json")
    assert os.path.exists(sidecar)
    params = _json.load(open(sidecar))
    params["num_hashes"] = 64
    _json.dump(params, open(sidecar, "w"))
    with _pytest.raises(ValueError, match="signature parameters"):
        run_curation_incremental(spark, b2, bench, state, "b2", cfg)
