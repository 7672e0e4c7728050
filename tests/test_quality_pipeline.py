"""Spark pipeline vs pandas oracle — the BASELINE.md correctness gate:
keep/drop F1 >= 0.99 and EXACT scrubbed-text equality per turn under
stable (conv_id, turn_idx) ordering."""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pandas as pd
import pytest

from feast_spark.fixtures import TRANSCRIPT_SCHEMA, generate_transcripts, transcripts_spark
from feast_spark.pipeline.oracle import f1_score, oracle_labels
from feast_spark.pipeline.quality import QualityConfig, run_quality_pipeline

N_CONVS = 120
DECISION_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)
CREATED_TS = datetime(2025, 6, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def transcripts_pdf() -> pd.DataFrame:
    return generate_transcripts(N_CONVS, seed=42, mega_every=50, mega_turns=300)


@pytest.fixture(scope="module")
def spark_labels(spark, transcripts_pdf):
    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    result = run_quality_pipeline(
        spark, df, QualityConfig(), run_id="t", decision_ts=DECISION_TS
    )
    out = (
        result.labels.toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    return out, result


@pytest.fixture(scope="module")
def expected(transcripts_pdf) -> pd.DataFrame:
    return oracle_labels(
        transcripts_pdf, QualityConfig(), decision_ts=DECISION_TS, created_ts=CREATED_TS
    )


def test_row_alignment(spark_labels, expected):
    actual, _ = spark_labels
    assert len(actual) == len(expected)
    assert actual["conv_id"].tolist() == expected["conv_id"].tolist()
    assert actual["turn_idx"].tolist() == expected["turn_idx"].tolist()


def test_keep_f1(spark_labels, expected):
    actual, _ = spark_labels
    f1 = f1_score(
        expected["keep"].to_numpy(dtype=bool), actual["keep"].to_numpy(dtype=bool)
    )
    assert f1 >= 0.99, f"keep/drop F1 {f1} below target"
    # shared rules code should actually give exact agreement
    assert (expected["keep"].to_numpy() == actual["keep"].to_numpy()).all()


def test_drop_reasons_match(spark_labels, expected):
    actual, _ = spark_labels
    a = actual["drop_reason"].where(actual["drop_reason"].notna(), None)
    e = expected["drop_reason"].where(expected["drop_reason"].notna(), None)
    assert a.tolist() == e.tolist()


def test_scrubbed_text_exact(spark_labels, expected):
    actual, _ = spark_labels
    mism = actual["scrubbed_text"].to_numpy() != expected["scrubbed_text"].to_numpy()
    assert not mism.any(), (
        f"{mism.sum()} scrubbed-text mismatches, first at "
        f"{actual.loc[np.argmax(mism), ['conv_id', 'turn_idx']].tolist()}"
    )


def test_dedup_resolved_edits(spark_labels, transcripts_pdf):
    actual, _ = spark_labels
    dup_keys = transcripts_pdf[
        transcripts_pdf.duplicated(["conv_id", "turn_idx"], keep=False)
    ]
    assert len(dup_keys) > 0, "fixture should plant duplicate keys"
    # output must contain each key exactly once
    assert not actual.duplicated(["conv_id", "turn_idx"]).any()


def test_lineage_counters(spark_labels):
    actual, result = spark_labels
    lineage = result.lineage.toPandas()
    assert lineage["row_count"].sum() == len(actual)
    kept_total = sum(m.get("kept", 0) for m in lineage["rule_hit_counters"])
    assert kept_total == int(actual["keep"].sum())


def test_distributed_generator_matches_local(spark, transcripts_pdf):
    sdf = transcripts_spark(spark, N_CONVS, seed=42, mega_every=50, mega_turns=300)
    got = (
        sdf.toPandas()
        .sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp = (
        transcripts_pdf.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_pipeline_rerun_idempotent_labels(spark, tmp_path):
    """Re-running the pipeline against the SAME feature table (the resume/
    retry scenario) appends a second conv-feature snapshot; the as-of join's
    created-ts tie-break picks the newest and the labels are unchanged —
    north_rule 'resumable from checkpoint' at pipeline granularity."""
    from datetime import datetime, timezone

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.quality import QualityConfig, run_quality_pipeline

    path = str(tmp_path / "conv_features")
    dts = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def run(run_id):
        res = run_quality_pipeline(
            spark, transcripts_spark(spark, 30, seed=21), QualityConfig(),
            run_id=run_id, decision_ts=dts, feature_table_path=path,
        )
        out = res.labels.orderBy("conv_id", "turn_idx").toPandas()
        res.scored.unpersist()
        return out

    l1 = run("attempt-1")
    l2 = run("attempt-2")  # retry against the same table
    for c in ["conv_id", "turn_idx", "keep", "drop_reason", "scrubbed_text"]:
        assert l1[c].tolist() == l2[c].tolist(), c
    # both snapshots live in the feature table (append-only history)
    hist = spark.read.parquet(path)
    n_convs = l1.conv_id.nunique()
    assert hist.count() == 2 * n_convs


def test_trained_lm_gate_flips_exactly_the_over_threshold_turns(spark, transcripts_pdf):
    """Opt-in QualityConfig(lm_model=...): the corpus-trained LM scores
    inside the existing Arrow pass; vs the default run, labels differ on
    EXACTLY the kept turns whose model ppl exceeds the threshold, each
    flipped to drop_reason='lm_perplexity'. Everything else — including
    scrubbed text — is byte-identical."""
    from pyspark.sql import functions as F

    from feast_spark.operators.lm import lm_score_texts, train_ngram_lm

    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    model = train_ngram_lm(
        df.where(F.col("role") == "assistant"),
        text_col="text",
        method="numpy",
        order=3,
        n_buckets=1 << 16,
    )
    base = run_quality_pipeline(
        spark, df, QualityConfig(), run_id="b", decision_ts=DECISION_TS
    ).labels.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    thr = 3.0
    gated = run_quality_pipeline(
        spark, df, QualityConfig(lm_model=model, lm_max_ppl=thr),
        run_id="g", decision_ts=DECISION_TS,
    ).labels.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (base["conv_id"] == gated["conv_id"]).all()
    assert (base["scrubbed_text"] == gated["scrubbed_text"]).all()
    # driver-side replay of the SAME kernel on the deduped turn order
    # the labels carry: join ppl onto the base frame via the raw text
    dedup = (
        transcripts_pdf.sort_values(["conv_id", "turn_idx", "ts", "text"])
        .groupby(["conv_id", "turn_idx"], as_index=False)
        .last()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    _, _, ppl = lm_score_texts(model, dedup["text"])
    over = ppl > thr
    # final keep = base keep minus the over-threshold turns
    exp_keep = base["keep"].to_numpy(bool) & ~over
    assert (gated["keep"].to_numpy(bool) == exp_keep).all()
    flipped = base["keep"].to_numpy(bool) & over
    assert flipped.sum() > 0  # the gate actually fires on this corpus
    assert (gated.loc[flipped, "drop_reason"] == "lm_perplexity").all()
    # under-threshold rows keep byte-identical reasons; over-threshold
    # rows that the heuristic TURN rules already dropped do too (rules
    # fire first) — only conv-level reasons yield to the turn-level gate
    heur_dropped = base["drop_reason"].isin(
        ["too_short", "language", "symbol_soup", "repetition"]
    ).to_numpy()
    same = ~over | (heur_dropped & over)
    br = base.loc[same, "drop_reason"].fillna("")
    gr = gated.loc[same, "drop_reason"].fillna("")
    assert (br.to_numpy() == gr.to_numpy()).all()


def test_agent_loop_rule_drops_later_copies(spark):
    """Opt-in loop rule: a normalized turn text repeated >= loop_min_repeats
    within one conversation keeps its FIRST occurrence and drops the later
    copies as 'agent_loop'; twice-repeated and short-ack turns survive;
    the default config stays byte-identical (rule fully gated)."""
    loop_text = "let me check the file again for the answer"
    base_ts = datetime(2024, 5, 1, tzinfo=timezone.utc)
    rows = []
    # conv A: 4 copies of the loop text (whitespace/case variants -> same
    # normalized hash), plus a unique turn
    variants = [loop_text, loop_text.upper(), "  " + loop_text, loop_text + " "]
    for i, v in enumerate(variants):
        rows.append(("convA", i, "assistant", v, None, base_ts.replace(minute=i)))
    rows.append(("convA", 4, "assistant", "here is the final answer now done",
                 None, base_ts.replace(minute=10)))
    # conv B: the same text repeated only TWICE -> under threshold, kept
    rows.append(("convB", 0, "assistant", loop_text, None, base_ts))
    rows.append(("convB", 1, "assistant", loop_text, None, base_ts.replace(minute=1)))
    # conv C: short ack repeated 5 times -> exempt via loop_min_words
    for i in range(5):
        rows.append(("convC", i, "user", "ok sure", None, base_ts.replace(minute=i)))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)

    cfg = QualityConfig(loop_min_repeats=3)
    res = run_quality_pipeline(spark, df, cfg, run_id="loop", decision_ts=DECISION_TS)
    out = {(r["conv_id"], r["turn_idx"]): r for r in res.labels.collect()}
    res.scored.unpersist()

    looped = [(c, i) for (c, i), r in out.items() if r["drop_reason"] == "agent_loop"]
    assert sorted(looped) == [("convA", 1), ("convA", 2), ("convA", 3)]
    assert all(not out[k]["keep"] for k in looped)
    # first occurrence + unique turn: not loop-dropped (may still fail
    # other rules independently — only assert the loop reason is absent)
    assert out[("convA", 0)]["drop_reason"] != "agent_loop"
    assert out[("convA", 4)]["drop_reason"] != "agent_loop"
    for k, r in out.items():
        if k[0] in ("convB", "convC"):
            assert r["drop_reason"] != "agent_loop"

    # gated off (default config): no agent_loop reason anywhere
    res0 = run_quality_pipeline(spark, df, QualityConfig(), run_id="loop0",
                                decision_ts=DECISION_TS)
    assert res0.labels.filter("drop_reason = 'agent_loop'").count() == 0
    res0.scored.unpersist()


def test_agent_loop_turn_rule_precedence(spark):
    """A loop copy that ALSO fails a turn rule keeps the turn-rule reason
    (turn rules fire first)."""
    base_ts = datetime(2024, 5, 1, tzinfo=timezone.utc)
    short = "k k k"  # 3 words -> passes loop_min_words, fails mean_word_len rule
    rows = [("convA", i, "assistant", short, None, base_ts.replace(minute=i))
            for i in range(4)]
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    cfg = QualityConfig(loop_min_repeats=3)
    res = run_quality_pipeline(spark, df, cfg, run_id="prec", decision_ts=DECISION_TS)
    reasons = {r["turn_idx"]: r["drop_reason"] for r in res.labels.collect()}
    res.scored.unpersist()
    assert all(v == "mean_word_len" for v in reasons.values()), reasons


# ------------------------------------------ round 5 s11: rule co-occurrence


def _naive_matrix(texts):
    """Independent python fold of rule_fail_bits into the co-fire matrix."""
    from feast_spark import rules

    bits = rules.rule_fail_bits(pd.Series(list(texts)))
    k = len(rules.RULE_ORDER)
    recs: dict[tuple[int, int], list[int]] = {}
    for b in bits:
        b = int(b)
        s = [i for i in range(k) if (b >> i) & 1]
        for x in s:
            for y in s:
                if y >= x:
                    c = recs.setdefault((x, y), [0, 0])
                    c[0] += 1
                    if x == y and b == 1 << x:
                        c[1] += 1
    return {
        (rules.RULE_ORDER[x], rules.RULE_ORDER[y]): tuple(v)
        for (x, y), v in recs.items()
    }


def test_rule_cooccurrence_matches_naive_fold(spark, transcripts_pdf):
    from feast_spark.pipeline.oracle import oracle_dedup_latest
    from feast_spark.pipeline.quality import rule_cooccurrence

    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    got = {
        (r["rule_a"], r["rule_b"]): (r["n_cofail"], r["n_exclusive"])
        for r in rule_cooccurrence(df).collect()
    }
    d = oracle_dedup_latest(transcripts_pdf).reset_index(drop=True)
    assert got == _naive_matrix(d["text"])


def test_rule_cooccurrence_plants_and_consistency(spark):
    from feast_spark import rules
    from feast_spark.pipeline.quality import rule_cooccurrence

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        ("c1", 0, "user", rules.RULE_MATRIX_PLANTS[0], None, ts0),
        ("c1", 1, "user", rules.RULE_MATRIX_PLANTS[1], None, ts0),
        ("c2", 0, "user", rules.RULE_MATRIX_PLANTS[2], None, ts0),
        ("c2", 1, "user", rules.RULE_MATRIX_PLANTS[3], None, ts0),
        ("c3", 0, "user", "This sentence is perfectly fine and should "
                          "pass all of the rules with ease today.", None, ts0),
    ]
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    got = {
        (r["rule_a"], r["rule_b"]): (r["n_cofail"], r["n_exclusive"])
        for r in rule_cooccurrence(df).collect()
    }
    # plant 0: symbol+digit+language+perplexity (4 rules -> 10 pairs);
    # plant 1: exclusive too_short; plant 2: repetition+toxicity;
    # plant 3: exclusive stopword_ratio; passing row contributes nothing
    assert got[("too_short", "too_short")] == (1, 1)
    assert got[("stopword_ratio", "stopword_ratio")] == (1, 1)
    assert got[("repetition", "toxicity")] == (1, 0)
    assert got[("repetition", "repetition")] == (1, 0)
    assert got[("symbol_ratio", "digit_ratio")] == (1, 0)
    assert got[("symbol_ratio", "perplexity")] == (1, 0)
    assert got[("digit_ratio", "language")] == (1, 0)
    assert len(got) == 4 + 6 + 1 + 3 + 1  # pairs of sizes C(4,2)+4, 1, C(2,2)+2, 1
    # every pair is (a <= b) in RULE_ORDER index terms, and diagonal
    # marginals bound their row/column co-fails
    order = {n: i for i, n in enumerate(rules.RULE_ORDER)}
    for (a, b), (c, _e) in got.items():
        assert order[a] <= order[b]
        assert c <= got[(a, a)][0] and c <= got[(b, b)][0]
    # bits never disagree with decide(): the lowest set bit's rule is
    # the pipeline drop_reason on the same texts
    texts = pd.Series([r[3] for r in rows])
    bits = rules.rule_fail_bits(texts)
    scored = rules.score_turns(texts)
    for b, reason in zip(bits, scored["drop_reason"]):
        if int(b) == 0:
            assert reason is None
        else:
            low = min(i for i in range(len(rules.RULE_ORDER)) if (int(b) >> i) & 1)
            assert reason == rules.RULE_ORDER[low]


def test_rule_threshold_sweep_matches_decide_rerun(spark, transcripts_pdf):
    # the curve is EXACTLY sum(keep) of the full rule chain re-run with
    # the swept threshold swapped in — for a 'gt' rule (symbol_ratio,
    # ungated) AND the gated 'lt' rule (stopword_ratio)
    import dataclasses

    from feast_spark import rules
    from feast_spark.pipeline.oracle import oracle_dedup_latest
    from feast_spark.pipeline.quality import rule_threshold_sweep

    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    d = oracle_dedup_latest(transcripts_pdf).reset_index(drop=True)
    s = d["text"].fillna("").astype(str)
    stats = rules.heuristic_stats(s)
    lang = rules.language_id(s, stats)
    ppl = rules.perplexity(s)
    for rule, grid in [
        ("symbol_ratio", [0.05, 0.15, 0.25, 0.5]),
        ("stopword_ratio", [0.02, 0.04, 0.1, 0.25]),
    ]:
        _, attr = rules.SWEEPABLE_RULES[rule]
        got = {
            r["threshold"]: (r["n_kept"], r["n_pass_others"], r["n_total"])
            for r in rule_threshold_sweep(df, rule, grid).collect()
        }
        for t in grid:
            cfg_t = dataclasses.replace(rules.RuleConfig(), **{attr: t})
            keep, _ = rules.decide(stats, lang, ppl, cfg_t)
            assert got[t][0] == int(keep.sum()), (rule, t)
            assert got[t][2] == len(d)
        # n_pass_others is the curve's ceiling and constant across grid
        ceilings = {v[1] for v in got.values()}
        assert len(ceilings) == 1
        assert all(v[0] <= v[1] for v in got.values())


def test_rule_threshold_sweep_boundary_and_validation(spark):
    # a stat EXACTLY on a grid point: 'gt' rules keep it there (fail is
    # strict >), 'lt' rules keep it there (fail is strict <)
    from feast_spark import rules
    from feast_spark.pipeline.quality import rule_threshold_sweep

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    # symbol_ratio = 2 symbols / 40 chars = 0.05 exactly (kernel-checked
    # below so the test's intent can't drift from heuristic_stats), and
    # every other rule passes — the curve isolates the swept rule
    text = "the cat sat on the mat with a dog now @@"
    stats = rules.heuristic_stats(pd.Series([text]))
    assert float(stats["symbol_ratio"].iloc[0]) == 0.05
    df = spark.createDataFrame(
        [("c1", 0, "user", text, None, ts0)], schema=TRANSCRIPT_SCHEMA
    )
    got = {
        r["threshold"]: r["n_kept"]
        for r in rule_threshold_sweep(
            df, "symbol_ratio", [0.01, 0.05, 0.2]
        ).collect()
    }
    assert got == {0.01: 0, 0.05: 1, 0.2: 1}
    with pytest.raises(ValueError):
        rule_threshold_sweep(df, "language", [0.1])
    with pytest.raises(ValueError):
        rule_threshold_sweep(df, "symbol_ratio", [])
    with pytest.raises(ValueError):
        rule_threshold_sweep(df, "symbol_ratio", [0.2, 0.1])


def test_rule_threshold_sweep_bounded_agg_plan(spark, transcripts_pdf):
    from feast_spark import rules
    from feast_spark.pipeline.quality import rule_threshold_sweep

    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    out = rule_threshold_sweep(df, "stopword_ratio", rules.RULE_SWEEP_GRID)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # dedup agg + cell agg + curve agg; the only python stage is the
    # Arrow scoring pass (two bools + one int64 out per turn), and the
    # grid joins broadcast-nested-loop (two bounded dims), never as a
    # shuffled cartesian
    assert plan.count("Exchange hashpartitioning") <= 3
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_rule_cooccurrence_bounded_agg_plan(spark, transcripts_pdf):
    from feast_spark.pipeline.quality import rule_cooccurrence

    df = spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA)
    plan = (
        rule_cooccurrence(df)._jdf.queryExecution().executedPlan().toString()
    )
    # dedup agg + bits agg + pair agg — and the only python stage is the
    # Arrow-batched scoring pass (one int64 out per turn)
    assert plan.count("Exchange hashpartitioning") <= 3
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan


# ---- round 5 session 12: exactly-once label snapshots ----


def test_quality_batch_commit_resume_resolve_and_crash(spark, tmp_path):
    import os

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.quality_incremental import (
        committed_label_batches,
        resolved_labels,
        run_quality_batch,
    )

    dts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    state = str(tmp_path / "qstate")
    t = transcripts_spark(spark, 40, seed=33)
    # every conversation spans both batches (turn split), so batch 2's
    # as-of join reads batch 1's committed feature snapshots
    b1 = t.filter("turn_idx < 3")
    b2 = t.filter("turn_idx >= 3")

    r1 = run_quality_batch(spark, b1, state, "b1", decision_ts=dts)
    r2 = run_quality_batch(spark, b2, state, "b2", decision_ts=dts)
    assert not r1.resumed and not r2.resumed
    assert committed_label_batches(state) == ["b1", "b2"]

    feat = f"{state}/conv_features"
    n_feat = spark.read.parquet(feat).count()
    # re-delivery of a committed id: returned from state, NO reprocessing
    # (feature table untouched), labels identical
    r1b = run_quality_batch(spark, b1, state, "b1", decision_ts=dts)
    assert r1b.resumed
    assert spark.read.parquet(feat).count() == n_feat
    assert sorted(map(tuple, r1b.labels.collect())) == sorted(
        map(tuple, r1.labels.collect())
    )

    res = resolved_labels(spark, state).collect()
    keys = [(r["conv_id"], r["turn_idx"]) for r in res]
    assert len(keys) == len(set(keys))
    assert len(keys) == r1.labels.count() + r2.labels.count()

    # re-delivery that RE-LABELS earlier turns under a later batch id:
    # the resolved view must carry the later id for those keys
    r3 = run_quality_batch(spark, b1, state, "b3", decision_ts=dts)
    assert not r3.resumed
    res2 = resolved_labels(spark, state)
    assert res2.filter("turn_idx < 3 AND batch_id != 'b3'").count() == 0

    # crash-retry idempotence: in a SECOND state dir, b2's first attempt
    # dies AFTER its feature append but BEFORE the labels _SUCCESS (the
    # marker is removed to simulate it); the retry's resolved labels are
    # identical to the clean run's — the orphaned feature snapshot is
    # absorbed by the as-of created-ts tie-break (same content, newest
    # wins)
    state_b = str(tmp_path / "qstate_crash")
    run_quality_batch(spark, b1, state_b, "b1", decision_ts=dts)
    run_quality_batch(spark, b2, state_b, "b2", decision_ts=dts)
    os.remove(f"{state_b}/labels/batch=b2/_SUCCESS")
    assert committed_label_batches(state_b) == ["b1"]
    feat_b = f"{state_b}/conv_features"
    with_orphan = spark.read.parquet(feat_b).count()
    rb2 = run_quality_batch(spark, b2, state_b, "b2", decision_ts=dts)
    assert not rb2.resumed
    assert committed_label_batches(state_b) == ["b1", "b2"]
    assert spark.read.parquet(feat_b).count() > with_orphan
    cols = ["conv_id", "turn_idx", "keep", "drop_reason", "scrubbed_text"]
    clean = sorted(map(tuple, r2.labels.select(*cols).collect()))
    retried = sorted(map(tuple, rb2.labels.select(*cols).collect()))
    assert clean == retried
    with pytest.raises(ValueError):
        run_quality_batch(spark, b1, state, "evil/../id", decision_ts=dts)


def test_quality_stream_matches_manual_batches(spark, tmp_path):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.quality_incremental import (
        committed_label_batches,
        quality_stream,
        resolved_labels,
        run_quality_batch,
    )

    dts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    t = transcripts_spark(spark, 30, seed=34)
    b1 = t.filter("turn_idx < 3")
    b2 = t.filter("turn_idx >= 3")
    src = tmp_path / "src"
    src.mkdir()
    b1.coalesce(1).write.parquet(str(src / "f0"))
    b2.coalesce(1).write.parquet(str(src / "f1"))

    s_state = str(tmp_path / "s_state")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = quality_stream(
        spark, stream, s_state, str(tmp_path / "ckpt"), decision_ts=dts
    )
    q.processAllAvailable()
    q.stop()
    assert committed_label_batches(s_state) == ["s00000000", "s00000001"]

    m_state = str(tmp_path / "m_state")
    # file order == micro-batch order (maxFilesPerTrigger=1)
    run_quality_batch(spark, spark.read.parquet(str(src / "f0")),
                      m_state, "s00000000", decision_ts=dts)
    run_quality_batch(spark, spark.read.parquet(str(src / "f1")),
                      m_state, "s00000001", decision_ts=dts)
    cols = ["conv_id", "turn_idx", "keep", "drop_reason", "scrubbed_text",
            "batch_id"]
    got = sorted(
        map(tuple, resolved_labels(spark, s_state).select(*cols).collect())
    )
    exp = sorted(
        map(tuple, resolved_labels(spark, m_state).select(*cols).collect())
    )
    assert got == exp


def test_quality_batch_profile_cards_and_drift(spark, tmp_path):
    import os

    import pytest as _pytest

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.profile import dataset_profile, profile_drift
    from feast_spark.pipeline.quality_incremental import (
        batch_profile_drift,
        profile_history,
        run_quality_batch,
    )

    dts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    state = str(tmp_path / "qstate_prof")
    t = transcripts_spark(spark, 30, seed=21)
    b1 = t.filter("turn_idx < 3")
    b2 = t.filter("turn_idx >= 3")

    # profile=False leaves no cards -> history raises
    run_quality_batch(spark, b1, state, "p0", decision_ts=dts)
    with _pytest.raises(FileNotFoundError):
        profile_history(spark, state)

    run_quality_batch(spark, b1, state, "p1", decision_ts=dts, profile=True)
    run_quality_batch(spark, b2, state, "p2", decision_ts=dts, profile=True)

    hist = profile_history(spark, state).collect()
    by_batch: dict = {}
    for r in hist:
        by_batch.setdefault(r["batch_id"], {})[r["metric"]] = r["value"]
    assert set(by_batch) == {"p1", "p2"}
    # persisted card == recomputing the card on the batch input
    direct = {r["metric"]: r["value"] for r in dataset_profile(b1).collect()}
    assert by_batch["p1"] == direct

    # stored-card drift == live drift on the raw inputs
    stored = {
        r["metric"]: (r["value_a"], r["value_b"], r["delta"], r["rel_units"])
        for r in batch_profile_drift(spark, state, "p1", "p2").collect()
    }
    live = {
        r["metric"]: (r["value_a"], r["value_b"], r["delta"], r["rel_units"])
        for r in profile_drift(b1, b2).collect()
    }
    assert stored == live

    # re-delivered committed id: card untouched (no recompute)
    card_dir = f"{state}/profile/batch=p1"
    mtimes = {
        f: os.path.getmtime(os.path.join(card_dir, f))
        for f in os.listdir(card_dir)
    }
    r = run_quality_batch(spark, b1, state, "p1", decision_ts=dts, profile=True)
    assert r.resumed
    assert mtimes == {
        f: os.path.getmtime(os.path.join(card_dir, f))
        for f in os.listdir(card_dir)
    }

    # crashed batch: card written, labels _SUCCESS removed -> excluded
    # from history and rejected by drift
    run_quality_batch(spark, b2, state, "p3", decision_ts=dts, profile=True)
    os.remove(f"{state}/labels/batch=p3/_SUCCESS")
    assert set(
        r["batch_id"] for r in profile_history(spark, state).collect()
    ) == {"p1", "p2"}
    with _pytest.raises(ValueError, match="not committed"):
        batch_profile_drift(spark, state, "p1", "p3")
    # committed batch without a card (p0) is a FileNotFoundError
    with _pytest.raises(FileNotFoundError, match="no persisted card"):
        batch_profile_drift(spark, state, "p0", "p1")
