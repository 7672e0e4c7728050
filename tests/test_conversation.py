"""Conversation operators (structure / windows / render) + Gopher
repetition stats + NFC normalization — value tests against brute-force
references and plan audits for the single-shuffle / map-only claims."""

from __future__ import annotations

import contextlib
import io
from datetime import datetime, timezone

import numpy as np
import pandas as pd
import pytest


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _turns(spark):
    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def t(c, i, role, text, tool=None, sec=0):
        return (c, i, role, text, tool, ts0.replace(second=sec % 60, minute=sec // 60))

    rows = [
        # c1: clean user/assistant alternation with one valid tool turn
        t("c1", 0, "user", "hello there", sec=0),
        t("c1", 1, "assistant", "hi how can I help", sec=1),
        t("c1", 2, "user", "run the search", sec=2),
        t("c1", 3, "tool", "search results here", tool="search", sec=3),
        # c2: role repeat + orphan tool + stray tool name + empty text
        t("c2", 0, "assistant", "I start uninvited", sec=0),  # bad_start
        t("c2", 1, "assistant", "and repeat myself", sec=1),  # repeat
        t("c2", 2, "tool", "orphan output", tool=None, sec=2),  # orphan+missing name
        t("c2", 3, "user", "   ", tool="search", sec=3),  # empty + stray tool
        # c3: duplicate (conv_id, turn_idx) keys — later ts must win
        t("c3", 0, "user", "v1 text", sec=0),
        t("c3", 0, "user", "v2 edited", sec=9),
        t("c3", 1, "assistant", "reply", sec=10),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def test_conversation_structure_flags(spark):
    from feast_spark.operators.conversation import conversation_structure

    out = {
        r["conv_id"]: r.asDict()
        for r in conversation_structure(_turns(spark)).collect()
    }
    c1 = out["c1"]
    assert c1["n_turns"] == 4 and c1["structure_ok"]
    assert c1["n_orphan_tools"] == 0  # tool directly after user is valid
    c2 = out["c2"]
    assert c2["bad_start"] and not c2["structure_ok"]
    assert c2["n_role_repeats"] == 1
    assert c2["n_orphan_tools"] == 1
    assert c2["n_missing_tool_name"] == 1
    assert c2["n_stray_tool_name"] == 1
    assert c2["n_empty"] == 1
    c3 = out["c3"]
    assert c3["n_turns"] == 2 and c3["structure_ok"]  # dedup kept 2 keys


def test_conversation_windows_brute_force(spark):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import conversation_windows

    budget = 40
    turns = transcripts_spark(spark, 30, seed=7, mega_every=10, mega_turns=60)
    got = (
        conversation_windows(turns, token_budget=budget)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # brute force on the deduped pandas view
    pdf = turns.toPandas()
    pdf = (
        pdf.sort_values(["conv_id", "turn_idx", "ts", "text"])
        .groupby(["conv_id", "turn_idx"], as_index=False)
        .last()
        .sort_values(["conv_id", "turn_idx"])
    )
    pdf["n_tokens"] = pdf["text"].fillna("").str.strip().str.split().str.len().fillna(0)
    recs = []
    for conv, g in pdf.groupby("conv_id"):
        toks = g["n_tokens"].tolist()
        idxs = g["turn_idx"].tolist()
        for i in range(len(toks)):
            total, start = 0, None
            for j in range(i, -1, -1):
                if total + toks[j] > budget:
                    break
                total += toks[j]
                start = j
            if start is None:
                recs.append((conv, idxs[i], toks[i], 0, -1, 0))
            else:
                recs.append(
                    (conv, idxs[i], toks[i], i - start + 1, idxs[start],
                     sum(toks[start : i + 1]))
                )
    exp = pd.DataFrame(
        recs, columns=["conv_id", "turn_idx", "n_tokens", "ctx_turns",
                       "ctx_start", "ctx_tokens"],
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for c in ["n_tokens", "ctx_turns", "ctx_start", "ctx_tokens"]:
        assert np.array_equal(
            got[c].to_numpy(dtype=np.int64), exp[c].to_numpy(dtype=np.int64)
        ), c


def test_render_offsets_are_line_starts(spark):
    from feast_spark.operators.conversation import render_conversations

    out = render_conversations(_turns(spark)).collect()
    for r in out:
        offs = [int(x) for x in r["offsets"].split(",")]
        assert len(offs) == r["n_turns"]
        assert offs[0] == 0
        lines = r["text"].split("\n")
        # each offset points at the start of its rendered line
        for off, line in zip(offs, lines):
            assert r["text"][off : off + len(line)] == line
        assert r["n_chars"] == len(r["text"])


def test_conversation_plans_single_exchange(spark):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import (
        conversation_structure,
        render_conversations,
    )

    turns = transcripts_spark(spark, 20, seed=1, mega_every=0)
    # structure: dedup-agg + window + final agg all hash-partition on
    # conv_id-prefixed keys; at most 2 exchanges (dedup keys ->
    # conv window/agg), never a cartesian product
    p = _plan(conversation_structure(turns))
    assert p.count("Exchange hashpartitioning") <= 2
    p2 = _plan(render_conversations(turns))
    assert p2.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in p and "CartesianProduct" not in p2


def test_gopher_repetition_matches_naive(spark):
    from pyspark.sql import functions as F

    from feast_spark.operators.repetition import (
        DEMO_LINE_SUFFIX,
        gopher_repetition,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(
        "doc_id", F.concat("text", F.lit(DEMO_LINE_SUFFIX)).alias("text")
    )
    got = (
        gopher_repetition(docs, line_sep=". ")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    from feast_spark.oracles import gopher_repetition_pdf

    exp = (
        gopher_repetition_pdf("/root/testdata/sf0.001")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        assert np.allclose(got[c], exp[c], rtol=0, atol=0), c  # bit-exact


def test_gopher_repetition_map_only(spark):
    from feast_spark.operators.repetition import gopher_repetition

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = _plan(gopher_repetition(docs))
    assert "Exchange" not in p  # zero shuffles: pure map pass


def test_gopher_kernel_crafted_values():
    from feast_spark.operators.repetition import repetition_stats_pdf

    df = repetition_stats_pdf(
        pd.Series(["l1\nl2\nl1\nl3\nl2\nl1", "a b c a b c a b c"])
    )
    assert df.loc[0, "dup_line_frac"] == pytest.approx(3 / 6)
    # "a b c" x3: top3gram = most common trigram (a,b,c) count 3 x 3 chars
    # over 9 token chars
    assert df.loc[1, "top3gram_char_frac"] == pytest.approx(1.0)
    # dup 5-grams: (a,b,c,a,b) occurs at positions 0 and 3 -> the union
    # of its [p, p+5) intervals covers all 9 tokens
    assert df.loc[1, "dup5gram_char_frac"] == pytest.approx(1.0)


def test_normalize_text_composes_and_collapses(spark):
    from feast_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [("cafe\u0301  \t x",), ("  plain  text ",), (None,)], "text string"
    )
    vals = [r["text_norm"] for r in normalize_text(df).collect()]
    assert vals[0] == "caf\u00e9 x"  # NFC-composed + collapsed
    assert vals[1] == "plain text"
    assert vals[2] == ""


def test_gopher_bullet_ellipsis_fractions():
    from feast_spark.operators.repetition import repetition_stats_pdf

    df = repetition_stats_pdf(
        pd.Series(
            [
                "- item one\n* item two\nplain line\nit trails off...",
                "  • indented bullet\nends with unicode…\nnothing",
                "no lines of interest",
            ]
        )
    )
    assert df.loc[0, "bullet_line_frac"] == pytest.approx(2 / 4)
    assert df.loc[0, "ellipsis_line_frac"] == pytest.approx(1 / 4)
    assert df.loc[1, "bullet_line_frac"] == pytest.approx(1 / 3)  # lstrip
    assert df.loc[1, "ellipsis_line_frac"] == pytest.approx(1 / 3)
    assert df.loc[2, "bullet_line_frac"] == 0.0
    assert df.loc[2, "ellipsis_line_frac"] == 0.0


def test_pack_conversations_mask_and_order(spark):
    from feast_spark.operators.bpe import train_bpe
    from feast_spark.operators.conversation import pack_conversations

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        ("c1", 0, "user", "aa bb", None, ts0),
        ("c1", 1, "assistant", "bb cc", None, ts0),
        ("c2", 0, "user", "cc", None, ts0),
        # duplicate key: later ts wins, earlier text must not be packed
        ("c2", 1, "assistant", "STALE", None, ts0),
        ("c2", 1, "assistant", "dd", None, ts0.replace(second=9)),
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    from pyspark.sql import functions as F

    from feast_spark.operators.conversation import _deduped

    rendered = _deduped(turns).select(
        F.concat("role", F.lit(": "), F.coalesce("text", F.lit(""))).alias(
            "text"
        )
    )
    model = train_bpe(rendered, num_merges=4)
    # huge seq_len: everything lands in sequence 0 -> easy to reason about
    out = pack_conversations(turns, model, seq_len=10_000).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_convs == 2
    assert len(r.token_ids) == len(r.loss_mask) == r.n_tokens
    # mask is 1 exactly on assistant-turn tokens: both convs have one
    # assistant turn and one user turn; user tokens must be masked 0
    assert 0 < sum(r.loss_mask) < r.n_tokens
    # the stale duplicate's text never contributes: re-pack without the
    # stale row -> identical sequence
    clean = turns.filter(F.col("text") != "STALE")
    r2 = pack_conversations(clean, model, seq_len=10_000).collect()[0]
    assert list(r.token_ids) == list(r2.token_ids)
    assert list(r.loss_mask) == list(r2.loss_mask)


def test_pack_conversations_boundary_crossing(spark):
    from pyspark.sql import functions as F

    from feast_spark.operators.bpe import train_bpe
    from feast_spark.operators.conversation import pack_conversations

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        (f"c{i}", 0, "assistant", "xx yy zz ww", None, ts0) for i in range(6)
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    model = train_bpe(
        turns.select(
            F.concat("role", F.lit(": "), "text").alias("text")
        ),
        num_merges=4,
    )
    small = pack_conversations(turns, model, seq_len=7)
    rows_s = sorted(small.collect(), key=lambda r: r.seq_id)
    total = sum(r.n_tokens for r in rows_s)
    # token conservation vs one giant sequence
    big = pack_conversations(turns, model, seq_len=10_000).collect()[0]
    assert total == big.n_tokens
    flat_ids = [t for r in rows_s for t in r.token_ids]
    flat_mask = [m for r in rows_s for m in r.loss_mask]
    assert flat_ids == list(big.token_ids)
    assert flat_mask == list(big.loss_mask)
    # all turns are assistant: mask all ones
    assert set(flat_mask) == {1}
    # every sequence but the last is exactly seq_len
    assert all(r.n_tokens == 7 for r in rows_s[:-1])


def test_conversation_pii_values(spark):
    from feast_spark.operators.conversation import conversation_pii

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        ("c1", 0, "user", "mail me a@b.com and c@d.org", None, ts0),
        ("c1", 1, "assistant", "ok will do", None, ts0),
        ("c1", 2, "user", "ssn is 123-45-6789", None, ts0),
        ("c2", 0, "user", "clean words only", None, ts0),
        # duplicate key: clean later version replaces a PII-laden draft
        ("c3", 0, "user", "leak 9.9.9.9", None, ts0),
        ("c3", 0, "user", "redacted already", None, ts0.replace(second=9)),
    ]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    out = {r["conv_id"]: r for r in conversation_pii(turns).collect()}
    c1 = out["c1"]
    assert c1["n_turns"] == 3 and c1["n_email"] == 2 and c1["n_ssn"] == 1
    assert c1["n_flagged_turns"] == 2
    assert c1["flagged_turn_frac"] == 2 / 3
    assert out["c2"]["n_flagged_turns"] == 0
    assert out["c2"]["flagged_turn_frac"] == 0.0
    # the stale PII draft was deduped away before counting
    assert out["c3"]["n_ipv4"] == 0 and out["c3"]["n_flagged_turns"] == 0


# ------------------------------------------------- isolated (no-cross) packing


def test_pack_conversations_isolated_conserves_and_never_crosses(spark):
    from pyspark.sql import functions as F

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.bpe import train_bpe
    from feast_spark.operators.conversation import (
        _deduped,
        pack_conversations,
    )

    turns = transcripts_spark(spark, 30, seed=7, mega_every=10, mega_turns=60)
    rendered = _deduped(turns).select(
        F.concat("role", F.lit(": "), F.coalesce("text", F.lit(""))).alias(
            "text"
        )
    )
    model = train_bpe(rendered, num_merges=8)
    iso = pack_conversations(
        turns, model, seq_len=48, cross_boundaries=False
    ).toPandas()
    cross = pack_conversations(turns, model, seq_len=48).toPandas()
    # conservation: both modes carry exactly the same total token stream
    assert iso["n_tokens"].sum() == cross["n_tokens"].sum()
    # per conversation: chunk_idx is 1..n, all but the last chunk full,
    # masks ride 1:1
    for conv, grp in iso.groupby("conv_id"):
        g = grp.sort_values("chunk_idx")
        assert list(g["chunk_idx"]) == list(range(1, len(g) + 1))
        assert (g["n_tokens"].iloc[:-1] == 48).all()
        assert 1 <= g["n_tokens"].iloc[-1] <= 48
    assert (
        iso["token_ids"].map(len) == iso["loss_mask"].map(len)
    ).all()
    # isolation: a sequence's tokens come from ONE conversation — implied
    # by the (conv_id, chunk_idx) key; cross-mode has multi-conv seqs on
    # this fixture, so the distinction is real
    assert (cross["n_convs"] > 1).any()


def test_turn_dedup_semantics_and_arm_parity(spark):
    """Planted cross-conv clones are caught beyond first occurrence;
    short turns are exempt; xxhash64 arm == portable arm bit-exactly."""
    from pyspark.sql import functions as F

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import turn_dedup

    t = transcripts_spark(spark, 40, seed=11, mega_every=20, mega_turns=60)
    idx = F.substring("conv_id", 2, 9).cast("int")
    clones = t.filter(F.pmod(idx, F.lit(4)) == 0).withColumn(
        "conv_id", F.concat("conv_id", F.lit("d"))
    )
    tt = t.unionByName(clones)
    port = turn_dedup(tt, key_method="portable").toPandas()
    xx = turn_dedup(tt, key_method="xxhash64").toPandas()
    key = ["conv_id", "turn_idx"]
    assert port.sort_values(key).reset_index(drop=True).equals(
        xx.sort_values(key).reset_index(drop=True)
    )
    # every clone's eligible assistant turn is a non-first copy of the
    # original conversation's turn: for each cloned conv there must be
    # dropped rows, and each keep=False row has a keep=True twin whose
    # (n_copies, n_words) agree
    dups = port[~port["keep"]]
    assert len(dups) > 0
    firsts = port[port["keep"]]
    assert (dups["copy_rank"] > 1).all()
    assert (firsts["copy_rank"] == 1).all()
    # group sanity: ranks within a copy group are 1..n_copies — join on
    # nothing observable except the counts
    assert (port["copy_rank"] <= port["n_copies"]).all()
    # min_words gate: no eligible row below the threshold
    assert (port["n_words"] >= 3).all()
    # cloned conv c...0d: its assistant turns >=3 words never keep when
    # the original precedes them lexicographically
    cloned = port[port["conv_id"].str.endswith("d")]
    # every (conv, turn) pair present in both original and clone with
    # identical word count -> the clone is dropped (the original's id
    # sorts first)
    both = cloned.merge(
        port[~port["conv_id"].str.endswith("d")].assign(
            conv_id=lambda d: d["conv_id"] + "d"
        ),
        on=key,
        suffixes=("_c", "_o"),
    )
    same = both[both["n_words_c"] == both["n_words_o"]]
    assert len(same) > 0
    assert not same["keep_c"].any()


def test_turn_dedup_xx_arm_sheds_text_before_exchange(spark):
    """The xxhash64 arm's window exchange must not carry the normalized
    string — only the 8-byte key plus the id/count columns."""
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import turn_dedup

    t = transcripts_spark(spark, 10, seed=3, mega_every=0)
    plan = turn_dedup(t, key_method="xxhash64")._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"Exchange hashpartitioning\(__k#\d+L", plan)
    assert m, plan[:2000]
    # tree text prints parents ABOVE the exchange: everything above must
    # be string-free — the normalized text is consumed map-side (the
    # child Project computes n_words + xxhash64 and drops it), so only
    # the 8-byte key crosses the wire
    above = plan[: m.start()]
    assert "__norm" not in above, above[:1500]


def test_conversation_repetition_hand_computed(spark):
    """Crafted conversation: runs of identical assistant texts produce
    exact run-length stats; whitespace variants collapse to one text."""
    from datetime import datetime, timezone

    from feast_spark.operators.conversation import conversation_repetition

    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = []
    # conv A assistant texts: x, x, y, x, x, x  -> max_run 3, repeats 3,
    # distinct 2 ('x  again'/'x again' collapse under ws normalization)
    seq = ["x again", "x  again", "y", "x again", "x again", "x again"]
    for i, txt in enumerate(seq):
        rows.append(("A", 2 * i, "user", "q", None, ts))
        rows.append(("A", 2 * i + 1, "assistant", txt, None, ts))
    # conv B: no assistant turns at all -> absent from output
    rows.append(("B", 0, "user", "hello", None, ts))
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    out = conversation_repetition(t, min_repeats=3).toPandas()
    assert set(out["conv_id"]) == {"A"}
    r = out.iloc[0]
    assert r["n_role_turns"] == 6
    assert r["n_distinct_texts"] == 2
    assert r["n_consec_repeats"] == 3
    assert r["max_run"] == 3
    assert bool(r["is_loop"])


def test_conversation_repetition_single_exchange(spark):
    """Lag window, run-id prefix sum, run-length window and final agg all
    reuse ONE conv_id exchange (hash(conv_id) satisfies the clustered
    distribution of (conv_id, run))."""
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import conversation_repetition

    t = transcripts_spark(spark, 10, seed=3, mega_every=0)
    plan = (
        conversation_repetition(t, pre_deduped=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan[:3000]


def test_sessionize_hand_computed(spark):
    """Crafted gaps around the threshold: strict inequality, first-turn
    sentinel, per-conversation restart."""
    from datetime import datetime, timedelta, timezone

    from feast_spark.operators.conversation import sessionize_turns

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    offsets = [0, 59, 119, 180]  # gaps 59s, 60s (NOT > 60), 61s
    rows = [
        ("A", i, "user", f"t{i}", None, t0 + timedelta(seconds=s))
        for i, s in enumerate(offsets)
    ] + [("B", 0, "user", "x", None, t0)]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = (
        sessionize_turns(t, gap_minutes=1)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
    )
    a = out[out["conv_id"] == "A"]
    assert list(a["gap_us"]) == [-1, 59_000_000, 60_000_000, 61_000_000]
    assert list(a["session_start"]) == [True, False, False, True]
    assert list(a["session_idx"]) == [1, 1, 1, 2]
    b = out[out["conv_id"] == "B"]
    assert list(b["session_idx"]) == [1] and list(b["gap_us"]) == [-1]


def test_sessionize_single_exchange(spark):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import sessionize_turns

    t = transcripts_spark(spark, 10, seed=3, mega_every=0)
    plan = (
        sessionize_turns(t, pre_deduped=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]


def test_conversation_contamination_values_and_plan(spark):
    """A planted benchmark n-gram is found in every conversation that
    contains it verbatim (across turn boundaries never matches); the
    benchmark side is broadcast and the corpus gram stream is pruned
    BEFORE any exchange."""
    from datetime import datetime, timezone

    from feast_spark.operators.conversation import (
        conversation_contamination,
    )

    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    phrase = "the quick brown fox jumps over the lazy"  # 8 words
    rows = [
        ("A", 0, "user", f"intro {phrase} outro", None, ts),
        ("A", 1, "assistant", phrase, None, ts),
        ("B", 0, "user", "the quick brown fox", None, ts),  # only half
        ("B", 1, "assistant", "jumps over the lazy", None, ts),
        ("C", 0, "user", "nothing related here at all whatsoever really",
         None, ts),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    bench = spark.createDataFrame([(phrase,)], "bench_text string")
    out = (
        conversation_contamination(t, bench, n=8)
        .toPandas()
        .set_index("conv_id")
    )
    assert bool(out.loc["A", "contaminated"])
    assert int(out.loc["A", "n_hit_grams"]) == 1  # distinct grams, not 2
    assert not bool(out.loc["B", "contaminated"])  # split across turns
    assert not bool(out.loc["C", "contaminated"])
    plan = (
        conversation_contamination(t, bench, n=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pii_entity_exposure_values(spark):
    """Crafted entities: same email in two convs -> cross_conv; twice in
    one conv -> n_occurrences 2 / n_convs 1; raw extraction (a phone
    inside an email's digits would still count — exposure, not scrub)."""
    from datetime import datetime, timezone

    from feast_spark.operators.conversation import pii_entity_exposure

    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        ("A", 0, "user", "mail a@b.com and a@b.com again", None, ts),
        ("B", 0, "user", "also a@b.com here", None, ts),
        ("B", 1, "user", "call 555-123-4567 now", None, ts),
        ("C", 0, "user", "nothing", None, ts),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = pii_entity_exposure(t).toPandas().set_index(["kind", "entity"])
    em = out.loc[("email", "a@b.com")]
    assert em["n_occurrences"] == 3 and em["n_convs"] == 2
    assert em["first_conv"] == "A" and bool(em["cross_conv"])
    ph = out.loc[("phone", "555-123-4567")]
    assert ph["n_occurrences"] == 1 and not bool(ph["cross_conv"])
    assert len(out) == 2  # conv C contributes nothing


def test_pii_entity_exposure_two_bounded_aggs(spark):
    """Plan: extraction is map-only; the first shuffle keys include
    conv_id (mega-entity skew pre-reduced), the second is entity-keyed."""
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import pii_entity_exposure

    t = transcripts_spark(spark, 20, seed=5, mega_every=0)
    plan = (
        pii_entity_exposure(t, pre_deduped=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    ex = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    conv_keyed = [e for e in ex if "conv_id" in e and "entity" in e]
    entity_keyed = [e for e in ex if "conv_id" not in e and "entity" in e]
    assert conv_keyed and entity_keyed, ex
    assert "CartesianProduct" not in plan


def test_reply_latency_hand_computed(spark):
    """Crafted pairs: assistant AND tool replies count, a conversation-
    final user turn doesn't, no-reply conversations get the -1 sentinel
    and exact integer microsecond sums."""
    from datetime import datetime, timedelta, timezone

    from feast_spark.operators.conversation import reply_latency

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def r(c, i, role, sec):
        return (c, i, role, f"{role} text", None, t0 + timedelta(seconds=sec))

    rows = [
        r("A", 0, "user", 0),
        r("A", 1, "assistant", 5),
        r("A", 2, "user", 10),
        r("A", 3, "tool", 12),
        r("A", 4, "user", 20),  # conversation-final user turn: no reply
        r("B", 0, "system", 0),
        r("B", 1, "assistant", 1),  # no user turns at all
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = reply_latency(t).toPandas().set_index("conv_id").sort_index()
    a = out.loc["A"]
    assert (a["n_user_turns"], a["n_replies"]) == (3, 2)
    assert a["total_latency_us"] == 7_000_000
    assert a["max_latency_us"] == 5_000_000
    b = out.loc["B"]
    assert (b["n_user_turns"], b["n_replies"]) == (0, 0)
    assert b["total_latency_us"] == 0 and b["max_latency_us"] == -1


def test_reply_latency_single_exchange(spark):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import reply_latency

    t = transcripts_spark(spark, 10, seed=3, mega_every=0)
    plan = (
        reply_latency(t, pre_deduped=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]


def test_tool_transitions_hand_computed(spark):
    """^START sentinel per conversation, self-edges, n_convs counts
    DISTINCT conversations via the pre-agg (never a count-distinct)."""
    from datetime import datetime, timedelta, timezone

    from feast_spark.operators.conversation import tool_transitions

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def r(c, i, role, tool, sec):
        return (c, i, role, "x", tool, t0 + timedelta(seconds=sec))

    rows = [
        r("A", 0, "user", None, 0),
        r("A", 1, "tool", "search", 1),
        r("A", 2, "user", None, 2),
        r("A", 3, "tool", "search", 3),
        r("A", 4, "user", None, 4),
        r("A", 5, "tool", "browse", 5),
        r("B", 0, "user", None, 0),
        r("B", 1, "tool", "browse", 1),
        r("C", 0, "user", None, 0),
        r("C", 1, "tool", "search", 1),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = (
        tool_transitions(t)
        .toPandas()
        .set_index(["prev_tool", "tool"])
        .sort_index()
    )
    assert out.loc[("^START", "search")].tolist() == [2, 2]  # A and C
    assert out.loc[("^START", "browse")].tolist() == [1, 1]
    assert out.loc[("search", "search")].tolist() == [1, 1]
    assert out.loc[("search", "browse")].tolist() == [1, 1]
    assert len(out) == 4


def test_tool_transitions_two_exchanges(spark):
    """conv window exchange is REUSED by the (edge, conv) pre-agg
    (hash(conv_id) satisfies any clustering containing conv_id); only
    the final edge-keyed agg adds a second exchange."""
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import tool_transitions

    t = transcripts_spark(spark, 10, seed=3, mega_every=0)
    plan = (
        tool_transitions(t, pre_deduped=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan[:3000]


def test_turn_novelty_hand_computed(spark):
    """Global first occurrence under (conv_id, turn_idx) order; per-turn
    DISTINCT grams (repeats inside one turn count once); short turns
    carry no row."""
    from datetime import datetime, timezone

    from feast_spark.operators.conversation import turn_novelty

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        ("A", 0, "user", "a b c", None, t0),        # grams: 'a b', 'b c'
        ("A", 1, "user", "a b a b", None, t0),      # distinct: 'a b', 'b a'
        ("B", 0, "user", "b c d", None, t0),        # 'b c' stale, 'c d' novel
        ("B", 1, "user", "solo", None, t0),         # <2 words: no row
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = (
        turn_novelty(t, n=2)
        .toPandas()
        .set_index(["conv_id", "turn_idx"])
        .sort_index()
    )
    assert out.loc[("A", 0)].tolist() == [2, 2]
    assert out.loc[("A", 1)].tolist() == [2, 1]  # 'b a' novel, 'a b' stale
    assert out.loc[("B", 0)].tolist() == [2, 1]
    assert ("B", 1) not in out.index and len(out) == 3


def test_turn_novelty_two_exchanges(spark):
    """One gram-keyed exchange (first-occurrence window) + one turn-keyed
    agg exchange; the novelty bit rides the row — no join."""
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import turn_novelty

    t = transcripts_spark(spark, 10, seed=3, mega_every=0)
    df = turn_novelty(t, n=8, pre_deduped=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan[:3000]
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_turn_length_trend_hand_computed(spark):
    """Exact integer slope pair: descending word counts give a negative
    numerator; a single role turn gives den == 0; non-role turns are
    invisible to positions."""
    from datetime import datetime, timedelta, timezone

    from feast_spark.operators.conversation import turn_length_trend

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def r(c, i, role, text, sec):
        return (c, i, role, text, None, t0 + timedelta(seconds=sec))

    rows = [
        r("A", 0, "user", "ignored words here entirely", 0),
        r("A", 1, "assistant", "one two three four", 1),   # w=4, i=0
        r("A", 2, "user", "u", 2),
        r("A", 3, "assistant", "five six", 3),             # w=2, i=1
        r("B", 0, "assistant", "only reply", 0),           # n=1 -> den 0
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = turn_length_trend(t).toPandas().set_index("conv_id").sort_index()
    a = out.loc["A"]
    # n=2, sum_w=6, sum_iw=2, sum_i=1, sum_i2=1
    assert a["n_role_turns"] == 2 and a["total_words"] == 6
    assert a["slope_num"] == 2 * 2 - 1 * 6 == -2
    assert a["slope_den"] == 2 * 1 - 1 * 1 == 1
    b = out.loc["B"]
    assert b["n_role_turns"] == 1 and b["slope_den"] == 0


def test_turn_length_trend_single_exchange(spark):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import turn_length_trend

    t = transcripts_spark(spark, 10, seed=3, mega_every=0)
    plan = (
        turn_length_trend(t, pre_deduped=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]


def test_conversation_forks_hand_computed(spark):
    """Planted fork pair shares a 2-turn prefix; a whitespace-variant
    prefix still groups (normalization); a 1-turn conversation carries
    no fingerprint; a lone prefix (< min_group) is excluded."""
    from datetime import datetime, timedelta, timezone

    from feast_spark.operators.conversation import conversation_forks

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def r(c, i, role, text, sec=0):
        return (c, i, role, text, None, t0 + timedelta(seconds=sec))

    rows = [
        # A and B fork after the shared 2-turn prefix; B's prefix text
        # differs only in whitespace (must normalize to the same group)
        r("A", 0, "user", "find the report"),
        r("A", 1, "assistant", "searching now"),
        r("A", 2, "tool", "result one"),
        r("B", 0, "user", "  find   the report "),
        r("B", 1, "assistant", "searching\tnow"),
        r("B", 2, "tool", "a different result"),
        # C: unique prefix — no group at min_group=2
        r("C", 0, "user", "something else"),
        r("C", 1, "assistant", "ok"),
        # D: single turn — shorter than k, no fingerprint at all
        r("D", 0, "user", "find the report"),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = conversation_forks(t, k=2, min_group=2).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["n_convs"] == 2
    assert out.iloc[0]["first_conv"] == "A"


def test_conversation_forks_plan_bounded(spark):
    """The rn <= k filter must compile to WindowGroupLimit (a
    mega-conversation ships at most k rows map-side) and the whole
    operator runs in exactly two hash exchanges (conv, then prefix)."""
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import conversation_forks

    t = transcripts_spark(spark, 10, seed=3, mega_every=0)
    plan = (
        conversation_forks(t, pre_deduped=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan, plan[:3000]
    assert plan.count("Exchange hashpartitioning") == 2, plan[:3000]


def test_assistant_templates_hand_computed(spark):
    """Digit runs mask to one template across distinct texts; n_convs is
    distinct conversations while n_turns counts occurrences; short
    templates (< min_words) and other roles are excluded."""
    from datetime import datetime, timedelta, timezone

    from feast_spark.operators.conversation import assistant_templates

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def r(c, i, role, text):
        return (c, i, role, text, None, t0 + timedelta(seconds=i))

    rows = [
        r("A", 0, "user", "request completed in 1 ms"),  # wrong role
        r("A", 1, "assistant", "request completed in 183 ms"),
        r("A", 3, "assistant", "request completed in 7 ms"),
        r("B", 0, "assistant", "request  completed in\t42 ms"),  # ws variant
        r("B", 1, "assistant", "found 9 results"),  # 3 words, count 1
        r("C", 0, "assistant", "ok 123"),  # 2 words < min_words
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = (
        assistant_templates(t, min_count=2, min_words=3)
        .toPandas()
        .set_index("template")
    )
    assert len(out) == 1
    row = out.loc["request completed in 0 ms"]
    assert row["n_turns"] == 3
    assert row["n_convs"] == 2
    assert row["first_conv"] == "A"


def test_assistant_templates_two_exchanges(spark):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import assistant_templates

    t = transcripts_spark(spark, 10, seed=3, mega_every=0)
    plan = (
        assistant_templates(t, pre_deduped=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan[:3000]


def test_role_patterns_hand_computed(spark):
    """Pattern truncates at max_turns while n_turns_total sums FULL
    conversation lengths; identical shapes group across conversations."""
    from datetime import datetime, timedelta, timezone

    from feast_spark.operators.conversation import role_patterns

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def r(c, i, role):
        return (c, i, role, f"t{i}", None, t0 + timedelta(seconds=i))

    rows = (
        [r("A", i, ["user", "assistant"][i % 2]) for i in range(2)]
        + [r("B", i, ["user", "assistant"][i % 2]) for i in range(2)]
        # C runs past max_turns=3: pattern truncates, count doesn't
        + [r("C", i, ["user", "assistant"][i % 2]) for i in range(5)]
    )
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = (
        role_patterns(t, max_turns=3).toPandas().set_index("role_pattern")
    )
    ab = out.loc["user,assistant"]
    assert ab["n_convs"] == 2 and ab["n_turns_total"] == 4
    c = out.loc["user,assistant,user"]
    assert c["n_convs"] == 1 and c["n_turns_total"] == 5


def test_role_patterns_two_exchanges(spark):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import role_patterns

    t = transcripts_spark(spark, 10, seed=3, mega_every=0)
    plan = (
        role_patterns(t, pre_deduped=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan[:3000]


def test_turn_neardup_pairs_planted(spark):
    """Planted near-identical assistant turns across conversations are
    detected; exact-equal short turns below min_words are not; the pair
    ordering contract (composite a < b) holds."""
    from datetime import datetime, timedelta, timezone

    from feast_spark.operators.conversation import turn_neardup_pairs

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    base = (
        "please run the integration test suite and report every failing "
        "case with a full stack trace attached"
    )

    def r(c, i, role, text):
        return (c, i, role, text, None, t0 + timedelta(seconds=i))

    rows = [
        r("A", 0, "user", "kick off the tests"),
        r("A", 1, "assistant", base + " for build 4711"),
        r("B", 0, "user", "run tests please"),
        r("B", 1, "assistant", base + " for build 9042 thanks"),
        # C: unrelated long assistant turn — no pair
        r("C", 0, "assistant",
          "completely different content about unrelated topics entirely "
          "with no overlap whatsoever in any shingle of this response"),
        # D/E: identical but under min_words — excluded
        r("D", 0, "assistant", "ok done"),
        r("E", 0, "assistant", "ok done"),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = turn_neardup_pairs(t, min_words=5, jaccard_threshold=0.4).toPandas()
    assert len(out) == 1
    p = out.iloc[0]
    assert (p["conv_a"], p["idx_a"], p["conv_b"], p["idx_b"]) == ("A", 1, "B", 1)
    assert 0.4 <= p["jaccard"] < 1.0


def test_turn_neardup_matches_naive_oracle(spark):
    """Operator output == the shared naive-LSH replay on the fixture
    with planted clones (the driver query's exact setup at small n)."""
    from pyspark.sql import functions as F

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import turn_neardup_pairs
    from feast_spark.oracles import turn_neardup_pdf

    import __spark_entry__ as entry

    got = (
        entry.q_turn_neardup(spark, "unused")
        .toPandas()
        .sort_values(["conv_a", "idx_a", "conv_b", "idx_b"])
        .reset_index(drop=True)
    )
    exp = (
        turn_neardup_pdf()
        .sort_values(["conv_a", "idx_a", "conv_b", "idx_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) and len(got) > 0
    for c in ("conv_a", "idx_a", "conv_b", "idx_b"):
        assert got[c].tolist() == exp[c].tolist(), c
    assert max(abs(a - b) for a, b in zip(got["jaccard"], exp["jaccard"])) < 1e-12


def test_assistant_echo_planted_overlap_and_exclusions(spark):
    from feast_spark.operators.conversation import assistant_echo

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        # full echo: assistant repeats the user's text verbatim
        ("e1", 0, "user", "alpha beta gamma delta", None, ts0),
        ("e1", 1, "assistant", "alpha beta gamma delta", None, ts0),
        # zero echo: disjoint trigrams
        ("e1", 2, "user", "one two three four five", None, ts0),
        ("e1", 3, "assistant", "six seven eight nine ten", None, ts0),
        # partial echo: shares exactly 'p q r' with the prev turn
        ("e2", 0, "user", "p q r unrelated tail", None, ts0),
        ("e2", 1, "assistant", "p q r different ending", None, ts0),
        # excluded rows: conversation-opening assistant turn (no prev),
        # short assistant turn (< n words), NULL-text assistant turn
        ("e3", 0, "assistant", "I open the conversation", None, ts0),
        ("e4", 0, "user", "context words here now", None, ts0),
        ("e4", 1, "assistant", "too short", None, ts0),
        ("e4", 2, "assistant", None, None, ts0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in assistant_echo(df, n=3).collect()
    }
    u = 1 << 20
    assert out[("e1", 1)]["n_grams"] == 2 and out[("e1", 1)]["echo_units"] == u
    assert out[("e1", 3)]["n_echoed"] == 0 and out[("e1", 3)]["echo_units"] == 0
    # 'p q r different ending' has 3 trigrams, exactly 1 ('p q r') echoed
    e2 = out[("e2", 1)]
    assert (e2["n_grams"], e2["n_echoed"]) == (3, 1)
    assert e2["echo_units"] == (1 * u) // 3
    # opener / short / NULL rows carry no output row
    assert ("e3", 0) not in out
    assert ("e4", 1) not in out and ("e4", 2) not in out
    # user turns never emit rows
    assert all(k[0] != "e4" or k[1] == 1 for k in out if k[0] == "e4")


def test_assistant_echo_dedups_before_lag(spark):
    # the edited duplicate of turn 0 (later ts) must be what turn 1 sees
    from feast_spark.operators.conversation import assistant_echo

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    ts1 = datetime(2026, 1, 1, 0, 0, 9, tzinfo=timezone.utc)
    rows = [
        ("d1", 0, "user", "stale version of context", None, ts0),
        ("d1", 0, "user", "fresh words entirely different", None, ts1),
        ("d1", 1, "assistant", "fresh words entirely different", None, ts1),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    [r] = assistant_echo(df, n=3).collect()
    assert r["echo_units"] == 1 << 20  # echoes the LATEST turn-0 text


def test_assistant_echo_plan_single_conv_window_no_join(spark):
    from feast_spark.operators.conversation import assistant_echo

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [("c", 0, "user", "a b c d", None, ts0),
         ("c", 1, "assistant", "a b c d", None, ts0)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    plan = (
        assistant_echo(df, pre_deduped=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # no join anywhere (the predecessor arrives via lag), exactly one
    # exchange: hashpartitioning(conv_id) for the window sort
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]


def test_conversation_language_modes_and_switches(spark):
    import datetime as dt

    from feast_spark.operators.conversation import conversation_language

    TS = dt.datetime(2026, 1, 1)
    en = "the and is with for this that have from they"
    de = "der die und ist nicht das ein ich sie wir"
    rows = [
        # c1: en -> de -> en -> de = 3 switches, mode tie en/de -> 'de'
        ("c1", 0, "user", en, None, TS),
        ("c1", 1, "assistant", de, None, TS),
        ("c1", 2, "user", en, None, TS),
        ("c1", 3, "assistant", de, None, TS),
        # c2: all en, 0 switches
        ("c2", 0, "user", en, None, TS),
        ("c2", 1, "assistant", en, None, TS),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = {r["conv_id"]: r for r in conversation_language(df).collect()}
    c1 = out["c1"]
    assert (c1["n_turns"], c1["n_langs"], c1["n_switches"]) == (4, 2, 3)
    assert c1["lang_mode"] == "de"  # tie -> lexicographically smallest
    c2 = out["c2"]
    assert (c2["lang_mode"], c2["n_switches"]) == ("en", 0)


def test_conversation_language_dedups_latest(spark):
    import datetime as dt

    from feast_spark.operators.conversation import conversation_language

    en = "the and is with for this that have from they"
    de = "der die und ist nicht das ein ich sie wir"
    df = spark.createDataFrame(
        [
            ("c1", 0, "user", de, None, dt.datetime(2026, 1, 1)),
            ("c1", 0, "user", en, None, dt.datetime(2026, 1, 2)),  # latest
            ("c1", 1, "assistant", en, None, dt.datetime(2026, 1, 1)),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    [r] = conversation_language(df).collect()
    assert (r["lang_mode"], r["n_switches"], r["n_turns"]) == ("en", 0, 2)


def test_conversation_integrity_hand_computed(spark):
    # round 5 session 8: dup keys, index gaps, ts inversions, span
    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def t(c, i, sec):
        return (c, i, "user", "x", None, ts0.replace(minute=sec // 60, second=sec % 60))

    rows = [
        # c1: clean 0..2, monotonic
        t("c1", 0, 0), t("c1", 1, 5), t("c1", 2, 10),
        # c2: dup key at 0 (two deliveries), gap (0,2), inversion at 2
        t("c2", 0, 0), t("c2", 0, 30), t("c2", 2, 7),
        # c3: first_idx != 0, equal ts (NOT an inversion — strict <)
        t("c3", 1, 4), t("c3", 2, 4),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    from feast_spark.operators.conversation import conversation_integrity

    got = {
        r["conv_id"]: r.asDict()
        for r in conversation_integrity(df).collect()
    }
    c1 = got["c1"]
    assert (c1["n_rows_raw"], c1["n_dup_keys"], c1["n_idx_gaps"]) == (3, 0, 0)
    assert c1["n_ts_inversions"] == 0 and c1["integrity_ok"]
    assert c1["span_ms"] == 10_000
    c2 = got["c2"]
    # dedup keeps ts=30 for key 0; turn 2 at ts=7 < 30 -> inversion
    assert (c2["n_rows_raw"], c2["n_turns"], c2["n_dup_keys"]) == (3, 2, 1)
    assert (c2["n_idx_gaps"], c2["n_ts_inversions"]) == (1, 1)
    assert c2["span_ms"] == 30_000 - 7_000
    assert not c2["integrity_ok"]
    c3 = got["c3"]
    assert c3["first_idx"] == 1 and c3["n_ts_inversions"] == 0
    assert not c3["integrity_ok"]  # first_idx != 0


def test_conversation_integrity_two_exchanges(spark):
    # key-grain agg -> conv window -> conv agg: exactly two exchanges
    # (the conv agg reuses the window's hashpartitioning(conv_id))
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import conversation_integrity

    t = transcripts_spark(spark, 10, seed=7)
    plan = (
        conversation_integrity(t)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan[:3000]


# ---------------------------------------------------------------------------
# pii_echo (round 5 session 9)
# ---------------------------------------------------------------------------


def _pii_turns(spark):
    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def t(c, i, role, text, sec=0):
        return (c, i, role, text, None, ts0.replace(second=sec % 60, minute=sec // 60))

    rows = [
        # c1: user introduces an email at 0; assistant echoes it TWICE
        t("c1", 0, "user", "mail me at a@x.com please", 0),
        t("c1", 1, "assistant", "sure, a@x.com it is", 1),
        t("c1", 2, "user", "thanks", 2),
        t("c1", 3, "assistant", "sent to a@x.com", 3),
        # c2: ASSISTANT introduces the email first -> filtered out
        t("c2", 0, "user", "what is support's address", 0),
        t("c2", 1, "assistant", "write to help@y.org", 1),
        t("c2", 2, "user", "ok help@y.org noted", 2),
        # c3: user email never echoed; plus a phone echoed once
        t("c3", 0, "user", "I am b@z.net, call 555-123-4567", 0),
        t("c3", 1, "assistant", "calling 555-123-4567 now", 1),
        # c4: duplicate-key delivery — edited later row removes the email,
        # so after latest-per-key dedup the entity never existed
        t("c4", 0, "user", "my mail is gone@old.com", 0),
        t("c4", 1, "assistant", "ok gone@old.com", 1),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    from pyspark.sql import functions as F

    edited = (
        df.filter((F.col("conv_id") == "c4"))
        .withColumn("text", F.lit("redacted"))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 5 SECONDS"))
    )
    return df.unionByName(edited)


def test_pii_echo_hand_computed(spark):
    from feast_spark.operators.conversation import pii_echo

    out = {
        (r["conv_id"], r["kind"], r["entity"]): r.asDict()
        for r in pii_echo(_pii_turns(spark)).collect()
    }
    e1 = out[("c1", "email", "a@x.com")]
    assert e1["first_src_idx"] == 0
    assert e1["n_echoes"] == 2 and e1["first_echo_idx"] == 1 and e1["echoed"]
    # assistant-introduced entity is NOT a user->assistant leak
    assert ("c2", "email", "help@y.org") not in out
    e3 = out[("c3", "email", "b@z.net")]
    assert e3["n_echoes"] == 0 and e3["first_echo_idx"] == -1 and not e3["echoed"]
    p3 = out[("c3", "phone", "555-123-4567")]
    assert p3["n_echoes"] == 1 and p3["first_echo_idx"] == 1
    # c4's entity was removed by the later-ts edit before extraction
    assert not any(c == "c4" for (c, _, _) in out)


def test_pii_echo_matches_python_replay(spark):
    import re

    from feast_spark.fixtures import generate_transcripts
    from feast_spark.operators.conversation import pii_echo
    from feast_spark.rules import SCRUB_PATTERNS

    pdf = generate_transcripts(60, seed=11)
    df = spark.createDataFrame(pdf)
    got = {
        (r["conv_id"], r["kind"], r["entity"]): (
            r["first_src_idx"],
            r["n_echoes"],
            r["first_echo_idx"],
        )
        for r in pii_echo(df).collect()
    }
    # naive replay: latest-per-key dedup, per-occurrence scan
    d = (
        pdf.sort_values(["ts", "text"])
        .groupby(["conv_id", "turn_idx"], as_index=False)
        .last()
    )
    pats = {n: re.compile(p) for n, p, _ in SCRUB_PATTERNS if n in ("email", "phone")}
    occ: dict = {}
    for _, row in d.iterrows():
        for kind, pat in pats.items():
            for m in pat.findall(row["text"] or ""):
                occ.setdefault((row["conv_id"], kind, m), []).append(
                    (int(row["turn_idx"]), row["role"])
                )
    want = {}
    for key, lst in occ.items():
        lst.sort()
        if lst[0][1] != "user":
            continue
        echoes = [i for i, r in lst if r == "assistant"]
        want[key] = (lst[0][0], len(echoes), min(echoes) if echoes else -1)
    assert got == want and len(want) > 0


def test_pii_echo_single_agg_no_join(spark):
    from feast_spark.operators.conversation import pii_echo

    plan = _plan(pii_echo(_pii_turns(spark), kinds=("email",)))
    assert "Join" not in plan and "Window" not in plan


# ---------------------------------------------------------------------------
# tool_error_stats (round 5 session 9)
# ---------------------------------------------------------------------------


def _tool_turns(spark):
    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def t(c, i, role, text, tool=None, sec=0):
        return (c, i, role, text, tool, ts0.replace(second=sec % 60, minute=sec // 60))

    rows = [
        t("c1", 0, "user", "search for x"),
        t("c1", 1, "tool", "3 results found", "search", 1),
        t("c1", 2, "tool", "Error: upstream timed out", "search", 2),
        t("c2", 0, "tool", "Traceback (most recent call last):", "exec", 0),
        t("c2", 1, "tool", "terror and exceptional are fine words", "exec", 1),
        t("c2", 2, "tool", "ok", "search", 2),
        # unknown tool name on a tool turn
        t("c3", 0, "tool", "request FAILED", None, 0),
        # assistant text with 'Error' is NOT a tool call
        t("c3", 1, "assistant", "Error: not counted", None, 1),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_tool_error_stats_hand_computed(spark):
    from feast_spark.operators.conversation import tool_error_stats

    out = {r["tool"]: r.asDict() for r in tool_error_stats(_tool_turns(spark)).collect()}
    s = out["search"]
    assert s["n_calls"] == 3 and s["n_convs"] == 2 and s["n_errors"] == 1
    assert s["error_units"] == (1 << 20) // 3
    assert s["first_error_conv"] == "c1"
    e = out["exec"]
    # 'terror'/'exceptional' embedded words must NOT match (anchored classes)
    assert e["n_calls"] == 2 and e["n_errors"] == 1
    u = out["<unknown>"]
    # 'FAILED' is not in the explicit-case alternation; stays clean
    assert u["n_calls"] == 1 and u["n_errors"] == 0
    assert u["first_error_conv"] is None


def test_tool_error_stats_two_exchanges(spark):
    from feast_spark.operators.conversation import tool_error_stats

    plan = _plan(tool_error_stats(_tool_turns(spark)))
    assert plan.count("Exchange hashpartitioning") <= 3  # dedup + 2 aggs
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# mask_fork_prefixes (round 5 session 9)
# ---------------------------------------------------------------------------


def _fork_turns(spark):
    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def t(c, i, role, text, sec=0):
        return (c, i, role, text, None, ts0.replace(second=sec % 60, minute=sec // 60))

    rows = [
        # fork family: a1/a2/a3 share the 2-turn prefix, distinct tails
        t("a1", 0, "user", "same seed prompt", 0),
        t("a1", 1, "assistant", "same first reply", 1),
        t("a1", 2, "user", "tail one", 2),
        t("a2", 0, "user", "same  seed   prompt", 0),  # ws-normalized equal
        t("a2", 1, "assistant", "same first reply", 1),
        t("a2", 2, "user", "tail two", 2),
        t("a2", 3, "assistant", "more tail", 3),
        t("a3", 0, "user", "same seed prompt", 0),
        t("a3", 1, "assistant", "same first reply", 1),
        # singleton: unique prefix
        t("b1", 0, "user", "different prompt", 0),
        t("b1", 1, "assistant", "different reply", 1),
        t("b1", 2, "user", "b tail", 2),
        # too short for a fingerprint (k=2)
        t("s1", 0, "user", "same seed prompt", 0),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_mask_fork_prefixes_hand_computed(spark):
    from feast_spark.operators.conversation import mask_fork_prefixes

    out = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in mask_fork_prefixes(_fork_turns(spark), k=2).collect()
    }
    assert len(out) == 13
    # representative (min conv_id) keeps everything
    for i in range(3):
        r = out[("a1", i)]
        assert r["is_rep"] and r["keep_turn"] and r["fork_md5"] is not None
    # siblings: first k turns masked, tails kept
    for c in ("a2", "a3"):
        assert not out[(c, 0)]["keep_turn"] and not out[(c, 0)]["is_rep"]
        assert not out[(c, 1)]["keep_turn"]
    assert out[("a2", 2)]["keep_turn"] and out[("a2", 3)]["keep_turn"]
    # all family members share one digest
    digests = {out[(c, 0)]["fork_md5"] for c in ("a1", "a2", "a3")}
    assert len(digests) == 1
    # singleton + short conversations: untouched, no group
    for key in (("b1", 0), ("b1", 2), ("s1", 0)):
        r = out[key]
        assert r["fork_md5"] is None and not r["is_rep"] and r["keep_turn"]


def test_mask_fork_prefixes_consistent_with_forks(spark):
    from feast_spark.operators.conversation import (
        conversation_forks,
        mask_fork_prefixes,
    )

    from feast_spark.fixtures import transcripts_spark
    from pyspark.sql import functions as F

    t = transcripts_spark(spark, 40, seed=5, mega_every=0)
    idx = F.substring("conv_id", 2, 9).cast("int")
    clones = t.filter(F.pmod(idx, F.lit(4)) == 0).withColumn(
        "conv_id", F.concat("conv_id", F.lit("d"))
    ).withColumn(
        "text",
        F.when(F.col("turn_idx") >= 2, F.concat(F.coalesce("text", F.lit("")), F.lit(" v2"))).otherwise(F.col("text")),
    )
    u = t.unionByName(clones)
    forks = conversation_forks(u, k=2, min_group=2)
    masked = mask_fork_prefixes(u, k=2, min_group=2)
    # one rep per fork group; masked prefix turn count = k * (members - 1)
    f = {r["prefix_md5"]: r for r in forks.collect()}
    m = masked.filter("fork_md5 is not null")
    reps = {
        r["fork_md5"]: r["n"]
        for r in m.filter("is_rep").groupBy("fork_md5").agg(
            F.count_distinct("conv_id").alias("n")
        ).collect()
    }
    dropped = {
        r["fork_md5"]: r["n"]
        for r in m.filter("NOT keep_turn").groupBy("fork_md5").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert set(f) == set(reps)
    for h, row in f.items():
        assert reps[h] == 1
        assert dropped[h] == 2 * (row["n_convs"] - 1)
    # masking never touches a turn outside the first k of a non-rep member
    bad = masked.filter("NOT keep_turn AND (is_rep OR fork_md5 IS NULL)").count()
    assert bad == 0


def test_mask_fork_prefixes_no_broadcast_of_conv_relations(spark):
    from feast_spark.operators.conversation import mask_fork_prefixes

    plan = _plan(mask_fork_prefixes(_fork_turns(spark)))
    assert "BroadcastHashJoin" not in plan
    assert plan.count("Join type:") == 2 and "ShuffledHashJoin" in plan


# ---------------------------------------------------------------------------
# preference_pairs (round 5 session 9)
# ---------------------------------------------------------------------------


def test_preference_pairs_hand_computed(spark):
    from feast_spark.operators.conversation import preference_pairs

    turns = _fork_turns(spark)  # a1/a2/a3 fork family + b1 + short s1
    scores = spark.createDataFrame(
        [("a1", 10), ("a2", 30), ("a3", 20), ("b1", 99), ("s1", 5)],
        "conv_id string, score long",
    )
    out = preference_pairs(turns, scores, k=2).collect()
    assert len(out) == 1  # b1 is a singleton group; s1 has no fingerprint
    r = out[0].asDict()
    assert r["n_convs"] == 3
    assert r["chosen_conv"] == "a2" and r["chosen_score"] == 30
    assert r["rejected_conv"] == "a1" and r["rejected_score"] == 10
    assert r["margin"] == 20


def test_preference_pairs_all_tie_emits_nothing(spark):
    from feast_spark.operators.conversation import preference_pairs

    turns = _fork_turns(spark)
    scores = spark.createDataFrame(
        [("a1", 7), ("a2", 7), ("a3", 7), ("b1", 1), ("s1", 1)],
        "conv_id string, score long",
    )
    assert preference_pairs(turns, scores, k=2).count() == 0


def test_preference_pairs_partial_tie_breaks_on_conv_id(spark):
    from feast_spark.operators.conversation import preference_pairs

    turns = _fork_turns(spark)
    # two members tie at the TOP; pair still emitted vs the lower one,
    # chosen = max (score, conv_id) -> a3
    scores = spark.createDataFrame(
        [("a1", 5), ("a2", 9), ("a3", 9), ("b1", 1), ("s1", 1)],
        "conv_id string, score long",
    )
    r = preference_pairs(turns, scores, k=2).collect()[0].asDict()
    assert r["chosen_conv"] == "a3" and r["rejected_conv"] == "a1"
    assert r["margin"] == 4


def test_preference_pairs_no_broadcast_of_conv_relations(spark):
    from feast_spark.operators.conversation import preference_pairs

    turns = _fork_turns(spark)
    scores = spark.createDataFrame(
        [("a1", 1), ("a2", 2), ("a3", 3), ("b1", 4), ("s1", 5)],
        "conv_id string, score long",
    )
    plan = _plan(preference_pairs(turns, scores))
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan


def test_preference_pairs_duplicate_scores_never_self_pair(spark):
    from feast_spark.operators.conversation import preference_pairs

    turns = _fork_turns(spark)
    # contract violation: duplicate conv_id rows in conv_scores — must
    # not inflate n_convs past distinct members or emit a self-pair
    scores = spark.createDataFrame(
        [("a1", 10), ("a1", 30), ("a2", 20), ("a3", 20),
         ("b1", 1), ("b1", 9), ("s1", 1)],
        "conv_id string, score long",
    )
    rows = preference_pairs(turns, scores, k=2).collect()
    # a1 holds BOTH extrema (10 and 30), so the self-pair guard
    # suppresses the group entirely — conservative: a fabricated margin
    # never becomes a training pair; b1's dup scores can't make a
    # singleton a group either
    assert rows == []
    # duplicates that do NOT own both extrema still yield a sane pair
    scores2 = spark.createDataFrame(
        [("a1", 10), ("a1", 25), ("a2", 30), ("a3", 5),
         ("b1", 1), ("s1", 1)],
        "conv_id string, score long",
    )
    (r,) = preference_pairs(turns, scores2, k=2).collect()
    assert r["n_convs"] == 3  # distinct members, not score rows
    assert r["chosen_conv"] == "a2" and r["rejected_conv"] == "a3"
    assert r["margin"] == 25


# ---------------------------------------------------------------------------
# round 5 session 10: repair_alternation / fit_context_budget /
# system_prompt_census
# ---------------------------------------------------------------------------


def _rep_turns(spark):
    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def t(c, i, role, text, tool=None, sec=0):
        return (c, i, role, text, tool, ts0.replace(second=sec % 60, minute=sec // 60))

    rows = [
        # c1: user run of 3 (one NULL text), assistant run of 2 (tool mix)
        t("c1", 0, "user", "first", sec=0),
        t("c1", 1, "user", None, sec=1),
        t("c1", 2, "user", "third", sec=2),
        t("c1", 3, "assistant", "a1", tool="search", sec=3),
        t("c1", 4, "assistant", "a2", tool="browser", sec=4),
        t("c1", 5, "user", "closing", sec=5),
        # c2: already alternating — must pass through unchanged
        t("c2", 0, "system", "sys", sec=0),
        t("c2", 1, "user", "q", sec=1),
        t("c2", 2, "assistant", "a", sec=2),
        # c3: duplicate key — the edited row's ROLE change must win dedup
        t("c3", 0, "user", "v1", sec=0),
        t("c3", 0, "assistant", "v2-edited", sec=9),
        t("c3", 1, "assistant", "reply", sec=10),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_repair_alternation_values(spark):
    from feast_spark.operators.conversation import repair_alternation

    out = repair_alternation(_rep_turns(spark), sep=" | ")
    rows = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in out.collect()
    }
    # c1 collapses 6 turns -> 3 runs with contiguous new indices
    assert rows[("c1", 0)]["text"] == "first |  | third"  # NULL joins as ''
    assert rows[("c1", 0)]["n_merged"] == 3
    assert rows[("c1", 0)]["src_first_idx"] == 0
    assert rows[("c1", 1)]["text"] == "a1 | a2"
    assert rows[("c1", 1)]["tool"] == "browser"  # MIN over the run
    assert rows[("c1", 2)]["text"] == "closing"
    assert ("c1", 3) not in rows
    # c2 unchanged: three runs of one
    assert [rows[("c2", i)]["n_merged"] for i in range(3)] == [1, 1, 1]
    assert rows[("c2", 0)]["role"] == "system"
    # c3: dedup first — turn 0 becomes assistant, merging with turn 1
    assert rows[("c3", 0)]["text"] == "v2-edited | reply"
    assert rows[("c3", 0)]["n_merged"] == 2
    # ts_ms is the run's earliest ts
    assert rows[("c1", 0)]["ts_ms"] < rows[("c1", 1)]["ts_ms"]


def test_repair_alternation_single_exchange(spark):
    from feast_spark.operators.conversation import repair_alternation

    plan = _plan(repair_alternation(_rep_turns(spark)))
    assert plan.count("Exchange hashpartitioning") <= 2  # dedup agg + conv window


def test_fit_context_budget_values(spark):
    from feast_spark.operators.conversation import fit_context_budget

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        # c1: system 3 tokens, then 2/4/2/6-token turns; budget 10 ->
        # rest 7: suffix sums from the end: idx4=6, idx3=8(stop) ->
        # keep system + idx 4 only... then idx2: 6+2=8 > 7 as well
        ("c1", 0, "system", "a b c", None, ts0),
        ("c1", 1, "user", "t1 t2", None, ts0),
        ("c1", 2, "assistant", "u1 u2 u3 u4", None, ts0),
        ("c1", 3, "user", "v1 v2", None, ts0),
        ("c1", 4, "assistant", "w1 w2 w3 w4 w5 w6", None, ts0),
        # c2: system alone exceeds the budget — still kept, rest dropped
        ("c2", 0, "system", " ".join(f"s{i}" for i in range(20)), None, ts0),
        ("c2", 1, "user", "q", None, ts0),
        # c3: no system turn — plain suffix fit
        ("c3", 0, "user", "x1 x2 x3 x4 x5 x6", None, ts0),
        ("c3", 1, "assistant", "y1 y2 y3", None, ts0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in fit_context_budget(df, 10).collect()
    }
    assert [out[("c1", i)]["keep_turn"] for i in range(5)] == [
        True, False, False, False, True,
    ]
    assert out[("c1", 0)]["n_tokens"] == 3
    assert out[("c2", 0)]["keep_turn"] is True  # pinned even over budget
    assert out[("c2", 1)]["keep_turn"] is False
    assert [out[("c3", i)]["keep_turn"] for i in range(2)] == [True, True]
    # keep_system=False: c1 system competes like any turn (suffix from end:
    # 6, 8, 12 -> only idx 3+4 fit)
    out2 = {
        (r["conv_id"], r["turn_idx"]): r["keep_turn"]
        for r in fit_context_budget(df, 10, keep_system=False).collect()
    }
    assert [out2[("c1", i)] for i in range(5)] == [
        False, False, False, True, True,
    ]
    assert out2[("c2", 0)] is False
    with pytest.raises(ValueError):
        fit_context_budget(df, 0)


def test_fit_context_budget_null_text_counts_zero(spark):
    # documented contract: n_tokens is 0 (not NULL) for NULL text, and a
    # NULL-text turn costs nothing against the budget
    from feast_spark.operators.conversation import fit_context_budget

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [
            ("c1", 0, "user", None, None, ts0),
            ("c1", 1, "assistant", "a b", None, ts0),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = {
        r["turn_idx"]: r.asDict()
        for r in fit_context_budget(df, 2).collect()
    }
    assert out[0]["n_tokens"] == 0 and out[0]["keep_turn"] is True
    assert out[1]["n_tokens"] == 2 and out[1]["keep_turn"] is True


def test_fit_context_budget_single_exchange(spark):
    from feast_spark.operators.conversation import fit_context_budget

    plan = _plan(fit_context_budget(_rep_turns(spark), 10))
    # dedup agg + the shared conv window partitioning
    assert plan.count("Exchange hashpartitioning") <= 2


def test_system_prompt_census_values(spark):
    from feast_spark.operators.conversation import system_prompt_census

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        # two convs share a prompt modulo whitespace -> same digest
        ("c1", 0, "system", "You are  a\thelpful agent", None, ts0),
        ("c1", 1, "user", "q", None, ts0),
        ("c2", 0, "system", "You are a helpful agent", None, ts0),
        ("c2", 1, "user", "q", None, ts0),
        ("c2", 2, "assistant", "a", None, ts0),
        # distinct prompt
        ("c3", 0, "system", "Other prompt", None, ts0),
        ("c3", 1, "user", "q", None, ts0),
        # no system turn
        ("c4", 0, "user", "q", None, ts0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = {r["digest"]: r.asDict() for r in system_prompt_census(df).collect()}
    assert len(out) == 3
    none = out["<none>"]
    assert none["n_convs"] == 1 and none["n_turns"] == 1
    assert none["sample_text"] is None
    shared = [v for k, v in out.items() if v["n_convs"] == 2]
    assert len(shared) == 1
    assert shared[0]["n_turns"] == 5
    assert shared[0]["sample_text"] == "You are a helpful agent"
    other = [v for k, v in out.items() if v["sample_text"] == "Other prompt"]
    assert other and other[0]["n_convs"] == 1 and other[0]["n_turns"] == 2


def test_assistant_refusals_values(spark):
    from feast_spark.operators.conversation import assistant_refusals

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        # c1: refusal opener with TWO markers in one turn, then clean
        ("c1", 0, "user", "do the thing", None, ts0),
        ("c1", 1, "assistant", "I'm sorry, but I can't help with that.", None, ts0),
        ("c1", 2, "user", "ok fine", None, ts0),
        ("c1", 3, "assistant", "here is a normal answer", None, ts0),
        # c2: clean conversation
        ("c2", 0, "user", "hi", None, ts0),
        ("c2", 1, "assistant", "hello, happy to help", None, ts0),
        # c3: no assistant turns -> no output row
        ("c3", 0, "user", "alone", None, ts0),
        # c4: marker in a USER turn must not count
        ("c4", 0, "user", "I'm sorry I was late", None, ts0),
        ("c4", 1, "assistant", "no problem", None, ts0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = {r["conv_id"]: r.asDict() for r in assistant_refusals(df).collect()}
    assert "c3" not in out and len(out) == 3
    c1 = out["c1"]
    assert c1["n_assistant_turns"] == 2
    assert c1["n_refusal_turns"] == 1
    assert c1["n_refusal_hits"] == 2  # "I'm sorry" + "I can't"
    assert c1["first_refusal_idx"] == 1
    assert c1["refusal_units"] == (1 << 20) // 2
    assert out["c2"]["n_refusal_turns"] == 0
    assert out["c2"]["first_refusal_idx"] == -1
    assert out["c4"]["n_refusal_hits"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        assistant_refusals(df, markers=[])


def test_assistant_refusals_single_exchange(spark):
    from feast_spark.operators.conversation import assistant_refusals

    plan = _plan(assistant_refusals(_rep_turns(spark)))
    # dedup agg + conv agg
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "BatchEvalPython" not in plan


def test_tool_call_json_stats_values(spark):
    from feast_spark.operators.conversation import tool_call_json_stats

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        ("c1", 0, "user", '{"not": "a tool turn"}', None, ts0),
        ("c1", 1, "tool", '{"status": "ok", "n": 5}', "search", ts0),
        ("c1", 2, "tool", '{"a": 1', "search", ts0),          # truncated
        ("c1", 3, "tool", "plain text result", "search", ts0),  # not object
        ("c2", 0, "tool", '{"nested": {"k": [1, 2]}}', "search", ts0),  # no status
        ("c2", 1, "tool", '{status: "bad"}', "python", ts0),   # unquoted key
        ("c2", 2, "tool", None, None, ts0),                    # NULL text+tool
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = {r["tool"]: r.asDict() for r in tool_call_json_stats(df).collect()}
    s = out["search"]
    assert s["n_calls"] == 4 and s["n_convs"] == 2
    assert s["n_object_like"] == 3
    assert s["n_parsed"] == 2 and s["n_malformed"] == 1
    assert s["n_with_status"] == 1
    assert s["parse_units"] == (2 * (1 << 20)) // 3
    p = out["python"]
    assert p["n_parsed"] == 0 and p["n_malformed"] == 1
    assert p["parse_units"] == 0
    u = out["<unknown>"]
    assert u["n_calls"] == 1 and u["n_object_like"] == 0
    assert u["parse_units"] == -1


def test_tool_call_json_stats_plan(spark):
    from feast_spark.operators.conversation import tool_call_json_stats

    plan = _plan(tool_call_json_stats(_rep_turns(spark)))
    # dedup agg + (tool, conv) pre-agg + tool agg
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "BatchEvalPython" not in plan


def test_system_prompt_census_no_broadcast_plan(spark):
    # the conv-grain join is conversation-DIMENSION sized on both sides
    # — at fleet scale neither is broadcastable, and a wrong-tiny static
    # estimate of the cached python-sourced side must not pick a
    # driver-collecting broadcast (round-5 session-7 discipline)
    from feast_spark.operators.conversation import system_prompt_census

    plan = (
        system_prompt_census(_rep_turns(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" not in plan, plan[:3000]
    assert "ShuffledHashJoin" in plan, plan[:3000]


def test_tool_latency_histogram_hand_computed(spark):
    from datetime import datetime, timezone

    from feast_spark.operators.conversation import tool_latency_histogram

    def ts(sec, us=0):
        return datetime(2026, 1, 1, 0, 0, tzinfo=timezone.utc).replace(
            second=sec % 60, minute=sec // 60, microsecond=us
        )

    rows = [
        # c1: tool at idx 1 lags the request by exactly 5s = 5_000_000us
        # (bin length 23: 2^22 <= 5e6 < 2^23); tool at idx 3 by 1us
        # (bucket 1); first-turn tool call in c2 has no request row
        ("c1", 0, "user", "q", None, ts(0)),
        ("c1", 1, "tool", "r", "search", ts(5)),
        ("c1", 2, "user", "q2", None, ts(10)),
        ("c1", 3, "tool", "r2", "search", ts(10, 1)),
        ("c2", 0, "tool", "orphan", "python", ts(0)),
        # c3: ts inversion -> negative latency -> sentinel bucket -1,
        # excluded from total_ms
        ("c3", 0, "user", "q", None, ts(30)),
        ("c3", 1, "tool", "r", "python", ts(20)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = {
        (r["tool"], r["lat_bucket"]): r.asDict()
        for r in tool_latency_histogram(df).collect()
    }
    assert set(out) == {("search", 23), ("search", 1), ("python", -1)}
    s = out[("search", 23)]
    assert s["n_calls"] == 1 and s["total_ms"] == 5000
    assert s["min_us"] == 5_000_000 and s["max_us"] == 5_000_000
    tiny = out[("search", 1)]
    assert tiny["total_ms"] == 0 and tiny["max_us"] == 1  # 1us div 1000
    neg = out[("python", -1)]
    assert neg["n_calls"] == 1 and neg["total_ms"] == 0
    assert neg["min_us"] == -10_000_000


def test_tool_latency_histogram_bucket_is_exact_log2(spark):
    # length(bin(x)) == floor(log2(x)) + 1 across bucket boundaries —
    # the INTEGER path both engines share (no float log rounding)
    from feast_spark.operators.conversation import tool_latency_histogram
    from datetime import datetime, timedelta, timezone
    import math

    base = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows, expect = [], {}
    for i, us in enumerate([1, 2, 3, 4, 1023, 1024, (1 << 26) - 1, 1 << 26]):
        cid = f"b{i}"
        rows.append((cid, 0, "user", "q", None, base))
        rows.append(
            (cid, 1, "tool", "r", f"t{i}", base + timedelta(microseconds=us))
        )
        expect[f"t{i}"] = math.floor(math.log2(us)) + 1
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        r["tool"]: r["lat_bucket"]
        for r in tool_latency_histogram(df).collect()
    }
    assert got == expect


def test_tool_latency_histogram_plan(spark):
    from feast_spark.operators.conversation import tool_latency_histogram

    plan = _plan(tool_latency_histogram(_rep_turns(spark), pre_deduped=True))
    # one conv_id exchange for the lag window + one (tool, bucket) agg
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "BatchEvalPython" not in plan


# ---- round 5 session 12: tool_arg_key_stats / repair_turn_order ----


def test_tool_arg_key_stats_values(spark):
    from feast_spark.operators.conversation import tool_arg_key_stats

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [
        # search tool: 2 convs; "status" in all 3 parsed payloads,
        # "rows" in 2, "extra" in 1; one malformed and one non-object
        # payload (neither counts in n_parsed)
        ("c1", 1, "tool", '{"status": "ok", "rows": 1}', "search", ts0),
        ("c1", 3, "tool", '{"status": "ok", "rows": 2, "extra": true}',
         "search", ts0),
        ("c2", 1, "tool", '{"status": "err"}', "search", ts0),
        ("c2", 3, "tool", '{"broken": true', "search", ts0),
        ("c2", 5, "tool", "[1, 2]", "search", ts0),
        # NULL tool name buckets under <unknown>; nested object only
        # contributes its TOP-LEVEL keys
        ("c3", 1, "tool", '{"data": {"inner": 1}}', None, ts0),
        # non-tool roles never counted even with JSON text
        ("c3", 2, "assistant", '{"status": "sneaky"}', None, ts0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        (r["tool"], r["key"]): r.asDict()
        for r in tool_arg_key_stats(df).collect()
    }
    assert set(got) == {
        ("search", "status"), ("search", "rows"), ("search", "extra"),
        ("<unknown>", "data"),
    }
    st = got[("search", "status")]
    assert (st["n_calls"], st["n_convs"], st["n_parsed"]) == (3, 2, 3)
    assert st["coverage_units"] == 1 << 20
    rw = got[("search", "rows")]
    assert (rw["n_calls"], rw["n_convs"]) == (2, 1)
    assert rw["coverage_units"] == (2 * (1 << 20)) // 3
    assert got[("<unknown>", "data")]["n_parsed"] == 1
    # "inner" must NOT appear — top-level keys only
    assert ("<unknown>", "inner") not in got


def test_repair_turn_order_stable_and_composes(spark):
    from feast_spark.operators.conversation import (
        conversation_integrity,
        repair_turn_order,
    )

    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def at(s):
        return datetime(2026, 1, 1, 0, 0, s, tzinfo=timezone.utc)

    rows = [
        # c1: already ordered — repair must be a byte-identical no-op
        ("c1", 0, "user", "a", None, at(0)),
        ("c1", 1, "assistant", "b", None, at(10)),
        # c2: turn 2's ts precedes turn 1's (backfilled tool result)
        ("c2", 0, "user", "q", None, at(0)),
        ("c2", 1, "assistant", "r", None, at(30)),
        ("c2", 2, "tool", "out", "search", at(20)),
        # c3: exact-ts tie — original index order preserved (stable)
        ("c3", 0, "user", "x", None, at(5)),
        ("c3", 1, "user", "y", None, at(5)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in repair_turn_order(df).collect()
    }
    assert all(not out[("c1", i)]["moved"] for i in range(2))
    assert [out[("c2", i)]["src_turn_idx"] for i in range(3)] == [0, 2, 1]
    assert [out[("c2", i)]["moved"] for i in range(3)] == [False, True, True]
    assert [out[("c3", i)]["src_turn_idx"] for i in range(2)] == [0, 1]
    # composition: integrity on repaired output reports ZERO inversions
    rep = repair_turn_order(df).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    integ = {
        r["conv_id"]: r["n_ts_inversions"]
        for r in conversation_integrity(rep).collect()
    }
    assert integ == {"c1": 0, "c2": 0, "c3": 0}
