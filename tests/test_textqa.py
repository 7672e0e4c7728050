"""Generation-artifact QA operators (truncation detector, decode-loop
detector) + cross-source overlap matrix + readability."""

from __future__ import annotations

import datetime as dt
import math
import re

import pytest
from pyspark.sql import functions as F

TS = dt.datetime(2026, 1, 1)


def _turns(spark, rows):
    return spark.createDataFrame(
        [(c, i, r, t, None, TS) for c, i, r, t in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


# ---------------------------------------------------------------- truncation


def test_generation_artifacts_verdicts(spark):
    from feast_spark.operators.textqa import generation_artifacts

    long_clean = "x" * 100 + " and the final sentence terminates properly."
    long_cut = "word " * 30 + "and then it was cut right in the middle of a"
    rows = [
        ("c1", 0, "user", "ignored role"),
        ("c1", 1, "assistant", "Code:\n```python\nprint(1)\n"),  # odd fence
        ("c1", 2, "assistant", long_clean),
        ("c1", 3, "assistant", long_cut),
        ("c2", 0, "assistant", "ok"),  # short fragment: exempt
        ("c2", 1, "assistant", "Fine.\n```py\na\n```\nDone."),  # balanced
        ("c2", 2, "assistant", ""),
        ("c2", 3, "assistant", None),
    ]
    out = {
        (r["conv_id"], r["turn_idx"]): r
        for r in generation_artifacts(_turns(spark, rows), min_chars=80).collect()
    }
    assert ("c1", 0) not in out  # user turn filtered
    assert out[("c1", 1)]["n_fences"] == 1
    assert not out[("c1", 1)]["fence_balanced"]
    assert out[("c1", 1)]["truncated"]
    assert out[("c1", 2)]["ends_clean"] and not out[("c1", 2)]["truncated"]
    assert not out[("c1", 3)]["ends_clean"] and out[("c1", 3)]["truncated"]
    assert not out[("c2", 0)]["truncated"]  # short, unclean end, exempt
    assert out[("c2", 1)]["n_fences"] == 2 and not out[("c2", 1)]["truncated"]
    for k in [("c2", 2), ("c2", 3)]:
        assert out[k]["n_chars"] == 0 and not out[k]["truncated"]


def test_generation_artifacts_signals(spark):
    from feast_spark.operators.textqa import generation_artifacts

    rows = [
        ("c1", 0, "assistant", "Deep (nested [brackets {everywhere"),
        ("c1", 1, "assistant", "To be continued...   "),
        ("c1", 2, "assistant", "Or the single char…"),
    ]
    out = {
        r["turn_idx"]: r
        for r in generation_artifacts(_turns(spark, rows)).collect()
    }
    assert out[0]["paren_delta"] == 1
    assert out[0]["bracket_delta"] == 1
    assert out[0]["brace_delta"] == 1
    assert out[1]["trailing_ellipsis"]  # trailing ws stripped first
    assert out[2]["trailing_ellipsis"]
    # '...' ends on '.', a clean ending — ellipsis is a SIGNAL, not a verdict
    assert out[1]["ends_clean"] and not out[1]["truncated"]


def test_generation_artifacts_dedups_latest(spark):
    from feast_spark.operators.textqa import generation_artifacts

    df = spark.createDataFrame(
        [
            ("c1", 0, "assistant", "old truncated version that is quite long and ends mid", None, TS),
            ("c1", 0, "assistant", "Repaired version. Properly terminated sentence here, long enough to be checked.", None, TS + dt.timedelta(hours=1)),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    [r] = generation_artifacts(df, min_chars=40).collect()
    assert not r["truncated"]  # latest (repaired) row wins


def test_generation_artifacts_plan_map_only(spark):
    from feast_spark.operators.textqa import generation_artifacts

    df = _turns(spark, [("c1", 0, "assistant", "hello there.")])
    plan = generation_artifacts(df, pre_deduped=True)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------- decode loops


def _naive_loop(text: str, max_p: int = 8, min_reps: int = 2):
    w = [t for t in re.split(r"[ \t\n\x0b\f\r]+", text or "") if t]
    n = len(w)
    best = (0, 0, 0, 1)  # (lw, -p, p, reps)
    for p in range(1, max_p + 1):
        m = n // p
        reps = 1
        if n >= 2 * p and m >= 2:
            block = w[n - p:]
            reps = m
            for i in range(2, m + 1):
                if w[n - i * p: n - i * p + p] != block:
                    reps = i - 1
                    break
        lw = reps * p if reps >= min_reps else 0
        cand = (lw, -p, p, reps)
        if cand > best:
            best = cand
    lw, _, p, reps = best
    if lw == 0:
        p, reps = 0, 1
    return n, p, reps, lw, (lw * (1 << 20)) // n if n else 0


def test_suffix_loop_planted_periods(spark):
    from feast_spark.operators.textqa import suffix_loop_stats

    rows = [
        (1, "no loop in this sentence at all"),
        (2, "stop stop stop stop"),  # p=1 r=4 (not p=2 r=2)
        (3, "prefix words then let me check again let me check again let me check again"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in suffix_loop_stats(df, id_cols=("doc_id",)).collect()
    }
    assert out[1]["loop_words"] == 0 and out[1]["period"] == 0
    assert (out[2]["period"], out[2]["n_repeats"]) == (1, 4)
    assert out[2]["loop_units"] == 1 << 20  # whole turn is loop
    assert (out[3]["period"], out[3]["n_repeats"], out[3]["loop_words"]) == (4, 3, 12)
    assert out[4]["n_words"] == 0 and out[4]["loop_units"] == 0
    assert out[5]["n_words"] == 0


def test_suffix_loop_matches_naive_randomized(spark):
    from feast_spark.operators.textqa import suffix_loop_stats
    import numpy as np

    rng = np.random.default_rng(7)
    vocab = ["a", "b", "c", "ab"]
    texts = []
    for _ in range(120):
        n = int(rng.integers(0, 14))
        words = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(n)]
        texts.append(" ".join(words))
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["period"], r["n_repeats"], r["loop_words"], r["loop_units"])
        for r in suffix_loop_stats(df, id_cols=("doc_id",)).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _naive_loop(t), (i, t, got[i], _naive_loop(t))


def test_suffix_loop_min_repeats_and_plan(spark):
    from feast_spark.operators.textqa import suffix_loop_stats

    df = spark.createDataFrame(
        [(1, "x y x y"), (2, "x y x y x y")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in suffix_loop_stats(df, id_cols=("doc_id",), min_repeats=3).collect()
    }
    assert out[1]["loop_words"] == 0  # only 2 repeats < 3
    assert out[2]["loop_words"] == 6
    plan = suffix_loop_stats(df, id_cols=("doc_id",))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------- overlap


def test_cross_source_overlap_counts(spark):
    from feast_spark.operators.dedup import cross_source_overlap

    rows = [
        ("s1", "alpha beta"), ("s1", "gamma  delta"), ("s1", "only one"),
        ("s1", ""), ("s1", "alpha beta"),  # blank + in-source dup collapse
        ("s2", "alpha   beta"), ("s2", "gamma delta"), ("s2", "other two"),
        ("s3", "alpha beta"), ("s3", None),
        ("s4", "nothing shared here"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in cross_source_overlap(df).collect()
    }
    assert len(out) == 6  # all C(4,2) pairs, zero-filled
    r12 = out[("s1", "s2")]
    assert (r12["n_a"], r12["n_b"], r12["n_shared"]) == (3, 3, 2)
    assert r12["jaccard_units"] == (2 * (1 << 20)) // 4
    assert out[("s1", "s3")]["containment_b_units"] == 1 << 20
    assert out[("s1", "s4")]["n_shared"] == 0
    assert out[("s3", "s4")]["n_shared"] == 0


def test_cross_source_overlap_broadcasts(spark):
    from feast_spark.operators.dedup import cross_source_overlap

    df = spark.createDataFrame(
        [("s1", "a b"), ("s2", "a b")], "source string, text string"
    )
    plan = cross_source_overlap(df)._jdf.queryExecution().executedPlan().toString()
    # dimension-sized frames broadcast; the corpus-side self-join is a
    # hash join on the digest, never a nested-loop over doc rows
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------- readability


def test_readability_scores_exact(spark):
    from feast_spark.operators.lexical import readability_scores

    rows = [
        (1, "The cat sat on the mat. It was happy!"),
        (2, "ok"),
        (3, ""),
        (4, None),
        (5, "No terminator here just words flowing on and on"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in readability_scores(df).collect()}
    assert set(out) == {1, 2, 5}  # zero-word docs dropped

    def fk(w, s, syl):
        return math.floor(
            (0.39 * (w / s) + 11.8 * (syl / w) - 15.59) * float(1 << 20)
        )

    r1 = out[1]
    assert (r1["n_words"], r1["n_sentences"]) == (9, 2)
    assert r1["fk_units"] == fk(9, 2, r1["n_syllables"])
    assert out[2]["n_sentences"] == 1  # clamped
    assert out[5]["fk_units"] == fk(
        out[5]["n_words"], 1, out[5]["n_syllables"]
    )


def test_readability_plan_map_only(spark):
    from feast_spark.operators.lexical import readability_scores

    df = spark.createDataFrame([(1, "a.")], "doc_id long, text string")
    plan = readability_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_generation_artifacts_cjk_clean_endings(spark):
    from feast_spark.operators.textqa import generation_artifacts

    zh = "这是一个足够长的中文回答" * 8  # > 80 chars, complete
    rows = [
        ("c1", 0, "assistant", zh + "。"),
        ("c1", 1, "assistant", zh + "！"),
        ("c1", 2, "assistant", zh),  # long, ends mid-character-run
    ]
    out = {
        r["turn_idx"]: r
        for r in generation_artifacts(_turns(spark, rows), min_chars=80).collect()
    }
    assert out[0]["ends_clean"] and not out[0]["truncated"]
    assert out[1]["ends_clean"] and not out[1]["truncated"]
    assert not out[2]["ends_clean"] and out[2]["truncated"]


# ---------------------------------------------------------------------------
# role_ngram_diversity (round 5 session 8)
# ---------------------------------------------------------------------------


def _naive_diversity(rows, n):
    """Independent python replay: rows = (role, text)."""
    import re as _re
    from collections import Counter

    per_role: dict[str, Counter] = {}
    for role, text in rows:
        nt = _re.sub(r"[ \t\n\x0b\f\r]+", " ", text or "").strip()
        if not nt:
            continue
        w = nt.split(" ")
        for i in range(len(w) - n + 1):
            per_role.setdefault(role, Counter())["\x1e".join(w[i : i + n])] += 1
    out = {}
    for role, c in per_role.items():
        total = sum(c.values())
        out[role] = {
            "total_ngrams": total,
            "distinct_ngrams": len(c),
            "max_gram_count": max(c.values()),
            "diversity_units": len(c) * (1 << 20) // total,
            "top_units": max(c.values()) * (1 << 20) // total,
        }
    return out


def test_role_diversity_matches_naive_trigrams(spark):
    rows = [
        ("user", "alpha beta gamma delta epsilon"),
        ("user", "beta gamma delta zeta"),
        ("assistant", "ok done. ok done. ok done."),
        ("assistant", "ok done. ok done."),
        ("assistant", "  "),  # blank -> no grams
        ("tool", "xy"),  # 1 word < n -> no grams
    ]
    df = _turns(
        spark, [(f"c{i}", 0, r, t) for i, (r, t) in enumerate(rows)]
    )
    from feast_spark.operators.textqa import role_ngram_diversity

    got = {r["role"]: r.asDict() for r in role_ngram_diversity(df, n=3).collect()}
    exp = _naive_diversity(rows, 3)
    assert set(got) == set(exp)  # tool/blank rows contribute nothing
    for role in exp:
        for k, v in exp[role].items():
            assert got[role][k] == v, (role, k, got[role][k], v)


def test_role_diversity_detects_collapse(spark):
    # collapsed assistant (one template) vs diverse user: assistant's
    # diversity_units crater, top_units saturate
    rows = []
    for i in range(30):
        rows.append((f"c{i}", 0, "user", f"unique question number {i} about topic{i}"))
        rows.append((f"c{i}", 1, "assistant", "the request completed successfully"))
    from feast_spark.operators.textqa import role_ngram_diversity

    got = {r["role"]: r.asDict() for r in role_ngram_diversity(_turns(spark, rows), n=2).collect()}
    # 4-word template -> 3 bigrams, each with count 30 of 90 total
    assert got["assistant"]["distinct_ngrams"] == 3
    assert got["assistant"]["diversity_units"] < got["user"]["diversity_units"] // 10
    assert got["assistant"]["top_units"] == 30 * (1 << 20) // 90


def test_role_diversity_hash_arm_parity_and_plan(spark):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.textqa import role_ngram_diversity

    t = transcripts_spark(spark, 30, seed=11, mega_every=0)
    a = {r["role"]: r.asDict() for r in role_ngram_diversity(t, n=2).collect()}
    b = {
        r["role"]: r.asDict()
        for r in role_ngram_diversity(t, n=2, hash_grams=True).collect()
    }
    assert a == b  # 8-byte surrogate arm identical (no collisions here)
    # two hash exchanges: (role, gram) counts + role rollup; no window/sort
    plan = (
        role_ngram_diversity(t, n=2, hash_grams=True, pre_deduped=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan[:3000]
    assert "Sort " not in plan


# ---------------------------------------------------------------------------
# code_block_stats (round 5 session 8)
# ---------------------------------------------------------------------------


def test_code_block_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            ("d1", "intro ```python\nx=1\ny=2\n``` and ```\nplain\n``` end"),
            ("d2", "```sql\nSELECT 1\n``` plus unterminated ```python\nnope"),
            ("d2b", "```python\nz\n``` and again ```python\nw\n```"),
            ("d3", "no fences at all"),
            ("d4", None),
        ],
        "conv_id string, text string",
    )
    from feast_spark.operators.textqa import code_block_stats

    got = {
        r["lang"]: r.asDict()
        for r in code_block_stats(df, pre_deduped=True).collect()
    }
    # python: d1 one block "x=1\ny=2\n" (8 chars), d2b two blocks (2+2)
    assert got["python"]["n_blocks"] == 3
    assert got["python"]["n_code_chars"] == 8 + 2 + 2
    assert got["python"]["n_docs"] == 2
    # bare fence -> <none>; "plain\n" = 6 chars
    assert got["<none>"] == {
        "lang": "<none>", "n_blocks": 1, "n_code_chars": 6, "n_docs": 1,
    }
    # the unterminated trailing fence contributes nothing
    assert got["sql"]["n_blocks"] == 1 and got["sql"]["n_code_chars"] == 9
    assert set(got) == {"python", "<none>", "sql"}


def test_code_block_stats_dedups_and_plan(spark):
    # duplicate (conv, turn) keys: only the latest row's fences count
    from datetime import datetime, timezone

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [
            ("c1", 0, "assistant", "```go\nold\n```", None, ts0),
            ("c1", 0, "assistant", "```rust\nnew!\n```", None,
             ts0.replace(second=9)),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    from feast_spark.operators.textqa import code_block_stats

    got = {r["lang"]: r.asDict() for r in code_block_stats(df).collect()}
    assert set(got) == {"rust"} and got["rust"]["n_code_chars"] == 5
    # pre-deduped shape: map-side regex extract, (lang, id) pre-agg +
    # lang rollup — exactly two exchanges, no sort, no python eval
    plan = (
        code_block_stats(df.drop("ts"), pre_deduped=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan[:3000]
    assert "Sort " not in plan and "BatchEvalPython" not in plan


def test_code_block_stats_rejects_undeduplicable_schema(spark):
    import pytest as _pytest

    from feast_spark.operators.textqa import code_block_stats

    df = spark.createDataFrame(
        [("d1", "```\nx\n```")], "doc_id string, text string"
    )
    with _pytest.raises(ValueError, match="pre_deduped"):
        code_block_stats(df, id_col="doc_id")
    assert code_block_stats(df, id_col="doc_id", pre_deduped=True).count() == 1


# ---------------------------------------------------------------------------
# round 5 session 10: special_token_stats
# ---------------------------------------------------------------------------


def test_special_token_stats_values(spark):
    from datetime import datetime, timezone

    import pytest as _pytest

    from feast_spark.operators.textqa import special_token_stats

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    ts1 = datetime(2026, 1, 2, tzinfo=timezone.utc)
    rows = [
        # two occurrences in one turn + one in another conv
        ("c1", 0, "user", "x <|im_start|>a<|im_start|> y", None, ts0),
        ("c1", 1, "assistant", "clean reply", None, ts0),
        ("c2", 0, "user", "<|im_start|> solo", None, ts0),
        # </s> vs <s>: independent counting, no containment here
        ("c2", 1, "assistant", "tail</s> and <s>head", None, ts0),
        # duplicate key: the edited row (clean) wins dedup, so the
        # marker in the stale v1 row must NOT count
        ("c3", 0, "user", "[INST] stale", None, ts0),
        ("c3", 0, "user", "edited clean", None, ts1),
        ("c3", 1, "assistant", None, None, ts0),  # NULL text
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = {
        (r["marker"], r["role"]): r.asDict()
        for r in special_token_stats(df).collect()
    }
    im = out[("<|im_start|>", "user")]
    assert im["n_hits"] == 3 and im["n_turns"] == 2 and im["n_convs"] == 2
    assert out[("</s>", "assistant")]["n_hits"] == 1
    assert out[("<s>", "assistant")]["n_hits"] == 1
    assert ("[INST]", "user") not in out  # stale duplicate suppressed
    assert len(out) == 3
    with _pytest.raises(ValueError):
        special_token_stats(df, markers=[])
    # custom marker list narrows the census
    only = special_token_stats(df, markers=["</s>"]).collect()
    assert len(only) == 1 and only[0]["n_hits"] == 1


def test_special_token_stats_map_side_filter_plan(spark):
    from datetime import datetime, timezone

    from feast_spark.operators.textqa import special_token_stats

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [("c1", 0, "user", "x", None, ts0)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    plan = (
        special_token_stats(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # dedup agg + (marker, role, conv) pre-agg + final agg; counting is
    # JVM-side (no regex-engine python eval), explode carries hits only
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------- round 5 s11: unicode anomalies


def test_unicode_anomaly_stats_values(spark):
    from feast_spark.operators.textqa import unicode_anomaly_stats

    rows = [
        # 4 bidi controls (RLO + PDF + isolate pair), user side
        ("c1", 0, "user", "x ‮rev‬⁦iso⁩ y"),
        # 4 zero-width + 1 BOM-as-ZWNBSP, assistant side
        ("c1", 1, "assistant", "a​b‌c‍d⁠e﻿"),
        # two replacement chars
        ("c2", 0, "user", "moji �� bake"),
        # c0: \x01 and DEL count; tab/LF/CR and \x0b/\x0c do NOT
        ("c2", 1, "assistant", "a\x01b\x7fc\td\ne\rf\x0bg\x0ch"),
        # c1 band
        ("c3", 0, "user", "q\x80w\x9fe"),
        # clean + NULL rows contribute nothing
        ("c3", 1, "assistant", "perfectly ordinary text"),
        ("c4", 0, "user", None),
    ]
    out = {
        (r["kind"], r["role"]): (r["n_chars"], r["n_turns"], r["n_convs"])
        for r in unicode_anomaly_stats(_turns(spark, rows)).collect()
    }
    assert out == {
        ("bidi_control", "user"): (4, 1, 1),
        ("zero_width", "assistant"): (5, 1, 1),
        ("replacement_char", "user"): (2, 1, 1),
        ("c0_control", "assistant"): (2, 1, 1),
        ("c1_control", "user"): (2, 1, 1),
    }


def test_unicode_anomaly_stats_multi_turn_and_custom_classes(spark):
    from feast_spark.operators.textqa import unicode_anomaly_stats

    rows = [
        ("c1", 0, "user", "a​b"),
        ("c1", 1, "user", "c‍b"),
        ("c2", 0, "user", "d﻿e"),
    ]
    out = unicode_anomaly_stats(_turns(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    # 3 chars over 3 turns across 2 conversations, one kind
    assert (r["kind"], r["n_chars"], r["n_turns"], r["n_convs"]) == (
        "zero_width", 3, 3, 2,
    )
    # custom class list narrows the census; empty list rejected
    only = unicode_anomaly_stats(
        _turns(spark, rows), classes=[("bom", "[\\x{FEFF}]")]
    ).collect()
    assert len(only) == 1 and only[0]["n_chars"] == 1
    with pytest.raises(ValueError):
        unicode_anomaly_stats(_turns(spark, rows), classes=[])


def test_unicode_anomaly_stats_plan(spark):
    from datetime import datetime, timezone

    from feast_spark.operators.textqa import unicode_anomaly_stats

    ts0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    df = spark.createDataFrame(
        [("c1", 0, "user", "x​", None, ts0)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    plan = (
        unicode_anomaly_stats(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # dedup agg + (kind, role, conv) pre-agg + final agg; counting is
    # JVM regexp (no python eval); explode carries hit rows only
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
