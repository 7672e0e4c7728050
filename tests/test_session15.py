"""Round-5 session-15 operators: packing seq-len sweep, shuffle-skew
diagnostic, assistant grounding, KMV distinct sketch.

Value tests replay each contract naively in Python (Counter / hashlib /
sorted lists) on planted inputs; plan tests pin the scale shapes the
docstrings claim (broadcast literal dimensions, SHUFFLE_HASH on the
corpus-scaled grounding join, WindowGroupLimit on the KMV rank prune)."""

from __future__ import annotations

import contextlib
import hashlib
import io
from collections import defaultdict
from datetime import datetime

import pytest


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _md5_48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


# ------------------------------------------------------------- packing_sweep


def test_packing_sweep_matches_naive_replay(spark):
    from feast_spark.operators.selection import packing_sweep

    import random

    rng = random.Random(15)
    counts = [rng.randrange(0, 300) for _ in range(400)] + [0, 0, 1]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "id long, n_tokens long"
    )
    lens = [16, 50, 128]
    got = {r["seq_len"]: r for r in packing_sweep(df, lens).collect()}
    for L in lens:
        nseqs = sum(-(-c // L) for c in counts)
        ntok = sum(counts)
        nitems = sum(1 for c in counts if c > 0)
        r = got[L]
        assert r["n_items"] == nitems
        assert r["n_empty"] == sum(1 for c in counts if c == 0)
        assert r["n_seqs"] == nseqs
        assert r["n_splits"] == nseqs - nitems
        assert r["n_tokens"] == ntok
        assert r["n_pad"] == nseqs * L - ntok
        assert r["util_units"] == ntok * (1 << 20) // (nseqs * L)


def test_packing_sweep_empty_input_and_null_rows(spark):
    from feast_spark.operators.selection import packing_sweep

    df = spark.createDataFrame(
        [(1, None), (2, 10)], "id long, n_tokens long"
    )
    # NULL rows are excluded by contract
    got = {r["seq_len"]: r for r in packing_sweep(df, [8]).collect()}
    assert got[8]["n_items"] == 1 and got[8]["n_tokens"] == 10
    # empty input still emits every requested length, with the -1 sentinel
    rows = packing_sweep(df.filter("id < 0"), [8, 16]).collect()
    assert sorted(r["seq_len"] for r in rows) == [8, 16]
    assert all(
        r["n_seqs"] == 0 and r["util_units"] == -1 and r["n_pad"] == 0
        for r in rows
    )


def test_packing_sweep_validation_and_negative_counts(spark):
    from feast_spark.operators.selection import packing_sweep

    df = spark.createDataFrame([(1, 5)], "id long, n_tokens long")
    with pytest.raises(ValueError, match="non-empty"):
        packing_sweep(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        packing_sweep(df, [8, 8])
    with pytest.raises(ValueError, match="positive"):
        packing_sweep(df, [0, 8])
    bad = spark.createDataFrame([(1, -5)], "id long, n_tokens long")
    with pytest.raises(Exception, match="negative token count"):
        packing_sweep(bad, [8]).collect()


def test_packing_sweep_plan_broadcast_dimension(spark):
    from feast_spark.operators.selection import packing_sweep

    df = spark.createDataFrame([(1, 5)], "id long, n_tokens long")
    plan = _plan(packing_sweep(df, [8, 16, 32]))
    # the seq_len dimension rides a broadcast nested-loop join; the item
    # relation is never shuffled before the dimension-sized agg
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------- skew report


def _naive_skew(keys, n_parts, units=1 << 20):
    cnt: dict[str, int] = defaultdict(int)
    for k in keys:
        cnt[k] += 1
    parts: dict[int, list[tuple[str, int]]] = defaultdict(list)
    for k, c in cnt.items():
        parts[_md5_48(k) % n_parts].append((k, c))
    total = len(keys)
    out = {}
    for p in range(n_parts):
        ks = parts.get(p, [])
        if not ks:
            out[p] = (0, 0, 0, None, 0, 0)
            continue
        n_rows = sum(c for _, c in ks)
        mx = max(c for _, c in ks)
        hot = max(k for k, c in ks if c == mx)
        out[p] = (
            n_rows,
            len(ks),
            mx,
            hot,
            n_rows * n_parts * units // total,
            -(-mx * n_parts // total),
        )
    return out


def test_shuffle_skew_report_matches_naive_replay(spark):
    from feast_spark.operators.salting import shuffle_skew_report

    keys = [f"c{i % 13}" for i in range(200)] + ["mega"] * 500
    df = spark.createDataFrame([(k,) for k in keys], "conv_id string")
    got = {
        r["partition"]: (
            r["n_rows"], r["n_keys"], r["max_key_rows"], r["hot_key"],
            r["balance_units"], r["salt_hint"],
        )
        for r in shuffle_skew_report(df, ["conv_id"], 8).collect()
    }
    assert got == _naive_skew(keys, 8)
    # the mega key's partition must recommend salting
    mega_part = _md5_48("mega") % 8
    assert got[mega_part][5] > 1


def test_shuffle_skew_report_null_and_multi_column_keys(spark):
    from feast_spark.operators.salting import shuffle_skew_report

    rows = [("a", 1), (None, 1), ("a", None), ("a", 1)]
    df = spark.createDataFrame(rows, "k1 string, k2 long")
    out = shuffle_skew_report(df, ["k1", "k2"], 4).collect()
    assert len(out) == 4
    # keys concatenate with chr(30); NULL -> '<null>' on each component
    expect = _naive_skew(
        ["a\x1e1", "<null>\x1e1", "a\x1e<null>", "a\x1e1"], 4
    )
    got = {
        r["partition"]: (
            r["n_rows"], r["n_keys"], r["max_key_rows"], r["hot_key"],
            r["balance_units"], r["salt_hint"],
        )
        for r in out
    }
    assert got == expect
    hot = [r for r in out if r["max_key_rows"] == 2]
    assert hot and hot[0]["hot_key"] == "a\x1e1"


def test_shuffle_skew_report_validation(spark):
    from feast_spark.operators.salting import shuffle_skew_report

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="positive"):
        shuffle_skew_report(df, ["k"], 0)
    with pytest.raises(ValueError, match="non-empty"):
        shuffle_skew_report(df, [], 4)


def test_shuffle_skew_report_balance_sums(spark):
    from feast_spark.operators.salting import shuffle_skew_report

    keys = [f"k{i}" for i in range(97)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    rows = shuffle_skew_report(df, ["k"], 16).collect()
    # conservation: partition row counts sum to the input size
    assert sum(r["n_rows"] for r in rows) == 97
    assert sum(r["n_keys"] for r in rows) == 97


# -------------------------------------------------------------- grounding


def test_assistant_grounding_contract(spark):
    from feast_spark.operators.conversation import assistant_grounding

    T = datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "user", None, T, "budget is 4242 see https://ok.example/a"),
        ("c1", 1, "assistant", None, T,
         "total 4242 plus 9191 at https://ok.example/a and"
         " https://fab.example/b"),
        ("c1", 2, "tool", "search", T, "result 777"),
        ("c1", 3, "assistant", None, T,
         "so 777 and 9191 again, v2.5.1 and step 1"),
        ("c2", 0, "user", None, T, "no numbers here"),
        ("c2", 1, "assistant", None, T, "fabricated 31337"),
        # self-introduction: an assistant inventing a number never
        # grounds itself, even on repeat
        ("c3", 0, "assistant", None, T, "self 55 intro"),
        ("c3", 1, "assistant", None, T, "repeat 55"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, tool string,"
        " ts timestamp, text string",
    )
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["kind"], r["n_entities"],
         r["n_grounded"])
        for r in assistant_grounding(df).collect()
    )
    # c1 t3 numbers: 777 (grounded by tool t2), 9191 (assistant-only),
    # 2.5 from 'v2.5.1' (len>=2; the trailing '1' and 'step 1' are
    # single digits, excluded)
    assert got == [
        ("c1", 1, "number", 2, 1),
        ("c1", 1, "url", 2, 1),
        ("c1", 3, "number", 3, 1),
        ("c2", 1, "number", 1, 0),
        ("c3", 0, "number", 1, 0),
        ("c3", 1, "number", 1, 0),
    ]


def test_assistant_grounding_kinds_and_validation(spark):
    from feast_spark.operators.conversation import assistant_grounding

    T = datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("c1", 0, "user", None, T, "see https://a.example x 42"),
         ("c1", 1, "assistant", None, T, "https://a.example and 42")],
        "conv_id string, turn_idx int, role string, tool string,"
        " ts timestamp, text string",
    )
    only_url = assistant_grounding(df, kinds=("url",)).collect()
    assert [r["kind"] for r in only_url] == ["url"]
    assert only_url[0]["n_grounded"] == 1
    with pytest.raises(ValueError, match="unknown kinds"):
        assistant_grounding(df, kinds=("number", "ssn"))


def test_assistant_grounding_plan_shuffle_hash(spark):
    from feast_spark.operators.conversation import assistant_grounding

    T = datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("c1", 0, "user", None, T, "42 and 43"),
         ("c1", 1, "assistant", None, T, "42 44")],
        "conv_id string, turn_idx int, role string, tool string,"
        " ts timestamp, text string",
    )
    plan = _plan(assistant_grounding(df))
    # the (conv, kind, entity) source relation is corpus-scaled — the
    # grounding join must never auto-broadcast it
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


# ------------------------------------------------------------------- KMV


def test_kmv_exact_below_k_and_estimate(spark):
    from feast_spark.operators.lexical import kmv_estimate, kmv_sketch

    import random

    rng = random.Random(7)
    rows = [("big", f"w{rng.randrange(4000)}") for _ in range(20000)] + [
        ("small", f"w{i}") for i in range(50)
    ] + [("small", None)]
    df = spark.createDataFrame(rows, "source string, term string")
    k = 256
    est = {
        r["source"]: r
        for r in kmv_estimate(
            kmv_sketch(df, ["source"], "term", k=k), ["source"], k
        ).collect()
    }
    # below k distinct -> exact (NULL excluded)
    assert est["small"]["n_sketch"] == 50
    assert est["small"]["est_distinct"] == 50
    # full sketch -> the unbiased estimator, replayed exactly
    big_terms = {t for s, t in rows if s == "big"}
    hashes = sorted({_md5_48(t) for t in big_terms})
    exact = len(hashes)
    kth = hashes[k - 1]
    expect = (k - 1) * (1 << 48) // kth
    assert est["big"]["n_sketch"] == k
    assert est["big"]["max_hash"] == kth
    assert est["big"]["est_distinct"] == expect
    # and the estimate is actually close: k=256 -> stderr ~ 6%
    assert abs(expect - exact) / exact < 0.2


def test_kmv_merge_equals_whole_sketch(spark):
    from feast_spark.operators.lexical import kmv_merge, kmv_sketch

    rows = [("s", f"t{i % 700}") for i in range(3000)]
    df = spark.createDataFrame(rows, "source string, term string")
    k = 64
    a = kmv_sketch(df.filter("term < 't4'"), ["source"], "term", k=k)
    b = kmv_sketch(df.filter("term >= 't4'"), ["source"], "term", k=k)
    merged = kmv_merge(a, b, ["source"], k)
    whole = kmv_sketch(df, ["source"], "term", k=k)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_kmv_validation_and_plan(spark):
    from feast_spark.operators.lexical import kmv_sketch

    df = spark.createDataFrame([("s", "t")], "source string, term string")
    with pytest.raises(ValueError, match=">= 16"):
        kmv_sketch(df, ["source"], "term", k=4)
    plan = _plan(kmv_sketch(df, ["source"], "term", k=64))
    # the rank<=k prune must run map-side before the group exchange
    assert "WindowGroupLimit" in plan


# ------------------------------------------------------------- interleave


def test_interleave_sources_rank_and_key_replay(spark):
    from feast_spark.operators.selection import interleave_sources

    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = {"s0": 1, "s1": 2, "s2": 4}
    out = interleave_sources(df, w).collect()
    by_src: dict[str, list[int]] = defaultdict(list)
    for i, s in rows:
        by_src[s].append(i)
    exp = {}
    W = 7
    for s, ids in by_src.items():
        ids.sort(key=lambda i: (_md5_48("il1" + str(i)), i))
        for r, i in enumerate(ids, 1):
            exp[i] = (s, r, r * W // w[s])
    got = {
        r["doc_id"]: (r["source"], r["src_rank"], r["sched_key"])
        for r in out
    }
    assert got == exp


def test_interleave_sources_prefix_mixture(spark):
    from collections import Counter

    from feast_spark.operators.selection import interleave_sources

    rows = [(i, f"s{i % 3}") for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = {"s0": 1, "s1": 2, "s2": 4}
    W = 7
    out = interleave_sources(df, w).collect()
    order = sorted(out, key=lambda r: (r["sched_key"], r["source"], r["doc_id"]))
    # stride property: before ANY source exhausts, per-source counts in
    # every prefix drift < 1 from target (+1 slack for position ties)
    limit = min(300 * W // ws for ws in w.values())
    c: Counter = Counter()
    for n, r in enumerate(order[:limit], 1):
        c[r["source"]] += 1
        for s in w:
            assert abs(c[s] - n * w[s] / W) <= 2, (n, s, c[s])


def test_interleave_sources_exclusion_and_validation(spark):
    from feast_spark.operators.selection import interleave_sources

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zzz")], "doc_id long, source string"
    )
    out = interleave_sources(df, {"a": 1, "b": 1}).collect()
    # unweighted sources are excluded from the schedule
    assert sorted(r["source"] for r in out) == ["a", "b"]
    with pytest.raises(ValueError, match="non-empty"):
        interleave_sources(df, {})
    with pytest.raises(ValueError, match="positive"):
        interleave_sources(df, {"a": 0})


def test_interleave_sources_plan_no_source_funnel(spark):
    from feast_spark.operators.selection import interleave_sources

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    plan = _plan(interleave_sources(df, {"a": 1}))
    # ranks come from windows partitioned (source, bucket) — never a
    # single-source sort funnel; offsets + weights ride broadcasts
    assert "hashpartitioning" in plan and "__b" in plan
    assert "BroadcastExchange" in plan


# -------------------------------------------------------- repeated tools


def test_repeated_tool_calls_contract(spark):
    from feast_spark.operators.conversation import repeated_tool_calls

    T = datetime(2026, 1, 1)
    rows = [
        # non-consecutive identical payloads (different ws spelling)
        ("c1", 1, "tool", "search", T, "status  pending"),
        ("c1", 3, "assistant", None, T, "hmm"),
        ("c1", 5, "tool", "search", T, " status pending "),
        # same payload, different tool -> separate group, not repeated
        ("c1", 7, "tool", "browser", T, "status pending"),
        # empty payloads are excluded
        ("c2", 1, "tool", "search", T, ""),
        ("c2", 3, "tool", "search", T, None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, tool string,"
        " ts timestamp, text string",
    )
    out = repeated_tool_calls(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["conv_id"], r["tool"], r["n_calls"], r["first_idx"],
            r["last_idx"]) == ("c1", "search", 2, 1, 5)
    with pytest.raises(ValueError, match=">= 2"):
        repeated_tool_calls(df, min_calls=1)


# ---------------------------------------------------------- pack_best_fit


def test_pack_best_fit_conservation_and_bounds(spark):
    import math

    from feast_spark.operators.selection import pack_best_fit

    items = [(f"d{i}", 1 + (i * 37) % 100) for i in range(500)]
    df = spark.createDataFrame(items, "id string, n_tokens long")
    packed = pack_best_fit(df, 128, bucket_docs=100).collect()
    assert sorted(r["id"] for r in packed) == sorted(i for i, _ in items)
    bins: dict[tuple, int] = defaultdict(int)
    for r in packed:
        bins[(r["pack_bucket"], r["pack_bin"])] += r["n_tokens"]
    assert all(v <= 128 for v in bins.values())
    total = sum(n for _, n in items)
    assert math.ceil(total / 128) <= len(bins) < len(items)


def test_pack_best_fit_beats_isolated_packing(spark):
    from feast_spark.operators.selection import pack_best_fit, packing_sweep

    items = [(i, 1 + (i * 53) % 90) for i in range(400)]
    df = spark.createDataFrame(items, "id long, n_tokens long")
    L = 96
    sweep = {
        r["seq_len"]: r for r in packing_sweep(df, [L]).collect()
    }[L]
    ffd_bins = {
        (r["pack_bucket"], r["pack_bin"])
        for r in pack_best_fit(df, L, bucket_docs=200).collect()
    }
    # FFD combines whole items -> strictly fewer sequences than the
    # one-item-per-sequence isolated layout the sweep prices
    assert len(ffd_bins) < sweep["n_seqs"]


def test_pack_best_fit_deterministic_across_partitioning(spark):
    from feast_spark.operators.selection import pack_best_fit

    items = [(f"x{i}", 1 + i % 50) for i in range(300)]
    df = spark.createDataFrame(items, "id string, n_tokens long")
    a = sorted(map(tuple, pack_best_fit(df, 64, bucket_docs=64).collect()))
    b = sorted(
        map(tuple, pack_best_fit(df.repartition(17), 64, bucket_docs=64).collect())
    )
    assert a == b


def test_pack_best_fit_oversize_and_empty(spark):
    from feast_spark.operators.selection import pack_best_fit

    bad = spark.createDataFrame([("x", 200)], "id string, n_tokens long")
    with pytest.raises(Exception, match="exceeds seq_len"):
        pack_best_fit(bad, 128).collect()
    empty = bad.filter("n_tokens < 0")
    assert pack_best_fit(empty, 128).count() == 0
    with pytest.raises(ValueError, match="positive"):
        pack_best_fit(bad, 0)


# ------------------------------------------------- incremental vocab state


def test_batch_vocab_sketch_state_and_corpus_estimate(spark, tmp_path):
    import os
    from datetime import timezone

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.lexical import kmv_estimate, kmv_sketch
    from feast_spark.pipeline.quality_incremental import (
        corpus_vocab_estimate,
        run_quality_batch,
    )
    from pyspark.sql import functions as F

    dts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    state = str(tmp_path / "vstate")
    t = transcripts_spark(spark, 30, seed=9)
    b1 = t.filter("turn_idx < 3")
    b2 = t.filter("turn_idx >= 3")
    k = 64

    run_quality_batch(spark, b1, state, "b1", decision_ts=dts, vocab_k=k)
    run_quality_batch(spark, b2, state, "b2", decision_ts=dts, vocab_k=k)

    # merged committed sketches == one sketch over the concatenated
    # batches (the KMV merge property, end-to-end through the state dir)
    toks = t.select(
        "role",
        F.explode(
            F.filter(
                F.split(F.coalesce("text", F.lit("")), "[ \t\n\x0b\f\r]+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    whole = {
        (r["role"], r["n_sketch"], r["max_hash"], r["est_distinct"])
        for r in kmv_estimate(
            kmv_sketch(toks, ["role"], "term", k=k), ["role"], k
        ).collect()
    }
    got = {
        (r["role"], r["n_sketch"], r["max_hash"], r["est_distinct"])
        for r in corpus_vocab_estimate(spark, state, k).collect()
    }
    assert got == whole

    # re-delivery of a committed id never rewrites the sketch partition
    vdir = os.path.join(state, "vocab", "batch=b1")
    mtime = max(
        os.path.getmtime(os.path.join(vdir, f)) for f in os.listdir(vdir)
    )
    r = run_quality_batch(spark, b1, state, "b1", decision_ts=dts, vocab_k=k)
    assert r.resumed
    assert mtime == max(
        os.path.getmtime(os.path.join(vdir, f)) for f in os.listdir(vdir)
    )


def test_corpus_vocab_estimate_excludes_uncommitted_batches(
    spark, tmp_path
):
    import os
    import shutil
    from datetime import timezone

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.quality_incremental import (
        corpus_vocab_estimate,
        run_quality_batch,
    )

    dts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    state = str(tmp_path / "vstate2")
    t = transcripts_spark(spark, 20, seed=11)
    b1 = t.filter("turn_idx < 2")
    b2 = t.filter("turn_idx >= 2")
    k = 32
    run_quality_batch(spark, b1, state, "b1", decision_ts=dts, vocab_k=k)
    base = sorted(
        map(tuple, corpus_vocab_estimate(spark, state, k).collect())
    )

    # simulate a crash AFTER the b2 sketch write but BEFORE the labels
    # commit: sketch dir exists, labels _SUCCESS does not -> the corpus
    # estimate must ignore it
    run_quality_batch(spark, b2, state, "b2", decision_ts=dts, vocab_k=k)
    succ = os.path.join(state, "labels", "batch=b2", "_SUCCESS")
    os.remove(succ)
    crashed = sorted(
        map(tuple, corpus_vocab_estimate(spark, state, k).collect())
    )
    assert crashed == base

    # the retry overwrites the orphan sketch and commits both
    shutil.rmtree(os.path.join(state, "labels", "batch=b2"))
    run_quality_batch(spark, b2, state, "b2", decision_ts=dts, vocab_k=k)
    after = sorted(
        map(tuple, corpus_vocab_estimate(spark, state, k).collect())
    )
    assert after != base

    # empty state raises
    with pytest.raises(ValueError, match="no committed vocab"):
        corpus_vocab_estimate(spark, str(tmp_path / "nothing"), k)


# ------------------------------------------------------------ embedding QA


def test_embedding_qa_contract(spark):
    from feast_spark.operators.similarity import embedding_qa

    rows = [
        (0, [0.5, -0.25, 0.0]),
        (1, [float("nan"), 1.0, 2.0]),
        (2, [0.0, 0.0, 0.0]),
        (3, None),
        (4, [1.0, 1.0]),          # wrong dim
        (5, [float("inf"), 1.0, 1.0]),
        (6, [0.5, None, 0.5]),    # NULL element
        (7, [1.0, 2.0, 3.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: (r["dim"], r["n_nan"], r["n_inf"], r["n_null"],
                      r["n_zero"], r["norm2_units"], r["qa_ok"])
        for r in embedding_qa(df, expected_dim=3).collect()
    }
    U = 1 << 30
    assert got[0] == (3, 0, 0, 0, 1, int(0.25 * U) + int(0.0625 * U), True)
    # NaN component: counted, contributes 0 to the norm, fails qa
    assert got[1] == (3, 1, 0, 0, 0, 1 * U + 4 * U, False)
    assert got[2] == (3, 0, 0, 0, 3, 0, False)      # zero vector
    assert got[3] == (-1, 0, 0, 0, 0, -1, False)    # NULL vector
    assert got[4][0] == 2 and not got[4][6]          # dim mismatch
    assert got[5] == (3, 0, 1, 0, 0, 2 * U, False)  # Inf guarded
    assert got[6] == (3, 0, 0, 1, 0, int(0.5 * U), False)
    assert got[7] == (3, 0, 0, 0, 0, 14 * U, True)
    # without expected_dim, any positive dim passes
    free = {
        r["vec_id"]: r["qa_ok"] for r in embedding_qa(df).collect()
    }
    assert free[4] and free[7]


def test_embedding_qa_plan_map_only(spark):
    from feast_spark.operators.similarity import embedding_qa

    df = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    plan = _plan(embedding_qa(df))
    assert "Exchange" not in plan  # map-only, no shuffle at any size


# ------------------------------------- interleave -> export composition


def test_interleave_order_rides_shard_export(spark, tmp_path):
    from pyspark.sql import functions as F

    from feast_spark.operators.selection import interleave_sources
    from feast_spark.pipeline.export import export_training_shards

    rows = [(i, f"s{i % 3}", f"text {i}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    sched = interleave_sources(df, {"s0": 1, "s1": 2, "s2": 4})
    full = df.join(sched.select("doc_id", "sched_key"), "doc_id")
    res = export_training_shards(
        spark,
        full,
        key=F.col("doc_id"),
        out_dir=str(tmp_path / "shards"),
        n_shards=4,
        order_by=["sched_key", "doc_id"],
    )
    # within every shard file, rows stream in schedule order — a trainer
    # reading any shard sequentially consumes the mixture in stride order
    import glob

    import pandas as pd

    for d in sorted(glob.glob(str(tmp_path / "shards/shards/shard_id=*"))):
        pdf = pd.concat(
            [pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))]
        )
        keys = list(pdf["sched_key"])
        assert keys == sorted(keys), d


# ----------------------------------------------------- review-pass pins


def test_corpus_vocab_estimate_rejects_sketchless_committed_batch(
    spark, tmp_path
):
    from datetime import timezone

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.quality_incremental import (
        corpus_vocab_estimate,
        run_quality_batch,
    )

    dts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    state = str(tmp_path / "vstate3")
    t = transcripts_spark(spark, 10, seed=3)
    # b1 committed WITHOUT a sketch (vocab_k=0), b2 with one: the merged
    # estimate would silently exclude b1's vocabulary — must raise
    run_quality_batch(spark, t.filter("turn_idx < 2"), state, "b1",
                      decision_ts=dts)
    run_quality_batch(spark, t.filter("turn_idx >= 2"), state, "b2",
                      decision_ts=dts, vocab_k=32)
    with pytest.raises(ValueError, match="without vocab sketches"):
        corpus_vocab_estimate(spark, state, 32)


def test_pack_best_fit_rejects_duplicate_ids(spark):
    from feast_spark.operators.selection import pack_best_fit

    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 3)], "id string, n_tokens long"
    )
    with pytest.raises(Exception, match="duplicate id"):
        pack_best_fit(df, 64).collect()


# --------------------------------------------------------- bucketed batches


def test_bucketed_batches_contract(spark):
    from feast_spark.operators.selection import bucketed_batches

    rows = [(f"d{i}", 1 + (i * 7) % 200) for i in range(300)] + [
        ("z1", None), ("z2", 0)
    ]
    df = spark.createDataFrame(rows, "id string, n_tokens long")
    out = bucketed_batches(df, 8).collect()
    # NULL/zero excluded; everything else assigned exactly once
    assert len(out) == 300
    by_bucket = defaultdict(list)
    for r in out:
        # bucket is the exact integer log2
        assert r["bucket"] == r["n_tokens"].bit_length() - 1
        assert 2 ** r["bucket"] <= r["n_tokens"] < 2 ** (r["bucket"] + 1)
        by_bucket[r["bucket"]].append(r)
    # replay the md5 order per bucket: rank -> (batch, slot)
    for b, rs in by_bucket.items():
        order = sorted(rs, key=lambda r: (_md5_48("bb1" + r["id"]), r["id"]))
        for rank, r in enumerate(order):
            assert (r["batch_idx"], r["slot"]) == (rank // 8, rank % 8), (
                b, r)
    # every batch except possibly the bucket's last is full
    sizes = defaultdict(int)
    for r in out:
        sizes[(r["bucket"], r["batch_idx"])] += 1
    for (b, bi), n in sizes.items():
        last = max(i for (bb, i) in sizes if bb == b)
        assert n == 8 or bi == last
    with pytest.raises(ValueError, match="positive"):
        bucketed_batches(df, 0)


def test_bucketed_batches_plan_no_bucket_funnel(spark):
    from feast_spark.operators.selection import bucketed_batches

    df = spark.createDataFrame([("a", 5)], "id string, n_tokens long")
    plan = _plan(bucketed_batches(df, 4))
    # rank windows partition (bucket, sub-bucket) — 64 log2 buckets
    # never funnel through 64 tasks; offsets ride a broadcast
    assert "__sb" in plan and "BroadcastExchange" in plan


# --------------------------------------------------------- sentence chunks


def test_sentence_chunks_contract(spark):
    from feast_spark.operators.selection import sentence_chunks

    rows = [
        (1, "One two three. Four five! Six seven eight nine? Ten."),
        (2, "Single sentence with exactly seven words here."),
        (3, None),
        (4, "   "),
        (5, "A very long sentence that keeps going well past target. End."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_sentences"],
         r["n_words"])
        for r in sentence_chunks(df, target_words=5).collect()
    )
    # doc 1: sentences of 3/2/4/1 words -> cum-before 0,3,5,9 ->
    # chunks 0,0,1,1 (never splits a sentence; chunk 0 holds 5 words)
    assert out[0] == (1, 0, "One two three Four five", 2, 5)
    assert out[1] == (1, 1, "Six seven eight nine Ten", 2, 5)
    # doc 2: one 7-word sentence owns chunk 0 (overflow allowed)
    assert out[2] == (2, 0, "Single sentence with exactly seven words here",
                      1, 7)
    # NULL/blank docs emit nothing
    assert all(d not in (3, 4) for d, *_ in out)
    # doc 5: 10-word sentence -> chunk 0; 'End' starts at cum 10 -> chunk 2
    d5 = [t for t in out if t[0] == 5]
    assert [t[1] for t in d5] == [0, 2]
    with pytest.raises(ValueError, match="positive"):
        sentence_chunks(df, 0)


def test_sentence_chunks_conservation_and_plan(spark):
    from pyspark.sql import functions as F

    from feast_spark.operators.selection import sentence_chunks

    docs = spark.createDataFrame(
        [(i, ". ".join(f"sent {i} word{j} extra" for j in range(7)) + ".")
         for i in range(50)],
        "doc_id long, text string",
    )
    ch = sentence_chunks(docs, target_words=8)
    # conservation: total words and sentences survive chunking
    agg = ch.agg(F.sum("n_words"), F.sum("n_sentences")).first()
    assert agg[0] == 50 * 7 * 4 and agg[1] == 50 * 7
    # fill rule: a chunk that is not its doc's last must have reached
    # the target with its final sentence (the next sentence started a
    # new chunk only because cum-before >= target)
    rows = ch.collect()
    last = {}
    for r in rows:
        last[r["doc_id"]] = max(last.get(r["doc_id"], -1), r["chunk_idx"])
    for r in rows:
        if r["chunk_idx"] != last[r["doc_id"]]:
            assert r["n_words"] >= 8 - 3, r  # >= target minus one sentence
    plan = _plan(ch)
    # ONE doc-keyed exchange feeds both the window and the agg
    assert plan.count("Exchange hashpartitioning") <= 2


def test_bucketed_batches_null_id_raises_and_dup_ids_deterministic(spark):
    from feast_spark.operators.selection import bucketed_batches

    bad = spark.createDataFrame(
        [(None, 5), ("b", 3)], "id string, n_tokens long"
    )
    with pytest.raises(Exception, match="NULL id"):
        bucketed_batches(bad, 8).collect()
    # duplicate ids: caller's modeling error, but output is
    # deterministic — (hash, id, n_tokens) tie-break
    dup = spark.createDataFrame(
        [("a", 5), ("a", 9), ("b", 3)], "id string, n_tokens long"
    )
    a = sorted(map(tuple, bucketed_batches(dup, 8).collect()))
    b = sorted(map(tuple, bucketed_batches(dup.repartition(7), 8).collect()))
    assert a == b and len(a) == 3
