"""Semantic tests for the training-data selection operators
(feast_spark/operators/selection.py + similarity.semantic_dedup) — the
oracle-parity evidence lives in test_entry_oracle.py; these pin the
operator CONTRACTS on hand-built corpora where the right answer is
known by construction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_spark.operators.selection import (
    contamination_check,
    deterministic_sample,
    dsir_weights,
    span_dedup,
    top_ngrams,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


# ---------------------------------------------------------------------------
# span_dedup
# ---------------------------------------------------------------------------


def test_span_dedup_cuts_later_copies_and_reconstructs(spark):
    # doc 0: spans [A, B]; doc 1 repeats span A then adds unique C;
    # doc 2 is doc 0 verbatim -> fully deduplicated away.
    A = "a b c"
    B = "d e f"
    C = "x y z"
    d = _docs(spark, [(0, f"{A} {B}"), (1, f"{A} {C}"), (2, f"{A} {B}")])
    out = {
        r["doc_id"]: r
        for r in span_dedup(d, span_words=3).collect()
    }
    assert out[0]["dedup_text"] == f"{A} {B}"
    assert out[0]["n_spans_kept"] == 2 and out[0]["n_spans_total"] == 2
    # doc 1 lost its copy of A but keeps C (reconstruction preserves order)
    assert out[1]["dedup_text"] == C
    assert out[1]["n_spans_kept"] == 1 and out[1]["n_spans_total"] == 2
    # doc 2 contributed nothing new -> no row (the C4 semantic)
    assert 2 not in out


def test_span_dedup_first_occurrence_is_doc_then_span_ordered(spark):
    # the same span appears at doc 0 span 1 and doc 1 span 0: the winner
    # is (doc 0, span 1) — ordering is (doc_id, span_idx), not span_idx.
    dup = "p q"
    d = _docs(spark, [(0, f"a b {dup}"), (1, f"{dup} c d")])
    out = {r["doc_id"]: r["dedup_text"] for r in span_dedup(d, span_words=2).collect()}
    assert out[0] == f"a b {dup}"
    assert out[1] == "c d"


def test_span_dedup_tail_span_shorter_than_window(spark):
    d = _docs(spark, [(0, "a b c d e")])  # spans: "a b", "c d", "e"
    row = span_dedup(d, span_words=2).collect()[0]
    assert row["dedup_text"] == "a b c d e"
    assert row["n_spans_total"] == 3


# ---------------------------------------------------------------------------
# contamination_check
# ---------------------------------------------------------------------------


def test_contamination_flags_only_overlapping_docs(spark):
    bench_text = "q1 q2 q3 q4"
    d = _docs(
        spark,
        [
            (0, f"intro {bench_text} outro pad pad2"),  # contains the 4-gram
            (1, "totally unrelated words here pad pad2"),
            (2, f"{bench_text} dup of benchmark pad"),
        ],
    )
    bench = spark.createDataFrame(pd.DataFrame({"bench_text": [bench_text]}))
    out = {
        r["doc_id"]: (r["n_hit_grams"], r["contaminated"])
        for r in contamination_check(d, bench, n=4).collect()
    }
    assert out[0] == (1, True)
    assert out[1] == (0, False)
    assert out[2] == (1, True)
    # every input doc gets a row, hit or not
    assert set(out) == {0, 1, 2}


def test_contamination_benchmark_is_broadcast(spark):
    d = _docs(spark, [(0, "a b c d e f g h i")])
    bench = spark.createDataFrame(pd.DataFrame({"bench_text": ["a b c d e f g h"]}))
    plan = contamination_check(d, bench, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_word_ngrams_short_doc_is_empty(spark):
    d = _docs(spark, [(0, "one two")])
    got = d.select(F.size(word_ngrams(F.split("text", " "), 8)).alias("n")).collect()
    assert got[0]["n"] == 0


# ---------------------------------------------------------------------------
# dsir_weights
# ---------------------------------------------------------------------------


def test_dsir_ranks_target_domain_higher(spark):
    # target docs speak vocab {t*}, raw docs vocab {r*}; held-out docs of
    # each vocab must score on the right side of each other.
    rows = []
    for i in range(20):
        rows.append((i, "t1 t2 t3 t4 t5 t1 t2 t3", "tgt"))
    for i in range(20, 60):
        rows.append((i, "r1 r2 r3 r4 r5 r1 r2 r3", "raw"))
    # held-out probes (not in the target mask):
    rows.append((100, "t1 t2 t3 t4 t5", "raw"))
    rows.append((101, "r1 r2 r3 r4 r5", "raw"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "dom"]))
    out = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_weights(df, F.col("dom") == "tgt").collect()
    }
    assert out[100] > out[101]
    # per-gram average for the target-vocab probe is positive LLR
    assert out[100] > 0 > out[101]


def test_dsir_zero_bigram_doc_scores_zero(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["solo", "a b c"], "dom": ["x", "x"]})
    )
    out = {r["doc_id"]: r for r in dsir_weights(df, F.lit(False)).collect()}
    assert out[0]["n_bigrams"] == 0 and out[0]["dsir_score"] == 0
    assert out[1]["n_bigrams"] == 2


# ---------------------------------------------------------------------------
# deterministic_sample
# ---------------------------------------------------------------------------


def test_deterministic_sample_is_stable_and_rate_accurate(spark):
    n = 4000
    df = spark.range(n).select(F.col("id").alias("k"))
    key = F.col("k").cast("string")
    got1 = sorted(r["k"] for r in deterministic_sample(df, key, F.lit(0.3)).collect())
    got2 = sorted(r["k"] for r in deterministic_sample(df, key, F.lit(0.3)).collect())
    assert got1 == got2  # re-run selects the SAME rows
    assert abs(len(got1) / n - 0.3) < 0.03  # md5 is uniform
    # smaller rate selects a SUBSET (nested samples — the property data
    # mixing relies on when rates are tuned)
    got_small = set(r["k"] for r in deterministic_sample(df, key, F.lit(0.1)).collect())
    assert got_small <= set(got1)


def test_deterministic_sample_rate_one_clamps(spark):
    df = spark.range(100).select(F.col("id").cast("string").alias("k"))
    kept = deterministic_sample(df, F.col("k"), F.lit(1.0)).count()
    assert kept >= 99  # 65535/65536 of the space


def test_deterministic_sample_is_map_only(spark):
    df = spark.range(100).select(F.col("id").cast("string").alias("k"))
    plan = (
        deterministic_sample(df, F.col("k"), F.lit(0.5))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # no shuffle: pure filter


# ---------------------------------------------------------------------------
# top_ngrams
# ---------------------------------------------------------------------------


def test_top_ngrams_counts_and_deterministic_ties(spark):
    d = _docs(spark, [(0, "a b c a b c x y"), (1, "a b c q r")])
    out = top_ngrams(d, n=3, k=3).collect()
    assert out[0]["gram"] == "a b c" and out[0]["cnt"] == 3 and out[0]["rank"] == 1
    # all remaining grams have cnt 1 -> tie broken by gram string asc
    assert [r["gram"] for r in out[1:]] == sorted(r["gram"] for r in out[1:])


# ---------------------------------------------------------------------------
# semantic_dedup
# ---------------------------------------------------------------------------


def test_semantic_dedup_drops_planted_near_duplicates(spark):
    from feast_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(40)]
    # plant: 100..104 are near-copies of vec 3 (tiny perturbation)
    for j in range(5):
        rows.append((100 + j, (base[3] + 0.001 * rng.normal(size=16).astype(np.float32)).tolist()))
    emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    out = {r["vec_id"]: r for r in semantic_dedup(emb, n_clusters=4, threshold=0.95).collect()}
    assert len(out) == 45
    assert out[3]["is_kept"]  # smallest id of the duplicate group survives
    for j in range(5):
        r = out[100 + j]
        assert not r["is_kept"]
        assert r["dup_of"] == 3.0  # attributed to the smallest kept id
    # distinct random gaussians at threshold .95: everyone else kept
    kept = sum(1 for r in out.values() if r["is_kept"])
    assert kept == 40


def test_semantic_dedup_dup_of_null_for_kept(spark):
    from feast_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(3)
    rows = [(i, rng.normal(size=8).astype(np.float32).tolist()) for i in range(10)]
    emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    for r in semantic_dedup(emb, n_clusters=2, threshold=0.99).collect():
        assert r["is_kept"] and r["dup_of"] is None


def test_semantic_dedup_multiprobe_catches_cross_cluster_dup(spark):
    """n_probe=1 misses a duplicate pair straddling a cluster boundary
    (SemDeDup's documented blind spot); n_probe=2 probes both vectors into
    the shared second-nearest cluster and drops the larger id."""
    from feast_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(11)
    dim = 16
    e1 = np.zeros(dim); e1[0] = 1.0
    e2 = np.zeros(dim); e2[1] = 1.0
    rows = []
    # first two rows seed the kmeans init -> clusters converge on e1/e2
    rows.append((0, e1.tolist()))
    rows.append((1, e2.tolist()))
    for i in range(2, 20):
        axis, other = (e1, e2) if i % 2 == 0 else (e2, e1)
        v = axis + 0.05 * rng.normal(size=dim)
        rows.append((i, v.tolist()))
    # planted straddlers: both on the e1/e2 bisector, nudged to opposite
    # sides so their PRIMARY clusters differ, cosine(a, b) ~ 1
    bis = (e1 + e2) / np.linalg.norm(e1 + e2)
    a = bis + 0.01 * e1
    b = bis + 0.01 * e2
    assert float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))) > 0.998
    rows.append((100, a.tolist()))
    rows.append((101, b.tolist()))
    emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))

    one = {r["vec_id"]: r for r in semantic_dedup(emb, n_clusters=2, threshold=0.998).collect()}
    assert one[100]["cluster"] != one[101]["cluster"]  # genuinely straddling
    assert one[100]["is_kept"] and one[101]["is_kept"]  # blind spot: missed

    two = {r["vec_id"]: r
           for r in semantic_dedup(emb, n_clusters=2, threshold=0.998, n_probe=2).collect()}
    assert len(two) == len(rows)  # still one row per vector
    assert two[100]["is_kept"]
    assert not two[101]["is_kept"] and two[101]["dup_of"] == 100.0
    # primary cluster column matches the single-probe assignment
    assert all(two[i]["cluster"] == one[i]["cluster"] for i in one)
    # min id of every duplicate group survives; non-dups untouched
    assert all(two[i]["is_kept"] for i in range(20))


def test_semantic_dedup_multiprobe_matches_single_when_clusters_clean(spark):
    """With no cross-cluster structure, n_probe=2 must agree with n_probe=1
    on every verdict (probing a second cluster can only ADD drops, and
    clean gaussians at threshold .95 have none to add)."""
    from feast_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(40)]
    for j in range(5):
        rows.append((100 + j, (base[3] + 0.001 * rng.normal(size=16).astype(np.float32)).tolist()))
    emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    one = {r["vec_id"]: (r["is_kept"], r["dup_of"])
           for r in semantic_dedup(emb, n_clusters=4, threshold=0.95).collect()}
    two = {r["vec_id"]: (r["is_kept"], r["dup_of"])
           for r in semantic_dedup(emb, n_clusters=4, threshold=0.95, n_probe=2).collect()}
    assert one == two


def test_dsir_xxhash64_scale_method_same_ranking(spark):
    rows = [(i, "t1 t2 t3 t4 t1 t2", "tgt") for i in range(10)]
    rows += [(i + 10, "r1 r2 r3 r4 r1 r2", "raw") for i in range(10)]
    rows += [(100, "t1 t2 t3", "raw"), (101, "r1 r2 r3", "raw")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "dom"]))
    out = {
        r["doc_id"]: r
        for r in dsir_weights(df, F.col("dom") == "tgt", method="xxhash64").collect()
    }
    # different bucketing, same decision: target-vocab probe outranks
    assert out[100]["dsir_score"] > out[101]["dsir_score"]
    assert out[100]["n_bigrams"] == 2


# ---------------------------------------------------------------------------
# chunk_documents / pack_documents
# ---------------------------------------------------------------------------


def test_chunk_documents_overlap_windows(spark):
    from feast_spark.operators.selection import chunk_documents

    d = _docs(spark, [(0, "a b c d e f g")])
    out = sorted(
        chunk_documents(d, chunk_words=4, overlap=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 2: windows start at 0,2,4,6 (every start inside the doc)
    assert [r["chunk_text"] for r in out] == ["a b c d", "c d e f", "e f g", "g"]
    assert [r["n_words"] for r in out] == [4, 4, 3, 1]


def test_chunk_documents_no_overlap_covers_exactly(spark):
    from feast_spark.operators.selection import chunk_documents

    d = _docs(spark, [(0, "a b c d e")])
    out = sorted(
        chunk_documents(d, chunk_words=2, overlap=0).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["chunk_text"] for r in out] == ["a b", "c d", "e"]
    # reconstruction: non-overlapping chunks concatenate to the original
    assert " ".join(r["chunk_text"] for r in out) == "a b c d e"


def test_chunk_documents_rejects_bad_overlap(spark):
    from feast_spark.operators.selection import chunk_documents

    d = _docs(spark, [(0, "a b")])
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_words=4, overlap=4)


def test_pack_documents_matches_naive_prefix_sum(spark):
    from feast_spark.operators.selection import pack_documents

    rows = [(i, " ".join(["w"] * (7 + 3 * (i % 5)))) for i in range(50)]
    d = _docs(spark, rows)
    # bucket_docs=8 forces 7 buckets -> the offset join really runs
    out = {
        r["doc_id"]: r
        for r in pack_documents(d, budget_words=20, bucket_docs=8).collect()
    }
    start = 0
    for i in range(50):
        n = 7 + 3 * (i % 5)
        assert out[i]["n_words"] == n
        assert out[i]["pack_id"] == start // 20
        assert out[i]["pack_offset"] == start % 20
        start += n


def test_pack_documents_bucketing_is_invisible(spark):
    from feast_spark.operators.selection import pack_documents

    rows = [(i, " ".join(["w"] * (5 + i % 3))) for i in range(30)]
    d = _docs(spark, rows)
    a = sorted(map(tuple, pack_documents(d, 16, bucket_docs=4).collect()))
    b = sorted(map(tuple, pack_documents(d, 16, bucket_docs=1000).collect()))
    assert a == b  # bucket size is a physical knob, not a semantic one


# ---------------------------------------------------------------------------
# randomized invariants (seeded corpora vs pure-python references)
# ---------------------------------------------------------------------------


def _random_corpus(seed, n_docs=40, vocab=8, max_words=30):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]  # tiny vocab forces span collisions
    return [
        (i, " ".join(rng.choice(words, size=rng.integers(1, max_words + 1))))
        for i in range(n_docs)
    ]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_span_dedup_matches_python_reference(spark, seed):
    rows = _random_corpus(seed)
    out = {
        r["doc_id"]: r for r in span_dedup(_docs(spark, rows), span_words=3).collect()
    }
    seen, expected = set(), {}
    for doc_id, text in rows:  # ascending doc_id = first-occurrence order
        w = text.split(" ")
        kept = []
        for i in range(0, (len(w) + 2) // 3):
            span = " ".join(w[i * 3 : i * 3 + 3])
            if span not in seen:
                seen.add(span)
                kept.append(span)
        if kept:
            expected[doc_id] = " ".join(kept)
    assert {k: v["dedup_text"] for k, v in out.items()} == expected
    # every distinct span of the input survives exactly once corpus-wide
    assert len(seen) == sum(v["n_spans_kept"] for v in out.values())


@pytest.mark.parametrize("seed", [7, 8])
def test_pack_documents_gappy_ids_match_reference(spark, seed):
    from feast_spark.operators.selection import pack_documents

    rng = np.random.default_rng(seed)
    ids = sorted(rng.choice(10_000, size=60, replace=False))  # sparse ids
    rows = [(int(i), " ".join(["x"] * int(rng.integers(1, 40)))) for i in ids]
    out = {
        r["doc_id"]: r
        for r in pack_documents(_docs(spark, rows), 50, bucket_docs=997).collect()
    }
    start = 0
    for i, text in rows:
        n = len(text.split(" "))
        assert out[i]["pack_id"] == start // 50, f"doc {i}"
        assert out[i]["pack_offset"] == start % 50
        start += n


@pytest.mark.parametrize("seed", [11])
def test_contamination_matches_python_reference(spark, seed):
    rows = _random_corpus(seed, n_docs=30, vocab=5, max_words=20)
    bench_rows = _random_corpus(seed + 100, n_docs=4, vocab=5, max_words=12)
    bench = spark.createDataFrame(
        pd.DataFrame({"bench_text": [t for _, t in bench_rows]})
    )
    out = {
        r["doc_id"]: r["n_hit_grams"]
        for r in contamination_check(_docs(spark, rows), bench, n=3).collect()
    }
    bg = set()
    for _, t in bench_rows:
        w = t.split(" ")
        bg.update(" ".join(w[i : i + 3]) for i in range(len(w) - 2))
    for doc_id, t in rows:
        w = t.split(" ")
        dg = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        assert out[doc_id] == len(dg & bg), f"doc {doc_id}"


def test_embeddings_fixture_partitioning_invariant_with_planted_dups(spark):
    from feast_spark.fixtures import embeddings_spark

    a = embeddings_spark(spark, 100, partitions=2).toPandas().sort_values("vec_id")
    b = embeddings_spark(spark, 100, partitions=7).toPandas().sort_values("vec_id")
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    assert all(
        np.array_equal(x, y) for x, y in zip(a["embedding"], b["embedding"])
    )
    # planted copy has cosine ~1 to its group head
    v0 = np.asarray(a["embedding"].iloc[0], dtype=np.float64)
    v9 = np.asarray(a["embedding"].iloc[9], dtype=np.float64)
    cos = v0 @ v9 / (np.linalg.norm(v0) * np.linalg.norm(v9))
    assert cos > 0.99 and bool(a["is_dup"].iloc[9]) and not bool(a["is_dup"].iloc[0])


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_span_dedup_xxhash64_arm_parity(spark, seed):
    # the 8-byte-keyed scale arm must produce exactly the portable arm's
    # output (64-bit collisions are ~impossible on these corpora)
    rows = _random_corpus(seed)
    d = _docs(spark, rows)
    a = sorted(map(tuple, span_dedup(d, span_words=3).collect()))
    b = sorted(
        map(tuple, span_dedup(d, span_words=3, method="xxhash64").collect())
    )
    assert a == b


def test_span_dedup_xxhash64_plan_carries_no_strings(spark):
    # shuffle #1 of the scale arm must not move the span text: the
    # exchange below the first-occurrence window reads only
    # (doc_id, span_idx, h)
    rows = _random_corpus(11)
    plan = span_dedup(
        _docs(spark, rows), span_words=3, method="xxhash64"
    )._jdf.queryExecution().executedPlan().toString()
    import re

    win = plan.find("WindowGroupLimit")
    assert win != -1 or "window" in plan.lower()
    # the window's input exchange partitions by the hash column, and no
    # string-typed span attribute appears between scan and first window
    first_exchange = plan.find("Exchange hashpartitioning(h#")
    assert first_exchange != -1, plan


# ---------------------------------------------------------------------------
# mixture_sample (domain reweighting)
# ---------------------------------------------------------------------------


def test_mixture_sample_hits_target_mixture(spark):
    import hashlib

    from feast_spark.operators.selection import mixture_sample

    # 3 strata with very different supplies
    rows = (
        [(i, "web") for i in range(4000)]
        + [(i + 10000, "wiki") for i in range(1000)]
        + [(i + 20000, "code") for i in range(200)]
    )
    d = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_sample(
        d, "source", {"web": 0.5, "wiki": 0.4, "code": 0.1},
        target_rows=1000, key=F.col("doc_id").cast("string"),
    ).toPandas()
    got = out.groupby("source").size().to_dict()
    # web: rate 500/4000=0.125 -> ~500; wiki: 400/1000 -> ~400;
    # code: 100/200 -> ~100 (md5 sampling is binomial around the target)
    assert abs(got["web"] - 500) < 90
    assert abs(got["wiki"] - 400) < 80
    assert abs(got["code"] - 100) < 45

    # determinism + exact md5 rule parity with a python replay
    kept = set(out.doc_id)
    rates = {"web": 500 / 4000, "wiki": 400 / 1000, "code": 100 / 200}
    for i, s in rows:
        b = hashlib.md5(str(i).encode()).hexdigest()[:4]
        thr = format(min(int(rates[s] * 65536), 65535), "04x")
        assert (i in kept) == (b < thr), (i, s)


def test_mixture_sample_saturates_and_drops(spark):
    from feast_spark.operators.selection import mixture_sample

    d = spark.createDataFrame(
        [(i, "tiny" if i < 50 else "other") for i in range(1050)],
        "doc_id long, source string",
    )
    out = mixture_sample(
        d, "source", {"tiny": 1.0}, target_rows=500,
        key=F.col("doc_id").cast("string"),
    ).toPandas()
    # undersupplied stratum saturates at rate 1 (all 50 kept); strata
    # with no weight are dropped entirely
    assert sorted(out.doc_id) == list(range(50))
    assert set(out.source) == {"tiny"}


def test_deterministic_shuffle_order_and_reproducibility(spark):
    import hashlib

    from feast_spark.operators.selection import deterministic_shuffle

    d = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(500)], "doc_id long, text string"
    )
    out = deterministic_shuffle(
        d, F.col("doc_id").cast("string"), num_partitions=8, salt="ep0"
    )
    # partition-major concatenation == the global hash order
    rows = []
    for pidx, part in enumerate(
        out.select("doc_id", "shuffle_key", F.spark_partition_id().alias("p"))
        .collect()
    ):
        rows.append((part["p"], part["shuffle_key"], part["doc_id"]))
    # ranges are contiguous per partition: sorting by (partition, key)
    # must equal sorting by key alone
    by_part = [r[2] for r in sorted(rows, key=lambda r: (r[0], r[1]))]
    by_key = [r[2] for r in sorted(rows, key=lambda r: r[1])]
    assert by_part == by_key
    # exact order replay in python
    exp = sorted(range(500), key=lambda i: hashlib.md5(f"ep0{i}".encode()).hexdigest())
    assert by_key == exp
    # a different salt is an (almost surely) different permutation; the
    # same salt reproduces exactly
    out2 = deterministic_shuffle(
        d.repartition(3), F.col("doc_id").cast("string"),
        num_partitions=8, salt="ep0",
    )
    rows2 = out2.select("doc_id", "shuffle_key",
                        F.spark_partition_id().alias("p")).collect()
    by_part2 = [
        r["doc_id"] for r in sorted(rows2, key=lambda r: (r["p"], r["shuffle_key"]))
    ]
    assert by_part2 == by_part  # input partitioning is irrelevant
    exp1 = sorted(range(500), key=lambda i: hashlib.md5(f"ep1{i}".encode()).hexdigest())
    assert exp1 != exp


# ---------------------------------------------------------------------------
# source_cap / quantile_filter
# ---------------------------------------------------------------------------


def test_source_cap_keeps_under_cap_groups_whole(spark):
    import hashlib as _h

    from feast_spark.operators.selection import source_cap

    # source "tail" has 3 docs (under cap=5) -> kept verbatim via the
    # broadcast anti-join branch; "mega" has 12 (over cap) -> exactly 5
    # kept, chosen by ascending md5(doc_id).
    rows = [(i, "tail") for i in range(3)] + [(100 + i, "mega") for i in range(12)]
    d = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source"]))
    out = source_cap(d, group_col="source", cap=5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert sorted(by_src["tail"]) == [0, 1, 2]
    exp = sorted(
        (100 + i for i in range(12)),
        key=lambda i: _h.md5(str(i).encode()).hexdigest(),
    )[:5]
    assert sorted(by_src["mega"]) == sorted(exp)


def test_source_cap_key_stable_under_repartition(spark):
    from feast_spark.operators.selection import source_cap

    rows = [(i, f"s{i % 4}") for i in range(200)]
    d = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source"]))
    a = sorted(r["doc_id"] for r in source_cap(d, cap=10).collect())
    b = sorted(
        r["doc_id"] for r in source_cap(d.repartition(17), cap=10).collect()
    )
    assert a == b and len(a) == 40


def test_quantile_filter_upper_and_lower(spark):
    from feast_spark.operators.selection import quantile_filter

    d = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(11), "score": range(11)})
    )
    up = quantile_filter(d, F.col("score"), 0.5, keep="upper").collect()
    lo = quantile_filter(d, F.col("score"), 0.5, keep="lower").collect()
    # exact median of 0..10 is 5; threshold rides along
    assert sorted(r["score"] for r in up) == list(range(5, 11))
    assert sorted(r["score"] for r in lo) == list(range(0, 6))
    assert all(r["thr"] == 5.0 for r in up)


def test_quantile_filter_interpolated_threshold(spark):
    from feast_spark.operators.selection import quantile_filter

    d = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 1], "score": [0.0, 1.0]}))
    out = quantile_filter(d, F.col("score"), 0.3, keep="upper").collect()
    # quantile_cont interpolation: thr = 0.3 -> only score=1.0 survives
    assert len(out) == 1 and out[0]["score"] == 1.0
    assert abs(out[0]["thr"] - 0.3) < 1e-12


# ---------------------------------------------------------------------------
# bloom_contamination_check
# ---------------------------------------------------------------------------


def test_bloom_contamination_verify_matches_exact_arm(spark):
    """Bloom + exact-verify must equal the broadcast-exact operator row for
    row (false positives removed by the verification join)."""
    from feast_spark.operators.selection import bloom_contamination_check

    bench_text = "q1 q2 q3 q4"
    d = _docs(
        spark,
        [
            (0, f"intro {bench_text} outro pad pad2"),
            (1, "totally unrelated words here pad pad2"),
            (2, f"{bench_text} dup of benchmark pad"),
            (3, "more clean text with nothing shared at all"),
        ],
    )
    bench = spark.createDataFrame(pd.DataFrame({"bench_text": [bench_text]}))
    exact = {
        r["doc_id"]: (r["n_hit_grams"], r["contaminated"])
        for r in contamination_check(d, bench, n=4).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_hit_grams"], r["contaminated"])
        for r in bloom_contamination_check(
            d, bench, n=4, m_bits=1 << 16, verify=True
        ).collect()
    }
    assert bloom == exact


def test_bloom_contamination_unverified_upper_bounds_exact(spark):
    """verify=False may over-count (false positives) but never under-counts
    — the safe direction for decontamination. At a DELIBERATELY tiny
    filter (64 bits, 200 corpus grams) false positives are certain, so
    this also exercises the fp path."""
    from feast_spark.operators.selection import bloom_contamination_check

    rng_words = [f"w{i}" for i in range(200)]
    d = _docs(spark, [(0, " ".join(rng_words)), (1, "b1 b2 b3 b4 tail word pad")])
    bench = spark.createDataFrame(pd.DataFrame({"bench_text": ["b1 b2 b3 b4"]}))
    exact = {
        r["doc_id"]: r["n_hit_grams"]
        for r in contamination_check(d, bench, n=4).collect()
    }
    loose = {
        r["doc_id"]: r["n_hit_grams"]
        for r in bloom_contamination_check(
            d, bench, n=4, m_bits=8, k_hashes=1, verify=False
        ).collect()
    }
    assert all(loose[k] >= exact[k] for k in exact)
    assert sum(loose.values()) > sum(exact.values())  # fps actually occurred
    # properly sized filter: no false positives on this corpus
    tight = {
        r["doc_id"]: r["n_hit_grams"]
        for r in bloom_contamination_check(
            d, bench, n=4, m_bits=1 << 16, verify=False
        ).collect()
    }
    assert tight == exact


def test_bloom_contamination_rejects_non_power_of_two(spark):
    from feast_spark.operators.selection import bloom_contamination_check

    d = _docs(spark, [(0, "a b c d e")])
    bench = spark.createDataFrame(pd.DataFrame({"bench_text": ["a b c d"]}))
    with pytest.raises(ValueError, match="power of two"):
        bloom_contamination_check(d, bench, n=4, m_bits=100)


# ---------------------------------------------------------------------------
# substring_dedup (Lee et al. ExactSubstr)
# ---------------------------------------------------------------------------


def _substring_reference(rows, k):
    """Sequential replay of the ExactSubstr semantic: corpus order
    (doc_id asc, pos asc); first instance of each stride-1 k-gram keeps,
    later instances cut [pos, pos+k) in their own doc."""
    seen = set()
    expected = {}
    for doc_id, text in sorted(rows):
        w = text.split(" ")
        cut: set = set()
        for i in range(len(w) - k + 1):
            g = tuple(w[i : i + k])
            if g in seen:
                cut.update(range(i, i + k))
            else:
                seen.add(g)
        kept = [w[t] for t in range(len(w)) if t not in cut]
        if kept:
            expected[doc_id] = (" ".join(kept), len(w), len(kept))
    return expected


def test_substring_dedup_cuts_straddling_repeats(spark):
    from feast_spark.operators.selection import substring_dedup

    rows = [
        (0, "a b c d e f g h i j"),     # first occurrence
        (1, "x y a b c d e f g h z w"), # repeat straddles no span boundary issue
        (2, "p q r s"),                 # shorter than k: untouched
        (3, "a b c d e f g h i j"),     # verbatim copy -> fully cut, vanishes
    ]
    out = {
        r["doc_id"]: (r["dedup_text"], r["n_tokens"], r["n_kept"])
        for r in substring_dedup(_docs(spark, rows), k=8).collect()
    }
    assert out == {
        0: ("a b c d e f g h i j", 10, 10),
        1: ("x y z w", 12, 4),
        2: ("p q r s", 4, 4),
    }


def test_substring_dedup_within_doc_repeat(spark):
    # a phrase repeated INSIDE one doc: the second copy is cut too
    from feast_spark.operators.selection import substring_dedup

    rows = [(0, "a b c u v a b c")]
    out = substring_dedup(_docs(spark, rows), k=3).collect()
    assert [(r["dedup_text"], r["n_kept"]) for r in out] == [("a b c u v", 5)]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_substring_dedup_matches_python_reference(spark, seed):
    from feast_spark.operators.selection import substring_dedup

    rows = _random_corpus(seed)
    out = {
        r["doc_id"]: (r["dedup_text"], r["n_tokens"], r["n_kept"])
        for r in substring_dedup(_docs(spark, rows), k=3).collect()
    }
    assert out == _substring_reference(rows, 3)


@pytest.mark.parametrize("seed", [4, 5])
def test_substring_dedup_xxhash64_arm_parity(spark, seed):
    from feast_spark.operators.selection import substring_dedup

    d = _docs(spark, _random_corpus(seed))
    a = sorted(map(tuple, substring_dedup(d, k=3).collect()))
    b = sorted(map(tuple, substring_dedup(d, k=3, method="xxhash64").collect()))
    assert a == b


def test_substring_dedup_xxhash64_plan_carries_no_gram_strings(spark):
    # the scale arm's first-occurrence window must key on the 8-byte
    # hash: its input exchange partitions by g# (bigint), and the plan
    # below the window carries no gram-string attribute
    from feast_spark.operators.selection import substring_dedup

    plan = (
        substring_dedup(_docs(spark, _random_corpus(9)), k=3, method="xxhash64")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.find("Exchange hashpartitioning(g#") != -1, plan
    assert "xxhash64" in plan


# ---------------------------------------------------------------------------
# diverse_sample (greedy k-center coreset selection)
# ---------------------------------------------------------------------------


def test_greedy_kcenter_picks_one_per_tight_group():
    # three tight orthogonal groups, budget 3 -> exactly one pick per
    # group, every coverage tiny; first pick is the smallest id
    from feast_spark.operators.similarity import greedy_kcenter

    rng = np.random.default_rng(5)
    groups = np.eye(3)
    ids, vecs = [], []
    for g in range(3):
        for j in range(6):
            ids.append(g * 100 + j)
            vecs.append(groups[g] + 1e-4 * rng.normal(size=3))
    sel_rank, coverage = greedy_kcenter(np.array(ids), np.array(vecs), 3)
    picked = {ids[i] // 100 for i in range(len(ids)) if sel_rank[i] >= 0}
    assert picked == {0, 1, 2}
    assert sel_rank[0] == 0  # smallest id starts the traversal
    assert coverage.max() < 1e-6
    assert (coverage[sel_rank >= 0] == 0.0).all()


def test_greedy_kcenter_rank_is_farthest_first():
    from feast_spark.operators.similarity import greedy_kcenter

    # ids 0,1 nearly parallel; id 2 orthogonal: pick order 0 then 2
    ids = np.array([0, 1, 2])
    vecs = np.array([[1.0, 0.0], [0.999, 0.01], [0.0, 1.0]])
    sel_rank, _ = greedy_kcenter(ids, vecs, 2)
    assert sel_rank.tolist() == [0, -1, 1]


def test_diverse_sample_budget_and_determinism(spark):
    from feast_spark.operators.similarity import diverse_sample

    rng = np.random.default_rng(11)
    rows = [(i, rng.normal(size=8).astype(np.float32).tolist()) for i in range(60)]
    emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    out = diverse_sample(emb, rate=0.25, n_clusters=4).collect()
    assert len(out) == 60
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for c, members in by_cluster.items():
        n_sel = sum(1 for r in members if r["selected"])
        assert n_sel == int(np.ceil(0.25 * len(members)))
        ranks = sorted(r["sel_rank"] for r in members if r["selected"])
        assert ranks == list(range(n_sel))  # dense 0..k-1 pick order
        for r in members:
            if r["selected"]:
                assert r["coverage"] == 0.0
            else:
                assert r["sel_rank"] == -1 and r["coverage"] > 0.0
    # repartition-invariant (kernel sorts by id internally)
    again = diverse_sample(emb.repartition(7), rate=0.25, n_clusters=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# pack_token_sequences (token-exact contiguous-stream packing)
# ---------------------------------------------------------------------------


def _packed_reference(id_arrays: dict, L: int):
    stream, bounds = [], []
    for d in sorted(id_arrays):
        ids = id_arrays[d]
        bounds.append((len(stream), len(stream) + len(ids)))
        stream.extend(ids)
    exp = {}
    for s in range((len(stream) + L - 1) // L):
        seg = stream[s * L : (s + 1) * L]
        nd = sum(1 for a, b in bounds if a < (s + 1) * L and b > s * L and b > a)
        exp[s] = (seg, nd)
    return exp, len(stream)


def test_pack_token_sequences_matches_reference(spark):
    from feast_spark.operators.selection import pack_token_sequences

    rng = np.random.default_rng(21)
    id_arrays = {
        i: rng.integers(0, 50, size=rng.integers(0, 40)).tolist() for i in range(30)
    }
    enc = spark.createDataFrame(
        [(d, ids) for d, ids in id_arrays.items()],
        "doc_id long, token_ids array<int>",
    )
    out = {
        r["seq_id"]: (list(r["token_ids"]), r["n_docs"])
        for r in pack_token_sequences(enc, seq_len=16, bucket_docs=8).collect()
    }
    exp, total = _packed_reference(id_arrays, 16)
    assert out == exp
    # every token crosses into exactly one sequence
    assert sum(len(v[0]) for v in out.values()) == total
    # repartition-invariant
    out2 = {
        r["seq_id"]: (list(r["token_ids"]), r["n_docs"])
        for r in pack_token_sequences(
            enc.repartition(5), seq_len=16, bucket_docs=8
        ).collect()
    }
    assert out2 == exp


def test_pack_token_sequences_doc_straddles_many_sequences(spark):
    from feast_spark.operators.selection import pack_token_sequences

    # one 25-token doc at offset 3 straddles seqs 0,1,2,3 at L=8
    enc = spark.createDataFrame(
        [(0, list(range(100, 103))), (1, list(range(25)))],
        "doc_id long, token_ids array<int>",
    )
    rows = {r["seq_id"]: r for r in pack_token_sequences(enc, seq_len=8).collect()}
    assert list(rows[0]["token_ids"]) == [100, 101, 102, 0, 1, 2, 3, 4]
    assert rows[0]["n_docs"] == 2
    assert list(rows[3]["token_ids"]) == [21, 22, 23, 24]
    assert rows[3]["n_docs"] == 1


# ---------------------------------------------------------------------------
# paragraph_dedup (Dolma exact paragraph dedup)
# ---------------------------------------------------------------------------


def test_paragraph_dedup_semantics_and_arm_parity(spark):
    from feast_spark.operators.selection import paragraph_dedup

    footer = "shared footer text"
    rows = [
        (1, f"alpha beta\n\n{footer}\n\ngamma delta"),
        (2, f"{footer}\n\nunique two"),
        (3, footer),  # fully duplicated -> disappears
        (4, "  \n\nkept after blank"),  # blank paragraph filtered
    ]
    d = _docs(spark, rows)
    got = {r["doc_id"]: r for r in paragraph_dedup(d).collect()}
    # doc 1 is the first occurrence of every one of its paragraphs
    assert got[1]["dedup_text"] == rows[0][1]
    assert got[1]["n_paras_kept"] == 3 and got[1]["n_paras_total"] == 3
    # doc 2 loses the footer (doc 1 owns it), keeps its unique paragraph
    assert got[2]["dedup_text"] == "unique two"
    assert got[2]["n_paras_kept"] == 1 and got[2]["n_paras_total"] == 2
    assert 3 not in got
    assert got[4]["dedup_text"] == "kept after blank"
    assert got[4]["n_paras_total"] == 1  # blank never counted
    xx = {
        r["doc_id"]: r.asDict()
        for r in paragraph_dedup(d, method="xxhash64").collect()
    }
    assert xx == {k: v.asDict() for k, v in got.items()}


def test_paragraph_dedup_first_occurrence_doc_then_idx(spark):
    from feast_spark.operators.selection import paragraph_dedup

    # same paragraph at (doc 0, idx 1) and (doc 1, idx 0): doc 0 wins
    d = _docs(spark, [(0, "one\n\ndup para"), (1, "dup para\n\ntwo")])
    out = {
        r["doc_id"]: r["dedup_text"] for r in paragraph_dedup(d).collect()
    }
    assert out[0] == "one\n\ndup para"
    assert out[1] == "two"


def test_paragraph_dedup_literal_separator_not_regex(spark):
    from feast_spark.operators.selection import paragraph_dedup

    # a regex-metachar separator must be treated literally
    d = _docs(spark, [(0, "a|+|b|+|a"), (1, "b")])
    out = {
        r["doc_id"]: r for r in paragraph_dedup(d, sep="|+|").collect()
    }
    assert out[0]["dedup_text"] == "a|+|b"
    assert out[0]["n_paras_total"] == 3
    assert 1 not in out  # doc 1's only paragraph was seen in doc 0


def test_paragraph_dedup_xxhash64_plan_carries_no_strings(spark):
    from feast_spark.operators.selection import paragraph_dedup

    rows = [(i, f"p{i} q{i}\n\ncommon tail") for i in range(8)]
    plan = (
        paragraph_dedup(_docs(spark, rows), method="xxhash64")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.find("Exchange hashpartitioning(h#") != -1, plan


# ---------------------------------------------------------------------------
# exact_k_sample (fixed-size deterministic stratified sampling)
# ---------------------------------------------------------------------------


def test_exact_k_sample_sizes_and_determinism(spark):
    import hashlib

    from pyspark.sql import functions as F

    from feast_spark.operators.selection import exact_k_sample

    rows = [(i, f"s{i % 3}") for i in range(100)] + [(900, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = exact_k_sample(
        df, F.col("doc_id").cast("string"), 5, stratum=F.col("source")
    ).collect()
    by_s: dict = {}
    for r in out:
        by_s.setdefault(r["source"], []).append(r)
    # exactly min(k, n) per stratum
    assert {s: len(v) for s, v in by_s.items()} == {
        "s0": 5, "s1": 5, "s2": 5, "tiny": 1,
    }
    # the picks are the k smallest md5 digests, ranks follow digest order
    for s, members in (("s0", range(0, 100, 3)), ("tiny", [900])):
        want = sorted(
            (hashlib.md5(str(i).encode()).hexdigest(), str(i)) for i in members
        )[:5]
        got = sorted(by_s[s], key=lambda r: r["sample_rank"])
        assert [str(r["doc_id"]) for r in got] == [w[1] for w in want]
    # layout-independent: same picks under a different partitioning
    out2 = exact_k_sample(
        df.repartition(7, "doc_id"),
        F.col("doc_id").cast("string"),
        5,
        stratum=F.col("source"),
    ).collect()
    assert sorted((r["source"], r["doc_id"]) for r in out) == sorted(
        (r["source"], r["doc_id"]) for r in out2
    )


def test_exact_k_sample_plan_uses_window_group_limit(spark):
    from pyspark.sql import functions as F

    from feast_spark.operators.selection import exact_k_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).alias("src")
    )
    plan = (
        exact_k_sample(df, F.col("doc_id").cast("string"), 3,
                       stratum=F.col("src"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_paragraph_dedup_incremental_equals_one_shot(spark):
    from feast_spark.operators.selection import (
        paragraph_dedup,
        paragraph_dedup_incremental,
    )

    footer = "the common tail paragraph"
    rows = [
        (i, f"u{i} v{i}\n\n{footer}" + ("\n\nmid shared" if i % 3 == 0 else ""))
        for i in range(30)
    ]
    d = _docs(spark, rows)
    one_shot = {
        r["doc_id"]: r.asDict()
        for r in paragraph_dedup(d, method="xxhash64").collect()
    }
    # id-ordered batches: [0,10), [10,20), [20,30)
    from pyspark.sql import functions as F

    state = None
    got = {}
    for b in range(3):
        batch = d.filter(
            (F.col("doc_id") >= b * 10) & (F.col("doc_id") < (b + 1) * 10)
        )
        deduped, new_h = paragraph_dedup_incremental(batch, state)
        for r in deduped.collect():
            got[r["doc_id"]] = r.asDict()
        nh = new_h
        state = nh if state is None else state.unionByName(nh).distinct()
        # distinct above only to keep the test-side state tiny; the
        # contract guarantees disjointness, asserted here:
        assert state.count() == state.select("h").distinct().count()
        state = state.localCheckpoint()
    assert got == one_shot


# ------------------------------------------------------- weighted sampling


def test_weighted_sample_k_exact_size_and_determinism(spark):
    from feast_spark.operators.selection import weighted_sample_k

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.pmod("id", F.lit(4))).cast("string").alias("g"),
        (F.pmod("id", F.lit(7)) + 1).cast("double").alias("w"),
    )
    out = weighted_sample_k(
        df, F.col("doc_id"), F.col("w"), 10, stratum=F.col("g")
    )
    pdf = out.toPandas()
    assert (pdf.groupby("g").size() == 10).all()
    # layout-independence: same picks after an arbitrary repartition
    pdf2 = weighted_sample_k(
        df.repartition(17), F.col("doc_id"), F.col("w"), 10,
        stratum=F.col("g"),
    ).toPandas()
    a = set(map(tuple, pdf[["g", "doc_id"]].to_numpy()))
    b = set(map(tuple, pdf2[["g", "doc_id"]].to_numpy()))
    assert a == b


def test_weighted_sample_k_is_weight_proportional_and_skips_nonpositive(spark):
    import numpy as np

    from feast_spark.operators.selection import weighted_sample_k

    # 900 light rows (w=1) + 100 heavy rows (w=50) + zero/NULL weights:
    # expected heavy share of a k=200 A-ES sample is ~85%; assert a loose
    # deterministic band (the draw is fixed by md5, not random at test
    # time) and that non-positive weights never appear
    df = spark.range(1010).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") >= 1000, F.lit(0.0))
        .when(F.col("id") % 10 == 0, F.lit(50.0))
        .otherwise(F.lit(1.0))
        .alias("w"),
    ).withColumn(
        "w", F.when(F.col("doc_id") == 1005, F.lit(None)).otherwise(F.col("w"))
    )
    pdf = weighted_sample_k(df, F.col("doc_id"), F.col("w"), 200).toPandas()
    assert len(pdf) == 200
    assert (pdf["w"] > 0).all()
    heavy = int((pdf["w"] == 50.0).sum())
    # E[heavy] ≈ 100·(1-(1-p)^...) — nearly all 100 heavy rows make a
    # k=200 cut when they carry 5000/5900 of the total weight
    assert heavy >= 85, heavy
    # sanity: ranks are 1..k and keys ascend with rank within the stratum
    s = pdf.sort_values("sample_rank")
    assert list(s["sample_rank"]) == list(range(1, 201))
    assert (np.diff(s["sample_key"].to_numpy()) >= 0).all()


def test_weighted_sample_k_plan_bounds_shuffle(spark):
    from feast_spark.operators.selection import weighted_sample_k

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit(2.0).alias("w"),
        (F.pmod("id", F.lit(3))).cast("string").alias("g"),
    )
    plan = (
        weighted_sample_k(df, F.col("doc_id"), F.col("w"), 5,
                          stratum=F.col("g"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # rank rewritten to WindowGroupLimit: each map task keeps <= k rows
    # per stratum BEFORE the exchange
    assert "WindowGroupLimit" in plan


def test_unimax_allocation_integer_fold():
    """Both branches: small languages cap at max_epochs*size, their
    unused fair share flows to larger ones; everything integer-exact."""
    from feast_spark.operators.selection import unimax_allocation

    sizes = {"en": 1000, "de": 100, "fr": 50}
    alloc = unimax_allocation(sizes, budget=600, max_epochs=1)
    # ascending visit: fr fair=200 -> cap 50; de fair=(550)//2=275 ->
    # cap 100; en fair=450 -> 450
    assert alloc == {"fr": 50, "de": 100, "en": 450}
    assert sum(alloc.values()) == 600
    # epochs raise the cap
    alloc2 = unimax_allocation(sizes, budget=600, max_epochs=4)
    assert alloc2 == {"fr": 200, "de": 200, "en": 200}
    # budget larger than all caps: leftover stays unspent
    alloc3 = unimax_allocation(sizes, budget=5000, max_epochs=1)
    assert alloc3 == {"fr": 50, "de": 100, "en": 1000}
    # size ties visit in language order (deterministic)
    assert unimax_allocation({"b": 10, "a": 10}, 15, 1) == {"a": 7, "b": 8}


def test_unimax_sample_invariants(spark):
    """Per language: kept tokens cross the allocation by at most the
    boundary document; selection is deterministic and layout-independent;
    every positive allocation contributes at least one document."""
    from feast_spark.operators.selection import (
        unimax_allocation,
        unimax_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = unimax_sample(docs, budget=9000, max_epochs=1).toPandas()
    assert len(out) > 0
    g = out.groupby("lang")
    for lang, grp in g:
        alloc = grp["lang_alloc"].iloc[0]
        tot = grp["n_tokens"].sum()
        # the boundary doc is included -> tot >= alloc (when enough
        # supply) and removing the LAST selected doc drops below alloc
        last = grp.sort_values("cum_before")["n_tokens"].iloc[-1]
        assert tot - last < alloc <= tot or tot < alloc  # undersupply
        assert (grp["cum_before"] < alloc).all()
    # repartitioned input -> identical selection
    out2 = (
        unimax_sample(docs.repartition(13), budget=9000, max_epochs=1)
        .toPandas()
    )
    k = ["doc_id"]
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # shared kernel agreement: per-language totals match the driver fold
    import re as _re

    sizes = out.groupby("lang")["lang_alloc"].first()
    ws = _re.compile(r"[ \t\n\x0b\f\r]+")
    pdf = docs.toPandas()
    full = {
        lang: int(
            pdf[pdf["lang"] == lang]["text"]
            .map(lambda t: len([x for x in ws.split(t or "") if x]))
            .sum()
        )
        for lang in pdf["lang"].unique()
    }
    expect = unimax_allocation(full, 9000, 1)
    assert {k_: int(v) for k_, v in sizes.items()} == {
        k_: v for k_, v in expect.items() if k_ in sizes.index
    }


def test_unimax_sample_plan_broadcasts_and_buckets(spark):
    """Plan audit: the offset and allocation tables join via broadcast;
    no global sort; the prefix-sum window partitions on (lang, bucket)."""
    from feast_spark.operators.selection import unimax_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        unimax_sample(docs, budget=9000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]
    assert "CartesianProduct" not in plan
    assert "Sort [lang" not in plan or "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# select_token_budget
# ---------------------------------------------------------------------------


def _stb_replay(pdf, budget, n_buckets=4096, seed="tb1"):
    """Pure-python replay of the documented global rule: order by
    (score_bucket DESC, md5_48, id), keep while exclusive cum < budget."""
    import hashlib

    mn, mx = int(pdf["score"].min()), int(pdf["score"].max())
    step = max(1, -((mn - mx - 1) // n_buckets))

    def h(i):
        return int(hashlib.md5(f"{seed}{i}".encode()).hexdigest()[:12], 16)

    rows = sorted(
        pdf.itertuples(index=False),
        key=lambda r: (-((int(r.score) - mn) // step), h(r.doc_id), r.doc_id),
    )
    kept, cum = [], 0
    for r in rows:
        if cum < budget:
            kept.append(int(r.doc_id))
        cum += int(r.n_tokens)
    return sorted(kept)


def test_select_token_budget_matches_global_rule_replay(spark):
    from feast_spark.operators.selection import select_token_budget

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = docs.select(
        "doc_id", "text", (F.col("doc_id") % 37).cast("long").alias("q")
    )
    out = select_token_budget(scored, 8000, "q").toPandas()
    # exclusive-cum rule: total kept crosses the budget by at most the
    # boundary document
    assert out["n_tokens"].sum() >= 8000
    assert out["n_tokens"].sum() - out["n_tokens"].max() < 8000
    # replay needs every doc's (score, n_tokens): a budget beyond the
    # corpus total returns the full scored/sized table
    full = select_token_budget(scored, 10**12, "q").toPandas()
    replay = _stb_replay(full, 8000)
    assert sorted(out["doc_id"]) == replay
    # layout independence
    out2 = select_token_budget(scored.repartition(13), 8000, "q").toPandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_select_token_budget_edges(spark):
    from feast_spark.operators.selection import select_token_budget

    d = _docs(
        spark,
        [(1, "a b c"), (2, "d e"), (3, "f g h i"), (4, "j")],
    ).withColumn("s", F.col("doc_id").cast("long"))
    # budget >= corpus -> keep all
    assert select_token_budget(d, 1000, "s").count() == 4
    # tiny budget -> exactly the crossing doc (highest score bucket first)
    one = select_token_budget(d, 1, "s").toPandas()
    assert list(one["doc_id"]) == [4]
    # empty input
    assert select_token_budget(d.filter("doc_id < 0"), 5, "s").count() == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        select_token_budget(d, 0, "s")


def test_select_token_budget_plan_is_sortfree_outside_straddle(spark):
    """Plan audit: the bucket flag tables join via broadcast; the
    fully-kept branch never sorts or windows corpus rows; no cartesian;
    the only corpus-keyed window partitions on the straddle hash
    bucket."""
    from feast_spark.operators.selection import select_token_budget

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = docs.select(
        "doc_id", "text", (F.col("doc_id") % 37).cast("long").alias("q")
    )
    plan = (
        select_token_budget(scored, 8000, "q")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]
    # the corpus-grain window partitions on the straddle bucket key
    assert "windowspecdefinition(__b" in plan


# ---------------------------------------------------------------------------
# temperature_sample_rates (round 5 session 8)
# ---------------------------------------------------------------------------


def test_temperature_rates_match_python_replay(spark):
    import math

    sizes = {"en": 9_000_000, "de": 640_000, "zh": 250_000, "sw": 4_100}
    df = spark.createDataFrame(
        [(k, v) for k, v in sizes.items()], "lang string, tokens long"
    )
    from feast_spark.operators.selection import temperature_sample_rates

    U = 1 << 20
    for alpha in (0.25, 0.5, 0.75, 1.0):
        def temper_units(w):
            a, b = math.sqrt(w), math.sqrt(math.sqrt(w))
            if alpha == 1.0:
                return w  # scale 1: exact int64, no double round-trip
            return math.floor({0.25: b, 0.5: a, 0.75: a * b}[alpha] * U)

        s = {k: temper_units(v) for k, v in sizes.items()}
        tw, ts = sum(sizes.values()), sum(s.values())
        got = {
            r["lang"]: r.asDict()
            for r in temperature_sample_rates(
                df, "lang", "tokens", alpha=alpha, budget=500_000
            ).collect()
        }
        for k in sizes:
            assert got[k]["s_units"] == s[k], (alpha, k)
            assert got[k]["p_units"] == sizes[k] * U // tw
            assert got[k]["q_units"] == s[k] * U // ts
            assert got[k]["budget_tokens"] == 500_000 * s[k] // ts
        # tempering flattens: low-resource share rises monotonically as
        # alpha drops (sw's tempered share >= its proportional share)
        assert got["sw"]["q_units"] >= got["sw"]["p_units"]
        # floor division never over-allocates
        assert sum(g["budget_tokens"] for g in got.values()) <= 500_000


def test_temperature_rates_rejects_non_dyadic_alpha(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("en", 10)], "lang string, tokens long")
    from feast_spark.operators.selection import temperature_sample_rates

    with _pytest.raises(ValueError, match="dyadic"):
        temperature_sample_rates(df, "lang", "tokens", alpha=0.3)


def test_temperature_rates_broadcasts_totals(spark):
    df = spark.createDataFrame(
        [("en", 100), ("de", 50)], "lang string, tokens long"
    )
    from feast_spark.operators.selection import temperature_sample_rates

    plan = (
        temperature_sample_rates(df, "lang", "tokens")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Exchange hashpartitioning" not in plan  # no shuffle of groups


def test_temperature_rates_alpha1_huge_weights_exact(spark):
    # alpha=1.0 takes the identity scale: no double round-trip, no
    # int64 overflow even at weights far past 2^43 (round-5 review)
    from feast_spark.operators.selection import temperature_sample_rates

    big = 1 << 50
    df = spark.createDataFrame(
        [("en", big), ("sw", 3)], "lang string, tokens long"
    )
    got = {
        r["lang"]: r.asDict()
        for r in temperature_sample_rates(
            df, "lang", "tokens", alpha=1.0, budget=10**6
        ).collect()
    }
    U = 1 << 20
    assert got["en"]["s_units"] == big
    assert got["en"]["q_units"] == big * U // (big + 3)
    assert got["sw"]["budget_tokens"] == 10**6 * 3 // (big + 3)
