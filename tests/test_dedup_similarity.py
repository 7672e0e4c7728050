"""Semantics tests for near-dup + similarity operators on planted data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from feast_spark.operators.dedup import (
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_dup_pairs,
)
from feast_spark.operators.similarity import cosine_topk, lsh_topk


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the clocks "
        "were striking thirteen and the wind was cold outside the house"
    )
    rows = [
        (0, base),
        (1, base),                                  # exact dup
        (2, base.replace("cold", "warm")),          # near dup (1 word)
        (3, base + " extra trailing words here"),   # near dup (suffix)
        (4, "completely different content about spark shuffle partitions "
            "and adaptive query execution in distributed engines"),
        (5, "yet another unrelated document mentioning feature stores and "
            "point in time joins for machine learning pipelines"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_minhash_finds_planted_dups(docs):
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=32, bands=8, jaccard_threshold=0.6
    ).toPandas()
    found = {tuple(p) for p in pairs[["id_a", "id_b"]].to_numpy()}
    assert (0, 1) in found
    assert (0, 2) in found or (1, 2) in found
    # unrelated docs must not pair with the fox cluster
    assert not any(4 in p or 5 in p for p in found)
    exact = pairs[(pairs.id_a == 0) & (pairs.id_b == 1)]
    assert exact.jaccard.iloc[0] == 1.0


def test_minhash_dedup_keeps_smallest_id(docs):
    kept = minhash_dedup(
        docs, "doc_id", "text", num_hashes=32, bands=8, jaccard_threshold=0.6
    ).toPandas()
    ids = set(kept.doc_id)
    assert 0 in ids and 1 not in ids
    assert {4, 5} <= ids


def test_simhash_near_dups(docs):
    pairs = simhash_dup_pairs(docs, "doc_id", "text", hamming_threshold=6).toPandas()
    found = {tuple(p) for p in pairs[["id_a", "id_b"]].to_numpy()}
    assert (0, 1) in found
    assert pairs[(pairs.id_a == 0) & (pairs.id_b == 1)].hamming.iloc[0] == 0
    assert not any((4 in p and 5 in p) for p in found)


def test_ngram_jaccard_exact_values(docs, spark):
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3).toPandas()
    row = pairs[(pairs.id_a == 0) & (pairs.id_b == 1)]
    assert row.jaccard.iloc[0] == 1.0


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((60, 16)).astype(np.float32)
    vecs[1] = vecs[0] + 0.01 * rng.standard_normal(16).astype(np.float32)  # near dup
    pdf = pd.DataFrame(
        {"vec_id": range(60), "embedding": [v.tolist() for v in vecs]}
    )
    return spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")


def test_cosine_topk_exact(emb):
    out = cosine_topk(emb, emb.filter("vec_id = 0"), k=3).toPandas()
    assert len(out) == 3
    top1 = out[out["rank"] == 1]
    assert top1.neighbor_id.iloc[0] == 1  # planted nearest
    assert top1.cosine.iloc[0] > 0.99
    # numpy cross-check of the full ranking
    pdf = emb.toPandas()
    mat = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    sims = mat @ mat[0] / (np.linalg.norm(mat, axis=1) * np.linalg.norm(mat[0]))
    sims[0] = -np.inf
    exp_top = set(np.argsort(-sims)[:3])
    assert set(out.neighbor_id) == exp_top


def test_lsh_topk_recall(emb):
    exact = cosine_topk(emb, emb.filter("vec_id < 10"), k=3).toPandas()
    approx = lsh_topk(emb, emb.filter("vec_id < 10"), k=3, dim=16, num_bits=4).toPandas()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # LSH trades recall for candidate-set size; with 4 bits + 1-bit
    # multiprobe 5/16 of the space is probed — random far neighbors are
    # lossy, but the planted NEAR duplicate must always survive bucketing
    assert recall >= 0.3, f"LSH recall {recall}"
    assert (0, 1) in approx_pairs


def test_connected_components_chain_and_isolates(spark):
    import pandas as pd
    from feast_spark.operators.dedup import connected_components

    # chain 1-2-3 (no direct 1-3), separate pair 10-11, long chain 20..24
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "id_a": [1, 2, 10, 20, 21, 22, 23],
                "id_b": [2, 3, 11, 21, 22, 23, 24],
            }
        )
    )
    out = connected_components(pairs).toPandas().sort_values("id")
    comp = dict(zip(out.id, out.component))
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20, 23: 20, 24: 20}


def test_minhash_dedup_transitive_chain(spark):
    import pandas as pd
    from feast_spark.operators.dedup import minhash_dedup

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest tonight while everyone sleeps quietly"
    )
    # A~B and B~C are near-dups, A and C differ more (transitive chain)
    a = base
    b = base.replace("quick", "swift")
    c = base.replace("quick", "swift").replace("lazy", "idle")
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [a, b, c, "completely different content here about cooking pasta recipes"],
            }
        )
    )
    kept = minhash_dedup(
        docs, "doc_id", "text", transitive=True,
        num_hashes=32, bands=16, jaccard_threshold=0.5,
    ).toPandas()
    assert sorted(kept.doc_id) == [0, 3]


def test_dedup_cache_lifecycle_no_growth(spark):
    import pandas as pd
    from feast_spark.operators.dedup import (
        minhash_lsh_pairs,
        release_dedup_caches,
        simhash_dup_pairs,
    )

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(20), "text": [f"doc number {i} words" for i in range(20)]})
    )

    def n_cached() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    release_dedup_caches()
    base = n_cached()
    for _ in range(5):
        minhash_lsh_pairs(
            docs, "doc_id", "text", release_previous_caches=True
        ).count()
        simhash_dup_pairs(
            docs, "doc_id", "text", release_previous_caches=True
        ).count()
    # each call releases the previous pass: at most one pass's caches live
    assert n_cached() - base <= 2
    release_dedup_caches()
    assert n_cached() <= base


def test_simhash_exact_pigeonhole_matches_bruteforce(spark):
    import numpy as np
    import pandas as pd
    from feast_spark.operators.dedup import _simhash_batch, simhash_dup_pairs

    rng = np.random.default_rng(0)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    texts = [
        " ".join(rng.choice(words, 12)) + (" tail" if i % 3 == 0 else "")
        for i in range(40)
    ]
    pdf = pd.DataFrame({"doc_id": range(40), "text": texts})
    docs = spark.createDataFrame(pdf)
    t = 8  # was only exact for t<=3 before the threshold+1 block fix
    got = (
        simhash_dup_pairs(docs, "doc_id", "text", hamming_threshold=t)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    h = _simhash_batch(pdf["text"]).view(np.uint64)
    exp = []
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            d = int(h[i] ^ h[j]).bit_count()
            if d <= t:
                exp.append((i, j, d))
    assert list(map(tuple, got.itertuples(index=False))) == exp


def test_bucket_cap_drops_degenerate_bucket(spark):
    import pandas as pd
    from feast_spark.operators.dedup import minhash_lsh_pairs

    # 30 identical docs -> one degenerate bucket of 30; cap of 10 must
    # suppress the quadratic candidate blowup (0 pairs survive the cap)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(30), "text": ["same exact text everywhere"] * 30})
    )
    uncapped = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_threshold=0.9)
    assert uncapped.count() == 30 * 29 // 2
    capped = minhash_lsh_pairs(
        docs, "doc_id", "text", jaccard_threshold=0.9, max_bucket_size=10
    )
    assert capped.count() == 0


def test_winnowing_guarantee_shared_substring(spark):
    import pandas as pd
    from feast_spark.operators.dedup import winnow_overlap_pairs

    # the paper's guarantee: a shared substring of length >= k+window-1
    # (= 8 here) yields at least one shared fingerprint
    shared_block = "identical boilerplate legal disclaimer paragraph here"
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "first document body. " + shared_block,
                    shared_block + " trailing unique content two",
                    "entirely different text with no overlap at all whatsoever",
                ],
            }
        )
    )
    pairs = winnow_overlap_pairs(
        docs, "doc_id", "text", k=5, window=4, min_shared=1
    ).toPandas()
    assert ((pairs.id_a == 0) & (pairs.id_b == 1)).any()
    assert not ((pairs.id_b == 2) | (pairs.id_a == 2)).any()


@pytest.mark.parametrize("seed,n,t", [(1, 2, 0.3), (2, 3, 0.5), (3, 2, 0.7)])
def test_prefix_jaccard_equals_quadratic_join(spark, seed, n, t):
    # the prefix filter must lose NOTHING: identical pair set + values
    # vs the all-pairs form, on corpora dense enough to have many pairs
    import numpy as np
    import pandas as pd

    from feast_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(6)]
    rows = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(n, 25))))
        for i in range(60)
    ]
    # plant guaranteed high-jaccard pairs (copy + one appended word) so
    # even the t=0.7 case has pairs to compare
    for j in range(5):
        rows.append((100 + j, rows[j][1] + " " + vocab[0]))
    d = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    exact = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(d, "doc_id", "text", n=n, threshold=t).collect()
    )
    fast = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in prefix_jaccard_pairs(d, "doc_id", "text", n=n, threshold=t).collect()
    )
    assert fast == exact and len(exact) > 0


def test_prefix_jaccard_planted_near_dup(spark):
    import pandas as pd

    from feast_spark.operators.dedup import prefix_jaccard_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(0, base), (1, base + " extra"), (2, "totally different words here now")]
    d = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {(r["id_a"], r["id_b"]) for r in
           prefix_jaccard_pairs(d, "doc_id", "text", n=2, threshold=0.5).collect()}
    assert (0, 1) in got and len(got) == 1


# ------------------------------------------------------ paragraph near-dup


def test_paragraph_neardup_finds_planted_near_identical_paragraphs(spark):
    from feast_spark.operators.dedup import (
        paragraph_neardup_pairs,
        release_dedup_caches,
    )

    # three docs; docs 1 and 2 share an IDENTICAL second paragraph, doc 3
    # carries a lightly edited variant (one word changed) — both the
    # exact and the fuzzy pair must surface; body paragraphs are distinct
    boiler = "this boilerplate footer paragraph repeats across documents verbatim"
    near = "this boilerplate footer paragraph repeats across pages verbatim"
    rows = [
        (1, "alpha unique body one\n\n" + boiler),
        (2, "beta different body two\n\n" + boiler),
        (3, "gamma third body text\n\n" + near),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = paragraph_neardup_pairs(df, jaccard_threshold=0.5).collect()
    release_dedup_caches()
    got = {
        ((r["doc_a"], r["para_a"]), (r["doc_b"], r["para_b"])): r["jaccard"]
        for r in pairs
    }
    assert got[((1, 1), (2, 1))] == 1.0
    # the edited variant pairs with both verbatim copies, below 1.0
    assert 0.5 <= got[((1, 1), (3, 1))] < 1.0
    assert 0.5 <= got[((2, 1), (3, 1))] < 1.0
    # distinct bodies never pair
    assert ((1, 0), (2, 0)) not in got


def test_paragraph_neardup_packing_guard_raises_on_idx_overflow(spark):
    from feast_spark.operators.dedup import (
        paragraph_neardup_pairs,
        release_dedup_caches,
    )

    # 5 paragraphs with idx_bits=2 (max 4): the packed-surrogate guard
    # must fail the job instead of silently colliding ids
    text = "\n\n".join(f"paragraph number {i} content here" for i in range(5))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    with pytest.raises(Exception, match="idx_bits|ASSERT"):
        paragraph_neardup_pairs(df, idx_bits=2).collect()
    release_dedup_caches()


def test_neardup_verify_edit_similarity_verdicts(spark):
    from feast_spark.operators.dedup import neardup_verify

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # exact
            (3, "the quick brown fox jumped over the lazy dog"),  # lev 2
            (4, "a b c d"),
            (5, "d c b a"),  # shares all unigram shingles, low edit sim
            (6, ""),
            (7, None),  # NULL projects to '' — empty vs empty is exact
            (8, "café résumé x"),  # ASCII-projects to 'caf rsum x'
            (9, "caf rsum x"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5), (6, 7), (8, 9)], "id_a long, id_b long"
    )
    out = {
        (r["id_a"], r["id_b"]): r.asDict()
        for r in neardup_verify(pairs, docs, threshold=0.8).collect()
    }
    u = 1 << 20
    assert out[(1, 2)]["sim_units"] == u and out[(1, 2)]["is_dup"]
    # one substitution + one insertion over 44 chars: (44-2)*u div 44
    assert out[(1, 3)]["sim_units"] == (44 - 2) * u // 44
    assert out[(1, 3)]["is_dup"]
    # order-blind shingle match fails the edit check: lev('a b c d',
    # 'd c b a') = 6 -> sim ~ 0.14 << 0.8
    assert not out[(4, 5)]["is_dup"]
    assert out[(6, 7)]["sim_units"] == u and out[(6, 7)]["is_dup"]
    # unicode strips identically on both sides -> exact after projection
    assert out[(8, 9)]["sim_units"] == u


def test_neardup_verify_max_chars_cap_and_plan(spark):
    from feast_spark.operators.dedup import neardup_verify

    docs = spark.createDataFrame(
        [(1, "identical prefix " + "x" * 50 + " tail one"),
         (2, "identical prefix " + "x" * 50 + " other ending")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    [r] = neardup_verify(pairs, docs, threshold=0.9, max_chars=60).collect()
    assert r["sim_units"] == 1 << 20 and r["is_dup"]  # divergence is past the cap
    plan = (
        neardup_verify(pairs, docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan


def test_neardup_verify_early_exit_parity(spark):
    # banded-DP arm: is_dup bit-identical to the exact arm across the
    # similarity spectrum; sim_units exact where confirmed, NULL where
    # the band exits early
    import random

    from feast_spark.operators.dedup import neardup_verify

    rng = random.Random(11)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf"]
    docs, pairs = [], []
    for i in range(40):
        base = [rng.choice(vocab) for _ in range(rng.randrange(5, 60))]
        mut = list(base)
        # mutation rate sweeps 0..~60%: pairs straddle every threshold
        for _ in range(int(len(mut) * (i / 40) * 0.6)):
            mut[rng.randrange(len(mut))] = rng.choice(vocab)
        docs += [(2 * i, " ".join(base)), (2 * i + 1, " ".join(mut))]
        pairs.append((2 * i, 2 * i + 1))
    # unrelated-doc pairs: rejected even at threshold 0.5
    for i in range(0, 40, 4):
        pairs.append((2 * i, 2 * ((i + 17) % 40)))
    docs += [(1000, ""), (1001, None)]
    pairs.append((1000, 1001))
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")

    for thr in (0.5, 0.8, 0.95):
        exact = {
            (r["id_a"], r["id_b"]): r.asDict()
            for r in neardup_verify(pdf, ddf, threshold=thr).collect()
        }
        banded = {
            (r["id_a"], r["id_b"]): r.asDict()
            for r in neardup_verify(
                pdf, ddf, threshold=thr, early_exit=True
            ).collect()
        }
        assert set(exact) == set(banded)
        confirmed = rejected = 0
        for k, e in exact.items():
            b = banded[k]
            assert b["is_dup"] == e["is_dup"], (thr, k, e, b)
            if e["is_dup"]:
                assert b["sim_units"] == e["sim_units"], (thr, k, e, b)
                confirmed += 1
            else:
                assert b["sim_units"] is None, (thr, k, b)
                rejected += 1
        # the sweep must actually exercise both branches
        assert confirmed > 0 and rejected > 0, (thr, confirmed, rejected)
