"""Distributed BPE trainer vs the pure-Python replay oracle + contract
tests (tie-break determinism, early stop, encode-count join shape)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_spark.operators.bpe import (
    BpeModel,
    END_OF_WORD,
    apply_merge,
    bpe_token_counts,
    encode_word,
    train_bpe,
    train_bpe_naive,
)


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _word_counts(rows) -> dict[str, int]:
    wc: dict[str, int] = {}
    for _, text in rows:
        for w in text.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


CORPUS = [
    (0, "low low low low low lower lower newest newest"),
    (1, "newest newest newest newest widest widest widest"),
    (2, "low lower newest widest widest new new new nest"),
    (3, "the the the quick quick brown fox low newest"),
]


def test_train_matches_naive_oracle(spark):
    d = _docs(spark, CORPUS)
    model = train_bpe(d, num_merges=24)
    expected = train_bpe_naive(_word_counts(CORPUS), num_merges=24)
    assert list(model.merges) == expected
    assert len(model.merges) == 24


def test_train_deterministic_across_parallelism(spark):
    d1 = _docs(spark, CORPUS).repartition(1)
    d16 = _docs(spark, CORPUS).repartition(16)
    assert train_bpe(d1, num_merges=12).merges == train_bpe(d16, num_merges=12).merges


def test_first_merges_are_the_frequent_pairs(spark):
    # 'low' x6, 'newest' x7, 'widest' x5 -> early merges must assemble
    # the dominant character pairs; the classic sanity property is that
    # frequent whole words end up as single tokens
    d = _docs(spark, CORPUS)
    model = train_bpe(d, num_merges=40)
    ranks = model.ranks
    assert encode_word("newest", ranks) == ["newest" + END_OF_WORD]
    assert encode_word("low", ranks) == ["low" + END_OF_WORD]


def test_early_stop_on_min_count(spark):
    d = _docs(spark, [(0, "ab ab cd")])
    # after merging everything reachable with count >= 2, training stops
    model = train_bpe(d, num_merges=50, min_count=2)
    expected = train_bpe_naive(_word_counts([(0, "ab ab cd")]), 50, min_count=2)
    assert list(model.merges) == expected
    assert len(model.merges) < 50


def test_encode_word_unknown_chars_pass_through():
    model = train_bpe_naive({"aa": 5}, num_merges=2)
    ranks = {p: i for i, p in enumerate(model)}
    # 'zq' shares no pair with the merges -> raw chars + end marker
    assert encode_word("zq", ranks) == ["z", "q", END_OF_WORD]


def test_apply_merge_non_overlapping_left_to_right():
    assert apply_merge(list("aaa"), "a", "a") == ["aa", "a"]
    assert apply_merge(["x", "y", "x", "y"], "x", "y") == ["xy", "xy"]


def test_token_counts_per_doc(spark):
    d = _docs(spark, CORPUS)
    model = train_bpe(d, num_merges=24)
    out = {r["doc_id"]: r for r in bpe_token_counts(d, model).collect()}
    ranks = model.ranks
    for doc_id, text in CORPUS:
        words = text.split()
        exp_tokens = sum(len(encode_word(w, ranks)) for w in words)
        assert out[doc_id]["n_words"] == len(words)
        assert out[doc_id]["n_bpe_tokens"] == exp_tokens
    # compression actually happened: fewer tokens than raw chars+1
    assert all(
        out[i]["n_bpe_tokens"]
        < sum(len(w) + 1 for w in t.split())
        for i, t in CORPUS
    )


def test_zero_merges_model_counts_chars(spark):
    d = _docs(spark, [(0, "ab c")])
    out = bpe_token_counts(d, BpeModel(merges=())).collect()[0]
    # 'ab' -> a b </w> (3), 'c' -> c </w> (2)
    assert out["n_words"] == 2 and out["n_bpe_tokens"] == 5


# ---------------------------------------------------------------------------
# bpe_encode (token-id encoding)
# ---------------------------------------------------------------------------


def _naive_encode(rows, num_merges):
    merges = train_bpe_naive(_word_counts(rows), num_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    cache = {}
    all_toks: set = set()
    per_doc = {}
    for doc_id, text in sorted(rows):
        ts = []
        for w in text.split():
            if w not in cache:
                cache[w] = encode_word(w, ranks)
            ts.extend(cache[w])
        per_doc[doc_id] = ts
        all_toks.update(ts)
    vid = {t: i for i, t in enumerate(sorted(all_toks))}
    return {d: [vid[t] for t in ts] for d, ts in per_doc.items()}, vid


def test_bpe_encode_matches_naive_and_is_partition_invariant(spark):
    import numpy as np

    from feast_spark.operators.bpe import bpe_encode

    rng = np.random.default_rng(13)
    vocab = ["red", "green", "blue", "cyan", "teal", "plum"]
    rows = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(1, 15))))
        for i in range(25)
    ]
    model = train_bpe(_docs(spark, rows), num_merges=10)
    expected, _ = _naive_encode(rows, 10)
    out = {
        r["doc_id"]: list(r["token_ids"])
        for r in bpe_encode(_docs(spark, rows), model).collect()
    }
    assert out == expected
    out2 = {
        r["doc_id"]: list(r["token_ids"])
        for r in bpe_encode(_docs(spark, rows).repartition(7), model).collect()
    }
    assert out2 == expected


def test_bpe_vocab_is_lexicographic_and_dense(spark):
    from feast_spark.operators.bpe import (
        _distinct_word_tokens,
        bpe_vocab,
    )

    rows = [(0, "aa ab aa"), (1, "b aa")]
    model = train_bpe(_docs(spark, rows), num_merges=4)
    wt = _distinct_word_tokens(_docs(spark, rows), model, "text")
    vocab = sorted(
        (r["token"], r["token_id"]) for r in bpe_vocab(wt).collect()
    )
    toks = [t for t, _ in vocab]
    assert toks == sorted(toks)
    assert [i for _, i in vocab] == list(range(len(vocab)))


def test_token_fertility_hand_computed(spark):
    from feast_spark.operators.bpe import BpeModel, token_fertility

    # empty model: every word splits into chars + the end-of-word marker
    # -> n_tokens = len(word) + 1
    model = BpeModel(merges=())
    rows = [
        (1, "en", "ab cd"),     # 2 words, 6 tokens, 4 bytes
        (2, "en", "abc"),       # 1 word, 4 tokens, 3 bytes
        (3, "de", "xyz xyz"),   # 2 words, 8 tokens, 6 bytes
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r.group: r for r in token_fertility(df, model).collect()}
    en, de = out["en"], out["de"]
    assert (en.n_docs, en.n_words, en.n_bpe_tokens, en.n_bytes) == (2, 3, 10, 7)
    assert en.fertility_units == 10 * (1 << 20) // 3
    assert en.bytes_per_token_units == 7 * (1 << 20) // 10
    assert (de.n_docs, de.n_words, de.n_bpe_tokens) == (1, 2, 8)


def test_token_fertility_plan_broadcasts_word_stats(spark):
    import contextlib
    import io

    from feast_spark.operators.bpe import token_fertility, train_bpe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_bpe(docs.limit(20), num_merges=4)
    out = token_fertility(docs, model)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # corpus never shuffled for the join
