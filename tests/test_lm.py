"""Contract tests for the corpus-trained stupid-backoff n-gram LM
(feast_spark/operators/lm.py) — oracle-parity evidence lives in
test_entry_oracle.py (lm_perplexity); these pin the training/scoring
contracts on corpora where the right answer is known by construction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_spark.operators.lm import (
    NgramLM,
    lm_perplexity,
    naive_lm_pdf,
    train_ngram_lm,
)


def _corpus(spark, seed=7, n_docs=40, vocab_size=60, min_w=3, max_w=40):
    rng = np.random.default_rng(seed)
    vocab = [
        "".join(rng.choice(list("abcdefghijklmnop"), 5)) for _ in range(vocab_size)
    ]
    texts = [
        " ".join(rng.choice(vocab, int(rng.integers(min_w, max_w))))
        for _ in range(n_docs)
    ]
    pdf = pd.DataFrame(
        {"doc_id": [str(i) for i in range(n_docs)], "text": texts}
    )
    return spark.createDataFrame(pdf), pdf


def test_lm_arms_agree_when_collision_free(spark):
    # distinct random 5-char tokens -> 64-bit keys collision-free in both
    # arms with overwhelming probability -> identical integer log sums
    df, pdf = _corpus(spark)
    out = {}
    for method in ("portable", "xxhash64"):
        m = train_ngram_lm(df, method=method, order=5)
        out[method] = (
            lm_perplexity(df, m)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert (
        out["portable"]["lp_sum"].to_numpy()
        == out["xxhash64"]["lp_sum"].to_numpy()
    ).all()
    assert (
        out["portable"]["n_tokens"].to_numpy()
        == out["xxhash64"]["n_tokens"].to_numpy()
    ).all()


def test_lm_in_domain_scores_lower(spark):
    # train on fluent in-domain docs; a verbatim in-domain doc must score
    # (much) lower perplexity than out-of-vocabulary gibberish
    df, pdf = _corpus(spark)
    model = train_ngram_lm(df, method="xxhash64", order=5)
    probe = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["seen", "gibberish"],
                "text": [pdf["text"][0], "zz qq xx vv kk ww yy uu tt ss"],
            }
        )
    )
    r = {x["doc_id"]: x["ppl"] for x in lm_perplexity(probe, model).collect()}
    assert r["seen"] < r["gibberish"]
    # every 5-gram of the seen doc has count 1 over its context -> every
    # position scores ~ln(1)=0 except early sentinel windows -> ppl ~ 1
    assert r["seen"] < 1.6 < r["gibberish"]


def test_lm_bucketed_model_is_bounded_and_deterministic(spark):
    df, _ = _corpus(spark, n_docs=30)
    m = train_ngram_lm(df, method="xxhash64", order=5, n_buckets=64)
    for name, (keys, cnts) in m.tables.items():
        assert len(keys) <= 64, name
        assert keys.min() >= 0 and keys.max() < 64
    a = lm_perplexity(df, m).toPandas().sort_values("doc_id")
    b = (
        lm_perplexity(df.repartition(13), m)
        .toPandas()
        .sort_values("doc_id")
    )
    assert (a["lp_sum"].to_numpy() == b["lp_sum"].to_numpy()).all()
    assert (a["ppl"].to_numpy() == b["ppl"].to_numpy()).all()


def test_lm_context_counts_are_consistent(spark):
    # sum_w count_k(ctx, w) == count(ctx): gram-table total of order k
    # equals context-table total of order k-1 equals total token count
    df, _ = _corpus(spark, n_docs=20)
    m = train_ngram_lm(df, method="xxhash64", order=4)
    totals = {t: int(c.sum()) for t, (k, c) in m.tables.items()}
    assert (
        totals["g1"]
        == totals["g2"]
        == totals["g3"]
        == totals["g4"]
        == totals["x1"]
        == totals["x2"]
        == totals["x3"]
        == m.n_tokens
    )


def test_lm_token_counts_match_split(spark):
    df, pdf = _corpus(spark, n_docs=15)
    m = train_ngram_lm(df, method="xxhash64", order=3)
    out = (
        lm_perplexity(df, m)
        .toPandas()
        .set_index("doc_id")["n_tokens"]
        .to_dict()
    )
    for _, row in pdf.iterrows():
        assert out[row["doc_id"]] == len(row["text"].split(" "))


def test_lm_train_slice_vs_score_all_matches_naive(spark):
    # the CCNet shape the driver query uses: train on a slice, score all
    df, pdf = _corpus(spark, n_docs=30)
    train = df.where(F.col("doc_id").cast("int") < 10)
    m = train_ngram_lm(train, method="portable", order=5)
    got = (
        lm_perplexity(df, m)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = naive_lm_pdf(
        pdf["text"],
        pdf["doc_id"],
        order=5,
        train_texts=pdf.loc[pdf["doc_id"].astype(int) < 10, "text"],
    ).sort_values("doc_id").reset_index(drop=True)
    assert (got["lp_sum"].to_numpy() == exp["lp_sum"].to_numpy()).all()
    assert (got["ppl"].to_numpy() == exp["ppl"].to_numpy()).all()


def test_lm_bucketed_portable_matches_naive_under_collisions(spark):
    # the pipeline's ALWAYS-bucketed shape, at a bucket count small
    # enough (61) that collisions are guaranteed: the Spark pmod and the
    # naive % must fold colliding grams into the same counts so both
    # arms stay bit-exact THROUGH the collisions (the parity the
    # doc_curation_lm oracle now relies on)
    df, pdf = _corpus(spark, n_docs=30)
    train = df.where(F.col("doc_id").cast("int") < 10)
    m = train_ngram_lm(train, method="portable", order=5, n_buckets=61)
    for name, (keys, _) in m.tables.items():
        assert len(keys) <= 61 and keys.max() < 61, name
    got = (
        lm_perplexity(df, m)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = naive_lm_pdf(
        pdf["text"],
        pdf["doc_id"],
        order=5,
        n_buckets=61,
        train_texts=pdf.loc[pdf["doc_id"].astype(int) < 10, "text"],
    ).sort_values("doc_id").reset_index(drop=True)
    assert (got["lp_sum"].to_numpy() == exp["lp_sum"].to_numpy()).all()
    assert (got["ppl"].to_numpy() == exp["ppl"].to_numpy()).all()
    # and collisions really happened (the test would otherwise prove
    # nothing beyond the exact-arm parity above)
    m_exact = train_ngram_lm(train, method="portable", order=5)
    assert len(m_exact.tables["g5"][0]) > 61


def test_lm_numpy_arm_matches_sql_arms_when_collision_free(spark):
    # three independent hash kernels (md5, xxhash64, prefix-product
    # numpy) -> identical counts on collision-free vocab -> identical lp
    df, _ = _corpus(spark, seed=11)
    out = {}
    for method in ("portable", "numpy"):
        m = train_ngram_lm(df, method=method, order=5)
        out[method] = (
            lm_perplexity(df, m).toPandas()
            .assign(doc_id=lambda d: d["doc_id"].astype(int))
            .sort_values("doc_id").reset_index(drop=True)
        )
    a, b = out["portable"], out["numpy"]
    assert (a["lp_sum"].to_numpy() == b["lp_sum"].to_numpy()).all()
    assert (a["ppl"].to_numpy() == b["ppl"].to_numpy()).all()


def test_lm_numpy_word_hash_matches_scalar_replay():
    import numpy as np

    from feast_spark.operators.lm import _word_hashes

    w, n = _word_hashes(pd.Series(["abc xy abc", "", "a  b"]))
    # words: abc, xy, abc | '' | a, '', b  (double space -> empty word,
    # exactly like Spark split(text, ' '))
    assert n.tolist() == [3, 1, 3]
    assert w[0] == w[2] and w[0] != w[1]
    assert w[3] == w[5]  # both empty words hash equal
    B, MIX, M = 1000003, 0x9E3779B97F4A7C15, 2**64
    v = (ord("a") + ord("b") * B + ord("c") * B * B) % M
    h = (v * MIX) % M
    h ^= h >> 32
    assert int(w[0]) == h


def test_lm_numpy_in_kernel_equals_distributed(spark):
    from feast_spark.operators.lm import lm_score_texts

    df, pdf = _corpus(spark, seed=13, n_docs=25)
    m = train_ngram_lm(df, method="numpy", order=4, n_buckets=1 << 14)
    dist = (
        lm_perplexity(df.repartition(7), m).toPandas()
        .assign(doc_id=lambda d: d["doc_id"].astype(int))
        .sort_values("doc_id").reset_index(drop=True)
    )
    lp, n, ppl = lm_score_texts(m, pdf["text"])
    assert (dist["lp_sum"].to_numpy() == lp).all()
    assert (dist["n_tokens"].to_numpy() == n).all()
    assert (dist["ppl"].to_numpy() == ppl).all()


# ---------------------------------------------------------------------------
# perplexity_buckets (CCNet head/middle/tail)
# ---------------------------------------------------------------------------


def test_perplexity_buckets_terciles_per_group(spark):
    import pandas as pd

    from feast_spark.operators.lm import perplexity_buckets

    rows = [("a", i, float(i)) for i in range(9)] + [
        ("b", 100 + i, float(100 - i)) for i in range(6)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["lang", "doc_id", "ppl"])
    )
    out = {r["doc_id"]: r["bucket"] for r in perplexity_buckets(df, "lang").collect()}
    # group a: 0..8 -> terciles at ~2.67/5.33: 0-2 head, 3-5 middle, 6-8 tail
    assert [out[i] for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    # group b cut independently of group a
    b_vals = sorted((100 - (d - 100), d) for d in range(100, 106))
    b_buckets = [out[d] for _, d in b_vals]
    assert b_buckets == ["head", "head", "middle", "middle", "tail", "tail"]


def test_perplexity_buckets_tie_falls_to_lower_bucket(spark):
    import pandas as pd

    from feast_spark.operators.lm import perplexity_buckets

    # all equal scores: every cut == score, so score > cut is false
    # everywhere -> everyone lands in 'head'
    df = spark.createDataFrame(
        pd.DataFrame([("x", i, 5.0) for i in range(6)],
                     columns=["lang", "doc_id", "ppl"])
    )
    out = perplexity_buckets(df, "lang").collect()
    assert all(r["bucket"] == "head" for r in out)


def test_perplexity_buckets_custom_quantiles_labels(spark):
    import pandas as pd

    from feast_spark.operators.lm import perplexity_buckets

    df = spark.createDataFrame(
        pd.DataFrame([("x", i, float(i)) for i in range(10)],
                     columns=["lang", "doc_id", "ppl"])
    )
    out = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(
            df, "lang", quantiles=(0.5,), labels=("keep", "drop")
        ).collect()
    }
    assert [out[i] for i in range(10)] == ["keep"] * 5 + ["drop"] * 5


def test_moore_lewis_separates_domains_and_is_integer_exact(spark):
    import numpy as np

    from feast_spark.operators.lm import moore_lewis_scores, naive_lm_pdf

    # two disjoint-vocabulary domains: in-domain docs must score negative
    # cross-entropy difference (more in-domain-like), out-of-domain
    # positive
    rng = np.random.default_rng(3)
    vin = [f"in{i}" for i in range(20)]
    vout = [f"out{i}" for i in range(20)]
    rows = []
    for i in range(30):
        rows.append((i, " ".join(rng.choice(vin, 20)), "target"))
    for i in range(30, 60):
        rows.append((i, " ".join(rng.choice(vout, 20)), "other"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = moore_lewis_scores(
        df, df.where("source = 'target'"), order=3, method="portable",
        n_buckets=1 << 16,
    ).toPandas().set_index("doc_id")
    ind, outd = out.loc[:29, "ce_diff"], out.loc[30:, "ce_diff"]
    # out-of-domain docs are unknown to the in-domain LM: strongly
    # positive, every one. In-domain docs hover near zero (both models
    # know them) — group separation, allowing stupid-backoff slack
    assert (outd > 0).all()
    assert (ind < 0).mean() >= 0.9
    assert ind.mean() < 0 < outd.mean()
    assert ind.max() < outd.min()
    # integer exactness vs the naive Counter replay
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    a = naive_lm_pdf(
        pdf["text"], pdf["doc_id"], order=3, n_buckets=1 << 16,
        train_texts=pdf.loc[pdf["source"] == "target", "text"],
    ).set_index("doc_id")
    b = naive_lm_pdf(
        pdf["text"], pdf["doc_id"], order=3, n_buckets=1 << 16,
        train_texts=pdf["text"],
    ).set_index("doc_id")
    want = (b["lp_sum"] - a["lp_sum"]).astype("int64")
    got = out["ce_diff_units"].astype("int64")
    assert (got.sort_index().to_numpy() == want.sort_index().to_numpy()).all()
