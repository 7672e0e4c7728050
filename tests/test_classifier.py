"""Hashed-bigram quality classifier: learning power (xxhash64 scale arm),
bit-exact oracle parity (portable arm), and degenerate-document edges."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_spark.operators.classifier import (
    hashed_bigram_features,
    naive_classifier_pdf,
    score_with_classifier,
    train_quality_classifier,
)


def _planted_docs(spark, n=240):
    # positive docs speak vocab A, negative docs vocab B — linearly
    # separable on bigram buckets
    va = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    vb = ["zulu", "yankee", "xray", "whiskey", "victor", "uniform"]
    rows = []
    rng = np.random.RandomState(7)
    for i in range(n):
        vocab = va if i % 2 == 0 else vb
        words = [vocab[j % len(vocab)] for j in rng.randint(0, 6, size=30)]
        rows.append((i, " ".join(words), "good" if i % 2 == 0 else "bad"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_classifier_learns_separable(spark):
    docs = _planted_docs(spark)
    feats = hashed_bigram_features(
        docs, F.col("source") == "good", n_buckets=512, method="xxhash64"
    )
    model = train_quality_classifier(spark, feats, n_buckets=512, n_iter=8)
    scored = score_with_classifier(model, feats).toPandas()
    acc = (scored["pred"] == scored["label"]).mean()
    assert acc == 1.0, f"separable corpus should be learned exactly, acc={acc}"
    # weights moved and the margin is the exact integer dot product
    assert np.abs(model.weights_micro).sum() > 0
    feats.unpersist()


def test_portable_arm_matches_naive_oracle(spark):
    # different hyperparameters than the driver query, so the kernel (not
    # a memoized artifact) is what's being pinned
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(60, dtype=np.int64),
            "text": [
                " ".join(
                    ["red green blue", "cyan magenta yellow"][i % 2].split()
                    * (2 + i % 3)
                )
                for i in range(60)
            ],
            "source": [["src1", "other"][i % 2] for i in range(60)],
        }
    )
    docs = spark.createDataFrame(pdf)
    feats = hashed_bigram_features(
        docs, F.col("source") == "src1", n_buckets=64, method="portable"
    )
    model = train_quality_classifier(spark, feats, n_buckets=64, n_iter=3)
    got = (
        score_with_classifier(model, feats)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        naive_classifier_pdf(
            pdf["text"], pdf["doc_id"], (pdf["source"] == "src1").astype(int),
            n_buckets=64, n_iter=3,
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # margins are int64 — equality is exact, not approximate
    assert got["margin_units"].tolist() == exp["margin_units"].tolist()
    assert got["pred"].tolist() == exp["pred"].tolist()
    feats.unpersist()


def test_degenerate_docs(spark):
    docs = spark.createDataFrame(
        [(0, "", "src1"), (1, "lonely", "other"), (2, "two words", "src1")],
        "doc_id long, text string, source string",
    )
    feats = hashed_bigram_features(
        docs, F.col("source") == "src1", n_buckets=32, method="xxhash64"
    )
    rows = {r["doc_id"]: r for r in feats.collect()}
    # zero- and one-token docs have no bigrams but stay in the frame
    assert set(rows) == {0, 1, 2}
    assert rows[0]["total"] == 0 and rows[1]["total"] == 0
    assert rows[2]["total"] == 1
    model = train_quality_classifier(spark, feats, n_buckets=32, n_iter=2)
    scored = {r["doc_id"]: r for r in score_with_classifier(model, feats).collect()}
    # featureless docs score margin 0 -> pred 0, and never crash training
    assert scored[0]["margin_units"] == 0 and scored[0]["pred"] == 0
    feats.unpersist()


@pytest.mark.parametrize("method", ["portable", "xxhash64"])
def test_feature_arrays_sorted_and_consistent(spark, method):
    docs = spark.createDataFrame(
        [(0, "a b a b c", "src1")], "doc_id long, text string, source string"
    )
    r = hashed_bigram_features(
        docs, F.lit(True), n_buckets=16, method=method
    ).collect()[0]
    assert list(r["b"]) == sorted(r["b"])
    assert sum(r["c"]) == r["total"] == 4  # 4 bigrams
