"""Contract tests for the trained multiclass language identifier
(feast_spark/operators/langid.py) — driver-oracle parity evidence lives
in test_entry_oracle.py (langid_classifier); these pin semantics on a
planted multilingual corpus where the right answer is known."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from feast_spark.operators.langid import (
    char_ngram_features,
    naive_langid_pdf,
    predict_langid,
    train_langid,
)

_VOCABS = {
    "aa": "kala tupu meri vona sela ripu nato mäki",
    "bb": "zorn blick wald strom kraft herz glück pfad",
    "cc": "中文语言文字处理引擎测试",
}


def _planted(seed=3, per_lang=30):
    rng = np.random.default_rng(seed)
    rows = []
    for lang, vocab in _VOCABS.items():
        toks = vocab.split(" ") if " " in vocab else list(vocab)
        for i in range(per_lang):
            n = int(rng.integers(8, 30))
            sep = " " if " " in vocab else ""
            rows.append(
                (f"{lang}{i:03d}", sep.join(rng.choice(toks, n)), lang)
            )
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


def _train_predict(spark, pdf, classes, n_iter=8):
    docs = spark.createDataFrame(pdf)
    lab = F.when(
        F.col("__train"),
        F.array_position(F.lit(classes), F.col("lang")) - 1,
    ).otherwise(F.lit(-1))
    feats = char_ngram_features(docs.withColumn("__train", F.col("train")), lab)
    feats = feats.persist()
    feats.count()
    m = train_langid(spark, feats, classes, n_iter=n_iter)
    out = predict_langid(m, feats).toPandas()
    feats.unpersist()
    return m, out.sort_values("doc_id").reset_index(drop=True)


def test_langid_learns_planted_languages(spark):
    pdf = _planted()
    pdf["train"] = np.arange(len(pdf)) % 2 == 0
    classes = sorted(_VOCABS)
    _, out = _train_predict(spark, pdf, classes)
    merged = out.merge(pdf[["doc_id", "lang", "train"]], on="doc_id")
    held = merged[~merged["train"]]
    # hashed features admit occasional bucket collisions (one 6-trigram
    # CJK doc lands on a bb-dominated bucket at seed 3) — the fastText
    # tradeoff; require near-perfect, non-degenerate separation
    assert (held["pred_lang"] == held["lang"]).mean() >= 0.95
    assert set(out["pred_lang"]) == set(classes)


def test_langid_engine_matches_naive_oracle(spark):
    pdf = _planted(seed=9, per_lang=12)
    pdf["train"] = np.arange(len(pdf)) % 3 != 0
    classes = sorted(_VOCABS)
    _, out = _train_predict(spark, pdf, classes, n_iter=5)
    exp = naive_langid_pdf(
        pdf["text"],
        pdf["doc_id"],
        pdf["lang"].where(pdf["train"]),
        classes,
        n_iter=5,
    ).sort_values("doc_id").reset_index(drop=True)
    assert (out["pred_lang"].values == exp["pred_lang"].values).all()
    assert (out["margin_top"].values == exp["margin_top"].values).all()


def test_langid_training_partition_invariant(spark):
    # int64 gradient sums commute -> identical weights whatever the
    # partition layout of the feature table
    pdf = _planted(seed=5, per_lang=10)
    pdf["train"] = True
    classes = sorted(_VOCABS)
    docs = spark.createDataFrame(pdf)
    lab = F.array_position(F.lit(classes), F.col("lang")) - 1
    w = []
    for parts in (2, 11):
        feats = char_ngram_features(docs.repartition(parts), lab).persist()
        feats.count()
        m = train_langid(spark, feats, classes, n_iter=4)
        feats.unpersist()
        w.append(m.weights_micro)
    assert (w[0] == w[1]).all()
