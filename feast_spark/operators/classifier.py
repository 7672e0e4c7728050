"""Model-based quality classification: a hashed-bigram linear classifier
(fastText-supervised style) trained DISTRIBUTED with Spark and applied
map-side.

The modern web-scale curation stack (DCLM, FineWeb-Edu) filters with a
trained classifier next to the heuristic rules: label a seed set (here: a
deterministic domain split, the same target the DSIR operator uses), train
a cheap linear model on hashed n-gram counts, score every document. The
reference (feast) has no trainer — this operator is part of the
training-data-pipeline surface the brief asks for beyond reference parity.

Why this shape at 100 TB
------------------------
- **Features built once**: one pass over the corpus explodes word bigrams
  into hashed buckets (``xxhash64(w1, w2) % n_buckets`` on the scale arm —
  no gram strings are ever materialized, the same 10× lesson as
  ``dsir_weights``), then two hash aggregations compact each document to
  ``(bucket[], cnt[], total, label)`` arrays. Persisted; every training
  iteration reads this compact table, never the text.
- **Iterations are map + tiny shuffle**: full-batch gradient descent. Each
  iteration broadcasts the (≤ ``n_buckets``-row) weight vector into an
  Arrow ``mapInPandas`` pass that computes every document's margin and
  error locally and pre-aggregates gradients per partition with
  ``np.add.at`` — each partition emits at most ``n_buckets`` rows, so the
  per-iteration shuffle is O(partitions × n_buckets), independent of
  corpus size. The driver holds only the weight vector.
- **Integer-exact determinism**: floating-point sums are order-dependent
  under Spark's nondeterministic partition order, so per-document errors
  are quantized to integer micro-units and all cross-document sums are
  int64 (associative + commutative ⇒ partition-order independent). The
  driver-side numpy oracle replays the identical kernel and matches
  bit-for-bit. (int64 gradient partials bound the corpus at ~10^9 docs
  per job; beyond that, promote the partial to two-level aggregation —
  the quantization contract is unchanged.)

Arithmetic contract (shared by the Spark passes and the oracle, all in
:func:`_margins_int` / :func:`_err_q` / :func:`_apply_grad`):

- weights ``w``: int64 micro-units (``w_float = w / 1e6``), init 0
- per doc: ``m = Σ w[b]·c[b]`` (int64); ``margin = m / (1e6·T)``;
  ``p = 1/(1+exp(-margin))`` (numpy float64);
  ``err_q = rint(1e6·(p - y)/T)`` (int64; 0 when T = 0)
- per bucket: ``G[b] = Σ_docs err_q·c[b]`` (int64)
- update: ``w -= rint(lr·G/n_docs)`` (numpy float64 → int64)

``predict = m > 0`` is an exact integer comparison — no float leaves the
kernel except through the documented quantization.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# shared numeric kernel (Spark map passes AND the driver-side oracle)
# ---------------------------------------------------------------------------


def _margins_int(
    w: np.ndarray, flat_b: np.ndarray, flat_c: np.ndarray, offsets: np.ndarray
) -> np.ndarray:
    """Per-doc int64 margin ``Σ w[b]·c[b]`` over CSR-style flattened
    features (``offsets`` = doc start indices, len = n_docs + 1)."""
    if len(flat_b) == 0:
        return np.zeros(len(offsets) - 1, np.int64)
    prod = w[flat_b] * flat_c  # int64 exact
    # segment sums via exclusive cumsum — exact int64 and correct for
    # empty segments (np.add.reduceat mis-handles those)
    csum = np.zeros(len(prod) + 1, np.int64)
    np.cumsum(prod, out=csum[1:])
    return (csum[offsets[1:]] - csum[offsets[:-1]]).astype(np.int64)


def _err_q(m_int: np.ndarray, total: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Quantized per-doc error ``rint(1e6·(sigmoid(margin) - y)/T)``."""
    t = total.astype(np.float64)
    safe_t = np.where(t > 0, t, 1.0)
    margin = m_int.astype(np.float64) / (1e6 * safe_t)
    p = 1.0 / (1.0 + np.exp(-margin))
    err = np.rint(1e6 * (p - y.astype(np.float64)) / safe_t)
    return np.where(total > 0, err, 0.0).astype(np.int64)


def _partition_grad(
    w: np.ndarray,
    flat_b: np.ndarray,
    flat_c: np.ndarray,
    offsets: np.ndarray,
    total: np.ndarray,
    y: np.ndarray,
    n_buckets: int,
) -> np.ndarray:
    """Int64 gradient partial for one batch: ``G[b] += err_q(doc)·c``."""
    grad = np.zeros(n_buckets, np.int64)
    if len(flat_b) == 0:
        return grad
    m = _margins_int(w, flat_b, flat_c, offsets)
    eq = _err_q(m, total, y)
    seg_lens = np.diff(offsets)
    contrib = np.repeat(eq, seg_lens) * flat_c
    np.add.at(grad, flat_b, contrib)  # exact int64 scatter-add
    return grad


def _apply_grad(
    w: np.ndarray, grad: np.ndarray, lr: float, n_docs: int
) -> np.ndarray:
    return w - np.rint(lr * grad.astype(np.float64) / n_docs).astype(np.int64)


def _flatten(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat_b, flat_c, offsets) from a pandas batch with b/c list cols."""
    lens = pdf["b"].map(len).to_numpy(np.int64)
    offsets = np.zeros(len(pdf) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    if offsets[-1] == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), offsets
    flat_b = np.concatenate([np.asarray(x, np.int64) for x in pdf["b"]])
    flat_c = np.concatenate([np.asarray(x, np.int64) for x in pdf["c"]])
    return flat_b, flat_c, offsets


# ---------------------------------------------------------------------------
# feature extraction
# ---------------------------------------------------------------------------


def hashed_bigram_features(
    docs: DataFrame,
    label: "F.Column",
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "xxhash64",
) -> DataFrame:
    """Compact per-doc hashed-bigram count features:
    ``(doc_id, b: array<bucket>, c: array<cnt>, total, y)``.

    ``method='xxhash64'`` (scale arm) hashes the word PAIR with multi-arg
    ``xxhash64`` — gram strings are never built (string construction, not
    hashing, dominates n-gram pipelines: NOTES r3, 10-12×).
    ``method='portable'`` builds the gram string and buckets on the first
    8 hex chars of its md5 — byte-replayable in pure numpy/DuckDB, used by
    the oracle. Buckets arrays are sorted by bucket id so downstream
    iteration is order-independent by construction.
    """
    w = F.split(F.col(text_col), " ")
    pairs = F.arrays_zip(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        label.cast("int").alias("y"),
        F.explode_outer(pairs).alias("p"),
    )
    if method == "xxhash64":
        bucket = F.pmod(F.xxhash64(F.col("p.0"), F.col("p.1")), F.lit(n_buckets))
    elif method == "portable":
        gram = F.concat_ws(" ", F.col("p.0"), F.col("p.1"))
        bucket = F.pmod(
            F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long"),
            F.lit(n_buckets),
        )
    else:  # pragma: no cover
        raise ValueError(f"unknown method {method!r}")
    counted = (
        base.withColumn("bucket", F.when(F.col("p").isNotNull(), bucket))
        .groupBy("doc_id", "y", "bucket")
        .agg(F.count("bucket").alias("cnt"))
    )
    return counted.groupBy("doc_id", "y").agg(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("bucket").isNotNull(),
                    F.struct(
                        F.col("bucket").cast("int").alias("bucket"),
                        F.col("cnt").cast("int").alias("cnt"),
                    ),
                )
            )
        ).alias("bc")
    ).select(
        "doc_id",
        F.col("bc.bucket").alias("b"),
        F.col("bc.cnt").alias("c"),
        F.aggregate("bc.cnt", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "total"
        ),
        "y",
    )


# ---------------------------------------------------------------------------
# training + scoring
# ---------------------------------------------------------------------------


@dataclass
class QualityClassifier:
    weights_micro: np.ndarray  # int64, len n_buckets
    n_buckets: int
    n_iter: int
    lr: float
    n_docs: int


def train_quality_classifier(
    spark: SparkSession,
    feats: DataFrame,
    n_buckets: int = 4096,
    n_iter: int = 8,
    lr: float = 1.0,
) -> QualityClassifier:
    """Full-batch logistic regression over a persisted compact feature
    table. Per iteration: one Arrow map pass (margins + errors + per-
    partition int64 gradient pre-aggregation) and one ≤ n_buckets-row
    shuffle; the weight vector (32 KB at 4096 buckets) ships inside the
    task closure."""
    feats = feats.persist()
    n_docs = feats.count()  # materialization barrier (round-1 lesson)
    w = np.zeros(n_buckets, np.int64)
    for _ in range(n_iter):
        w_cur = w  # bind per-iteration copy into the closure

        def grad_pass(batches, w_cur=w_cur):
            grad = np.zeros(n_buckets, np.int64)
            for pdf in batches:
                flat_b, flat_c, offsets = _flatten(pdf)
                grad += _partition_grad(
                    w_cur, flat_b, flat_c, offsets,
                    pdf["total"].to_numpy(np.int64),
                    pdf["y"].to_numpy(np.int64),
                    n_buckets,
                )
            yield pd.DataFrame({"g": [grad.tolist()]})

        # each partition emits its DENSE int64 gradient as one array row
        # (8·n_buckets bytes); the final reduction over partitions
        # happens on the driver — one Spark stage per iteration, no
        # shuffle at all. 10k partitions x 32 KB = a 320 MB collect at
        # the extreme; past that, reinstate a groupBy partial reduction
        # (the int64 sums commute either way).
        pdf = feats.mapInPandas(grad_pass, "g array<long>").toPandas()
        total_grad = np.zeros(n_buckets, np.int64)
        for g in pdf["g"]:
            total_grad += np.asarray(g, np.int64)
        w = _apply_grad(w, total_grad, lr, n_docs)
    return QualityClassifier(w, n_buckets, n_iter, lr, n_docs)


def score_with_classifier(
    model: QualityClassifier, feats: DataFrame
) -> DataFrame:
    """Map-only scoring: ``(doc_id, margin_units, pred, label)`` where
    ``margin_units = Σ w[b]·c[b]`` (int64 micro-unit dot product) and
    ``pred = margin_units > 0`` — exact integers end to end."""
    w = model.weights_micro

    def score(batches):
        for pdf in batches:
            flat_b, flat_c, offsets = _flatten(pdf)
            m = _margins_int(w, flat_b, flat_c, offsets)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "margin_units": m,
                    "pred": (m > 0).astype(np.int32),
                    "label": pdf["y"].astype(np.int32),
                }
            )

    return feats.mapInPandas(
        score, "doc_id long, margin_units long, pred int, label int"
    )


# ---------------------------------------------------------------------------
# driver-side oracle kernel (pure numpy — no Spark)
# ---------------------------------------------------------------------------


def naive_classifier_pdf(
    texts: pd.Series,
    doc_ids: pd.Series,
    y: pd.Series,
    n_buckets: int = 4096,
    n_iter: int = 8,
    lr: float = 1.0,
) -> pd.DataFrame:
    """Naive replay of the portable arm: Python dict feature extraction
    (md5 buckets), then the identical integer-quantized training loop in
    one numpy pass per iteration. Bit-exact vs the Spark path because
    every cross-document reduction is an int64 sum."""
    import hashlib
    from collections import Counter

    b_list, c_list = [], []
    for text in texts:
        toks = text.split(" ")
        counts = Counter(
            int(
                hashlib.md5(f"{a} {b}".encode()).hexdigest()[:8], 16
            ) % n_buckets
            for a, b in zip(toks, toks[1:])
        )
        items = sorted(counts.items())
        b_list.append(np.array([k for k, _ in items], np.int64))
        c_list.append(np.array([v for _, v in items], np.int64))
    offsets = np.zeros(len(b_list) + 1, np.int64)
    np.cumsum([len(x) for x in b_list], out=offsets[1:])
    flat_b = (
        np.concatenate(b_list) if offsets[-1] else np.zeros(0, np.int64)
    )
    flat_c = (
        np.concatenate(c_list) if offsets[-1] else np.zeros(0, np.int64)
    )
    total = np.array([x.sum() for x in c_list], np.int64)
    yv = y.to_numpy(np.int64)
    n_docs = len(b_list)
    w = np.zeros(n_buckets, np.int64)
    for _ in range(n_iter):
        grad = _partition_grad(w, flat_b, flat_c, offsets, total, yv, n_buckets)
        w = _apply_grad(w, grad, lr, n_docs)
    m = _margins_int(w, flat_b, flat_c, offsets)
    return pd.DataFrame(
        {
            "doc_id": doc_ids.to_numpy(np.int64),
            "margin_units": m,
            "pred": (m > 0).astype(np.int32),
            "label": yv.astype(np.int32),
        }
    )


def save_classifier(model: QualityClassifier, path: str) -> None:
    """Persist the trained weights as one .npz (frozen-calibration
    artifact for incremental curation)."""
    np.savez_compressed(
        path,
        weights_micro=model.weights_micro,
        meta=np.array(
            [model.n_buckets, model.n_iter, model.n_docs], dtype=np.int64
        ),
        lr=np.array([model.lr]),
    )


def load_classifier(path: str) -> QualityClassifier:
    z = np.load(path, allow_pickle=False)
    n_buckets, n_iter, n_docs = (int(x) for x in z["meta"])
    return QualityClassifier(
        weights_micro=z["weights_micro"],
        n_buckets=n_buckets,
        n_iter=n_iter,
        lr=float(z["lr"][0]),
        n_docs=n_docs,
    )
