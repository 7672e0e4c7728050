"""Trained multiclass language identifier (fastText lid.176 style):
hashed character-n-gram features + multinomial logistic regression,
trained distributed with integer-exact determinism and applied map-side
as a broadcast model inside vectorized Arrow UDFs.

:mod:`feast_spark.rules` ships the deterministic marker-based heuristic
the pipeline uses; this module adds the trained-model form of the
north-star surface ("a broadcast fastText lid.176 model ... run inside
vectorized pandas/Arrow UDFs"): supervised training on a labeled slice,
softmax scoring of every document. The reference (feast) has no trainer;
like :mod:`.classifier` this extends the training-data-pipeline surface
beyond reference parity.

Why this shape at 100 TB
------------------------
- **Features cross into Python once**: one ``mapInPandas`` pass turns
  each Arrow batch of texts into compact CSR arrays ``(bucket[],
  cnt[], total)`` via a rolling polynomial char-trigram hash over the
  flattened codepoint stream (the :mod:`feast_spark.rules` vectorized
  kernel pattern) — no per-row Python, no gram strings. The feature
  table (a few ints per distinct gram per doc) is what shuffles and
  persists, never the text.
- **Iterations are one map pass, zero shuffle**: full-batch softmax
  gradient descent; every partition emits ONE dense ``L x B`` int64
  gradient array (``L`` languages x ``B`` buckets — 160 KB at 5 x 4096)
  reduced on the driver, exactly the :mod:`.classifier` scheme.
- **Integer-exact determinism**: margins are int64 dot products of
  int64 micro-unit weights with int counts; per-doc softmax errors are
  quantized to micro-units before the cross-document int64 reduction,
  so partition order cannot perturb training. ``predict = argmax`` over
  int64 margins (ties -> lowest class index) is exact. The naive
  driver-side oracle (:func:`naive_langid_pdf`) replays per-doc python
  loops over the same leaf hash kernel and matches bit-for-bit.

Arithmetic contract (engine and oracle):

- weights ``W``: int64 micro-units, shape (L, B), init 0
- per doc: ``M[c] = sum_b W[c,b]*cnt[b]`` (int64);
  ``z[c] = M[c] / (1e6*T)``; ``p = softmax(z - max(z))`` (numpy
  float64, L summed sequentially); ``err_q[c] = rint(1e6*(p[c] -
  [y==c])/T)`` (int64, 0 when T = 0)
- ``G[c,b] = sum_docs err_q[c]*cnt[b]`` (int64);
  ``W -= rint(lr*G/n_docs)``
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# rolling char-trigram hash constants (shared leaf kernel — the oracle
# and the engine both call _tri_buckets)
_B_MUL = np.uint64(1000003)
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _codes_flat(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Flatten lowercased texts to (uint32 codepoints, per-row lengths)."""
    filled = texts.fillna("").astype(str).str.lower()
    joined = "".join(filled.tolist())
    codes = np.frombuffer(
        joined.encode("utf-32-le", "surrogatepass"), dtype=np.uint32
    )
    lens = filled.str.len().to_numpy(np.int64)
    return codes, lens


def _tri_buckets(codes: np.ndarray, n_buckets: int) -> np.ndarray:
    """Rolling trigram polynomial hash -> bucket ids (vectorized)."""
    c = codes.astype(np.uint64)
    h = c[:-2]
    for k in (1, 2):
        h = h * _B_MUL + c[k : len(c) - 2 + k]
    return ((h * _MIX) % np.uint64(n_buckets)).astype(np.int64)


def _doc_csr(
    codes: np.ndarray, lens: np.ndarray, n_buckets: int
) -> tuple[list, list, np.ndarray]:
    """Per-doc sorted (bucket[], cnt[]) lists + totals from the flat
    codepoint stream (vectorized: one np.unique over doc-prefixed keys;
    trigrams spanning doc boundaries are masked out)."""
    n = len(lens)
    totals = np.maximum(lens - 2, 0)
    if len(codes) < 3:
        return [[] for _ in range(n)], [[] for _ in range(n)], totals
    buckets = _tri_buckets(codes, n_buckets)
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    valid = doc[2:] == doc[:-2]
    key = doc[: len(buckets)][valid] * n_buckets + buckets[valid]
    uniq, cnts = np.unique(key, return_counts=True)
    doc_of = uniq // n_buckets
    bkt_of = uniq % n_buckets
    starts = np.searchsorted(doc_of, np.arange(n + 1))
    bs = [bkt_of[starts[i] : starts[i + 1]].tolist() for i in range(n)]
    cs = [cnts[starts[i] : starts[i + 1]].astype(np.int64).tolist() for i in range(n)]
    return bs, cs, totals


def char_ngram_features(
    docs: DataFrame,
    label: Column,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Compact per-doc hashed char-trigram features ``(doc_id, b, c,
    total, y)``; ``y`` is the integer class id (-1 for unlabeled rows).
    One Arrow pass; buckets sorted ascending per doc (np.unique)."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__t"),
        label.cast("int").alias("y"),
    )

    def feat(batches):
        for pdf in batches:
            codes, lens = _codes_flat(pdf["__t"])
            bs, cs, totals = _doc_csr(codes, lens, n_buckets)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "b": bs,
                    "c": cs,
                    "total": totals,
                    "y": pdf["y"].fillna(-1).astype(np.int64),
                }
            )

    id_type = dict(base.dtypes)["doc_id"]
    return base.mapInPandas(
        feat,
        schema=(
            f"doc_id {id_type}, b array<long>, c array<long>, "
            "total long, y long"
        ),
    )


# ---------------------------------------------------------------------------
# shared numeric kernel
# ---------------------------------------------------------------------------


def _flatten(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    lens = pdf["b"].map(len).to_numpy(np.int64)
    offsets = np.zeros(len(pdf) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    if offsets[-1] == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), offsets
    flat_b = np.concatenate([np.asarray(x, np.int64) for x in pdf["b"]])
    flat_c = np.concatenate([np.asarray(x, np.int64) for x in pdf["c"]])
    return flat_b, flat_c, offsets


def _margins_lx(
    W: np.ndarray, flat_b: np.ndarray, flat_c: np.ndarray, offsets: np.ndarray
) -> np.ndarray:
    """Int64 margins, shape (n_docs, L): per class a segment sum of
    ``W[c, b]*cnt`` (exclusive-cumsum differencing — exact int64 and
    correct on empty segments)."""
    n_docs = len(offsets) - 1
    L = W.shape[0]
    M = np.zeros((n_docs, L), np.int64)
    if len(flat_b) == 0:
        return M
    for c in range(L):
        prod = W[c][flat_b] * flat_c
        csum = np.zeros(len(prod) + 1, np.int64)
        np.cumsum(prod, out=csum[1:])
        M[:, c] = csum[offsets[1:]] - csum[offsets[:-1]]
    return M


def _softmax_err_q(
    M: np.ndarray, total: np.ndarray, y: np.ndarray
) -> np.ndarray:
    """Quantized per-doc per-class error, shape (n_docs, L) int64."""
    t = total.astype(np.float64)
    safe_t = np.where(t > 0, t, 1.0)
    z = M.astype(np.float64) / (1e6 * safe_t[:, None])
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    p = e / e.sum(axis=1, keepdims=True)
    onehot = (y[:, None] == np.arange(M.shape[1])[None, :]).astype(np.float64)
    err = np.rint(1e6 * (p - onehot) / safe_t[:, None])
    return np.where((total > 0)[:, None], err, 0.0).astype(np.int64)


@dataclass
class LangIdModel:
    weights_micro: np.ndarray  # int64, shape (L, n_buckets)
    classes: list[str]
    n_buckets: int
    n_iter: int
    lr: float
    n_docs: int


def train_langid(
    spark: SparkSession,
    feats: DataFrame,
    classes: list[str],
    n_buckets: int = 4096,
    n_iter: int = 8,
    lr: float = 1.0,
) -> LangIdModel:
    """Full-batch multinomial logistic regression over the persisted
    feature table (labeled rows only). One Arrow map pass per iteration,
    each partition emitting its dense (L x B) int64 gradient; driver
    reduce; no shuffle."""
    L = len(classes)
    labeled = feats.where(F.col("y") >= 0).persist()
    n_docs = labeled.count()  # materialization barrier (round-1 lesson)
    if n_docs == 0:  # pragma: no cover
        raise ValueError("no labeled rows to train on")
    W = np.zeros((L, n_buckets), np.int64)
    for _ in range(n_iter):
        W_cur = W

        def grad_pass(batches, W_cur=W_cur):
            grad = np.zeros((L, n_buckets), np.int64)
            for pdf in batches:
                flat_b, flat_c, offsets = _flatten(pdf)
                if len(flat_b) == 0:
                    continue
                M = _margins_lx(W_cur, flat_b, flat_c, offsets)
                eq = _softmax_err_q(
                    M,
                    pdf["total"].to_numpy(np.int64),
                    pdf["y"].to_numpy(np.int64),
                )
                seg_lens = np.diff(offsets)
                for c in range(L):
                    contrib = np.repeat(eq[:, c], seg_lens) * flat_c
                    np.add.at(grad[c], flat_b, contrib)
            yield pd.DataFrame({"g": [grad.reshape(-1).tolist()]})

        pdf = labeled.mapInPandas(grad_pass, "g array<long>").toPandas()
        G = np.zeros((L, n_buckets), np.int64)
        for g in pdf["g"]:
            G += np.asarray(g, np.int64).reshape(L, n_buckets)
        W = W - np.rint(lr * G.astype(np.float64) / n_docs).astype(np.int64)
    labeled.unpersist()
    return LangIdModel(W, list(classes), n_buckets, n_iter, lr, n_docs)


def predict_langid(model: LangIdModel, feats: DataFrame) -> DataFrame:
    """Map-side scoring with the broadcast weight matrix: ``(doc_id,
    pred_lang, margin_top)``. ``margin_top`` is the winning class's exact
    int64 margin; argmax ties resolve to the lowest class index."""
    spark = feats.sparkSession
    bc = spark.sparkContext.broadcast(model)
    id_type = dict(feats.dtypes)["doc_id"]

    def score(batches):
        m = bc.value
        for pdf in batches:
            flat_b, flat_c, offsets = _flatten(pdf)
            M = _margins_lx(m.weights_micro, flat_b, flat_c, offsets)
            pred = M.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pred_lang": [m.classes[i] for i in pred],
                    "margin_top": M[np.arange(len(pred)), pred],
                }
            )

    return feats.mapInPandas(
        score, schema=f"doc_id {id_type}, pred_lang string, margin_top long"
    )


def langid_score_texts(
    model: LangIdModel, texts: pd.Series
) -> tuple[list, np.ndarray]:
    """In-kernel scoring for use INSIDE an existing Arrow batch pass
    (the :func:`feast_spark.operators.lm.lm_score_texts` pattern):
    ``(pred_lang list, margin_top int64)`` for one pandas batch of raw
    texts, pure numpy, no Spark. ``predict_langid`` composes this same
    leaf path over a feature DataFrame; the quality pipeline calls this
    directly so the broadcast model rides the one scoring shuffle-free
    map pass (north star: "broadcast fastText lid.176 model ... inside
    vectorized pandas/Arrow UDFs")."""
    codes, lens = _codes_flat(texts)
    bs, cs, totals = _doc_csr(codes, lens, model.n_buckets)
    pdf = pd.DataFrame({"b": bs, "c": cs})
    flat_b, flat_c, offsets = _flatten(pdf)
    M = _margins_lx(model.weights_micro, flat_b, flat_c, offsets)
    pred = M.argmax(axis=1)
    return [model.classes[i] for i in pred], M[np.arange(len(pred)), pred]


# ---------------------------------------------------------------------------
# naive oracle (driver-side, per-doc python loops — no Spark)
# ---------------------------------------------------------------------------


def naive_langid_pdf(
    texts: pd.Series,
    ids: pd.Series,
    labels: pd.Series,
    classes: list[str],
    n_buckets: int = 4096,
    n_iter: int = 8,
    lr: float = 1.0,
) -> pd.DataFrame:
    """Independent replay: per-doc Counter features over the shared
    trigram leaf kernel, dense per-doc python training loop, argmax
    prediction. Bit-exact because every cross-doc reduction is an int64
    sum and per-doc floats run the same numpy ops."""
    cls_idx = {c: i for i, c in enumerate(classes)}
    L = len(classes)
    docs = []
    for t in texts.fillna(""):
        codes, lens = _codes_flat(pd.Series([t]))
        bs, cs, totals = _doc_csr(codes, lens, n_buckets)
        docs.append(
            (
                np.asarray(bs[0], np.int64),
                np.asarray(cs[0], np.int64),
                int(totals[0]),
            )
        )
    y = np.array(
        [cls_idx.get(v, -1) for v in labels.fillna("")], np.int64
    )
    train_ix = [i for i in range(len(docs)) if y[i] >= 0]
    n_docs = len(train_ix)
    W = np.zeros((L, n_buckets), np.int64)
    for _ in range(n_iter):
        G = np.zeros((L, n_buckets), np.int64)
        for i in train_ix:
            b, c, t = docs[i]
            M = np.array(
                [int((W[k][b] * c).sum()) if len(b) else 0 for k in range(L)],
                np.int64,
            )
            eq = _softmax_err_q(
                M[None, :], np.array([t], np.int64), y[i : i + 1]
            )[0]
            for k in range(L):
                np.add.at(G[k], b, eq[k] * c)
        W = W - np.rint(lr * G.astype(np.float64) / n_docs).astype(np.int64)
    rows = []
    for doc_id, (b, c, t) in zip(ids, docs):
        M = np.array(
            [int((W[k][b] * c).sum()) if len(b) else 0 for k in range(L)],
            np.int64,
        )
        k = int(M.argmax())
        rows.append((doc_id, classes[k], int(M[k])))
    return pd.DataFrame(
        rows, columns=["doc_id", "pred_lang", "margin_top"]
    ).astype({"margin_top": "int64"})
