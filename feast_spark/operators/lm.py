"""Corpus-trained hashed n-gram language model (KenLM-style) with stupid
backoff, trained and scored distributed.

The quality-filter stack (CCNet, Gopher, RefinedWeb) ranks documents by
perplexity under an n-gram LM. :mod:`feast_spark.rules` ships a fixed
import-time familiarity table for the pipeline's deterministic scoring;
this module adds the real thing: an LM whose counts come from the corpus
(or a curated in-domain slice) via Spark aggregation, applied map-side as
a vectorized Arrow kernel. Smoothing is stupid backoff (Brants et al.
2007, "Large Language Models in Machine Translation" — the scheme built
for distributed counting at web scale):

    S(w | ctx_k) = count_k(ctx_k, w) / count(ctx_k)      if seen
                 = alpha * S(w | ctx_{k-1})              otherwise

The reference (feast) has no model trainer; like
:mod:`feast_spark.operators.classifier` this extends the
training-data-pipeline surface the brief asks for beyond reference
parity (the materialization shape it reuses is the same
partition-parallel transform + broadcast-model pattern as
``batch_materialization_engine.py`` style jobs).

Why this shape at 100 TB
------------------------
- **One counting pass, one bounded shuffle**: every real token explodes
  to ONE row carrying its padded ``order``-word window; all 2·order-1
  hash keys (gram orders 1..order ending at the token, context orders
  1..order-1 ending just before it) are computed JVM-side from that
  window by multi-arg ``xxhash64`` — no gram strings are ever built (the
  dsir/span lesson). ``stack`` fans the keys into a ``(table, key)``
  stream whose hash aggregation is map-side combined, so the shuffle is
  bounded by the number of DISTINCT keys — and by ``n_buckets`` when set
  (``pmod(hash, B)``), which is what makes the model memory-bounded at
  web scale exactly like KenLM's hashed tries.
- **Context counts from the same windows**: the denominator table for
  order k is the count of (k-1)-gram CONTEXTS observed in the same
  exploded rows, so ``sum_w count_k(ctx, w) == count(ctx)`` holds by
  construction (every row increments a gram and its context once) and
  sentinel-padded document heads are consistent.
- **Broadcast model, map-only scoring**: the collected count tables are
  sorted int64 key/count arrays (O(distinct) or O(B) entries) broadcast
  to executors; scoring gathers with ``np.searchsorted`` inside ONE
  ``mapInPandas`` pass over the hash stream — the text itself never
  enters Python, only ``doc_id`` + 2·order-1 int64 columns cross the
  Arrow boundary.
- **Integer-exact determinism**: per-position log-scores are quantized
  to micro-units (``rint(1e6 * ln S)``) so the per-document reduction is
  an int64 sum — associative and commutative, partition order cannot
  perturb the result. The final ``ppl = exp(-lp/(1e6 n))`` runs in a
  pandas UDF so numpy's libm produces the float on both the engine and
  the driver-side oracle (JVM ``EXP`` may differ in the last ulp).

Collision semantics (hashed arm): gram and context keys collide
independently, so a ratio can exceed 1; probabilities are clamped to 1
and zero denominators floored to 1 — deterministic and shared with the
oracle kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_SENT = "<s>"  # head-padding sentinel word
_MD5_CHARS = 15  # 60-bit md5-prefix keys on the portable arm


def _padded_words(text_col: str, order: int) -> Column:
    return F.concat(
        F.array_repeat(F.lit(_SENT), order - 1), F.split(F.col(text_col), " ")
    )


def _window_struct(order: int) -> Column:
    """Zip ``order`` shifted slices of the padded word array: one struct
    per REAL token holding its ``order``-word history window."""
    w = F.col("__wp")
    n = F.size(w) - (order - 1)
    return F.arrays_zip(*[F.slice(w, 1 + o, n) for o in range(order)])


def _hash_cols(order: int, method: str, n_buckets: int | None) -> list[Column]:
    """The 2*order-1 key columns from a window struct ``__g`` whose
    fields ``0..order-1`` are the window words (field order-1 = current
    token): gram keys ``g1..g_order`` (suffixes ending at the token) and
    context keys ``x1..x_{order-1}`` (sub-windows ending just before
    it)."""

    def key(fields: list[Column]) -> Column:
        if method == "xxhash64":
            h = F.xxhash64(*fields)
        elif method == "portable":
            h = F.conv(
                F.substring(F.md5(F.concat_ws(" ", *fields)), 1, _MD5_CHARS),
                16,
                10,
            ).cast("long")
        else:  # pragma: no cover
            raise ValueError(f"unknown method {method!r}")
        return F.pmod(h, F.lit(n_buckets)) if n_buckets else h

    f = [F.col("__g").getField(str(i)) for i in range(order)]
    cols = []
    for k in range(1, order + 1):  # gram of order k = last k words
        cols.append(key(f[order - k : order]).alias(f"g{k}"))
    for k in range(1, order):  # context of order k = k words before token
        cols.append(key(f[order - 1 - k : order - 1]).alias(f"x{k}"))
    return cols


def _window_stream(
    df: DataFrame, id_col: str, text_col: str, order: int, method: str,
    n_buckets: int | None,
) -> DataFrame:
    return (
        df.select(F.col(id_col), _padded_words(text_col, order).alias("__wp"))
        .select(id_col, F.explode(_window_struct(order)).alias("__g"))
        .select(id_col, *_hash_cols(order, method, n_buckets))
    )


@dataclass
class NgramLM:
    """Broadcastable model: per-table sorted key/count arrays.

    ``tables`` maps table name (``g1..g{order}``, ``x1..x{order-1}``) to
    ``(keys, counts)`` — int64 numpy arrays sorted by key. ``n_tokens``
    is the total real-token count (the order-1 denominator)."""

    order: int
    method: str
    n_buckets: int | None
    alpha: float
    tables: dict[str, tuple[np.ndarray, np.ndarray]]
    n_tokens: int

    def lookup(self, table: str, keys: np.ndarray) -> np.ndarray:
        """Vectorized count gather (0 for absent keys)."""
        tk, tc = self.tables[table]
        idx = np.searchsorted(tk, keys)
        idx = np.minimum(idx, max(len(tk) - 1, 0))
        out = np.zeros(len(keys), np.int64)
        if len(tk):
            hit = tk[idx] == keys
            out[hit] = tc[idx[hit]]
        return out


def train_ngram_lm(
    df: DataFrame,
    text_col: str = "text",
    order: int = 5,
    method: str = "xxhash64",
    n_buckets: int | None = None,
    alpha: float = 0.4,
    id_col: str = "doc_id",
) -> NgramLM:
    """Count all gram/context tables in one pass and collect the model.

    ``n_buckets=None`` keeps exact 64-bit keys (collision-free for
    practical vocabularies — correctness harness / in-domain LMs);
    setting ``n_buckets`` bounds both the shuffle and the model at
    ``(2*order-1) * B`` rows total, the hashed-KenLM scale form.

    ``method='numpy'`` hashes inside the Arrow batches instead of in
    SQL (prefix-product rolling hashes), which pre-aggregates counts
    map-side in the kernel and makes SCORING shuffle-free — see the
    numpy-arm section below.
    """
    if method == "numpy":
        return _train_numpy(df, text_col, order, n_buckets, alpha)
    stream = _window_stream(df, id_col, text_col, order, method, n_buckets)
    names = [f"g{k}" for k in range(1, order + 1)] + [
        f"x{k}" for k in range(1, order)
    ]
    stacked = stream.select(
        F.expr(
            "stack({n}, {args}) AS (tbl, key)".format(
                n=len(names),
                args=", ".join(f"'{t}', {t}" for t in names),
            )
        )
    )
    counts = (
        stacked.groupBy("tbl", "key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .toPandas()
    )
    tables: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    n_tokens = 0
    for t in names:
        sub = counts[counts["tbl"] == t]
        keys = sub["key"].to_numpy(np.int64)
        cnts = sub["cnt"].to_numpy(np.int64)
        o = np.argsort(keys, kind="stable")
        tables[t] = (keys[o], cnts[o])
        if t == "g1":
            n_tokens = int(cnts.sum())
    return NgramLM(
        order=order, method=method, n_buckets=n_buckets, alpha=alpha,
        tables=tables, n_tokens=n_tokens,
    )


def _backoff_logq(
    model: NgramLM, cols: dict[str, np.ndarray]
) -> np.ndarray:
    """Shared scoring kernel: quantized ``rint(1e6 * ln S)`` per position
    under stupid backoff. Identical arithmetic on the Spark executors and
    in the naive oracle — every op is a numpy float64 ufunc."""
    n_tok = np.float64(max(model.n_tokens, 1))
    c1 = model.lookup("g1", cols["g1"]).astype(np.float64)
    # unseen unigram -> half-count floor over the corpus
    s = np.where(c1 > 0, c1 / n_tok, np.float64(0.5) / n_tok)
    for k in range(2, model.order + 1):
        ck = model.lookup(f"g{k}", cols[f"g{k}"]).astype(np.float64)
        dk = model.lookup(f"x{k - 1}", cols[f"x{k - 1}"]).astype(np.float64)
        s = np.where(ck > 0, ck / np.maximum(dk, 1.0), np.float64(model.alpha) * s)
    s = np.minimum(s, np.float64(1.0))
    return np.rint(np.float64(1e6) * np.log(s)).astype(np.int64)


def lm_perplexity(
    df: DataFrame,
    model: NgramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document: ``(id_col, n_tokens, lp_sum, ppl)`` where
    ``lp_sum`` is the exact int64 micro-log-prob sum and
    ``ppl = exp(-lp_sum / (1e6 * n_tokens))``. numpy-arm models score in
    ONE mapInPandas pass with no shuffle; SQL-arm models stream exploded
    positions through an Arrow kernel and aggregate by ``id_col``."""
    if model.method == "numpy":
        return _score_numpy(df, model, text_col, id_col)
    spark = df.sparkSession
    stream = _window_stream(
        df, id_col, text_col, model.order, model.method, model.n_buckets
    )
    bc = spark.sparkContext.broadcast(model)
    names = [f"g{k}" for k in range(1, model.order + 1)] + [
        f"x{k}" for k in range(1, model.order)
    ]
    id_type = dict(df.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, lp_q long"

    def score(batches):
        m = bc.value
        for pdf in batches:
            cols = {t: pdf[t].to_numpy(np.int64) for t in names}
            yield pd.DataFrame(
                {id_col: pdf[id_col], "lp_q": _backoff_logq(m, cols)}
            )

    scored = stream.mapInPandas(score, schema=out_schema)
    agg = scored.groupBy(id_col).agg(
        F.sum("lp_q").alias("lp_sum"),
        F.count(F.lit(1)).alias("n_tokens"),
    )

    @F.pandas_udf("double")
    def _ppl(lp: pd.Series, n: pd.Series) -> pd.Series:
        # numpy exp on both engine and oracle -> bit-identical doubles
        return pd.Series(
            np.exp(
                -lp.to_numpy(np.float64)
                / (np.float64(1e6) * n.to_numpy(np.float64))
            )
        )

    return agg.select(
        id_col, "n_tokens", "lp_sum", _ppl("lp_sum", "n_tokens").alias("ppl")
    )


# ---------------------------------------------------------------------------
# numpy arm: hashing vectorized INSIDE the Arrow batch, zero-shuffle scoring
# ---------------------------------------------------------------------------
#
# The SQL arms hash JVM-side, which forces scoring through an exploded
# per-position stream + a doc-keyed aggregation. The numpy arm instead
# hashes inside the pandas batch with prefix-product rolling hashes, so a
# whole document scores within its own row: `lm_perplexity(...,
# method="numpy")` is ONE mapInPandas with no shuffle at all, and
# :func:`lm_score_texts` drops into any other Arrow kernel (the quality
# pipeline's scoring pass) as a pure function of the batch.
#
# Span hashing trick: with odd base B, the prefix sum S_k = sum_{j<k}
# c_j * B^j (uint64, wraparound IS mod 2^64) gives the polynomial hash of
# ANY span [a, b) as (S_b - S_a) * B^-a — the modular inverse exists
# because B is odd. One prefix array per level (chars -> word hashes,
# word hashes -> gram hashes) yields every (order, position) key in O(1)
# each, fully vectorized. Sentinel padding is spliced into the flat
# word-hash array per document, so document boundaries never leak grams.

_NB = np.uint64(1000003)  # char-level base (odd -> invertible mod 2^64)
_NB2 = np.uint64(1000033)  # word-level base
_NINV = np.uint64(pow(1000003, -1, 2**64))
_NINV2 = np.uint64(pow(1000033, -1, 2**64))
_NMIX = np.uint64(0x9E3779B97F4A7C15)
_U1 = np.uint64(1)


def _mix64(v: np.ndarray) -> np.ndarray:
    h = v * _NMIX
    return h ^ (h >> np.uint64(32))


def _span_hash(prefix: np.ndarray, inv_pow: np.ndarray, a, b) -> np.ndarray:
    """Polynomial hash of spans [a, b) from a prefix array (vectorized)."""
    return _mix64((prefix[b] - prefix[a]) * inv_pow[a])


def _word_hashes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(flat word hashes, words-per-row) — split on single space, exactly
    like Spark ``split(text, ' ')`` (empty words between double spaces
    hash as the empty span, value mix(0))."""
    filled = texts.fillna("").astype(str)
    if len(filled) == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    joined = " ".join(filled.tolist())
    codes = np.frombuffer(
        joined.encode("utf-32-le", "surrogatepass"), dtype=np.uint32
    ).astype(np.uint64)
    n_chars = len(codes)
    # prefix powers/sums over the whole batch (span extraction normalizes
    # away the absolute offset, so no per-word or per-doc reset is needed)
    pw = np.empty(n_chars + 1, np.uint64)
    pw[0] = _U1
    np.cumprod(np.full(n_chars, _NB, np.uint64), out=pw[1:])
    ipw = np.empty(n_chars + 1, np.uint64)
    ipw[0] = _U1
    np.cumprod(np.full(n_chars, _NINV, np.uint64), out=ipw[1:])
    S = np.zeros(n_chars + 1, np.uint64)
    np.cumsum(codes * pw[:n_chars], out=S[1:])
    is_space = codes == np.uint64(32)
    # word boundaries: starts after each space (and 0), ends before each
    bnd = np.flatnonzero(is_space)
    starts = np.concatenate(([0], bnd + 1))
    ends = np.concatenate((bnd, [n_chars]))
    w = _span_hash(S, ipw, starts, ends)
    # words per row = in-row spaces + 1; the joining separators account
    # for the remaining boundary words, so len(w) == n_words.sum()
    n_words = (filled.str.count(" ") + 1).to_numpy(np.int64)
    return w, n_words


_SENT_H = _word_hashes(pd.Series([_SENT]))[0][0]


def _batch_keys(
    texts: pd.Series, order: int, n_buckets: int | None
) -> tuple[dict[str, np.ndarray], np.ndarray]:
    """All (2*order-1) key arrays for every real token of the batch, plus
    the per-row token counts. Keys are int64 (bucketed when requested)."""
    w, n_words = _word_hashes(texts)
    # splice sentinel padding in front of every row's words
    n_rows = len(n_words)
    total = int(n_words.sum())
    pad = order - 1
    P = np.empty(total + pad * n_rows, np.uint64)
    out_off = np.zeros(n_rows + 1, np.int64)
    np.cumsum(n_words + pad, out=out_off[1:])
    sent_idx = (
        out_off[:-1, None] + np.arange(pad)[None, :]
    ).reshape(-1)
    P[sent_idx] = _SENT_H
    mask = np.ones(len(P), bool)
    mask[sent_idx] = False
    P[mask] = w
    # word-level prefix arrays over the padded stream
    n = len(P)
    pw = np.empty(n + 1, np.uint64)
    pw[0] = _U1
    np.cumprod(np.full(n, _NB2, np.uint64), out=pw[1:])
    ipw = np.empty(n + 1, np.uint64)
    ipw[0] = _U1
    np.cumprod(np.full(n, _NINV2, np.uint64), out=ipw[1:])
    T = np.zeros(n + 1, np.uint64)
    np.cumsum(P * pw[:n], out=T[1:])
    # padded index of every real token
    pos = np.flatnonzero(mask)
    keys: dict[str, np.ndarray] = {}

    def fin(h: np.ndarray) -> np.ndarray:
        v = h.view(np.int64)
        if n_buckets:
            return np.mod(v, n_buckets)
        return v.copy()

    for k in range(1, order + 1):
        keys[f"g{k}"] = fin(_span_hash(T, ipw, pos - k + 1, pos + 1))
    for k in range(1, order):
        keys[f"x{k}"] = fin(_span_hash(T, ipw, pos - k, pos))
    return keys, n_words


def _train_numpy(
    df: DataFrame, text_col: str, order: int, n_buckets: int | None,
    alpha: float,
) -> NgramLM:
    """Counting pass for the numpy arm: each partition pre-aggregates its
    key stream with np.unique (map-side combine in the kernel), emits
    compact (tbl, key, cnt) rows; one bounded groupBy-sum shuffle."""
    names = [f"g{k}" for k in range(1, order + 1)] + [
        f"x{k}" for k in range(1, order)
    ]
    tbl_id = {t: i for i, t in enumerate(names)}

    def count_batches(batches):
        for pdf in batches:
            keys, _ = _batch_keys(pdf[text_col], order, n_buckets)
            out_t, out_k, out_c = [], [], []
            for t, arr in keys.items():
                uk, uc = np.unique(arr, return_counts=True)
                out_t.append(np.full(len(uk), tbl_id[t], np.int8))
                out_k.append(uk)
                out_c.append(uc.astype(np.int64))
            yield pd.DataFrame(
                {
                    "tbl": np.concatenate(out_t) if out_t else [],
                    "key": np.concatenate(out_k) if out_k else [],
                    "cnt": np.concatenate(out_c) if out_c else [],
                }
            )

    counts = (
        df.select(text_col)
        .mapInPandas(count_batches, "tbl byte, key long, cnt long")
        .groupBy("tbl", "key")
        .agg(F.sum("cnt").alias("cnt"))
        .toPandas()
    )
    tables: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    n_tokens = 0
    for t, i in tbl_id.items():
        sub = counts[counts["tbl"] == i]
        k = sub["key"].to_numpy(np.int64)
        c = sub["cnt"].to_numpy(np.int64)
        o = np.argsort(k, kind="stable")
        tables[t] = (k[o], c[o])
        if t == "g1":
            n_tokens = int(c.sum())
    return NgramLM(
        order=order, method="numpy", n_buckets=n_buckets, alpha=alpha,
        tables=tables, n_tokens=n_tokens,
    )


def lm_score_texts(
    model: NgramLM, texts: pd.Series
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Score a batch of texts against a numpy-arm model INSIDE the
    calling Arrow kernel: returns (lp_sum int64, n_tokens int64, ppl
    float64) per row. Pure function of the batch — no Spark, no shuffle;
    this is what the quality pipeline's opt-in LM gate calls."""
    if model.method != "numpy":  # pragma: no cover
        raise ValueError("lm_score_texts requires a method='numpy' model")
    keys, n_words = _batch_keys(texts, model.order, model.n_buckets)
    lp_q = _backoff_logq(model, keys)
    off = np.zeros(len(n_words) + 1, np.int64)
    np.cumsum(n_words, out=off[1:])
    csum = np.zeros(len(lp_q) + 1, np.int64)
    np.cumsum(lp_q, out=csum[1:])
    lp_sum = csum[off[1:]] - csum[off[:-1]]
    ppl = np.exp(
        -lp_sum.astype(np.float64)
        / (np.float64(1e6) * np.maximum(n_words, 1).astype(np.float64))
    )
    return lp_sum, n_words.astype(np.int64), ppl


def _score_numpy(
    df: DataFrame, model: NgramLM, text_col: str, id_col: str
) -> DataFrame:
    bc = df.sparkSession.sparkContext.broadcast(model)
    id_type = dict(df.dtypes)[id_col]

    def score(batches):
        m = bc.value
        for pdf in batches:
            lp, n, ppl = lm_score_texts(m, pdf[text_col])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": n,
                    "lp_sum": lp,
                    "ppl": ppl,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        score,
        schema=f"{id_col} {id_type}, n_tokens long, lp_sum long, ppl double",
    )


# ---------------------------------------------------------------------------
# naive oracle (driver-side, pure python/numpy — no Spark)
# ---------------------------------------------------------------------------


def _md5_key(words: tuple[str, ...], n_buckets: int | None) -> int:
    import hashlib

    h = int(
        hashlib.md5(" ".join(words).encode()).hexdigest()[:_MD5_CHARS], 16
    )
    return h % n_buckets if n_buckets else h


def naive_lm_pdf(
    texts: pd.Series,
    ids: pd.Series,
    order: int = 5,
    alpha: float = 0.4,
    n_buckets: int | None = None,
    train_texts: pd.Series | None = None,
) -> pd.DataFrame:
    """Independent replay of train+score on the portable arm: Counter
    tables over gram TUPLES keyed by the shared md5 bucket function, then
    a per-document python scoring loop. Bit-exact vs the engine because
    both kernels do the same float64 ops in the same order and all
    cross-position reductions are int64. ``train_texts`` (default: the
    scored texts themselves) selects the training slice — the CCNet
    pattern of training in-domain and scoring the whole corpus."""
    from collections import Counter

    tabs: dict[str, Counter] = {
        **{f"g{k}": Counter() for k in range(1, order + 1)},
        **{f"x{k}": Counter() for k in range(1, order)},
    }

    def _pad(series: pd.Series) -> list[list[str]]:
        return [
            [_SENT] * (order - 1) + str(t).split(" ")
            for t in series.fillna("")
        ]

    docs = _pad(texts)
    for words in _pad(train_texts) if train_texts is not None else docs:
        for i in range(order - 1, len(words)):
            for k in range(1, order + 1):
                tabs[f"g{k}"][_md5_key(tuple(words[i - k + 1 : i + 1]), n_buckets)] += 1
            for k in range(1, order):
                tabs[f"x{k}"][_md5_key(tuple(words[i - k : i]), n_buckets)] += 1
    n_tok = np.float64(max(sum(tabs["g1"].values()), 1))
    rows = []
    for doc_id, words in zip(ids, docs):
        lp = np.int64(0)
        n = 0
        for i in range(order - 1, len(words)):
            c1 = tabs["g1"][_md5_key((words[i],), n_buckets)]
            s = (
                np.float64(c1) / n_tok
                if c1 > 0
                else np.float64(0.5) / n_tok
            )
            for k in range(2, order + 1):
                ck = tabs[f"g{k}"][_md5_key(tuple(words[i - k + 1 : i + 1]), n_buckets)]
                dk = tabs[f"x{k - 1}"][_md5_key(tuple(words[i - k + 1 : i]), n_buckets)]
                if ck > 0:
                    s = np.float64(ck) / max(np.float64(dk), np.float64(1.0))
                else:
                    s = np.float64(alpha) * s
            s = min(s, np.float64(1.0))
            lp += np.rint(np.float64(1e6) * np.log(s)).astype(np.int64)
            n += 1
        ppl = np.exp(-np.float64(lp) / (np.float64(1e6) * np.float64(n)))
        rows.append((doc_id, n, int(lp), float(ppl)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_tokens", "lp_sum", "ppl"]
    ).astype({"n_tokens": "int64", "lp_sum": "int64"})


def save_ngram_lm(model: NgramLM, path: str) -> None:
    """Persist the model as one .npz (the frozen-calibration artifact
    incremental curation versions alongside its span state)."""
    arrays = {}
    for name, (k, c) in model.tables.items():
        arrays[f"k_{name}"] = k
        arrays[f"c_{name}"] = c
    np.savez_compressed(
        path,
        __meta=np.array(
            [model.order, -1 if model.n_buckets is None else model.n_buckets,
             model.n_tokens],
            dtype=np.int64,
        ),
        __alpha=np.array([model.alpha]),
        __method=np.array([model.method]),
        **arrays,
    )


def load_ngram_lm(path: str) -> NgramLM:
    z = np.load(path, allow_pickle=False)
    order, n_buckets, n_tokens = (int(x) for x in z["__meta"])
    tables = {
        name[2:]: (z[name], z[f"c_{name[2:]}"])
        for name in z.files
        if name.startswith("k_")
    }
    return NgramLM(
        order=order,
        method=str(z["__method"][0]),
        n_buckets=None if n_buckets < 0 else n_buckets,
        alpha=float(z["__alpha"][0]),
        tables=tables,
        n_tokens=n_tokens,
    )


def perplexity_buckets(
    scored: DataFrame,
    group_col: str,
    score_col: str = "ppl",
    quantiles: tuple = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): cut each
    group (CCNet: each language) at the exact ``quantiles`` of
    ``score_col`` and label rows ``head`` / ``middle`` / ``tail`` —
    the standard downstream treatment (keep head+middle, drop or
    down-sample tail) after LM scoring.

    Shape: one hash aggregation reduces each group to its cut array
    (Spark's EXACT ``percentile`` — interpolation pinned bit-equal to
    DuckDB ``quantile_cont`` by the round-1 ``numeric_stats`` oracle);
    the tiny per-group cut table broadcasts back; the label itself is a
    map-side fold over the cut array (``aggregate``: count of cuts
    strictly below the score indexes into ``labels``). No corpus-side
    shuffle beyond the one group agg — calibrating on 100 TB costs one
    numeric reduction per group.
    """
    assert len(labels) == len(quantiles) + 1
    cuts = scored.groupBy(group_col).agg(
        F.percentile(
            F.col(score_col),
            F.array(*[F.lit(float(q)) for q in quantiles]),
        ).alias("__cuts")
    )
    out = scored.join(F.broadcast(cuts), group_col)
    idx = F.aggregate(
        F.col("__cuts"),
        F.lit(0),
        lambda acc, c: acc + (F.col(score_col) > c).cast("int"),
    )
    label_arr = F.array(*[F.lit(l) for l in labels])
    return out.withColumn("bucket", F.element_at(label_arr, idx + 1)).drop(
        "__cuts"
    )


def moore_lewis_scores(
    docs: DataFrame,
    in_domain: DataFrame,
    general: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 3,
    method: str = "xxhash64",
    n_buckets: int | None = 1 << 20,
    alpha: float = 0.4,
) -> DataFrame:
    """Moore–Lewis cross-entropy-difference selection (Moore & Lewis
    2010, "Intelligent Selection of Language Model Training Data"): score
    every document by ``H_in(d) - H_gen(d)`` — its per-token cross-entropy
    under an IN-DOMAIN LM minus under a GENERAL LM trained on the whole
    corpus (default: ``docs`` itself). Documents that look more in-domain
    than average score NEGATIVE; the standard selection keeps everything
    under a threshold (0 = "more in-domain-like than corpus-typical").
    The two-model contrast cancels generic fluency that a single-LM
    perplexity gate (CCNet) conflates with domain fit.

    Exactness: both scores are the engine's int64 micro-log-prob sums, so
    ``ce_diff_units = lp_gen_sum - lp_in_sum`` is an EXACT integer per
    document (association-order-free); ``ce_diff`` is that over
    ``1e6 * n_tokens`` in one fixed float64 division.

    Scale shape: two bounded LM trainings (``n_buckets`` caps both the
    counting shuffle and the broadcast model — REQUIRED at corpus scale,
    see CurationConfig.lm_buckets) + two map-side scoring passes joined
    on ``id_col``; nothing new shuffles the corpus text.

    Reference: feast has no data-selection operators; the method is the
    public Moore–Lewis formulation (also the DSIR paper's baseline).
    """
    lm_in = train_ngram_lm(
        in_domain, text_col=text_col, order=order, method=method,
        n_buckets=n_buckets, alpha=alpha,
    )
    lm_gen = train_ngram_lm(
        general if general is not None else docs,
        text_col=text_col, order=order, method=method,
        n_buckets=n_buckets, alpha=alpha,
    )
    a = lm_perplexity(docs, lm_in, text_col=text_col, id_col=id_col).select(
        id_col,
        F.col("n_tokens"),
        F.col("lp_sum").alias("lp_in_sum"),
        F.col("ppl").alias("ppl_in"),
    )
    b = lm_perplexity(docs, lm_gen, text_col=text_col, id_col=id_col).select(
        id_col,
        F.col("lp_sum").alias("lp_gen_sum"),
        F.col("ppl").alias("ppl_gen"),
    )
    out = a.join(b, id_col)
    units = (F.col("lp_gen_sum") - F.col("lp_in_sum")).alias("ce_diff_units")
    return out.select(
        id_col,
        "n_tokens",
        "lp_in_sum",
        "lp_gen_sum",
        "ppl_in",
        "ppl_gen",
        units,
        (
            (F.col("lp_gen_sum") - F.col("lp_in_sum")).cast("double")
            / (F.lit(1e6) * F.col("n_tokens").cast("double"))
        ).alias("ce_diff"),
    )
