"""BM25 sparse keyword retrieval — the inverted-index complement of the
dense ANN family (``operators/similarity.py``): top-k documents per
query under Okapi BM25 with the Lucene/ATIRE idf
``ln(1 + (N - df + 0.5) / (df + 0.5))``.

In a training-data pipeline this is the retrieval arm used for
query-based decontamination sweeps and targeted curation (pull the docs
most similar to an eval prompt), next to ``contamination_check``'s
n-gram-overlap arm.

Scale shape (the part that matters at 100 TB):

- the QUERY side is tiny by contract and is collected once; its distinct
  terms become a broadcast build side, so the corpus term stream is
  pruned to matching terms BEFORE any shuffle — a 100-term query set
  reduces the exploded corpus to a sliver.
- shuffle #1: hash agg of the pruned stream to per-``(doc_id, term)``
  tf rows (doc length rides along as ``max(dl)``, computed map-side).
- ``df`` per query term and the resulting idf table are tiny
  (≤ distinct query terms) — collected, idf computed driver-side in
  Python, and broadcast-joined back.
- shuffle #2: hash agg to per-``(query_id, doc_id)`` scores; the top-k
  window per query is over ≤ matched docs and Spark rewrites the
  rank-filter to ``WindowGroupLimit`` (no global sort).
- corpus text itself never crosses an exchange.

Determinism / oracle bit-exactness: per-term contributions are computed
with one fixed association order of IEEE double ops (mirrored exactly by
the naive pandas oracle in ``feast_spark/oracles.py``), then quantized
to integer units of 2^-20 — ``score_units`` is an int64 SUM, so the
cross-term reduction is order-free, and ranking compares exact integers
with ``doc_id`` as the tie-break. idf is computed ONCE driver-side with
``math.log`` (both sides share CPython's libm), never re-derived by two
different engines' ``ln``.

Reference: feast's closest surface is vector retrieval
(``infra/online_stores/``'s ``retrieve_online_documents``); BM25 itself
follows the public Robertson/Sparck-Jones formulation as implemented in
Lucene.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_topk", "DEFAULT_QUERIES"]

_QUANT = 1048576.0  # contribution quantization: integer units of 2^-20

# default query set for the driver/bench surface (terms from the
# testdata documents vocabulary)
DEFAULT_QUERIES: list[tuple[str, str]] = [
    ("q1", "customer data filter"),
    ("q2", "spark stream window"),
    ("q3", "slow merge sort batch"),
]


def _tokens(col):
    return F.filter(
        F.split(F.lower(F.trim(col)), "\\s+"), lambda x: F.length(x) > 0
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[str, str]] | None = None,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` docs per query by BM25. ``queries`` is a small list of
    ``(query_id, query_text)`` — each query scores against its DISTINCT
    lowercased terms. Returns
    ``(query_id, doc_id, rank, score_units, score)`` where
    ``score = score_units / 2**20`` (see module docstring for why the
    integer form exists). Docs matching no term are absent; ranks are
    dense from 1 with ``doc_id`` breaking exact-score ties.
    """
    spark = docs.sparkSession
    if queries is None:
        queries = DEFAULT_QUERIES
    qterms = [
        (qid, sorted({t for t in qtext.lower().split() if t}))
        for qid, qtext in queries
    ]
    all_terms = sorted({t for _, ts in qterms for t in ts})
    if not all_terms:
        raise ValueError("queries contain no terms")

    toks = _tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        toks.alias("_toks"),
    )
    # corpus stats: one map-side-combined agg -> two driver scalars
    n_docs, total_tokens = base.agg(
        F.count(F.lit(1)), F.sum("dl")
    ).first()
    if not n_docs:
        raise ValueError("empty corpus")
    avgdl = float(total_tokens) / float(n_docs)

    # prune the exploded term stream to query terms BEFORE the shuffle
    # (broadcast hash join on the tiny term list)
    terms_df = F.broadcast(
        spark.createDataFrame([(t,) for t in all_terms], "term string")
    )
    from feast_spark.operators.dedup import _scoped_persist

    # persisted: consumed by the df collect AND the caller's final
    # action; registered in the dedup scoped-cache registry so
    # release_dedup_caches() / bench passes reclaim it
    tf = _scoped_persist(
        base.select("doc_id", "dl", F.explode("_toks").alias("term"))
        .join(terms_df, "term")
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.max("dl").alias("dl"),
        )
    )
    # df per query term: tiny (<= len(all_terms) rows)
    df_map = {
        r["term"]: r["df"]
        for r in tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    }
    # idf driver-side in Python (shared libm with the oracle)
    idf = {
        t: math.log(
            1.0 + (n_docs - df_map.get(t, 0) + 0.5) / (df_map.get(t, 0) + 0.5)
        )
        for t in all_terms
    }
    qt_rows = [
        (qid, t, idf[t]) for qid, ts in qterms for t in ts if df_map.get(t)
    ]
    if not qt_rows:
        return spark.createDataFrame(
            [],
            "query_id string, doc_id long, rank int, "
            "score_units long, score double",
        )
    qt = F.broadcast(
        spark.createDataFrame(qt_rows, "query_id string, term string, idf double")
    )

    # fixed association order, mirrored 1:1 by the pandas oracle:
    #   denom = tf + k1 * (one_minus_b + b * dl / avgdl)
    #   contrib = idf * (tf * k1p1) / denom
    one_minus_b = 1.0 - b
    k1p1 = k1 + 1.0
    dl_d = F.col("dl").cast("double")
    tf_d = F.col("tf").cast("double")
    denom = tf_d + F.lit(k1) * (
        F.lit(one_minus_b) + F.lit(b) * dl_d / F.lit(avgdl)
    )
    contrib = F.col("idf") * (tf_d * F.lit(k1p1)) / denom
    units = F.floor(contrib * F.lit(_QUANT)).cast("long")

    scored = (
        tf.join(qt, "term")
        .select("query_id", "doc_id", units.alias("u"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("u").alias("score_units"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_units").desc(), "doc_id"
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(
            "query_id",
            "doc_id",
            "rank",
            "score_units",
            (F.col("score_units").cast("double") / F.lit(_QUANT)).alias(
                "score"
            ),
        )
    )
    return out
