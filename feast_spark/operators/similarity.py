"""Similarity search over embedding columns (array<float>).

Not in the reference (feast's vector search is delegated to online stores
with native ANN, e.g. pgvector/Milvus — ``infra/online_stores/``); here it
is a first-class batch operator, needed for embedding-based near-dup and
retrieval at corpus scale.

- :func:`cosine_topk` — exact brute-force baseline. Queries are broadcast
  (small side), dot products run as Catalyst ``aggregate``/``zip_with``
  expressions (JVM, codegen) — the corpus side streams map-side with no
  shuffle except the final per-query top-k window.
- :func:`lsh_topk` — scale path: random-hyperplane LSH (seeded, driver-side
  numpy planes folded into a Catalyst expression), candidates restricted to
  matching buckets (optionally multi-probe over all single-bit flips),
  then exact re-rank. At 1000 executors the bucket join replaces the
  all-pairs crossJoin: cost drops from O(Q x N) to O(Q x N / 2^bits).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot_expr(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"


def _norm_expr(a: str) -> str:
    return f"sqrt(aggregate({a}, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))"


def with_norm(df: DataFrame, vec_col: str, out: str = "norm") -> DataFrame:
    return df.withColumn(out, F.expr(_norm_expr(vec_col)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine, rank).

    Broadcast the queries; per corpus row evaluate Q dot products JVM-side;
    rank with a per-query window. Deterministic tie-break on neighbor id.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    sims = joined.withColumn(
        "cosine",
        F.expr(_dot_expr("__qv", "__cv"))
        / (F.expr(_norm_expr("__qv")) * F.expr(_norm_expr("__cv"))),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane_bucket_expr(vec_col: str, planes: np.ndarray) -> str:
    """Catalyst expr computing the sign-bit bucket of vec against fixed
    hyperplanes (planes embedded as array literals — dims x bits doubles)."""
    bits = []
    for i, p in enumerate(planes):
        arr = "array(" + ",".join(f"{x:.9f}D" for x in p) + ")"
        bits.append(
            f"(case when aggregate(zip_with({vec_col}, {arr}, (x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v) >= 0 then {1 << i} else 0 end)"
        )
    return " + ".join(bits)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    num_bits: int = 8,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe: bool = True,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k via random-hyperplane buckets + exact re-rank.

    ``multiprobe`` also probes the ``num_bits`` single-bit-flip neighbor
    buckets of each query (recall boost at ~(bits+1)x candidate cost)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_bits, dim))
    bucket = _hyperplane_bucket_expr(vec_col, planes)

    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.expr(bucket).alias("__bucket"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.expr(bucket).alias("__qb"),
    )
    if multiprobe:
        probes = "array(__qb," + ",".join(
            f"__qb ^ {1 << i}" for i in range(num_bits)
        ) + ")"
        q = q.select(
            "query_id", "__qv", F.explode(F.expr(probes)).alias("__bucket")
        )
    else:
        q = q.withColumnRenamed("__qb", "__bucket")

    joined = c.join(F.broadcast(q), "__bucket")
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    sims = joined.withColumn(
        "cosine",
        F.expr(_dot_expr("__qv", "__cv"))
        / (F.expr(_norm_expr("__qv")) * F.expr(_norm_expr("__cv"))),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
