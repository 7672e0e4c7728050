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
import pandas as pd
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


def _bucket_col(vec_col: str, planes: np.ndarray, method: str = "auto"):
    """Bucket column for fixed hyperplanes.

    ``sql``: planes embedded as array literals — pure Catalyst, zero
    Python, but the expression string is O(dim x bits) chars (fragile
    above ~dim 256 x 16 bits: >100k-char SQL strings stress the parser).
    ``pandas``: vectorized Arrow-batched matmul with the planes shipped
    once in the task closure — the scale path for big dims. ``auto``
    picks sql below 4096 plane cells. Both produce IDENTICAL buckets for
    the same planes up to float summation order; pick ONE method per
    dataset (bucket files are not interchangeable across methods)."""
    if method == "auto":
        method = "sql" if planes.size <= 4096 else "pandas"
    if method == "sql":
        return F.expr(_hyperplane_bucket_expr(vec_col, planes))
    if method != "pandas":
        raise ValueError(f"unknown bucket method: {method}")
    # planes rounded through the same %.9f the SQL literal uses, so the
    # two methods agree except on knife-edge dot==0 sign flips
    p = np.array([[float(f"{x:.9f}") for x in row] for row in planes]).T

    @F.pandas_udf("long")
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs]) if len(vecs) else np.zeros((0, p.shape[0]))
        signs = (mat @ p) >= 0
        vals = signs @ (1 << np.arange(p.shape[1], dtype=np.int64))
        return pd.Series(vals.astype(np.int64))

    return bucket_udf(F.col(vec_col))


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
    bucket_method: str = "auto",
    num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k via random-hyperplane buckets + exact re-rank.

    ``multiprobe`` also probes the ``num_bits`` single-bit-flip neighbor
    buckets of each query (recall boost at ~(bits+1)x candidate cost).
    ``num_tables`` > 1 builds L independent hash tables (fresh planes per
    table) and unions their candidates — the classical LSH recall lever:
    miss probability decays exponentially in L while cost grows linearly
    (recall study: scripts/ann_recall.py + BASELINE.md §ANN).
    ``bucket_method`` picks the projection path (see :func:`_bucket_col`):
    Catalyst SQL literals for small dims, an Arrow-batched matmul pandas
    UDF for dim x bits beyond SQL-string sanity."""
    rng = np.random.default_rng(seed)

    def table(t: int) -> tuple:
        planes = rng.standard_normal((num_bits, dim))
        c = corpus.select(
            F.col(corpus_id).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            F.lit(t).alias("__tbl"),
            _bucket_col(vec_col, planes, bucket_method).alias("__bucket"),
        )
        q = queries.select(
            F.col(query_id).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.lit(t).alias("__tbl"),
            _bucket_col(vec_col, planes, bucket_method).alias("__qb"),
        )
        return c, q

    tables = [table(t) for t in range(num_tables)]
    c = tables[0][0]
    q = tables[0][1]
    for ct, qt in tables[1:]:
        c = c.unionByName(ct)
        q = q.unionByName(qt)
    if multiprobe:
        probes = "array(__qb," + ",".join(
            f"__qb ^ {1 << i}" for i in range(num_bits)
        ) + ")"
        q = q.select(
            "query_id", "__qv", "__tbl",
            F.explode(F.expr(probes)).alias("__bucket"),
        )
    else:
        q = q.withColumnRenamed("__qb", "__bucket")

    joined = c.join(F.broadcast(q), ["__tbl", "__bucket"])
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


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    cosine_threshold: float = 0.9,
    num_bits: int = 6,
    seed: int = 7,
    max_bucket_size: int | None = None,
    bucket_method: str = "auto",
) -> DataFrame:
    """(id_a, id_b, cosine) near-duplicate pairs via LSH bucketing — the
    package-level SCALE path for embedding near-dup (round-1 finding #7:
    the all-pairs theta join was entry-file-only and capped).

    Random-hyperplane buckets partition the corpus; the self-join runs
    only within a bucket (cost N^2 / 2^bits in expectation), then exact
    cosine verifies. Recall note: a pair straddling a hyperplane lands in
    different buckets and is missed — raise recall by lowering num_bits
    (bigger buckets) or running multiple seeds and unioning (standard
    banding); high-cosine pairs disagree on few planes, so recall rises
    steeply with similarity. ``max_bucket_size`` caps degenerate buckets
    (e.g. all-zero vectors) before the quadratic join.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_bits, dim))
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _bucket_col(vec_col, planes, bucket_method).alias("__bucket"),
    )
    if max_bucket_size:
        sizes = base.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__bsz"))
        base = (
            base.join(sizes, "__bucket")
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a = base.select(
        F.col("__bucket"), F.col("id").alias("id_a"), F.col("v").alias("va")
    )
    b = base.select(
        F.col("__bucket"), F.col("id").alias("id_b"), F.col("v").alias("vb")
    )
    pairs = a.join(b, ["__bucket"]).filter(F.col("id_a") < F.col("id_b"))
    sims = pairs.withColumn(
        "cosine",
        F.expr(_dot_expr("va", "vb"))
        / (F.expr(_norm_expr("va")) * F.expr(_norm_expr("vb"))),
    )
    return (
        sims.filter(F.col("cosine") >= cosine_threshold)
        .select("id_a", "id_b", "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse quantizer + probed exact re-rank
# ---------------------------------------------------------------------------


def spherical_kmeans(
    sample: np.ndarray, n_clusters: int, iters: int = 10
) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd, fixed iterations, first-rows
    init) on a driver-side sample — the IVF coarse quantizer. Returns
    unit-norm centroids (n_clusters, dim) float64. Shared verbatim by the
    driver oracle so assignment is bit-identical."""
    x = sample.astype(np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms
    cent = x[:n_clusters].copy()
    for _ in range(iters):
        sims = x @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(n_clusters):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def _assign_udf(centroids: np.ndarray, n_probe: int):
    """pandas UDF: top-n_probe centroid ids per vector (n_probe=1 for the
    corpus side). Centroids travel in the task closure once."""
    cent_t = centroids.T  # (dim, n_clusters)

    @F.pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ cent_t
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype(np.int32) for row in idx])

    return assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_clusters: int = 64,
    n_probe: int = 4,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    kmeans_iters: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into n_clusters
    inverted lists, probe each query's n_probe nearest lists, exact cosine
    re-rank inside them — the second ANN family next to hyperplane LSH
    (complementary failure modes: IVF adapts to the data distribution,
    LSH is distribution-free).

    Cost model: corpus assignment is one map-side matmul pass; the probe
    join touches ~n_probe/n_clusters of the corpus per query. Recall rises
    with n_probe (miss only when the true neighbor's list isn't probed).
    The quantizer trains on a deterministic driver-side sample (sorted
    top-``sample_size`` ids) so runs are reproducible and the driver
    oracle can retrain identically.
    """
    sample_rows = (
        corpus.select(corpus_id, vec_col)
        .orderBy(corpus_id)
        .limit(sample_size)
        .collect()
    )
    sample = np.array([list(r[1]) for r in sample_rows], dtype=np.float64)
    n_clusters = min(n_clusters, len(sample))
    centroids = spherical_kmeans(sample, n_clusters, kmeans_iters)

    c_assign = _assign_udf(centroids, 1)
    q_assign = _assign_udf(centroids, n_probe)
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.element_at(c_assign(F.col(vec_col)), 1).alias("__list"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(q_assign(F.col(vec_col))).alias("__list"),
    )
    joined = c.join(F.broadcast(q), "__list")
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


# ---------------------------------------------------------------------------
# SemDeDup: cluster-scoped semantic near-dup pruning
# ---------------------------------------------------------------------------


def greedy_semantic_keep(ids, mat, threshold: float):
    """Greedy within-cluster semantic dedup kernel (SemDeDup, Abbas et
    al. 2023): visit vectors in ascending id order; a vector is DROPPED
    when its cosine to any already-kept vector reaches ``threshold``
    (``dup_of`` = the smallest such kept id — not the argmax, so float
    ties cannot flip the attribution). Returns (is_kept bool array,
    dup_of float array with NaN for kept rows).

    Shared VERBATIM by the driver oracle (same discipline as
    ``spherical_kmeans``) so keep/drop decisions are bit-identical: both
    sides normalize in float64 and compare the same BLAS matvec output.
    Cost is O(n_c * kept) matvecs per cluster — the point of SemDeDup is
    that clustering bounds n_c, never the corpus size.
    """
    x = mat.astype(np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms
    order = np.argsort(np.asarray(ids), kind="stable")
    kept_rows: list[int] = []
    is_kept = np.zeros(len(ids), dtype=bool)
    dup_of = np.full(len(ids), np.nan)
    for i in order:
        if kept_rows:
            sims = x[kept_rows] @ x[i]
            hits = np.nonzero(sims >= threshold)[0]
            if len(hits):
                dup_of[i] = ids[kept_rows[int(hits[0])]]
                continue
        is_kept[i] = True
        kept_rows.append(int(i))
    return is_kept, dup_of


def semantic_dedup(
    embeddings: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    kmeans_iters: int = 10,
    n_probe: int = 1,
) -> DataFrame:
    """SemDeDup: semantic near-duplicate pruning over an embedding column.
    Coarse-cluster the corpus with the SAME deterministic spherical
    k-means quantizer IVF uses, then greedily keep one representative per
    semantic duplicate group WITHIN each cluster (cosine >= threshold =>
    duplicate). With ``n_probe=1`` (the published SemDeDup recipe,
    Abbas et al. 2023) cross-cluster duplicates are missed by
    construction — the stated recall trade for never comparing across
    clusters.

    ``n_probe >= 2`` closes that blind spot multi-probe-style: every
    vector joins its ``n_probe`` nearest clusters, the same greedy
    kernel runs independently in each probed cluster, and the global
    verdict unions the drops — a vector is dropped iff ANY probed
    cluster dropped it, ``dup_of`` = the smallest attributed id across
    clusters. Both reductions (bool_and / min) are order-independent, so
    the result is deterministic regardless of cluster task order.
    Representative guarantee: the smallest id of every duplicate group
    survives — the greedy kernel visits ascending ids, so the only
    vectors that can drop it hold smaller ids at cosine >= threshold,
    i.e. members of its own group. Cost scales linearly in ``n_probe``
    (assignment rows, shuffle volume, per-cluster work).

    Returns one row per vector: ``(vec_id, cluster, is_kept, dup_of)``
    with ``cluster`` = the primary (nearest) cluster in both arms.

    Scale shape: assignment is one map-side matmul pass (centroids travel
    in the task closure); the only corpus shuffles key on ``cluster``
    (plus, for n_probe>1, one hash-agg keyed on vec_id for the verdict
    union), and the quadratic-ish greedy pass is confined to one cluster
    per task (``applyInPandas``) — with n_clusters sized so clusters fit
    a task (the published recipe: ~sqrt(n) clusters), no task ever sees
    the corpus. The quantizer trains on a bounded driver-side sample
    exactly like ``ivf_topk``.
    """
    sample_rows = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(sample_size).collect()
    )
    sample = np.array([list(r[1]) for r in sample_rows], dtype=np.float64)
    n_clusters = min(n_clusters, len(sample))
    n_probe = min(n_probe, n_clusters)
    centroids = spherical_kmeans(sample, n_clusters, kmeans_iters)
    assign = _assign_udf(centroids, n_probe)

    schema = "vec_id long, cluster int, is_kept boolean, dup_of double"

    def dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
        is_kept, dup_of = greedy_semantic_keep(ids, mat, threshold)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": pdf["cluster"].to_numpy(),
                "is_kept": is_kept,
                "dup_of": dup_of,
            }
        )

    if n_probe == 1:
        assigned = embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("__v"),
            F.element_at(assign(F.col(vec_col)), 1).alias("cluster"),
        )
        return assigned.groupBy("cluster").applyInPandas(dedup_cluster, schema)

    # multi-probe arm: explode each vector into its n_probe nearest
    # clusters (probe rank rides along only to recover the primary
    # cluster), dedup per probed cluster, then union verdicts per vector
    assigned = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__v"),
        F.posexplode(assign(F.col(vec_col))).alias("__probe", "cluster"),
    )
    per_cluster = (
        assigned.select("vec_id", "__v", "cluster")
        .groupBy("cluster")
        .applyInPandas(dedup_cluster, schema)
    )
    primary = assigned.filter(F.col("__probe") == 0).select(
        "vec_id", F.col("cluster").alias("__primary")
    )
    verdict = (
        per_cluster
        # NaN marks kept rows inside the kernel; NULL it so min() skips it
        .withColumn(
            "dup_of",
            F.when(F.isnan("dup_of"), F.lit(None).cast("double")).otherwise(
                F.col("dup_of")
            ),
        )
        .groupBy("vec_id")
        .agg(
            F.bool_and("is_kept").alias("is_kept"),
            F.min("dup_of").alias("dup_of"),
        )
    )
    # kept rows keep NULL dup_of — the same convention the n_probe=1 arm
    # inherits from pandas NaN -> Spark NULL in applyInPandas
    return verdict.join(primary, "vec_id").select(
        "vec_id", F.col("__primary").alias("cluster"), "is_kept", "dup_of"
    )


# ---------------------------------------------------------------------------
# diversity sampling (greedy k-center coreset selection)
# ---------------------------------------------------------------------------


def greedy_kcenter(ids, mat, k: int):
    """Greedy k-center (farthest-first traversal, Gonzalez 1985) within
    one cluster: start from the smallest id, then repeatedly select the
    vector with the LARGEST cosine distance to the selected set
    (``np.argmax`` over the id-sorted rows, so float ties break to the
    smallest id). The classic 2-approximation to the k-center coreset —
    the selection-side complement of :func:`greedy_semantic_keep`
    (SemDeDup prunes redundancy; this picks a maximally-diverse subset,
    DeepCore/"coreset selection" style).

    Returns, in the ORIGINAL row order of ``ids``:
    ``sel_rank`` int64 (0-based pick order, -1 = not selected) and
    ``coverage`` float64 (final cosine distance to the nearest selected
    vector; exactly 0.0 for selected rows).

    Shared VERBATIM by the driver oracle (the ``spherical_kmeans`` /
    ``greedy_semantic_keep`` discipline): both sides normalize in
    float64 and run the same BLAS matvecs in the same order, so ranks
    AND coverage are bit-identical. Cost O(n_c * k) matvecs per cluster.
    """
    n = len(ids)
    k = min(int(k), n)
    x = mat.astype(np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms
    order = np.argsort(np.asarray(ids), kind="stable")
    xs = x[order]
    rank_sorted = np.full(n, -1, dtype=np.int64)
    cov_sorted = np.full(n, np.inf)
    mind = np.full(n, np.inf)  # min dist to selected, -inf once selected
    cur = 0
    for r in range(k):
        rank_sorted[cur] = r
        d = 1.0 - xs @ xs[cur]
        cov_sorted = np.minimum(cov_sorted, d)
        mind = np.minimum(mind, d)
        mind[cur] = -np.inf
        if r + 1 < k:
            cur = int(np.argmax(mind))
    cov_sorted[rank_sorted >= 0] = 0.0
    out_rank = np.empty(n, dtype=np.int64)
    out_cov = np.empty(n, dtype=np.float64)
    out_rank[order] = rank_sorted
    out_cov[order] = cov_sorted
    return out_rank, out_cov


def diverse_sample(
    embeddings: DataFrame,
    rate: float = 0.1,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    kmeans_iters: int = 10,
) -> DataFrame:
    """Diversity sampling: select ~``rate`` of the corpus maximizing
    embedding-space coverage. Coarse-cluster with the SAME deterministic
    spherical-k-means quantizer IVF/SemDeDup share, then run greedy
    k-center independently per cluster with a proportional budget
    ``ceil(rate * n_c)`` — the budget needs only the cluster's own row
    count, so no extra aggregation pass exists anywhere in the plan.

    Returns one row per vector:
    ``(vec_id, cluster, selected, sel_rank, coverage)`` — ``coverage``
    is the final cosine distance to the nearest selected vector in the
    same cluster (the k-center objective value; its per-cluster max is
    the coverage radius).

    Scale shape (identical to :func:`semantic_dedup` n_probe=1): one
    map-side assignment matmul (centroids in the task closure), ONE
    shuffle keyed on ``cluster``, and an O(n_c * k) kernel confined to
    one cluster per task — size ``n_clusters`` ~ sqrt(n) and no task
    ever sees the corpus. The reference has no selection surface; this
    extends the training-data toolkit (dedup prunes, this PICKS).
    """
    sample_rows = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(sample_size).collect()
    )
    sample = np.array([list(r[1]) for r in sample_rows], dtype=np.float64)
    n_clusters = min(n_clusters, len(sample))
    centroids = spherical_kmeans(sample, n_clusters, kmeans_iters)
    assign = _assign_udf(centroids, 1)

    schema = (
        "vec_id long, cluster int, selected boolean, "
        "sel_rank long, coverage double"
    )

    def pick_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
        k = int(np.ceil(rate * len(ids)))
        sel_rank, coverage = greedy_kcenter(ids, mat, k)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": pdf["cluster"].to_numpy(),
                "selected": sel_rank >= 0,
                "sel_rank": sel_rank,
                "coverage": coverage,
            }
        )

    assigned = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__v"),
        F.element_at(assign(F.col(vec_col)), 1).alias("cluster"),
    )
    return assigned.groupBy("cluster").applyInPandas(pick_cluster, schema)


def embedding_qa(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    expected_dim: int | None = None,
    units: int = 1 << 30,
) -> DataFrame:
    """Embedding-column health check — the QA gate BEFORE any ANN /
    semantic-dedup stage in this module: a batch of NaN, zero, or
    wrong-dimension vectors silently poisons every cosine (NaN
    propagates through dot products; zero vectors make cosine
    undefined; a dim mismatch crashes — or worse, truncates — the
    centroid kernels). One row per input row:

    - ``dim`` — vector length (``-1`` for a NULL vector)
    - ``n_nan`` / ``n_inf`` / ``n_null`` / ``n_zero`` — NaN, infinite,
      NULL-element and exact-0.0 components. Non-finite and NULL
      elements contribute 0 to the norm on BOTH engines (guarded
      term — Spark saturates a NaN/Inf bigint cast where DuckDB
      raises, so the guard is the only portable spelling) and fail
      ``qa_ok``
    - ``norm2_units`` — integer squared norm: per element
      ``floor(x^2 * units)`` (x widened float->double — exact — so the
      elementwise value is bit-identical cross-engine), summed as
      BIGINT (order-free). ``-1`` for NULL vectors. Bound: |x| must
      stay under ~2^16 at the default units or the per-element floor
      wraps (unit-norm embedding spaces are O(1) — documented).
    - ``qa_ok`` — dim matches ``expected_dim`` (when given, else any
      positive dim), no NaN, and norm2 > 0

    Map-only JVM higher-order functions (transform/filter/aggregate —
    no Python, no shuffle, scales trivially); GENUINE SQL oracle
    (DuckDB list_transform/list_sum + isnan on the same
    double-widened arithmetic).

    Reference: feast validates tabular dtypes only
    (``type_map.py``/``schema inference``); array-typed feature QA is
    this repo's extension, sized for the embeddings the similarity
    family consumes.
    """
    v = F.col(vec_col)
    dim = F.when(v.isNull(), F.lit(-1)).otherwise(F.size(v)).cast("long")
    n_nan = F.when(v.isNull(), F.lit(0)).otherwise(
        F.size(F.filter(v, lambda x: F.isnan(x)))
    ).cast("long")
    inf = F.lit(float("inf")).cast("double")
    n_inf = F.when(v.isNull(), F.lit(0)).otherwise(
        F.size(F.filter(v, lambda x: F.abs(x.cast("double")) == inf))
    ).cast("long")
    n_null = F.when(v.isNull(), F.lit(0)).otherwise(
        F.size(F.filter(v, lambda x: x.isNull()))
    ).cast("long")
    n_zero = F.when(v.isNull(), F.lit(0)).otherwise(
        F.size(F.filter(v, lambda x: x == 0.0))
    ).cast("long")
    norm2 = F.when(v.isNull(), F.lit(-1)).otherwise(
        F.aggregate(
            v,
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + F.when(
                x.isNull() | F.isnan(x) | (F.abs(x.cast("double")) == inf),
                F.lit(0).cast("long"),
            ).otherwise(
                F.floor(
                    x.cast("double") * x.cast("double") * F.lit(float(units))
                ).cast("long")
            ),
        )
    ).alias("norm2_units")
    out = emb.select(
        F.col(id_col),
        dim.alias("dim"),
        n_nan.alias("n_nan"),
        n_inf.alias("n_inf"),
        n_null.alias("n_null"),
        n_zero.alias("n_zero"),
        norm2,
    )
    dim_ok = (
        (F.col("dim") == int(expected_dim))
        if expected_dim is not None
        else (F.col("dim") > 0)
    )
    return out.withColumn(
        "qa_ok",
        dim_ok
        & (F.col("n_nan") == 0)
        & (F.col("n_inf") == 0)
        & (F.col("n_null") == 0)
        & (F.col("norm2_units") > 0),
    )
