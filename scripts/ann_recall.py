"""ANN recall study: lsh_topk vs exact cosine_topk at realistic dims.

Round-2 evidence item (VERDICT #10): recall@k on >=50k vectors at dim
256-1024, including the large-dim pandas bucket path (dim x bits > 4096
would previously inline a >100k-char SQL literal).

Data: mixture of gaussian clusters (so true near neighbors exist — on
uniform random vectors every neighbor is ~orthogonal and recall@k is
meaningless). Deterministic seed.

Usage: python scripts/ann_recall.py  # prints one JSON line per config
Results recorded in BASELINE.md §ANN.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("ANN_N", "50000"))
K = 10
N_QUERIES = int(os.environ.get("ANN_QUERIES", "64"))


def make_vectors(n: int, dim: int, clusters: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((clusters, dim)) * 3.0
    assign = rng.integers(0, clusters, n)
    return (centers[assign] + rng.standard_normal((n, dim))).astype(np.float32)


def main() -> None:
    from feast_spark.operators.similarity import cosine_topk, lsh_topk
    from feast_spark.session import get_spark

    spark = get_spark("ann_recall", cpus=int(os.environ.get("ANN_CPUS", "16")))
    # method "ivf": num_bits = n_clusters, num_tables = n_probe
    configs = [
        (256, [(12, "sql", 4), (256, "ivf", 8), (256, "ivf", 16)]),
        (1024, [(12, "pandas", 4), (256, "ivf", 16)]),
    ]
    for dim, variants in configs:
        vecs = make_vectors(N, dim, clusters=256, seed=dim)
        pdf = pd.DataFrame(
            {"vec_id": range(N), "embedding": [v.tolist() for v in vecs]}
        )
        corpus = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
        corpus = corpus.repartition(32).persist()
        corpus.count()
        queries = corpus.filter(f"vec_id < {N_QUERIES}")

        t0 = time.time()
        exact = (
            cosine_topk(corpus, queries, K)
            .toPandas()
            .groupby("query_id")["neighbor_id"]
            .apply(set)
        )
        t_exact = time.time() - t0

        for num_bits, method, num_tables in variants:
            t0 = time.time()
            if method == "ivf":
                from feast_spark.operators.similarity import ivf_topk

                approx = (
                    ivf_topk(
                        corpus, queries, K,
                        n_clusters=num_bits, n_probe=num_tables,
                    )
                    .toPandas()
                    .groupby("query_id")["neighbor_id"]
                    .apply(set)
                )
            else:
                approx = (
                    lsh_topk(
                        corpus, queries, K, dim=dim, num_bits=num_bits,
                        bucket_method=method, multiprobe=True,
                        num_tables=num_tables,
                    )
                    .toPandas()
                    .groupby("query_id")["neighbor_id"]
                    .apply(set)
                )
            t_lsh = time.time() - t0
            recalls = [
                len(exact.get(q, set()) & approx.get(q, set())) / K
                for q in exact.index
            ]
            print(
                json.dumps(
                    {
                        "n_vectors": N,
                        "dim": dim,
                        "num_bits": num_bits,
                        "num_tables": num_tables,
                        "bucket_method": method,
                        "k": K,
                        "n_queries": len(exact),
                        "recall_at_k": round(float(np.mean(recalls)), 4),
                        "exact_wall_sec": round(t_exact, 2),
                        "lsh_wall_sec": round(t_lsh, 2),
                        "speedup": round(t_exact / t_lsh, 2),
                    }
                ),
                flush=True,
            )
        corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
