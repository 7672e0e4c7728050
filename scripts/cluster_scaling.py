"""Multi-executor (multi-JVM) scaling evidence for the quality pipeline.

The north rule's two-cluster-size criterion asks for >=0.8 throughput
scaling from N to 4N *executors*. ``bench.py`` evidences this with
``local[2]`` vs ``local[8]`` (thread-parallelism inside one JVM); this
script runs the SAME job under Spark's ``local-cluster[N,cores,mem]``
master, which launches N **separate executor JVMs** — real cross-process
shuffle, real serialization boundaries, and Python workers that resolve
``feast_spark`` from a shipped ``--py-files``-style zip rather than the
driver's filesystem path (``sc.addPyFile``), exactly as a spark-submit
deployment would (``scripts/submit_pipeline.py``).

Configs: 1 executor x CORES_PER_EXEC vs 4 executors x CORES_PER_EXEC —
literally "N to 4N executors" at fixed per-executor size. Sampling
discipline matches bench.py (this host is shared): each config runs in
THREE fresh interleaved subprocesses, each warms once then reports the
min of three steady-state runs; the coordinator takes the min per config
so an external burst landing in any one window is discarded.

Run:  cd /root/repo && python3 scripts/cluster_scaling.py
Emits one compact JSON line: throughput at both sizes + efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORES_PER_EXEC = int(os.environ.get("SPARK_GRAFT_LC_CORES", "2"))
# 2 GB/core: at 1 GB/core the 8-executor config GC-throttles to ~140k
# turns/s on the 7M-turn corpus; at 2 GB/core it runs ~209k (+49%) and
# N->4N efficiency goes 0.68 -> ~1.0 — size executor memory to the
# shuffle working set before reading any scaling number
EXEC_MEM_MB = int(os.environ.get("SPARK_GRAFT_LC_MEM", "4096"))
# 2 -> 8 executors: BOTH configs are multi-JVM, so both pay cross-process
# shuffle serialization — this isolates executor-count scaling from the
# single-JVM -> cluster transition cost (a 1-executor baseline does no
# network shuffle at all and so overstates the small config)
SMALL_EXECS = int(os.environ.get("SPARK_GRAFT_LC_SMALL", "2"))
BIG_EXECS = SMALL_EXECS * 4
N_SAMPLES = int(os.environ.get("SPARK_GRAFT_LC_SAMPLES", "3"))


def _lc_session(n_execs: int):
    """local-cluster session; the package travels to executors as a zip
    (sc.addPyFile), NOT via the driver's PYTHONPATH — the same transport
    spark-submit --py-files uses on a real cluster."""
    from feast_spark.session import get_spark

    total_cores = n_execs * CORES_PER_EXEC
    extra = {"spark.driver.memory": "8g"}
    extra.update(json.loads(os.environ.get("SPARK_GRAFT_LC_EXTRA", "{}")))
    spark = get_spark(
        f"lc_{n_execs}x{CORES_PER_EXEC}",
        cpus=total_cores,
        master=f"local-cluster[{n_execs},{CORES_PER_EXEC},{EXEC_MEM_MB}]",
        extra_conf=extra,
    )
    from scripts.submit_pipeline import build_zip

    spark.sparkContext.addPyFile(build_zip(REPO))
    return spark


def run_one(n_execs: int, corpus: str) -> None:
    """Subprocess entry: warm once, min over three steady-state runs."""
    import bench  # repo-root bench helpers (corpus + pipeline runner)

    spark = _lc_session(n_execs)
    # SPARK_GRAFT_LC_LM=1: run the TRAINED-LM-gated pipeline (north-star
    # "KenLM-style scorer inside Arrow UDFs") — train the numpy-arm
    # backoff LM on a 30% conv slice once per subprocess (train wall
    # recorded separately; the timed region stays the pipeline, whose
    # scoring pass now carries the broadcast model with zero extra
    # shuffles, so gate cost is visible in the same metric)
    lm_model, train_wall = None, None
    if os.environ.get("SPARK_GRAFT_LC_LM") == "1":
        from pyspark.sql import functions as F

        from feast_spark.operators.lm import train_ngram_lm

        t0 = time.time()
        lm_model = train_ngram_lm(
            spark.read.parquet(corpus).where(
                F.pmod(F.hash("conv_id"), F.lit(10)) < 3
            ),
            text_col="text", method="numpy", order=5, n_buckets=1 << 18,
        )
        train_wall = round(time.time() - t0, 3)
    bench._run_pipeline(spark, corpus, lm_model)  # warm: JIT, codegen
    walls, n_turns = [], 0
    for _ in range(3):
        t0 = time.time()
        _, n_turns = bench._run_pipeline(spark, corpus, lm_model)
        walls.append(time.time() - t0)
    ex = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    print(json.dumps({
        "executors_requested": n_execs,
        "cores_per_executor": CORES_PER_EXEC,
        "jvm_endpoints": ex,  # executors + driver — proves multi-JVM
        "n_turns": n_turns,
        "wall_sec": round(min(walls), 3),
        "walls_sec": [round(w, 3) for w in walls],
        "lm_gate": lm_model is not None,
        "lm_train_wall_sec": train_wall,
    }))
    spark.stop()


def _subprocess(n_execs: int, corpus: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--run", str(n_execs), corpus],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "PYTHONPATH": REPO,
             "PYSPARK_PYTHON": sys.executable},
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"local-cluster run n_execs={n_execs} failed "
            f"(rc={out.returncode}); stderr tail: {out.stderr.strip()[-800:]}"
        )
    return json.loads(lines[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        run_one(int(sys.argv[2]), sys.argv[3])
        return

    # corpus: same deterministic fixture + cache path bench.py uses;
    # sized so each steady-state run is >> job-setup overhead
    import bench

    n_convs = int(os.environ.get("SPARK_GRAFT_LC_CONVS", "60000"))
    spark = bench._session(8)
    corpus = bench._corpus(spark, n_convs, files=128)
    spark.stop()

    runs: list[tuple[str, dict]] = []
    for _ in range(N_SAMPLES):
        runs.append(("big", _subprocess(BIG_EXECS, corpus)))
        runs.append(("small", _subprocess(SMALL_EXECS, corpus)))
    r_big = min((r for k, r in runs if k == "big"), key=lambda r: r["wall_sec"])
    r_small = min((r for k, r in runs if k == "small"),
                  key=lambda r: r["wall_sec"])
    tput_small = r_small["n_turns"] / r_small["wall_sec"]
    tput_big = r_big["n_turns"] / r_big["wall_sec"]
    ratio = BIG_EXECS / SMALL_EXECS
    print(json.dumps({
        "mode": "local-cluster (separate executor JVMs, zip-shipped package)",
        "lm_gate": r_big.get("lm_gate", False),
        "lm_train_wall_small": r_small.get("lm_train_wall_sec"),
        "lm_train_wall_big": r_big.get("lm_train_wall_sec"),
        "corpus_turns": r_big["n_turns"],
        "executors_small": SMALL_EXECS,
        "executors_big": BIG_EXECS,
        "cores_per_executor": CORES_PER_EXEC,
        "jvm_endpoints_big": r_big["jvm_endpoints"],
        "turns_per_sec_small": round(tput_small, 1),
        "turns_per_sec_big": round(tput_big, 1),
        "speedup": round(tput_big / tput_small, 3),
        "efficiency": round(tput_big / (tput_small * ratio), 3),
        "samples_turns_per_sec": [
            (k, round(r["n_turns"] / r["wall_sec"], 1)) for k, r in runs
        ],
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
