"""spark-submit entry point for the quality pipeline — the deployment
shape the north rule prescribes (``spark-submit --py-files`` on a
multi-executor cluster).

Build the dependency zip and submit:

    cd /root/repo && python3 scripts/submit_pipeline.py --build-zip
    /opt/spark/bin/spark-submit \
        --master 'local[8]' \
        --py-files /tmp/feast_spark.zip \
        scripts/submit_pipeline.py --convs 500

On a real cluster only ``--master`` changes (yarn / k8s / spark://...);
the zip travels to every executor, so worker Python resolves
``feast_spark`` without any shared filesystem. The job prints one JSON
line with row counts and throughput, and exercises the full pipeline
(dedup -> score -> conv features -> materialize -> PIT -> labels ->
per-partition lineage) exactly as `bench.py` does in-process.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zipfile

ZIP_PATH = "/tmp/feast_spark.zip"


def build_zip(repo_root: str) -> str:
    """Package feast_spark/ into a --py-files zip (pure-Python package —
    no build step, just the source tree at the archive root)."""
    with zipfile.ZipFile(ZIP_PATH, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(repo_root, "feast_spark")
        for dirpath, _dirnames, filenames in os.walk(pkg):
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, repo_root))
    return ZIP_PATH


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build-zip", action="store_true")
    ap.add_argument("--convs", type=int, default=500)
    args = ap.parse_args()

    if args.build_zip:
        path = build_zip(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        print(path)
        return

    # under spark-submit the zip on --py-files is already on sys.path of
    # the driver AND every executor; nothing repo-relative is imported
    from datetime import datetime, timezone

    from pyspark.sql import SparkSession

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.quality import QualityConfig, run_quality_pipeline

    spark = SparkSession.builder.appName("feast_spark_submit").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    t0 = time.time()
    transcripts = transcripts_spark(
        spark, args.convs, seed=42, mega_every=80, mega_turns=400
    )
    res = run_quality_pipeline(
        spark,
        transcripts,
        QualityConfig(),
        run_id="submit",
        decision_ts=datetime(2026, 1, 1, tzinfo=timezone.utc),
    )
    n_labels = res.labels.count()
    n_lineage = res.lineage.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "labels": n_labels,
                "lineage_partitions": n_lineage,
                "wall_sec": round(wall, 2),
                "turns_per_sec": round(n_labels / wall, 1),
                "master": spark.sparkContext.master,
                "py_files": [p for p in sys.path if p.endswith(".zip")],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
