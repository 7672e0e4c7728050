"""spark-submit entrypoint — the reference's standalone driver shape.

Mirrors ``infra/compute_engines/spark_application/main.py:1-195`` (config
from files/args, per-view materialization, launched by an operator via
``spark-submit --py-files``):

    zip -r feast_spark.zip feast_spark
    spark-submit --py-files feast_spark.zip -m feast_spark.cli \\
        --input  s3://bucket/transcripts/            \\
        --output s3://bucket/quality_out/            \\
        --run-id 2026-08-16 --decision-ts 2026-08-16T00:00:00

Stages are idempotent: each writes under ``<output>/<stage>/run_id=<id>``
and is skipped when its _SUCCESS marker exists (the parquet stand-in for
Iceberg snapshot isolation + feast's ``materialization_intervals`` resume,
``feature_store.py:2546``). Rule-hit counters land in the lineage table
(FIXTURES §3).
"""

from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime, timezone


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _load_repo_objects(repo_file: str) -> list:
    """Load a repo-definition python file and return its registrable
    objects: the explicit ``OBJECTS`` list when present, else every
    module-level registrable instance (the reference's repo parsing
    collects module members the same way — repo_operations.py)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("feast_repo_defs", repo_file)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if hasattr(mod, "OBJECTS"):
        return list(mod.OBJECTS)
    from feast_spark.core.diff import object_spec

    objs, seen = [], set()
    for val in vars(mod).values():
        try:
            key = object_spec(val)[:2]
        except TypeError:
            continue
        if key not in seen:
            seen.add(key)
            objs.append(val)
    return objs


def plan_main(argv: list[str], do_apply: bool) -> int:
    """``feast_spark.cli plan|apply --repo defs.py --store path`` — the
    reference's ``feast plan`` / ``feast apply`` surface: diff the
    desired repo state against the registry; apply optionally."""
    p = argparse.ArgumentParser(
        description="registry plan/apply (dry-run object diff)"
    )
    p.add_argument("--repo", required=True, help="python file defining OBJECTS")
    p.add_argument("--store", required=True, help="feature-store repo path")
    p.add_argument("--cpus", type=int, default=2)
    args = p.parse_args(argv)

    from feast_spark.core.store import FeatureStore
    from feast_spark.session import get_spark

    spark = get_spark("feast_spark_plan", cpus=args.cpus)
    store = FeatureStore(spark, args.store)
    diff = store.plan(_load_repo_objects(args.repo))
    print(diff.to_string())
    if do_apply:
        store.apply_diff(diff)
        print(f"applied {len(diff.changes)} change(s)")
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] in ("plan", "apply"):
        return plan_main(argv[1:], do_apply=argv[0] == "apply")
    p = argparse.ArgumentParser(
        description="transcript quality-filter pipeline"
    )
    p.add_argument("--input", required=True, help="transcript parquet path")
    p.add_argument("--output", required=True, help="output root directory")
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--decision-ts", default=None, help="ISO timestamp; default now")
    p.add_argument("--ttl-seconds", type=int, default=None)
    p.add_argument("--max-perplexity", type=float, default=None)
    p.add_argument("--cpus", type=int, default=None, help="local mode only")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    if args.cpus:
        from feast_spark.session import get_spark

        spark = get_spark("feast_spark_cli", cpus=args.cpus)
    else:
        # under spark-submit the master/conf come from the submit command
        spark = SparkSession.builder.appName("feast_spark_cli").getOrCreate()
        spark.conf.set("spark.sql.session.timeZone", "UTC")

    from feast_spark import rules
    from feast_spark.pipeline.quality import QualityConfig, run_quality_pipeline

    rule_kwargs = {}
    if args.max_perplexity is not None:
        rule_kwargs["max_perplexity"] = args.max_perplexity
    cfg = QualityConfig(
        rules=rules.RuleConfig(**rule_kwargs),
        feature_ttl_seconds=args.ttl_seconds,
    )
    decision_ts = (
        datetime.fromisoformat(args.decision_ts)
        if args.decision_ts
        else datetime.now(timezone.utc)
    )

    out = args.output.rstrip("/")
    labels_dir = f"{out}/turn_labels/run_id={args.run_id}"
    conv_dir = f"{out}/conv_features/run_id={args.run_id}"
    lineage_dir = f"{out}/lineage/run_id={args.run_id}"

    if _done(labels_dir) and _done(lineage_dir):
        print(f"run {args.run_id} already complete — nothing to do (resume)")
        return 0

    transcripts = spark.read.parquet(args.input)
    res = run_quality_pipeline(
        spark, transcripts, cfg, run_id=args.run_id, decision_ts=decision_ts,
    )

    if not _done(conv_dir):
        res.conv_features.write.mode("overwrite").parquet(conv_dir)
    if not _done(labels_dir):
        res.labels.write.mode("overwrite").parquet(labels_dir)
    res.lineage.write.mode("overwrite").parquet(lineage_dir)

    summary = (
        spark.read.parquet(labels_dir)
        .groupBy("keep")
        .count()
        .toPandas()
        .to_dict("records")
    )
    print(f"run {args.run_id} complete: {summary}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
