"""SparkSession factory with scale-oriented defaults.

Mirrors the session the reference builds for its Spark compute engine
(``sdk/python/feast/infra/compute_engines/spark/utils.py:118-126`` enables
Arrow; the offline store reads ``spark_conf`` from config,
``spark_offline_store/spark.py:1537-1555``), with the knobs a 100 TB run
needs set explicitly:

- UTC session timezone — the reference's recurring tz-normalization
  invariant (``dask.py:1123-1164``, ``spark.py:1577-1582``).
- AQE + skew-join handling on: mega-conversation skew is re-planned at
  runtime instead of hand-scheduled.
- Arrow execution for all pandas UDF exchange.
- shuffle partitions sized to cores locally; on a real cluster this is
  overridden via spark-submit conf (AQE coalesces the tail).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "feast_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession with engine defaults.

    ``cpus`` controls local parallelism (``local[cpus]``); on a cluster the
    master/deploy-mode comes from spark-submit and these builder calls are
    inert. Shuffle partitions default to ``2 × cores`` locally — enough to
    keep all threads busy through AQE coalescing without tiny-partition
    overhead. ``master`` overrides the master URL (e.g.
    ``local-cluster[4,4,3072]`` for a multi-JVM executor harness — real
    cross-process shuffle and Python-worker shipping; ``cpus`` then means
    total cores across executors and sizes shuffle partitions only).
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle = shuffle_partitions or max(cpus * 2, 8)
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # keep stdout clean for harnesses that parse the last line as JSON
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
