"""Training-shard export: the last mile of the curation pipeline.

After selection (``pipeline/curation.py``) and packing
(``operators/selection.pack_documents``), a training run consumes the
corpus as a fixed set of reproducible shards. This module writes them
the way a 100 TB job must:

- **Shard assignment is map-only and key-stable** — ``hash(salt ‖ key)
  mod n_shards`` (``md5`` portable arm / ``xxhash64`` scale arm, the
  same two-arm convention as ``dsir_weights`` and ``span_dedup``). The
  same input always lands in the same shard on any cluster, any
  partitioning, any rerun; a new ``salt`` re-deals the corpus
  (per-epoch shard remix without a global sort).
- **One exchange total**: ``repartition(n_shards, shard)`` co-locates
  each shard, ``sortWithinPartitions`` fixes the row order inside every
  file, and ``partitionBy(shard)`` writes ``shard_id=K/`` directories —
  no driver-side routing, no global ``orderBy``.
- **The manifest is computed from the PUBLISHED files** (read-back, not
  from the in-flight DataFrame) — one hash-agg over what a trainer will
  actually read: per-shard row/token counts plus an order-independent
  ``bit_xor`` key fingerprint, so two exports can be compared without
  diffing data.
- **Publish is atomic**: everything stages under ``<out>.staging-<pid>``
  and lands via ``os.rename`` — a crashed export leaves no partial
  ``out_dir`` (same rename-CAS discipline as the serving snapshot
  commit, ``core/store.py``).

Reference analogy: feast materializes feature ranges into an offline
store and records them in the registry (``feature_store.py``
materialize + registry apply); here the "registry row" is the manifest
table and the "store" is the shard directory tree.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_METHODS = ("md5", "xxhash64")


def _hash32(key: Column, salt: str) -> Column:
    """Portable 32-bit integer hash: first 8 hex chars of md5(salt‖key).
    Reproducible in any engine (and in the numpy oracle) without
    engine-specific hex parsing beyond base conversion."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key)), 1, 8), 16, 10
    ).cast("long")


def assign_shards(
    df: DataFrame,
    key: Column,
    n_shards: int,
    salt: str = "",
    method: str = "md5",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Deterministic, key-stable shard assignment (map-only, no shuffle).

    ``method='md5'`` is the oracle-portable arm; ``method='xxhash64'``
    hashes JVM-side with zero string construction — use it at scale when
    nothing external needs to re-derive the assignment.
    """
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if method == "md5":
        shard = _hash32(key, salt) % n_shards
    else:
        shard = F.pmod(F.xxhash64(F.lit(salt), key), F.lit(n_shards))
    return df.withColumn(shard_col, shard.cast("int"))


def shard_manifest(
    df: DataFrame,
    key: Column,
    salt: str = "",
    method: str = "md5",
    token_col: str | None = None,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Per-shard audit row: ``(shard_id, n_docs, n_tokens, fingerprint)``.

    The fingerprint is ``bit_xor`` of the per-key hash — order-independent
    (safe under any read order) and mergeable, so two exports of the same
    corpus compare equal shard-by-shard without reading data.
    """
    h = _hash32(key, salt) if method == "md5" else F.xxhash64(F.lit(salt), key)
    n_tokens = (
        F.sum(F.col(token_col)) if token_col
        else F.sum(F.size(F.split(F.col("text"), " ")))
    )
    return (
        df.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_tokens.cast("long").alias("n_tokens"),
            F.bit_xor(h).alias("fingerprint"),
        )
        .orderBy(shard_col)
    )


@dataclass
class ExportResult:
    path: str
    n_shards: int
    manifest: DataFrame  # read back from the published manifest parquet


def export_training_shards(
    spark: SparkSession,
    df: DataFrame,
    key: Column,
    out_dir: str,
    n_shards: int,
    order_by: list[str] | None = None,
    salt: str = "",
    method: str = "md5",
    token_col: str | None = None,
    overwrite: bool = False,
    max_records_per_file: int | None = None,
) -> ExportResult:
    """Write ``df`` as ``n_shards`` reproducible parquet shards + manifest.

    Layout::

        out_dir/
          shards/shard_id=0/ ... shard_id=<n-1>/   (partitionBy dirs)
          manifest/                                 (parquet)

    Within-shard row order is fixed by ``order_by`` (default: the shard
    hash then the key — i.e. a deterministic per-shard shuffle; pass
    e.g. ``["pack_id", "pack_offset"]`` after ``pack_documents`` to
    keep packed sequences contiguous). ``max_records_per_file`` bounds
    file size for the trainer's reader parallelism.
    """
    staging = f"{out_dir}.staging-{os.getpid()}"
    if os.path.exists(out_dir) and not overwrite:
        raise FileExistsError(f"{out_dir} exists (pass overwrite=True)")
    shutil.rmtree(staging, ignore_errors=True)

    sharded = assign_shards(df, key, n_shards, salt=salt, method=method)
    order_cols: list = (
        [F.col(c) for c in order_by]
        if order_by
        else [
            _hash32(key, salt) if method == "md5"
            else F.xxhash64(F.lit(salt), key),
            key,
        ]
    )
    writer = (
        sharded.repartition(n_shards, "shard_id")
        .sortWithinPartitions(F.col("shard_id"), *order_cols)
        .write.mode("errorifexists")
        .partitionBy("shard_id")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(f"{staging}/shards")

    # manifest from the files a trainer will read, not the in-flight plan
    # (explicit schema: an empty corpus writes zero data files, and an
    # export of nothing should publish an empty manifest, not crash on
    # schema inference)
    written = spark.read.schema(sharded.schema).parquet(f"{staging}/shards")
    manifest_df = shard_manifest(
        written, key, salt=salt, method=method, token_col=token_col
    )
    manifest_df.coalesce(1).write.mode("errorifexists").parquet(
        f"{staging}/manifest"
    )

    if os.path.exists(out_dir):  # overwrite=True: swap after a full stage
        old = f"{out_dir}.old-{os.getpid()}"
        os.rename(out_dir, old)
        os.rename(staging, out_dir)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(staging, out_dir)
    return ExportResult(
        path=out_dir,
        n_shards=n_shards,
        manifest=spark.read.schema(manifest_df.schema).parquet(
            f"{out_dir}/manifest"
        ),
    )
