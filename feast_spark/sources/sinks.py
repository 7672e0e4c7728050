"""Sinks — the reference's write paths re-expressed.

- :func:`offline_append` <- offline_write_batch (spark.py:357-407;
  dask.py:572-610): schema-checked, column-order-normalized append.
- :func:`saved_dataset_persist` <- SavedDatasetStorage persist
  (spark.py:1098-1132; dask.py:105-133): overwrite-guarded.
- :func:`feature_logging_sink` <- feature_logging.py:23-98 +
  dask.py:535-570: served-features log with __request_id/__log_timestamp,
  partitioned by __log_date.
- :func:`remote_storage_export` <- to_remote_storage (spark.py:1153-1201):
  parquet export to a staging dir, returns file list.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def offline_append(df: DataFrame, path: str, expected_schema=None) -> None:
    """Append with schema check + cast (spark.py:377-400: reorders columns
    to table order and casts, raising on missing columns)."""
    if expected_schema is not None:
        table_cols = [f.name for f in expected_schema.fields]
        missing = set(table_cols) - set(df.columns)
        if missing:
            raise ValueError(f"missing columns for append: {sorted(missing)}")
        df = df.select(
            *[
                F.col(f.name).cast(f.dataType)
                for f in expected_schema.fields
            ]
        )
    df.write.mode("append").parquet(path)


def saved_dataset_persist(df: DataFrame, path: str, allow_overwrite: bool = False) -> None:
    """Persist a retrieval result; refuse to clobber unless asked
    (spark.py:1098-1132 overwrite guard)."""
    if os.path.exists(path) and not allow_overwrite:
        raise FileExistsError(f"saved dataset already exists: {path}")
    df.write.mode("overwrite" if allow_overwrite else "errorifexists").parquet(path)


def feature_logging_sink(
    served: DataFrame, path: str, request_id_col: str | None = None
) -> None:
    """Log served features with __request_id / __log_timestamp /
    __log_date partition column (feature_logging.py:23-98)."""
    out = served
    if request_id_col is None:
        out = out.withColumn("__request_id", F.expr("uuid()"))
    else:
        out = out.withColumn("__request_id", F.col(request_id_col))
    out = out.withColumn("__log_timestamp", F.current_timestamp()).withColumn(
        "__log_date", F.to_date(F.col("__log_timestamp"))
    )
    out.write.mode("append").partitionBy("__log_date").parquet(path)


def remote_storage_export(df: DataFrame, staging_dir: str) -> list[str]:
    """Write result parquet under staging/<uuid> and list the files
    (spark.py:1153-1201)."""
    dest = os.path.join(staging_dir, str(uuid.uuid4()))
    df.write.parquet(dest)
    return sorted(
        os.path.join(dest, f) for f in os.listdir(dest) if f.endswith(".parquet")
    )


def read_partition_pruned(
    spark: SparkSession,
    path: str,
    ts_col: str,
    date_partition_column: str | None,
    start,
    end,
) -> DataFrame:
    """Time-range scan with the partition-pruning predicate on the
    partition column (spark.py:155,1359-1365; offline_utils.py:427-431):
    the coarse date filter prunes directories, the fine ts filter trims
    rows."""
    df = spark.read.parquet(path)
    if date_partition_column:
        df = df.filter(
            (F.col(date_partition_column) >= F.lit(str(start)[:10]))
            & (F.col(date_partition_column) <= F.lit(str(end)[:10]))
        )
    return df.filter(F.col(ts_col).between(F.lit(start), F.lit(end)))


def online_kv_export(
    df: DataFrame,
    join_keys: list[str],
    ts_col: str,
    path: str,
) -> None:
    """Executor-side KV serialization of a serving table — the shape of
    feast's ``online_write_batch`` (provider writes (entity_key bytes,
    feature blob) rows to a KV store) with the store swapped for parquet
    (no KV server in this sandbox; a real deployment replaces the write
    with the client call inside the SAME mapInPandas).

    Keys are the reference v3 binary encoding (``core/keys.py``,
    byte-for-byte ``key_encoding_utils.py:131-190``), so rows are directly
    loadable into any store that reads feast v3 keys. Values are the
    columnar tag/len/payload feature blob of
    :mod:`feast_spark.core.kv_codec` (scalars, timestamps and numeric
    lists/embeddings; NULL -> tag 0). All serialization happens ON
    EXECUTORS over whole Arrow batches via numpy scatter arithmetic —
    zero per-row Python (round-2 finding #1) and the driver never sees a
    row. Unsupported feature dtypes (struct/map/nested lists) fail fast
    on the DRIVER with a clear error before any job launches."""
    import pyarrow as pa

    from feast_spark.core.kv_codec import encode_keys_batch, encode_values_batch

    feature_cols = [c for c in df.columns if c not in set(join_keys) | {ts_col}]

    # fail fast on dtypes the blob cannot carry (ADVICE round 2: the
    # scalar restriction was neither documented nor validated)
    dtypes = dict(df.dtypes)
    _OK_SCALAR = {"string", "binary", "int", "bigint", "float", "double",
                  "boolean", "timestamp"}
    _OK_LIST = {"array<int>", "array<bigint>", "array<float>", "array<double>"}
    for c in feature_cols:
        if dtypes[c] not in _OK_SCALAR and dtypes[c] not in _OK_LIST:
            raise TypeError(
                f"online_kv_export: feature column {c!r} has unsupported "
                f"dtype {dtypes[c]!r} (supported: {sorted(_OK_SCALAR)} and "
                f"{sorted(_OK_LIST)})"
            )
    for k in join_keys:
        if dtypes[k] not in {"string", "binary", "int", "bigint", "timestamp"}:
            raise TypeError(
                f"online_kv_export: entity key column {k!r} has dtype "
                f"{dtypes[k]!r}; v3 keys support string/binary/int/bigint/"
                "timestamp (reference key_encoding_utils.py:12-28)"
            )

    out_schema = pa.schema(
        [
            pa.field("entity_key", pa.binary()),
            pa.field("value", pa.binary()),
            pa.field("event_ts", pa.timestamp("us")),
        ]
    )

    def run(batches):
        for batch in batches:
            keys = encode_keys_batch(batch, join_keys)
            vals = encode_values_batch(batch, feature_cols)
            ts = batch.column(batch.schema.get_field_index(ts_col)).cast(
                pa.timestamp("us")
            )
            yield pa.RecordBatch.from_arrays(
                [keys, vals, ts], schema=out_schema
            )

    out = df.mapInArrow(run, "entity_key binary, value binary, event_ts timestamp")
    out.write.mode("overwrite").parquet(path)
