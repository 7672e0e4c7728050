"""Structured Streaming operators — feast's stream ingestion re-expressed.

Reference: ``infra/contrib/spark_kafka_processor.py`` —
- ingest (:84-131): readStream from Kafka + JSON/Avro decode. In this
  sandbox there is no Kafka broker; :func:`stream_source` builds the same
  query shape from a file stream (the transformation/sink chain is
  identical, only the source format differs — swap ``format("kafka")`` +
  ``from_json(value)`` in production).
- per-batch latest-row dedup + ``created`` stamping (:136-153): the
  reference sorts a pandas batch and keeps group-head; here it is the
  same window dedup as the batch path (dropDuplicates-by-window inside
  foreachBatch), executed distributed instead of on the driver.
- fan-out with checkpointing (:159-175): writeStream.foreachBatch +
  checkpointLocation + processingTime trigger.

Late data: the reference relies on per-batch overwrite (late rows lose to
newer created_ts at dedup); we additionally support a real watermark for
windowed aggregations (SURVEY §2.10 gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feast_spark.operators.latest import latest_per_key


def stream_source(
    spark: SparkSession, path: str, schema: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-based stream with the Kafka-ingest query shape
    (spark_kafka_processor.py:84-131 minus the broker)."""
    return (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def streaming_materialize(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    out_path: str,
    checkpoint: str,
    transform=None,
):
    """writeStream.foreachBatch: per-batch latest-per-key dedup + created
    stamping + append to the offline table (processor :136-175).

    Returns the StreamingQuery; callers drive it with
    ``processAllAvailable()`` in tests or ``awaitTermination()`` in prod.
    """

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        out = batch_df
        if transform is not None:
            out = transform(out)
        out = latest_per_key(out, keys, ts_col)
        out = out.withColumn("created_ts", F.current_timestamp())
        out.write.mode("append").parquet(out_path)

    return (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle_batch)
        .start()
    )


def stream_window_agg(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    window: str,
    slide: str | None = None,
    watermark: str = "10 minutes",
    agg_exprs: list | None = None,
) -> DataFrame:
    """Tumbling/sliding windowed aggregation with watermarked late-data
    handling — the native replacement for the reference's sawtooth tiling
    (spark/nodes.py:248-362), per SURVEY §2.4."""
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    exprs = agg_exprs or [F.count(F.lit(1)).alias("n")]
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, win.alias("w"))
        .agg(*exprs)
    )
    return out.withColumn("window_start", F.col("w.start")).withColumn(
        "window_end", F.col("w.end")
    ).drop("w")


def streaming_stateful_dedup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "1 hour",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Cross-batch exact dedup via ``applyInPandasWithState`` — the custom
    stateful operator shape (SURVEY §2.10; not expressible with
    dropDuplicates' bounded state semantics when you need an explicit
    per-key TTL and first-seen emission).

    Emits only the FIRST row seen for each key across all micro-batches;
    later occurrences are suppressed while the key's state lives. State
    carries (first_ts) per key. With ``state_ttl_ms`` set, state expires
    after that much processing time (bounds state size at 100 TB key
    cardinality) — note the timeout makes the query trigger continuously
    for cleanup, so tests driving it with ``processAllAvailable()`` should
    leave it None. The reference's dedup is per-batch driver pandas
    (spark_kafka_processor.py:136-153); this dedups ACROSS batches, which
    it cannot do.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import StructType

    out_schema = stream.schema
    state_schema = StructType.fromDDL("first_ts timestamp")
    ttl = state_ttl_ms

    def dedup_fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=out_schema.names)
            return
        # track the running min-ts row across ALL Arrow chunks of the
        # group: a key with more rows than arrow.maxRecordsPerBatch spans
        # several chunks, and the first chunk's min need not be the
        # batch's min (round-2 ADVICE, low)
        first = None
        for pdf in pdf_iter:
            if state.exists or len(pdf) == 0:
                continue
            cand = pdf.sort_values(ts_col, kind="mergesort").iloc[:1]
            if first is None or cand[ts_col].iloc[0] < first[ts_col].iloc[0]:
                first = cand
        if not state.exists and first is not None:
            state.update((first[ts_col].iloc[0].to_pydatetime(),))
            if ttl:
                state.setTimeoutDuration(ttl)
            yield first
        else:
            if state.exists and ttl:
                state.setTimeoutDuration(ttl)
            yield pd.DataFrame(columns=out_schema.names)

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .applyInPandasWithState(
            dedup_fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if ttl
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def streaming_quality_scores(stream: DataFrame, cfg=None) -> DataFrame:
    """The quality pipeline's scoring stage applied to a STREAM: the same
    Arrow-vectorized rules kernel (``score_transcripts``) runs unchanged
    inside the streaming query — scoring is stateless per-row, so the
    streamed output is row-for-row identical to the batch pipeline on the
    same data (pinned by test). This is the stream-ingest arm of the
    north-rule pipeline: readStream -> score/scrub -> keyed sink, with
    the per-batch latest-dedup (:func:`streaming_materialize`) or the
    store upsert downstream.
    """
    from feast_spark.pipeline.quality import QualityConfig, score_transcripts

    return score_transcripts(stream, cfg or QualityConfig())


def stream_quality_to_labels(
    stream: DataFrame, out_path: str, checkpoint: str, cfg=None
):
    """Score a transcript stream and append per-turn label rows to a
    parquet sink with exactly-once file-sink semantics (checkpointed
    offsets + transactional file commits). Returns the StreamingQuery."""
    scored = streaming_quality_scores(stream, cfg)
    labels = scored.select(
        "conv_id", "turn_idx", "ts", "lang",
        F.col("keep_turn").alias("keep"),
        F.col("drop_reason_turn").alias("drop_reason"),
        "scrubbed_text",
    )
    return (
        labels.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
