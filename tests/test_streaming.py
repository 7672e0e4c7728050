"""Streaming ingestion: foreachBatch materialize + watermarked window agg
driven synchronously from file batches (SURVEY §2.10)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_spark.streaming import stream_window_agg, streaming_materialize
from feast_spark.streaming.processor import stream_source

SCHEMA = "user_id long, value double, ts timestamp"


@pytest.fixture(scope="module")
def src_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("stream_src")
    rng = np.random.default_rng(2)
    for batch in range(3):
        pdf = pd.DataFrame(
            {
                "user_id": rng.integers(0, 5, 50),
                "value": rng.random(50) * 100,
                "ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.integers(0, 7200, 50), unit="s"),
            }
        )
        spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.mode("append").parquet(str(d))
    return str(d)


def test_streaming_materialize_latest_per_key(spark, src_dir, tmp_path):
    out = str(tmp_path / "serving")
    ckpt = str(tmp_path / "ckpt")
    stream = stream_source(spark, src_dir, SCHEMA, max_files_per_trigger=1)
    q = streaming_materialize(stream, ["user_id"], "ts", out, ckpt)
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    assert "created_ts" in got.columns
    # per micro-batch dedup: within each batch, one row per user
    per_batch = got.groupBy("created_ts", "user_id").count().toPandas()
    assert (per_batch["count"] == 1).all()
    assert set(got.select("user_id").toPandas().user_id) <= set(range(5))


def test_stream_window_agg_matches_batch(spark, src_dir, tmp_path):
    stream = stream_source(spark, src_dir, SCHEMA)
    agg = stream_window_agg(
        stream, [], "ts", window="30 minutes", watermark="1 hour",
        agg_exprs=[F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("v")],
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("winagg")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT window_start, n, v FROM winagg")
        .toPandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    exp = (
        spark.read.parquet(src_dir)
        .groupBy(F.window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("v"))
        .select(F.col("w.start").alias("window_start"), "n", "v")
        .toPandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_stream_json_decode_end_to_end(spark, tmp_path):
    """Raw JSON strings -> from_json decode -> per-batch latest dedup ->
    offline append, through streaming_materialize (the reference's Kafka
    ingest shape minus the broker, spark_kafka_processor.py:95-153)."""
    import json

    from feast_spark.functions.codecs import decode_json
    from feast_spark.streaming.processor import streaming_materialize

    src = tmp_path / "json_src"
    out = tmp_path / "json_out"
    ckpt = tmp_path / "json_ckpt"
    src.mkdir()
    rows = [
        {"k": 1, "ts": "2024-01-01 00:00:00", "v": 1.0},
        {"k": 1, "ts": "2024-01-01 00:05:00", "v": 2.0},
        {"k": 2, "ts": "2024-01-01 00:01:00", "v": 9.0},
    ]
    (src / "batch0.txt").write_text("\n".join(json.dumps(r) for r in rows))

    raw = spark.readStream.format("text").load(str(src))
    decoded = decode_json(raw, "k long, ts timestamp, v double")
    q = streaming_materialize(
        decoded, ["k"], "ts", str(out), str(ckpt),
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(str(out)).toPandas().sort_values("k")
    assert got.k.tolist() == [1, 2]
    assert got.v.tolist() == [2.0, 9.0]  # latest per key won
    assert "created_ts" in got.columns


def test_avro_decode_roundtrip(spark):
    """Pure-Python Avro binary decode (fallback arm of decode_avro):
    payloads encoded HERE by an independent spec-following encoder."""
    import pandas as pd

    from feast_spark.functions.codecs import decode_avro, from_avro_available

    def zz(n: int) -> bytes:  # zigzag varint encoder (Avro spec)
        u = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    import struct as st

    def enc(k: int, name: str | None, score: float, ok: bool) -> bytes:
        buf = bytearray()
        buf += zz(k)
        if name is None:
            buf += zz(0)  # union index 0 = null
        else:
            nb = name.encode()
            buf += zz(1) + zz(len(nb)) + nb
        buf += st.pack("<d", score)
        buf += b"\x01" if ok else b"\x00"
        return bytes(buf)

    schema = (
        '{"type":"record","name":"r","fields":['
        '{"name":"k","type":"long"},'
        '{"name":"name","type":["null","string"]},'
        '{"name":"score","type":"double"},'
        '{"name":"ok","type":"boolean"}]}'
    )
    payloads = [enc(7, "alpha", 1.5, True), enc(-3, None, -0.25, False)]
    df = spark.createDataFrame(
        pd.DataFrame({"value": payloads}), "value binary"
    )
    got = decode_avro(df, schema).toPandas().sort_values("k").reset_index(drop=True)
    assert got.k.tolist() == [-3, 7]
    assert got.name.tolist()[1] == "alpha" and pd.isna(got.name.iloc[0])
    assert got.score.tolist() == [-0.25, 1.5]
    assert got.ok.tolist() == [False, True]
    # document which arm ran in this image
    assert from_avro_available(spark) in (True, False)


def test_streaming_stateful_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState custom stateful operator: a key seen in
    batch 0 must be suppressed when it reappears in batch 1 (cross-batch
    state the reference's per-batch pandas dedup cannot express)."""
    import json
    import time

    from feast_spark.functions.codecs import decode_json
    from feast_spark.streaming.processor import streaming_stateful_dedup

    src = tmp_path / "st_src"
    out = tmp_path / "st_out"
    ckpt = tmp_path / "st_ckpt"
    src.mkdir()
    (src / "b0.txt").write_text(
        json.dumps({"k": 1, "ts": "2024-01-01 00:00:00", "v": 1.0})
    )
    raw = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(str(src))
    decoded = decode_json(raw, "k long, ts timestamp, v double")
    deduped = streaming_stateful_dedup(decoded, ["k"], "ts")
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.processAllAvailable()
    # batch 1: same key again (+ a new key)
    (src / "b1.txt").write_text(
        "\n".join(
            [
                json.dumps({"k": 1, "ts": "2024-01-01 00:30:00", "v": 99.0}),
                json.dumps({"k": 2, "ts": "2024-01-01 00:31:00", "v": 7.0}),
            ]
        )
    )
    time.sleep(0.2)
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(str(out)).toPandas().sort_values("k")
    assert got.k.tolist() == [1, 2]
    assert got.v.tolist() == [1.0, 7.0]  # k=1 re-occurrence suppressed


def test_stream_feature_view_store_materialize_windowed(spark, tmp_path):
    """Store-level StreamFeatureView (round-2 VERDICT Next #2): apply a
    declarative stream view, drive materialize_stream from its spec, and
    assert the streamed windowed aggregation equals the batch F.window
    aggregation over the same data (cross-micro-batch state exercised by
    maxFilesPerTrigger=1 over 4 files)."""
    from feast_spark.core import Entity, FeatureStore
    from feast_spark.operators import Aggregation, apply_aggregations
    from feast_spark.streaming.views import StreamFeatureView, StreamSource

    rng = np.random.default_rng(5)
    n = 400
    pdf = pd.DataFrame(
        {
            "user_id": rng.integers(0, 8, n),
            "value": rng.random(n).round(3),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 6 * 3600, n), unit="s"),
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    src = tmp_path / "sv_src"
    spark.createDataFrame(pdf).repartition(4).write.parquet(str(src))

    store = FeatureStore(spark, str(tmp_path / "sv_repo"))
    sv = StreamFeatureView(
        name="user_hourly",
        entities=[Entity("user", "user_id")],
        source=StreamSource(
            path=str(src),
            schema="user_id long, value double, ts timestamp",
            timestamp_field="ts",
            max_files_per_trigger=1,
        ),
        aggregations=[
            Aggregation("value", "sum", 3600),
            Aggregation("value", "count", 3600),
        ],
        watermark="3650 days",  # test corpus: nothing may be dropped late
    )
    store.apply([sv])
    assert (
        store.registry.get_view("user_hourly")["object_type"]
        == "stream_feature_view"
    )
    assert store.get_stream_feature_view("user_hourly").feature_names == [
        "sum_value_3600s", "count_value_3600s",
    ]

    q = store.materialize_stream("user_hourly", str(tmp_path / "sv_ckpt"))
    q.processAllAvailable()
    q.stop()

    got = (
        store.read_snapshot("user_hourly")
        .drop("__batch_id")
        .toPandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    exp = (
        apply_aggregations(
            spark.read.parquet(str(src)),
            ["user_id"],
            [Aggregation("value", "sum", 3600), Aggregation("value", "count", 3600)],
            ts_col="ts",
        )
        .toPandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_stream_feature_view_ingest_latest_dedup(spark, tmp_path):
    """No aggregations -> per-batch latest-per-key dedup + snapshot merge
    across micro-batches (the reference processor's ingest path, driven
    from the declarative spec)."""
    from feast_spark.core import Entity, FeatureStore
    from feast_spark.streaming.views import StreamFeatureView, StreamSource

    pdf = pd.DataFrame(
        {
            "k": [1, 1, 2, 2, 3],
            "v": [1.0, 5.0, 2.0, 9.0, 3.0],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 02:00", "2024-01-01 01:00",
                 "2024-01-01 00:30", "2024-01-01 03:00"]
            ).astype("datetime64[us]"),
        }
    )
    src = tmp_path / "ing_src"
    spark.createDataFrame(pdf).repartition(3).write.parquet(str(src))

    store = FeatureStore(spark, str(tmp_path / "ing_repo"))
    sv = StreamFeatureView(
        name="kv_latest",
        entities=[Entity("k")],
        source=StreamSource(
            path=str(src), schema="k long, v double, ts timestamp",
            timestamp_field="ts", max_files_per_trigger=1,
        ),
    )
    store.apply([sv])
    q = store.materialize_stream("kv_latest", str(tmp_path / "ing_ckpt"))
    q.processAllAvailable()
    q.stop()
    got = store.read_snapshot("kv_latest").toPandas().sort_values("k")
    assert got.k.tolist() == [1, 2, 3]
    assert got.v.tolist() == [5.0, 2.0, 3.0]  # latest ts per key wins


def test_streaming_stateful_dedup_min_across_arrow_chunks(spark, tmp_path):
    """A key whose micro-batch rows span several Arrow chunks must emit
    the batch's GLOBAL min-ts row, not the first chunk's (round-2 ADVICE:
    the old code stopped scanning after the first non-empty chunk)."""
    import json

    from feast_spark.functions.codecs import decode_json
    from feast_spark.streaming.processor import streaming_stateful_dedup

    src = tmp_path / "mc_src"
    out = tmp_path / "mc_out"
    ckpt = tmp_path / "mc_ckpt"
    src.mkdir()
    # 6 rows, one key; the min-ts row is LAST so it lands in a later chunk
    rows = [
        {"k": 1, "ts": f"2024-01-01 0{h}:00:00", "v": float(h)}
        for h in (5, 4, 6, 7, 3, 1)
    ]
    (src / "b0.txt").write_text("\n".join(json.dumps(r) for r in rows))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        raw = spark.readStream.format("text").option(
            "maxFilesPerTrigger", 1
        ).load(str(src))
        decoded = decode_json(raw, "k long, ts timestamp, v double")
        deduped = streaming_stateful_dedup(decoded, ["k"], "ts")
        q = (
            deduped.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = spark.read.parquet(str(out)).toPandas()
    assert len(got) == 1
    assert got.v.iloc[0] == 1.0  # global min ts (01:00), from the last chunk


def test_streaming_quality_scores_match_batch_exactly(spark, tmp_path):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.quality import QualityConfig, score_transcripts
    from feast_spark.streaming.processor import (
        stream_quality_to_labels,
        stream_source,
    )

    t = transcripts_spark(spark, 30, seed=5)
    src = str(tmp_path / "turns")
    # two files -> at least two micro-batches with maxFilesPerTrigger=1
    t.coalesce(2).write.parquet(src)

    stream = stream_source(spark, src, t.schema, max_files_per_trigger=1)
    out = str(tmp_path / "labels")
    q = stream_quality_to_labels(stream, out, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    got = (
        spark.read.parquet(out)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    exp = (
        score_transcripts(spark.read.parquet(src), QualityConfig())
        .select("conv_id", "turn_idx", "ts", "lang",
                F.col("keep_turn").alias("keep"),
                F.col("drop_reason_turn").alias("drop_reason"),
                "scrubbed_text")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_avro_vectorized_matches_scalar_reference():
    """The vectorized batch decoder must be bit-equivalent to mapping the
    scalar spec decoder over the rows — randomized payloads covering
    unions with nulls, negative/large varints, multibyte utf-8, empty
    strings, bytes, floats and booleans."""
    import struct as st

    import numpy as np
    import pandas as pd

    from feast_spark.functions.codecs import (
        _decode_batch_vectorized,
        _decode_record,
        _parse_avro_schema,
        _vectorizable,
    )

    def zz(n: int) -> bytes:
        u = (n << 1) ^ (n >> 63)
        u &= (1 << 64) - 1
        out = bytearray()
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    schema = (
        '{"type":"record","name":"r","fields":['
        '{"name":"k","type":"long"},'
        '{"name":"name","type":["null","string"]},'
        '{"name":"score","type":["null","double"]},'
        '{"name":"f","type":"float"},'
        '{"name":"ok","type":"boolean"},'
        '{"name":"raw","type":"bytes"}]}'
    )
    fields, _ = _parse_avro_schema(schema)
    assert _vectorizable(fields)

    rng = np.random.default_rng(11)
    names = [None, "", "héllo wörld", "x" * 300, "短い文字列"]
    payloads = []
    for i in range(500):
        buf = bytearray()
        k = int(rng.integers(-(2**62), 2**62))
        buf += zz(k)
        nm = names[i % len(names)]
        buf += zz(0) if nm is None else zz(1) + zz(len(nm.encode())) + nm.encode()
        if i % 3 == 0:
            buf += zz(0)
        else:
            buf += zz(1) + st.pack("<d", float(rng.normal()))
        buf += st.pack("<f", float(rng.normal()))
        buf += b"\x01" if i % 2 else b"\x00"
        rb = bytes(rng.integers(0, 256, i % 7, dtype=np.uint8))
        buf += zz(len(rb)) + rb
        payloads.append(bytes(buf))

    got = _decode_batch_vectorized(pd.Series(payloads), fields)
    exp = pd.DataFrame([_decode_record(b, fields) for b in payloads])
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        for i, (a, b) in enumerate(zip(got[c].tolist(), exp[c].tolist())):
            if a is None or (isinstance(a, float) and pd.isna(a)):
                assert b is None or (isinstance(b, float) and pd.isna(b)), (c, i)
            elif isinstance(a, float):
                assert a == b or (np.isnan(a) and np.isnan(b)), (c, i, a, b)
            else:
                assert a == b, (c, i, a, b)


def test_avro_non_vectorizable_schema_falls_back():
    from feast_spark.functions.codecs import _parse_avro_schema, _vectorizable

    # a 3-branch union is outside the vectorized subset
    schema = (
        '{"type":"record","name":"r","fields":['
        '{"name":"u","type":["null","long","string"]}]}'
    )
    fields, _ = _parse_avro_schema(schema)
    assert not _vectorizable(fields)
