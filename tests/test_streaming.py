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
