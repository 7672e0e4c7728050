"""Tiled sliding-window agg vs the direct F.window plan; sink behaviors."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_spark.operators.tiling import tiled_sliding_agg
from feast_spark.sources.sinks import (
    feature_logging_sink,
    offline_append,
    saved_dataset_persist,
)


def test_tiled_agg_equals_direct_window(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = (
        tiled_sliding_agg(
            ev, ["event_type"], "ts", "value",
            window_seconds=7200, hop_seconds=3600, functions=("sum", "count", "max"),
        )
        .withColumn("sum_value", F.round("sum_value", 4))
        .toPandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    exp = (
        ev.groupBy("event_type", F.window("ts", "7200 seconds", "3600 seconds").alias("w"))
        .agg(
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count("value").alias("count_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "sum_value", "count_value", "max_value",
        )
        .toPandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_tiled_agg_rejects_non_decomposable(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    with pytest.raises(ValueError):
        tiled_sliding_agg(ev, [], "ts", "value", 7200, 3600, functions=("avg",))
    with pytest.raises(ValueError):
        tiled_sliding_agg(ev, [], "ts", "value", 7000, 3600)


def test_offline_append_schema_check(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame({"a": [1], "b": ["x"]}))
    path = str(tmp_path / "t")
    offline_append(df, path, expected_schema=df.schema)
    offline_append(df, path, expected_schema=df.schema)
    assert spark.read.parquet(path).count() == 2
    with pytest.raises(ValueError, match="missing columns"):
        offline_append(df.drop("b"), path, expected_schema=df.schema)


def test_saved_dataset_overwrite_guard(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame({"a": [1]}))
    path = str(tmp_path / "ds")
    saved_dataset_persist(df, path)
    with pytest.raises(Exception):
        saved_dataset_persist(df, path)
    saved_dataset_persist(df, path, allow_overwrite=True)


def test_feature_logging_partitioned(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame({"f": [1.0, 2.0]}))
    path = str(tmp_path / "log")
    feature_logging_sink(df, path)
    out = spark.read.parquet(path)
    assert {"__request_id", "__log_timestamp", "__log_date"} <= set(out.columns)
    # physically partitioned by __log_date
    parts = [d for d in os.listdir(path) if d.startswith("__log_date=")]
    assert parts


def test_online_kv_export_v3_keys(spark, tmp_path):
    import json

    import pandas as pd

    from feast_spark.core.keys import deserialize_entity_key
    from feast_spark.sources.sinks import online_kv_export

    pdf = pd.DataFrame(
        {
            "user_id": [7, 8],
            "region": ["eu", "us"],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]).astype("datetime64[us]"),
            "score": [1.5, None],
        }
    )
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "kv")
    online_kv_export(df, ["user_id", "region"], "ts", path)
    got = spark.read.parquet(path).toPandas()
    assert len(got) == 2
    keys = [deserialize_entity_key(bytes(b)) for b in got.entity_key]
    assert {"user_id": 7, "region": "eu"} in keys
    assert {"user_id": 8, "region": "us"} in keys
    row7 = got[got.entity_key.map(
        lambda b: deserialize_entity_key(bytes(b))["user_id"] == 7)]
    val = json.loads(bytes(row7.value.iloc[0]).decode())
    assert val == {"score": 1.5}
    row8 = got[got.entity_key.map(
        lambda b: deserialize_entity_key(bytes(b))["user_id"] == 8)]
    assert json.loads(bytes(row8.value.iloc[0]).decode()) == {"score": None}
