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
    import pandas as pd

    from feast_spark.core.keys import deserialize_entity_key, serialize_entity_key
    from feast_spark.core.kv_codec import decode_value
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
    # byte-for-byte v3 parity with the per-row reference encoder
    assert set(map(bytes, got.entity_key)) == {
        serialize_entity_key({"user_id": 7, "region": "eu"}),
        serialize_entity_key({"user_id": 8, "region": "us"}),
    }
    row7 = got[got.entity_key.map(
        lambda b: deserialize_entity_key(bytes(b))["user_id"] == 7)]
    assert decode_value(bytes(row7.value.iloc[0]), ["score"]) == {"score": 1.5}
    row8 = got[got.entity_key.map(
        lambda b: deserialize_entity_key(bytes(b))["user_id"] == 8)]
    assert decode_value(bytes(row8.value.iloc[0]), ["score"]) == {"score": None}


def test_online_kv_export_arrays_timestamps_and_dtype_gate(spark, tmp_path):
    """ADVICE round 2: array/timestamp features must serialize (not crash
    on pd.isna ambiguity), and unsupported dtypes must fail fast."""
    import numpy as np
    import pandas as pd
    import pytest

    from feast_spark.core.keys import deserialize_entity_key
    from feast_spark.core.kv_codec import decode_value
    from feast_spark.sources.sinks import online_kv_export

    from datetime import datetime

    df = spark.createDataFrame(
        [
            (1, [0.5, 0.25], "a", 10, True,
             datetime(2024, 3, 1, 12, 0, 0, 123456)),
            (2, None, None, None, None, None),
        ],
        "user_id long, emb array<double>, tag string, cnt long, ok boolean, "
        "seen timestamp",
    )
    path = str(tmp_path / "kv2")
    online_kv_export(df, ["user_id"], "seen", path)
    got = spark.read.parquet(path).toPandas()
    feature_cols = ["emb", "tag", "cnt", "ok"]
    by_key = {
        deserialize_entity_key(bytes(k))["user_id"]: decode_value(
            bytes(v), feature_cols
        )
        for k, v in zip(got.entity_key, got.value)
    }
    assert by_key[1] == {"emb": [0.5, 0.25], "tag": "a", "cnt": 10, "ok": True}
    assert by_key[2] == {"emb": None, "tag": None, "cnt": None, "ok": None}

    bad = spark.createDataFrame(
        [(1, {"a": 1}, datetime(2024, 1, 1))],
        "user_id long, m map<string,int>, ts timestamp",
    )
    with pytest.raises(TypeError, match="unsupported"):
        online_kv_export(bad, ["user_id"], "ts", str(tmp_path / "kv3"))


def test_kv_codec_key_parity_randomized(spark):
    """encode_keys_batch == serialize_entity_key per row across mixed
    dtypes, batch-split independent."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from feast_spark.core.keys import UnixTimestamp, serialize_entity_key
    from feast_spark.core.kv_codec import encode_keys_batch

    rng = np.random.default_rng(3)
    n = 257
    pdf = pd.DataFrame(
        {
            "b_str": ["k" * int(i % 7) + str(rng.integers(1e6)) for i in range(n)],
            "a_int": rng.integers(-(2**62), 2**62, n),
            "c_ts": pd.to_datetime(
                rng.integers(0, 2**31, n), unit="s"
            ).astype("datetime64[us]"),
        }
    )
    batch = pa.RecordBatch.from_pandas(pdf)
    enc = encode_keys_batch(batch, ["a_int", "b_str", "c_ts"])
    for i in range(n):
        expected = serialize_entity_key(
            {
                "a_int": int(pdf.a_int[i]),
                "b_str": pdf.b_str[i],
                "c_ts": UnixTimestamp(int(pdf.c_ts[i].timestamp())),
            }
        )
        assert enc[i].as_py() == expected, i
