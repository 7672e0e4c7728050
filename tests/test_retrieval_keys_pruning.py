"""RetrievalJob laziness/materialization, entity-key serde round-trip,
partition-pruning plan check."""

from __future__ import annotations

import io
import contextlib

import pandas as pd
import pyarrow as pa
import pytest

from feast_spark.core.keys import deserialize_entity_key, serialize_entity_key
from feast_spark.core.retrieval import RetrievalJob
from feast_spark.sources.sinks import read_partition_pruned


def test_retrieval_job_surfaces(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}))
    job = RetrievalJob(df)
    assert job.to_spark_df() is df
    pdf = job.to_df()
    assert len(pdf) == 2
    tbl = job.to_arrow()
    assert isinstance(tbl, pa.Table) and tbl.num_rows == 2
    job.persist(str(tmp_path / "ds"))
    with pytest.raises(Exception):
        job.persist(str(tmp_path / "ds"))
    files = job.to_remote_storage(str(tmp_path / "staging"))
    assert files and all(f.endswith(".parquet") for f in files)


def test_store_returns_job(spark, tmp_path):
    from feast_spark.core import Entity, FeatureStore, FeatureView, Field, ParquetSource

    feats = pd.DataFrame(
        {"k": [1], "event_timestamp": pd.to_datetime(["2024-01-01"]).astype("datetime64[us]"),
         "v": [1.0]}
    )
    fp = str(tmp_path / "f.parquet")
    feats.to_parquet(fp)
    store = FeatureStore(spark, str(tmp_path))
    store.apply([
        FeatureView("fv", [Entity("k")], ParquetSource(fp, "event_timestamp"),
                    schema=[Field("k", "int64"), Field("v", "float64")])
    ])
    entity = spark.createDataFrame(
        pd.DataFrame({"k": [1], "event_timestamp": pd.to_datetime(["2024-06-01"]).astype("datetime64[us]")})
    )
    job = store.get_historical_features(entity, ["fv:v"], as_job=True)
    assert isinstance(job, RetrievalJob)
    assert job.to_df().v.iloc[0] == 1.0


def test_entity_key_serde_roundtrip_and_canonical_order():
    k = {"user_id": 42, "region": "eu", "blob": b"\x00\x01"}
    buf = serialize_entity_key(k)
    assert deserialize_entity_key(buf) == k
    # key order must not matter (canonical sorted encoding,
    # key_encoding_utils.py:151-163)
    buf2 = serialize_entity_key(dict(reversed(list(k.items()))))
    assert buf == buf2
    assert serialize_entity_key({"a": 1}) != serialize_entity_key({"a": 2})


def test_entity_key_v3_byte_layout_matches_reference():
    # Expected bytes derived by hand from serialize_entity_key v3
    # (key_encoding_utils.py:131-190): <I count | per sorted key:
    # <I STRING(2) <I len name | per value: <I type <I len payload.
    # Keys sort to [region, user_id]; values follow in the same order.
    expected = bytes.fromhex(
        "02000000"                      # 2 keys
        "0200000006000000" + b"region".hex()
        + "0200000007000000" + b"user_id".hex()
        + "020000000200000065 75".replace(" ", "")   # STRING 'eu'
        + "04000000080000002a00000000000000"          # INT64 42
    )
    assert serialize_entity_key({"user_id": 42, "region": "eu"}) == expected


def test_entity_key_rejects_float_and_bool():
    import pytest

    with pytest.raises(TypeError):
        serialize_entity_key({"score": 1.5})
    with pytest.raises(TypeError):
        serialize_entity_key({"flag": True})


def test_partition_pruned_read_plan(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 05:00", "2024-01-02 05:00", "2024-01-03 05:00"] * 4
            ).astype("datetime64[us]"),
            "v": range(12),
        }
    )
    pdf["dt"] = pdf["ts"].dt.strftime("%Y-%m-%d")
    src = str(tmp_path / "part")
    spark.createDataFrame(pdf).write.partitionBy("dt").parquet(src)

    out = read_partition_pruned(
        spark, src, "ts", "dt", "2024-01-02 00:00:00", "2024-01-02 23:59:59"
    )
    assert out.count() == 4
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "2024-01-02" in plan
