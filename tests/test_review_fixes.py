"""Regression tests for the round-1 code-review findings."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_spark.operators.dedup import ngram_jaccard_pairs
from feast_spark.operators.latest import pull_latest
from feast_spark.operators.pit_join import point_in_time_join
from feast_spark.operators.validate import validate_schema


def test_validate_accepts_spark_and_alias_type_names(spark):
    df = spark.createDataFrame(pd.DataFrame({"v": [1], "f": [1.5]}))
    # 'long' (python-style) and 'bigint' (simpleString) both accepted
    assert validate_schema(df, {"v": "long"}).ok
    assert validate_schema(df, {"v": "bigint"}).ok
    # widening: int64 column satisfies a declared double
    assert validate_schema(df, {"v": "double"}).ok
    # but not the reverse
    assert not validate_schema(df, {"f": "long"}).ok


def test_pull_latest_start_inclusive(spark):
    pdf = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": pd.to_datetime(["2024-01-01 00:00:00", "2023-12-31 23:00:00"]).astype(
                "datetime64[us]"
            ),
            "v": [10.0, 9.0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = pull_latest(
        df, ["k"], ["v"], "ts",
        start="2024-01-01 00:00:00", end="2024-01-02 00:00:00",
    ).toPandas()
    # the row exactly at start must be included (reference BETWEEN)
    assert len(out) == 1 and out.v.iloc[0] == 10.0


def test_ngram_short_docs_emit_no_grams(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["hello", "hello", "a b c"]})
    )
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.1).toPandas()
    # two identical single-word docs must NOT pair (no bigrams exist)
    assert not ((pairs.id_a == 0) & (pairs.id_b == 1)).any()


def test_frame_sample_stub_boundary(spark):
    from feast_spark.functions.multimodal import encode_fake_image, frame_sample

    imgs = spark.createDataFrame(
        pd.DataFrame({"img_id": [0], "data": [encode_fake_image(8, 8, 1)]}),
        schema="img_id long, data binary",
    )
    assert frame_sample(imgs, "data", "img_id", fake=True).count() >= 1
    with pytest.raises(Exception) as ei:
        frame_sample(imgs, "data", "img_id", fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_pit_join_is_lazy_and_tiebreak_deterministic(spark):
    feats = pd.DataFrame(
        {
            "k": [1, 1],
            "fts": pd.to_datetime(["2024-01-01 00:00:00"] * 2).astype("datetime64[us]"),
            "v": [5.0, 7.0],  # identical ts -> tie
        }
    )
    entity = pd.DataFrame(
        {"k": [1], "ets": pd.to_datetime(["2024-06-01"]).astype("datetime64[us]")}
    )
    fdf = spark.createDataFrame(feats)
    edf = spark.createDataFrame(entity)
    out = point_in_time_join(
        edf, fdf, ["k"], feature_ts_col="fts", entity_ts_col="ets",
        tiebreak_cols=["v"],
    )
    vals = {out.toPandas().v.iloc[0] for _ in range(3)}
    assert vals == {7.0}  # max v wins deterministically


def test_pit_join_no_eager_job_by_default(spark):
    # building the plan must not run a Spark job (laziness contract)
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    feats = spark.range(10).selectExpr(
        "id as k", "timestamp'2024-01-01' as fts", "cast(id as double) as v"
    )
    entity = spark.range(5).selectExpr("id as k", "timestamp'2024-06-01' as ets")
    _ = point_in_time_join(
        entity, feats, ["k"], feature_ts_col="fts", entity_ts_col="ets"
    )
    after = tracker.getJobIdsForGroup(None)
    assert before == after, "plan construction launched a Spark job"


def test_pit_join_shared_lineage_no_ambiguity(spark):
    # entity and feature frames filtered from ONE parent (the pit_last_click
    # shape): must resolve by alias, produce the oracle answer, and raise no
    # AnalysisException (round-1 finding #1)
    parent = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2],
                "kind": ["e", "f", "f", "e"],
                "ts": pd.to_datetime(
                    [
                        "2024-01-02 00:00:00",
                        "2024-01-01 00:00:00",
                        "2024-01-01 12:00:00",
                        "2024-01-02 00:00:00",
                    ]
                ).astype("datetime64[us]"),
                "v": [0.0, 1.0, 2.0, 0.0],
            }
        )
    )
    entity = parent.filter(F.col("kind") == "e").select("k", "ts")
    feats = parent.filter(F.col("kind") == "f").select("k", "ts", "v")
    out = (
        point_in_time_join(entity, feats, ["k"], feature_ts_col="ts", entity_ts_col="ts")
        .orderBy("k")
        .toPandas()
    )
    assert len(out) == 2
    assert out.v.iloc[0] == 2.0 and pd.isna(out.v.iloc[1])


def test_pit_created_cutoff_before_dedup(spark):
    # backfill scenario (ADVICE r1 high): the LATEST row by ts is created
    # after the entity ts, but an OLDER row qualifies -> the older row's
    # value must win (reference masks too-new rows before _drop_duplicates,
    # dask.py:1203-1270). Previously this returned NULL.
    feats = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1],
                "fts": pd.to_datetime(
                    ["2024-01-01 00:00:00", "2024-01-03 00:00:00"]
                ).astype("datetime64[us]"),
                "created": pd.to_datetime(
                    ["2024-01-01 00:00:00", "2024-06-01 00:00:00"]
                ).astype("datetime64[us]"),
                "v": [1.0, 2.0],
            }
        )
    )
    entity = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1], "ets": pd.to_datetime(["2024-01-05"]).astype("datetime64[us]")}
        )
    )
    out = point_in_time_join(
        entity, feats, ["k"], feature_ts_col="fts", entity_ts_col="ets",
        created_ts_col="created", created_cutoff=True,
    ).toPandas()
    assert len(out) == 1 and out.v.iloc[0] == 1.0


def test_pit_created_cutoff_all_too_new_blanks(spark):
    # every candidate too new -> blank, don't drop
    feats = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1],
                "fts": pd.to_datetime(["2024-01-01"]).astype("datetime64[us]"),
                "created": pd.to_datetime(["2024-06-01"]).astype("datetime64[us]"),
                "v": [1.0],
            }
        )
    )
    entity = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1], "ets": pd.to_datetime(["2024-01-05"]).astype("datetime64[us]")}
        )
    )
    out = point_in_time_join(
        entity, feats, ["k"], feature_ts_col="fts", entity_ts_col="ets",
        created_ts_col="created", created_cutoff=True,
    ).toPandas()
    assert len(out) == 1 and pd.isna(out.v.iloc[0])


def test_pit_join_entityless_dummy_entity(spark):
    # non-entity mode (dask.py:298-302 DUMMY_ENTITY): zero join keys ->
    # every entity row gets the latest feature row as-of its timestamp
    feats = spark.createDataFrame(
        pd.DataFrame(
            {
                "fts": pd.to_datetime(["2024-01-01", "2024-02-01"]).astype(
                    "datetime64[us]"
                ),
                "v": [1.0, 2.0],
            }
        )
    )
    entity = spark.createDataFrame(
        pd.DataFrame(
            {
                "ets": pd.to_datetime(
                    ["2023-12-01", "2024-01-15", "2024-03-01"]
                ).astype("datetime64[us]")
            }
        )
    )
    out = (
        point_in_time_join(entity, feats, [], feature_ts_col="fts", entity_ts_col="ets")
        .orderBy("ets")
        .toPandas()
    )
    assert pd.isna(out.v.iloc[0]) and out.v.iloc[1] == 1.0 and out.v.iloc[2] == 2.0
