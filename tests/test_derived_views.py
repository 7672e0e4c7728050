"""Derived feature views (source_views DAG), RequestSource validation,
python-mode ODFV, and with_join_key_map — round-2 API surface.

Reference anchors: feature_view.py:148,232-239 (source_views),
feature_resolver.py:28-95 (DAG + cycle detection), data_source.py:591
(RequestSource), feature_store.py:2057-2068 (request validation),
on_demand_feature_view.py:56-60,1101-1134 (python/singleton mode),
feature_view.py:447-480 (with_join_key_map)."""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_spark.core import (
    BatchFeatureView,
    Entity,
    FeatureStore,
    FeatureView,
    Field,
    OnDemandFeatureView,
    RequestSource,
    SparkSqlSource,
)


@pytest.fixture()
def events_view_setup(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:10:00",
                    "2024-01-01 00:40:00",
                    "2024-01-01 02:10:00",
                    "2024-01-01 01:20:00",
                    "2024-01-01 03:05:00",
                ]
            ).astype("datetime64[us]"),
            "value": [10.0, 20.0, 5.0, 7.0, 1.0],
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("__derived_clicks")
    store = FeatureStore(spark, str(tmp_path))
    return store


def _hourly_udf(df):
    return (
        df.groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(F.sum("value").alias("hour_value"))
        .select("user_id", F.col("w.end").alias("ts"), "hour_value")
    )


def test_derived_view_historical_retrieval(spark, events_view_setup):
    store = events_view_setup
    user = Entity("user", "user_id")
    base = FeatureView(
        "clicks_base",
        [user],
        SparkSqlSource("SELECT * FROM __derived_clicks", timestamp_field="ts"),
        schema=[Field("user_id", "int64"), Field("value", "float64")],
    )
    derived = BatchFeatureView(
        "clicks_hourly",
        [user],
        source_views=[base],
        udf=_hourly_udf,
        mode="spark",
        schema=[Field("user_id", "int64"), Field("hour_value", "float64")],
    )
    store.apply([base, derived])
    entity = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 2],
                "event_timestamp": pd.to_datetime(
                    ["2024-01-01 02:00:00", "2024-01-01 02:00:00"]
                ).astype("datetime64[us]"),
            }
        )
    )
    out = (
        store.get_historical_features(entity, ["clicks_hourly:hour_value"])
        .orderBy("user_id")
        .toPandas()
    )
    # user 1: hour [00:00,01:00) closes at 01:00 <= 02:00 -> 30.0
    # user 2: hour [01:00,02:00) closes at 02:00 <= 02:00 -> 7.0
    assert out.hour_value.tolist() == [30.0, 7.0]


def test_derived_view_multi_source_and_cycle(spark, events_view_setup):
    user = Entity("user", "user_id")
    base = FeatureView(
        "b1",
        [user],
        SparkSqlSource("SELECT * FROM __derived_clicks", timestamp_field="ts"),
    )
    other = FeatureView(
        "b2",
        [user],
        SparkSqlSource(
            "SELECT user_id, ts, value * 2 AS v2 FROM __derived_clicks",
            timestamp_field="ts",
        ),
    )
    combined = BatchFeatureView(
        "comb",
        [user],
        source_views=[base, other],
        udf=lambda a, b: a.join(b.select("user_id", "ts", "v2"), ["user_id", "ts"]),
        mode="spark",
    )
    df = combined.read(spark)
    row = df.filter("user_id = 1 AND value = 10.0").first()
    assert row.v2 == 20.0

    # cycle detection (feature_resolver.py:62-65)
    v1 = BatchFeatureView("v1", [user], source_views=[base], udf=lambda d: d, mode="spark")
    v2 = BatchFeatureView("v2", [user], source_views=[v1], udf=lambda d: d, mode="spark")
    v1.source_views = [v2]
    with pytest.raises(ValueError, match="Cycle"):
        v2.read(spark)

    # a view must have a source or source_views
    with pytest.raises(ValueError, match="source"):
        FeatureView("empty", [user])


def test_request_source_validation_and_python_mode(spark, events_view_setup):
    store = events_view_setup
    user = Entity("user", "user_id")
    base = FeatureView(
        "clicks_rs",
        [user],
        SparkSqlSource("SELECT * FROM __derived_clicks", timestamp_field="ts"),
        schema=[Field("user_id", "int64"), Field("value", "float64")],
    )
    req = RequestSource("req", (Field("scale", "double"),))

    def scale_udf(cols: dict) -> dict:
        cols["scaled_value"] = cols["value"] * cols["scale"]
        return cols

    odfv = OnDemandFeatureView(
        "scaled",
        scale_udf,
        schema=[Field("scaled_value", "double")],
        mode="python",
        sources=[req, base],
    )
    store.apply([base, odfv])
    entity_missing = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1],
                "event_timestamp": pd.to_datetime(["2024-01-01 02:00:00"]).astype(
                    "datetime64[us]"
                ),
            }
        )
    )
    # request column absent -> reference-shaped error BEFORE any compute
    with pytest.raises(ValueError, match="Missing request data"):
        store.get_historical_features(
            entity_missing, ["clicks_rs:value", "scaled:scaled_value"]
        )
    entity = entity_missing.withColumn("scale", F.lit(3.0))
    out = store.get_historical_features(
        entity, ["clicks_rs:value", "scaled:scaled_value"]
    ).toPandas()
    assert out.scaled_value.iloc[0] == out.value.iloc[0] * 3.0


def test_with_join_key_map_two_roles(spark, events_view_setup):
    store = events_view_setup
    user = Entity("user", "user_id")
    stats = FeatureView(
        "stats",
        [user],
        SparkSqlSource("SELECT * FROM __derived_clicks", timestamp_field="ts"),
        schema=[Field("user_id", "int64"), Field("value", "float64")],
    )
    origin = stats.with_name("origin_stats").with_join_key_map(
        {"user_id": "origin_id"}
    )
    dest = stats.with_name("dest_stats").with_join_key_map({"user_id": "dest_id"})
    store.apply([origin, dest])
    entity = spark.createDataFrame(
        pd.DataFrame(
            {
                "origin_id": [1],
                "dest_id": [2],
                "event_timestamp": pd.to_datetime(["2024-01-01 04:00:00"]).astype(
                    "datetime64[us]"
                ),
            }
        )
    )
    out = store.get_historical_features(
        entity,
        ["origin_stats:value", "dest_stats:value"],
        full_feature_names=True,
    ).toPandas()
    assert out.origin_stats__value.iloc[0] == 5.0  # user 1 latest
    assert out.dest_stats__value.iloc[0] == 1.0  # user 2 latest
    # the original view is untouched (query-time copy semantics)
    assert stats.join_key_map == {} and stats.name == "stats"


def test_pipeline_conv_features_via_derived_view(spark):
    """SURVEY §1.3 proof: the conv-feature stage of the quality pipeline
    expressed as a derived BatchFeatureView through the FeatureStore API
    matches the hand-wired pipeline output."""
    import tempfile

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.quality import (
        QualityConfig,
        conversation_features,
        dedup_latest_turns,
        run_quality_pipeline,
        score_transcripts,
    )

    created = datetime(2025, 6, 1, tzinfo=timezone.utc)
    transcripts = transcripts_spark(spark, 40, seed=11)
    transcripts.createOrReplaceTempView("__pipeline_turns")

    conv = Entity("conv", "conv_id")
    turns_view = BatchFeatureView(
        "scored_turns",
        [conv],
        SparkSqlSource("SELECT * FROM __pipeline_turns", timestamp_field="ts"),
        udf=lambda df: score_transcripts(dedup_latest_turns(df), QualityConfig()),
        mode="spark",
    )
    conv_view = BatchFeatureView(
        "conv_features",
        [conv],
        source_views=[turns_view],
        udf=lambda df: conversation_features(df, created_ts=created),
        mode="spark",
        schema=[
            Field("conv_id", "string"),
            Field("mean_perplexity", "double"),
            Field("lang_mode", "string"),
            Field("tool_call_density", "double"),
        ],
    )
    store = FeatureStore(spark, tempfile.mkdtemp(prefix="fs_dv_"))
    store.apply([turns_view, conv_view])

    via_store = conv_view.read(spark).toPandas().sort_values("conv_id")
    res = run_quality_pipeline(
        spark,
        transcripts_spark(spark, 40, seed=11),
        QualityConfig(),
        decision_ts=datetime(2026, 1, 1, tzinfo=timezone.utc),
    )
    direct = res.conv_features.toPandas().sort_values("conv_id")
    for c in ["lang_mode", "n_turns"]:
        assert via_store[c].tolist() == direct[c].tolist()
    for c in ["mean_perplexity", "tool_call_density"]:
        # avg() partial-aggregation order differs between the two plans —
        # floating sums are not associative, so compare to 1e-9
        assert via_store[c].to_numpy() == pytest.approx(
            direct[c].to_numpy(), rel=1e-9, abs=1e-9
        )
