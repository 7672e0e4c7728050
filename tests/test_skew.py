"""Mega-conversation skew: one conv 3 orders of magnitude larger than the
rest must not break correctness or collapse onto one task (SURVEY §2.3
skew note; BASELINE.json 'salted repartitioning ... to defuse
mega-conversation skew')."""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd
import pytest

from feast_spark.fixtures import TRANSCRIPT_SCHEMA, generate_transcripts
from feast_spark.operators.salting import salted_join, salted_repartition
from feast_spark.pipeline.quality import QualityConfig, run_quality_pipeline

DTS = datetime(2026, 1, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def skewed(spark):
    # conv 40 is mega (20k turns); 40 normal convs (~10 turns each)
    pdf = generate_transcripts(41, seed=5, mega_every=40, mega_turns=20000)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA), pdf


def test_pipeline_survives_mega_conv(spark, skewed):
    df, pdf = skewed
    res = run_quality_pipeline(spark, df, QualityConfig(), decision_ts=DTS)
    labels = res.labels
    n_in = pdf.drop_duplicates(["conv_id", "turn_idx"]).shape[0]
    assert labels.count() == n_in
    conv = res.conv_features.toPandas().set_index("conv_id")
    assert conv.loc["c000000040", "n_turns"] >= 19000
    res.scored.unpersist()


def test_salted_repartition_spreads_hot_key(spark, skewed):
    df, _ = skewed
    out = salted_repartition(df, "conv_id", num_partitions=16, salt_buckets=8,
                             salt_from="turn_idx")
    from pyspark.sql import functions as F
    sizes = (
        out.withColumn("p", F.spark_partition_id())
        .filter(F.col("conv_id") == "c000000040")
        .groupBy("p").count().toPandas()
    )
    # the mega conv's rows must land on multiple partitions
    assert len(sizes) >= 4, f"hot key stayed on {len(sizes)} partitions"


def test_salted_join_matches_plain_join(spark, skewed):
    df, _ = skewed
    from pyspark.sql import functions as F
    dim = df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("conv_n"))
    plain = df.join(dim, "conv_id").selectExpr("conv_id", "turn_idx", "conv_n")
    salted = salted_join(
        df, dim, "conv_id", salt_buckets=8, probe_salt_from="turn_idx", how="left"
    ).selectExpr("conv_id", "turn_idx", "conv_n")
    a = plain.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = salted.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
