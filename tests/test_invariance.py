"""Determinism under parallelism (SURVEY §5 item 5 / §7 hard parts):
identical labels regardless of input partitioning, and distributed
generation matching local generation is covered in test_quality_pipeline.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd
import pytest

from feast_spark.fixtures import TRANSCRIPT_SCHEMA, generate_transcripts
from feast_spark.pipeline.quality import QualityConfig, run_quality_pipeline

DTS = datetime(2026, 1, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def base_pdf():
    return generate_transcripts(80, seed=3, mega_every=40, mega_turns=150)


def _labels(spark, df):
    res = run_quality_pipeline(spark, df, QualityConfig(), decision_ts=DTS)
    out = (
        res.labels.toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    res.scored.unpersist()
    return out


def test_labels_invariant_to_partitioning(spark, base_pdf):
    df = spark.createDataFrame(base_pdf, schema=TRANSCRIPT_SCHEMA)
    a = _labels(spark, df.repartition(2))
    b = _labels(spark, df.repartition(37))
    c = _labels(spark, df.repartition(8, "conv_id"))
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)


def test_labels_invariant_to_input_order(spark, base_pdf):
    df = spark.createDataFrame(base_pdf, schema=TRANSCRIPT_SCHEMA)
    shuffled = spark.createDataFrame(
        base_pdf.sample(frac=1.0, random_state=7), schema=TRANSCRIPT_SCHEMA
    )
    pd.testing.assert_frame_equal(_labels(spark, df), _labels(spark, shuffled))
