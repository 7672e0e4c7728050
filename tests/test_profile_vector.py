"""DQM validation reference (profile -> validate) and store-level vector
retrieval — round-2 items (VERDICT Missing #4/#7)."""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_spark.core import Entity, FeatureStore, FeatureView, Field
from feast_spark.core.model import SparkSqlSource
from feast_spark.operators.profile import (
    DatasetProfile,
    profile_dataset,
    validate_dataset,
)


@pytest.fixture()
def clean_df(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "v": rng.normal(100.0, 10.0, 400),
            "cat": rng.choice(["a", "b", "c"], 400),
            "maybe": np.where(rng.random(400) < 0.02, None, "x"),
        }
    )
    return spark.createDataFrame(pdf)


def test_profile_validate_clean_passes(spark, clean_df):
    prof = profile_dataset(clean_df)
    # same-distribution sample must validate
    report = validate_dataset(clean_df.sample(0.5, seed=1), prof)
    assert report.ok, report.errors
    # JSON round-trip (registry persistence shape, saved_dataset.py:259)
    prof2 = DatasetProfile.from_json(prof.to_json())
    assert validate_dataset(clean_df, prof2).ok


def test_profile_validate_mutations_fail(spark, clean_df):
    prof = profile_dataset(clean_df)
    # range shift
    shifted = clean_df.withColumn("v", F.col("v") + F.lit(500.0))
    rep = validate_dataset(shifted, prof)
    assert not rep.ok and any(e.check == "values_between" for e in rep.errors)
    # null-rate explosion
    nully = clean_df.withColumn(
        "maybe", F.when(F.rand(5) < 0.5, F.col("maybe"))
    )
    rep = validate_dataset(nully, prof)
    assert not rep.ok and any(e.check == "null_fraction" for e in rep.errors)
    # new category
    newcat = clean_df.withColumn(
        "cat", F.when(F.rand(7) < 0.1, F.lit("ZZZ")).otherwise(F.col("cat"))
    )
    rep = validate_dataset(newcat, prof)
    assert not rep.ok and any(e.check == "value_set" for e in rep.errors)
    # missing column
    rep = validate_dataset(clean_df.drop("cat"), prof)
    assert not rep.ok and any(e.check == "column_present" for e in rep.errors)


def test_retrieve_online_documents(spark, tmp_path):
    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    pdf = pd.DataFrame(
        {
            "doc_id": range(50),
            "ts": pd.to_datetime(["2024-01-01"] * 50).astype("datetime64[us]"),
            "embedding": [v.tolist() for v in vecs],
            "title": [f"doc-{i}" for i in range(50)],
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("__docs_vec")
    store = FeatureStore(spark, str(tmp_path))
    doc = Entity("doc", "doc_id")
    view = FeatureView(
        "docs",
        [doc],
        SparkSqlSource("SELECT * FROM __docs_vec", timestamp_field="ts"),
        schema=[
            Field("doc_id", "int64"),
            Field("embedding", "array<double>"),
            Field("title", "string"),
        ],
    )
    store.apply([view])
    store.materialize(
        "docs",
        datetime(2023, 1, 1, tzinfo=timezone.utc),
        datetime(2025, 1, 1, tzinfo=timezone.utc),
    )
    q = vecs[7].tolist()
    out = store.retrieve_online_documents("docs", q, top_k=3).toPandas()
    assert len(out) == 3
    # the query IS doc 7 -> exact self-match ranks first
    assert out.sort_values("rank").doc_id.iloc[0] == 7
    assert "title" in out.columns
    # LSH path returns <= k rows and includes the self-match bucket
    lsh = store.retrieve_online_documents("docs", q, top_k=3, method="lsh", num_bits=4)
    got = lsh.toPandas()
    assert 1 <= len(got) <= 3 and 7 in got.doc_id.tolist()


def test_retrieval_job_validation_gate(spark, tmp_path, clean_df):
    from feast_spark.core.retrieval import RetrievalJob

    prof = profile_dataset(clean_df)
    ok_path = str(tmp_path / "sd_ok")
    RetrievalJob(clean_df).persist(ok_path, validation_reference=prof)
    assert spark.read.parquet(ok_path).count() == clean_df.count()

    bad = clean_df.withColumn("v", F.col("v") + F.lit(999.0))
    bad_path = str(tmp_path / "sd_bad")
    with pytest.raises(ValueError, match="failed validation"):
        RetrievalJob(bad).persist(bad_path, validation_reference=prof)
    import os
    assert not os.path.exists(bad_path)


def test_validate_flags_unbounded_categorical_explosion(spark):
    """Bounded reference value_set vs a candidate exceeding max_categories
    distinct values must FAIL validation (round-2 ADVICE, medium)."""
    import pandas as pd

    from feast_spark.operators.profile import profile_dataset, validate_dataset

    ref = spark.createDataFrame(
        pd.DataFrame({"cat": ["a", "b", "c"] * 10})
    )
    prof = profile_dataset(ref, max_categories=25)
    assert prof.columns["cat"].categories == ["a", "b", "c"]

    exploded = spark.createDataFrame(
        pd.DataFrame({"cat": [f"v{i}" for i in range(60)]})
    )
    report = validate_dataset(exploded, prof)
    assert not report.ok
    errs = [e for e in report.errors if e.check == "value_set"]
    assert errs and "unbounded" in errs[0].observed
