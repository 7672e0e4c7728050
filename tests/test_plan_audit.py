"""Physical-plan audits — the scale properties the operators claim must be
visible in the plan, not just asserted in docstrings.

Checks: predicate pushdown reaches the parquet scan, dimension joins
broadcast, PIT joins never degenerate to cartesian products and carry the
WindowGroupLimit (map-side top-1 pruning), LSH bucket joins are equi-joins.
"""

from __future__ import annotations

import contextlib
import io

import pytest

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_pull_all_pushes_time_bounds_to_scan(spark):
    from feast_spark.operators import pull_all

    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = pull_all(
        ev, ["user_id"], ["value"], "ts",
        start="2024-01-10 00:00:00", end="2024-01-20 00:00:00",
    )
    plan = plan_of(out)
    assert "PushedFilters" in plan
    # both bounds must land in the parquet scan, not a post-scan filter only
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "GreaterThanOrEqual(ts" in pushed and "LessThanOrEqual(ts" in pushed
    # column pruning: the scan must not read unused wide columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "props" not in read_schema and "event_type" not in read_schema


def test_two_role_join_broadcasts_dims(spark):
    import __spark_entry__ as e

    plan = plan_of(e.q_two_role_join(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pit_join_plan_shape(spark):
    import __spark_entry__ as e

    plan = plan_of(e.q_pit_last_click(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # map-side top-1 pruning of the dedup window
    assert "WindowGroupLimit" in plan
    # the sha2 row id must NOT be in the hot path anymore
    assert "sha2" not in plan


def test_minhash_bucket_join_is_equijoin(spark):
    from feast_spark.operators.dedup import minhash_lsh_pairs, release_dedup_caches

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(minhash_lsh_pairs(docs, "doc_id", "text"))
    assert "CartesianProduct" not in plan
    release_dedup_caches()


def test_minhash_verify_joins_never_broadcast_corpus_sides(spark):
    """The gate/verify joins of minhash_lsh_pairs pair corpus-scaled
    relations (candidate pairs x signatures x candidate shingles).
    Catalyst's static size estimate for the cached python-sourced
    subtrees can come out tiny, and an auto-BroadcastExchange of a pair
    table that is actually GBs collects it to the driver — measured
    failure at 1.45M turns (driver.maxResultSize blown by a ~1 GB
    broadcast build). The SHUFFLE_HASH hints must keep every one of
    these joins off the broadcast path."""
    from feast_spark.operators.dedup import minhash_lsh_pairs, release_dedup_caches

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(minhash_lsh_pairs(docs, "doc_id", "text"))
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastExchange" not in plan
    assert "ShuffledHashJoin" in plan
    release_dedup_caches()


def test_neardup_verify_joins_never_broadcast_text_side(spark):
    """neardup_verify joins capped TEXT onto the pair relation twice —
    an auto-broadcast of the text side would pull the whole corpus's
    capped text to the driver. Hinted SHUFFLE_HASH on both id joins."""
    from feast_spark.operators.dedup import neardup_verify

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = docs.selectExpr("doc_id as id_a", "doc_id + 1 as id_b").limit(50)
    plan = plan_of(neardup_verify(pairs, docs, "doc_id", "text", max_chars=500))
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastExchange" not in plan
    assert "ShuffledHashJoin" in plan


def test_minhash_incremental_never_broadcasts_prior_state(spark):
    """minhash_dedup_incremental joins the new batch against PRIOR
    committed signature state (corpus-scaled, grows every batch) — an
    auto-broadcast of it would collect the whole committed corpus's
    signatures to the driver. All four sig joins are SHUFFLE_HASH."""
    from feast_spark.fixtures import documents_spark
    from feast_spark.operators.dedup import minhash_dedup_incremental

    docs = documents_spark(spark, 40, seed=11).select("doc_id", "text")
    prior = documents_spark(spark, 40, seed=12).selectExpr(
        "doc_id + 1000 as doc_id", "text"
    )
    _, prior_sigs = minhash_dedup_incremental(prior, None)
    kept, _ = minhash_dedup_incremental(docs, prior_sigs)
    plan = plan_of(kept)
    assert "BroadcastHashJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "ShuffledHashJoin" in plan


def test_minhash_profile_sig_joins_never_broadcast(spark):
    """minhash_est_histogram joins the corpus-scaled signature relation
    onto the candidate pairs twice — same SHUFFLE_HASH discipline as
    minhash_lsh_pairs. The cumulative window is bounded (num_hashes+1
    rows) so its single-partition sort is fine; the JOINS must not
    broadcast."""
    from feast_spark.operators.dedup import (
        minhash_est_histogram,
        release_dedup_caches,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(minhash_est_histogram(docs, "doc_id", "text"))
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastExchange" not in plan
    assert "ShuffledHashJoin" in plan
    release_dedup_caches()


def test_cosine_topk_broadcasts_queries(spark):
    from feast_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter("vec_id < 5")
    plan = plan_of(cosine_topk(emb, q, 3))
    # brute force is an intentional broadcast nested-loop of the SMALL query
    # side against the streaming corpus — never a shuffled cartesian
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_quality_pipeline_no_cartesian_no_sort_of_big_side(spark):
    from datetime import datetime, timezone

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.quality import QualityConfig, run_quality_pipeline

    t = transcripts_spark(spark, 30, seed=3)
    res = run_quality_pipeline(
        spark, t, QualityConfig(), run_id="audit",
        decision_ts=datetime(2026, 1, 1, tzinfo=timezone.utc),
    )
    plan = plan_of(res.labels)
    assert "CartesianProduct" not in plan
    # conv features join onto turns must be a broadcast, not a big shuffle
    assert "BroadcastHashJoin" in plan
    res.scored.unpersist()


def test_snapshot_time_travel(spark, tmp_path):
    from datetime import datetime, timezone

    import pandas as pd

    from feast_spark.core import Entity, FeatureStore, FeatureView, Field
    from feast_spark.core.model import SparkSqlSource

    pdf = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-02-01 00:00:00"]
            ).astype("datetime64[us]"),
            "v": [1.0, 2.0],
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("__tt_src")
    store = FeatureStore(spark, str(tmp_path))
    fv = FeatureView(
        "tt", [Entity("k", "k")],
        SparkSqlSource("SELECT * FROM __tt_src", timestamp_field="ts"),
        schema=[Field("k", "int64"), Field("v", "float64")],
    )
    store.apply([fv])
    store.materialize("tt", datetime(2024, 1, 1, tzinfo=timezone.utc),
                      datetime(2024, 1, 15, tzinfo=timezone.utc))
    store.materialize("tt", datetime(2024, 1, 15, tzinfo=timezone.utc),
                      datetime(2024, 3, 1, tzinfo=timezone.utc))
    snaps = store.list_snapshots("tt")
    assert snaps == ["snap-00000", "snap-00001"]
    # VERSION AS OF: the first snapshot still reads the old value
    assert store.read_snapshot("tt", "snap-00000").toPandas().v.tolist() == [1.0]
    assert store.read_snapshot("tt").toPandas().v.tolist() == [2.0]
    with pytest.raises(ValueError, match="unknown snapshot"):
        store.read_snapshot("tt", "snap-99999")


def test_span_dedup_plan_two_exchanges_with_group_limit(spark):
    import __spark_entry__ as e

    df = e.q_span_dedup(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # first-occurrence rank window prunes map-side before the shuffle
    assert "WindowGroupLimit" in plan
    # exactly the two semantic regroups: by span, then by doc
    assert plan.count("Exchange") == 2
    assert "CartesianProduct" not in plan


def test_dsir_plan_broadcasts_and_never_joins_corpus_wide(spark):
    import __spark_entry__ as e

    df = e.q_dsir_weights(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the fixed-size bucket-score table comes back as a broadcast; the
    # zero-fill is a union, so no sort-merge join of corpus-sized sides
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_contamination_plan_broadcasts_both_small_sides(spark):
    import __spark_entry__ as e

    df = e.q_contamination_check(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # benchmark grams AND the hit set are broadcast — the corpus side is
    # never shuffled for a join
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_semantic_dedup_plan_single_cluster_shuffle(spark):
    import __spark_entry__ as e

    df = e.q_semantic_dedup(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # map-side centroid assignment; the only exchange keys on the cluster
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan


def test_pack_documents_prefix_sum_stays_distributed(spark):
    import __spark_entry__ as e

    df = e.q_doc_packing(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the corpus-wide running sum is a window PARTITIONED by the bucket;
    # the only unpartitioned window runs over the tiny bucket-totals
    # table, and its offsets come back as a broadcast
    assert "windowspecdefinition(__b" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_prefix_jaccard_plan_no_cartesian_equijoin_on_hash(spark):
    from feast_spark.operators.dedup import (
        prefix_jaccard_pairs,
        release_dedup_caches,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(prefix_jaccard_pairs(docs, "doc_id", "text", n=3,
                                        threshold=0.4))
    release_dedup_caches()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the candidate self-join keys on the 8-byte gram hash (equi-join)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )


def test_classifier_feature_plan_shape(spark):
    from pyspark.sql import functions as F

    from feast_spark.operators.classifier import hashed_bigram_features

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    feats = hashed_bigram_features(
        docs, F.col("source") == "src1", n_buckets=256, method="xxhash64"
    )
    plan = plan_of(feats, mode="simple")
    # exactly the two declared build shuffles: (doc,bucket) counts then
    # per-doc array compaction — and no join at all
    assert plan.count("Exchange") == 2, plan
    assert "Join" not in plan
    # column pruning: the text pass must not read unused columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "lang" not in read_schema and "n_chars" not in read_schema


def test_label_resolve_recency_plan_no_sorts_or_cartesian(spark):
    import __spark_entry__ as e

    plan = plan_of(e.q_label_resolve_recency(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the reference semantics are hash aggregations + key joins — a
    # window sort over the raw label stream would be the wrong shape
    assert "Window" not in plan


def test_diverse_sample_plan_single_cluster_shuffle(spark):
    import __spark_entry__ as e

    df = e.q_diverse_sample(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # map-side centroid assignment (closure), one exchange on cluster
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan


def test_dsir_frozen_table_plan_broadcasts_table(spark):
    from pyspark.sql import functions as F

    from feast_spark.operators.selection import (
        dsir_bucket_table,
        dsir_score_with_table,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    table = dsir_bucket_table(docs, F.col("source") == "src1")
    plan = (
        dsir_score_with_table(docs, table)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # frozen calibration joins back as a broadcast; the gram stream is
    # never the build side of a wide join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pack_token_sequences_single_wide_exchange(spark):
    from feast_spark.operators.selection import pack_token_sequences

    enc = (
        spark.range(0, 200)
        .selectExpr(
            "id AS doc_id",
            "transform(sequence(0, CAST(id % 37 AS INT)), x -> CAST(x AS INT))"
            " AS token_ids",
        )
    )
    df = pack_token_sequences(enc, seq_len=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exchanges: tiny bucket totals agg (partial+final around 1 exchange),
    # the bucket window, and the one wide seq_id regroup — the token
    # stream itself crosses hashpartitioning(seq_id) exactly once
    assert plan.count("Exchange hashpartitioning(seq_id") == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # offsets come back broadcast, not joined wide
    assert "BroadcastHashJoin" in plan
