"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship transcript quality pipeline;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (+ the training-data operators); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query. Column names/alias
discipline: every computed column is aliased identically on both sides.

Float-valued aggregates are rounded on BOTH sides (sum/avg are not
associative in fp arithmetic; rounding removes engine-order noise while
still failing on real logic differences).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# sf dir the ORACLE side materializes derived relations for (the driver
# compares at sf0.01; the local pytest harness overrides this)
def _oracle_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# memo: the minhash LSH pair table shared by q_doc_minhash_pairs and
# q_dup_clusters (identical params + input). Pairs are localCheckpointed
# (lineage cut, independent of the dedup cache registry), so dup_clusters
# reuses the materialized pair table instead of re-running the whole
# minhash pipeline (round-2 VERDICT Next #1). Keyed by (applicationId, sf)
# so a stopped/new SparkContext never sees another context's checkpoints;
# clear_query_memo() resets it — the bench calls it between passes so each
# recorded pass pays the full minhash cost exactly once.
_PAIRS_MEMO: dict[tuple[str, str], DataFrame] = {}


def clear_query_memo() -> None:
    # release the memoized frames' blocks — clearing only the dict leaves
    # them pinned in executor memory until JVM GC, which inflates later
    # bench sections (ADVICE r3). DataFrame.unpersist() frees plain
    # persisted frames but is a NO-OP for localCheckpoint() results (the
    # blocks belong to the internal checkpoint RDD inside the LogicalRDD
    # plan node, not to a CacheManager entry) — unpersist that RDD
    # directly (verified: RDDStorageInfo drops to empty).
    for df in _PAIRS_MEMO.values():
        try:
            df.unpersist(blocking=False)
            node = df._jdf.queryExecution().analyzed()
            if node.getClass().getSimpleName() == "LogicalRDD":
                node.rdd().unpersist(False)
        except Exception:
            pass  # context already stopped
    _PAIRS_MEMO.clear()


def _minhash_pairs_shared(spark: SparkSession, sf: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf)
    got = _PAIRS_MEMO.get(key)
    if got is None:
        from feast_spark.operators.dedup import (
            minhash_lsh_pairs,
            release_dedup_caches,
        )

        release_dedup_caches()
        d = _t(spark, sf, "documents")
        pairs = minhash_lsh_pairs(
            d, "doc_id", "text", num_hashes=32, bands=8, jaccard_threshold=0.5
        )
        got = pairs.localCheckpoint()  # eager: materializes the pair table
        release_dedup_caches()  # sig/candidate caches no longer needed
        _PAIRS_MEMO[key] = got
    return got


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcript quality-filter pipeline on synthetic transcripts
    at sf0.001-ish scale (+ a sanity read of the provided tables)."""
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.quality import QualityConfig, run_quality_pipeline

    # touch the driver-provided data to prove the reader path
    _ = _t(spark, "/root/testdata/sf0.001", "lineitem").count()

    transcripts = transcripts_spark(spark, 150, seed=42, mega_every=75, mega_turns=300)
    res = run_quality_pipeline(
        spark,
        transcripts,
        QualityConfig(),
        run_id="entry",
        decision_ts=datetime(2026, 1, 1, tzinfo=timezone.utc),
    )
    return res.labels.orderBy("conv_id", "turn_idx")


# ---------------------------------------------------------------------------
# queries — §2.1/§2.2 scans & filters
# ---------------------------------------------------------------------------


def q_pull_all_window(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.operators import pull_all

    ev = _t(spark, sf, "events")
    return pull_all(
        ev, ["user_id"], ["value"], "ts",
        start="2024-01-10 00:00:00", end="2024-01-20 00:00:00",
    )


def q_pull_latest_events(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.operators import pull_latest

    ev = _t(spark, sf, "events")
    out = pull_latest(
        ev, ["user_id"], ["event_type", "value"], "ts", tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


def q_field_mapping_scan(spark: SparkSession, sf: str) -> DataFrame:
    # DataSource field_mapping rename + projection (data_source.py:179-266)
    ev = _t(spark, sf, "events").withColumnsRenamed(
        {"ts": "event_timestamp", "value": "amount"}
    )
    return ev.select("event_id", "event_timestamp", "amount").filter(
        F.col("amount") > 150
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


def q_pit_last_click(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.operators import point_in_time_join

    ev = _t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = point_in_time_join(
        purchases, clicks, ["user_id"],
        feature_ts_col="ts", entity_ts_col="ts",
    )
    return out.select("user_id", "ts", F.col("value").alias("last_click_value"))


def q_pit_ttl_1h(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.operators import point_in_time_join

    ev = _t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = point_in_time_join(
        purchases, clicks, ["user_id"],
        feature_ts_col="ts", entity_ts_col="ts", ttl_seconds=3600,
    )
    return out.select("user_id", "ts", F.col("value").alias("last_click_value"))


def q_odfv_post_agg(spark: SparkSession, sf: str) -> DataFrame:
    # post-retrieval aggregation (utils._apply_aggregations_to_response,
    # utils.py:671-726): the PIT response re-grouped per entity with the
    # view's aggregation specs — the last pytest-only relational operator
    # from round 2 (coverage row #35), now oracle-checked
    from feast_spark.operators import point_in_time_join
    from feast_spark.operators.aggregate import (
        Aggregation,
        apply_aggregations_to_response,
    )

    ev = _t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    resp = point_in_time_join(
        purchases, clicks, ["user_id"],
        feature_ts_col="ts", entity_ts_col="ts",
    ).select("user_id", "ts", F.col("value").alias("last_click_value"))
    agg = apply_aggregations_to_response(
        resp,
        [
            Aggregation("last_click_value", "avg"),
            Aggregation("last_click_value", "count"),
            Aggregation("last_click_value", "max"),
        ],
        group_keys=["user_id"],
    )
    return agg.select(
        "user_id",
        F.round("avg_last_click_value", 6).alias("avg_last_click"),
        F.col("count_last_click_value").alias("n_last_click"),
        F.col("max_last_click_value").alias("max_last_click"),
    )


def q_label_majority_vote(spark: SparkSession, sf: str) -> DataFrame:
    # store-level LabelView with majority-vote conflict policy
    # (labeling/label_view.py:28, conflict_resolver.py:19-102)
    import uuid as _uuid

    from feast_spark.core import Entity, FeatureStore, ParquetSource
    from feast_spark.operators.labels import LabelView

    repo = f"/tmp/feast_spark_label_q/repo_{_uuid.uuid4().hex}"
    store = FeatureStore(spark, repo)
    lv = LabelView(
        name="user_modal_event",
        entities=[Entity("user", "user_id")],
        source=ParquetSource(path=f"{sf}/events.parquet", timestamp_field="ts"),
        label_col="event_type",
        conflict_policy="majority_vote",
    )
    store.apply([lv])
    out = store.get_labels("user_modal_event")
    # the plan reads events.parquet directly; the throwaway registry dir
    # is not needed at execution time — don't leak one per invocation
    import shutil as _shutil

    _shutil.rmtree(repo, ignore_errors=True)
    return out


def q_pit_entityless(spark: SparkSession, sf: str) -> DataFrame:
    # non-entity mode / DUMMY_ENTITY (dask.py:298-302): zero join keys —
    # each purchase gets the globally-latest click value as-of its ts
    from feast_spark.operators import point_in_time_join

    ev = _t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "ts", "value", "event_id"
    )
    out = point_in_time_join(
        purchases, clicks, [],
        feature_ts_col="ts", entity_ts_col="ts",
        features=["value", "event_id"], tiebreak_cols=["event_id"],
    )
    return out.select("user_id", "ts", F.col("value").alias("global_last_click"))


def q_two_role_join(spark: SparkSession, sf: str) -> DataFrame:
    # self-join w/ key remap: one dim table (nation) under two roles
    # (feature_view.py:447-480 with_join_key_map)
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    supp_n = n.select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("supp_nation")
    )
    cust_n = n.select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(supp_n), "s_nationkey")
        .join(F.broadcast(cust_n), "c_nationkey")
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_entity_union(spark: SparkSession, sf: str) -> DataFrame:
    # non-entity-mode UNION DISTINCT of per-view entity projections,
    # CAST STRING aligned (spark.py:1336-1397)
    ev = _t(spark, sf, "events").filter(
        F.col("ts").between("2024-01-01 00:00:00", "2024-01-15 00:00:00")
    )
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1996-12-31")
    )
    a = ev.select(F.col("user_id").cast("string").alias("entity_key"))
    b = o.select(F.col("o_custkey").cast("string").alias("entity_key"))
    return a.unionByName(b).distinct()


def q_cross_join_share(spark: SparkSession, sf: str) -> DataFrame:
    # entity-less view -> DUMMY_ENTITY cross join (dask.py:1098-1116)
    ev = _t(spark, sf, "events")
    per_type = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    total = ev.agg(F.count(F.lit(1)).alias("total"))
    return per_type.crossJoin(F.broadcast(total)).select(
        "event_type", "cnt", F.round(F.col("cnt") / F.col("total"), 6).alias("share")
    )


# ---------------------------------------------------------------------------
# §2.4/§2.5 aggregations & windows
# ---------------------------------------------------------------------------


def q_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_agg_spec(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.operators import Aggregation, apply_aggregations

    ev = _t(spark, sf, "events")
    out = apply_aggregations(
        ev,
        ["event_type"],
        [
            Aggregation("value", "sum"),
            Aggregation("value", "max"),
            Aggregation("value", "min"),
            Aggregation("value", "count"),
            Aggregation("value", "avg"),
            Aggregation("user_id", "count_distinct"),
        ],
    )
    return out.select(
        "event_type",
        F.round("sum_value", 2).alias("sum_value"),
        "max_value", "min_value", "count_value",
        F.round("avg_value", 6).alias("avg_value"),
        "count_distinct_user_id",
    )


def q_hourly_window_agg(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.operators import Aggregation, apply_aggregations

    ev = _t(spark, sf, "events")
    out = apply_aggregations(
        ev,
        ["event_type"],
        [Aggregation("value", "sum", 3600), Aggregation("value", "count", 3600)],
        ts_col="ts",
    )
    return out.select(
        "event_type",
        "window_start",
        F.round("sum_value_3600s", 2).alias("hour_sum"),
        F.col("count_value_3600s").alias("hour_cnt"),
    )


def q_sliding_window_agg(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def q_stream_window_parity(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming-vs-batch parity (round-2 VERDICT Next #2): materialize a
    declarative StreamFeatureView (hourly sum/count over events, driven
    micro-batch by micro-batch through Spark's stateful windowed agg +
    snapshot upsert) and return the final snapshot — the DuckDB oracle is
    the plain batch hourly aggregation, so the hash match IS the
    stream==batch proof."""
    import uuid as _uuid

    from feast_spark.core import Entity, FeatureStore
    from feast_spark.operators import Aggregation
    from feast_spark.streaming.views import StreamFeatureView, StreamSource

    base = f"/tmp/feast_spark_stream_q/{os.path.basename(sf.rstrip('/'))}"
    src = f"{base}/events_src"
    if not os.path.exists(f"{src}/_SUCCESS"):
        # multi-file copy so maxFilesPerTrigger yields several micro-batches
        _t(spark, sf, "events").repartition(8).write.mode("overwrite").parquet(src)
    repo = f"{base}/repo_{_uuid.uuid4().hex}"
    store = FeatureStore(spark, repo)
    sv = StreamFeatureView(
        name="ev_hourly",
        entities=[Entity("event_type")],
        source=StreamSource(
            path=src,
            schema=(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"
            ),
            timestamp_field="ts",
            max_files_per_trigger=2,
        ),
        aggregations=[
            Aggregation("value", "sum", 3600),
            Aggregation("value", "count", 3600),
        ],
        watermark="3650 days",  # bounded test corpus: drop nothing as late
    )
    store.apply([sv])
    q = store.materialize_stream("ev_hourly", f"{repo}/ckpt")
    q.processAllAvailable()
    q.stop()
    return store.read_snapshot("ev_hourly").select(
        "event_type",
        "window_start",
        F.round("sum_value_3600s", 2).alias("hour_sum"),
        F.col("count_value_3600s").alias("hour_cnt"),
    )


def q_numeric_stats(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.operators import numeric_stats

    ev = _t(spark, sf, "events")
    out = numeric_stats(ev, "value")
    return out.select(
        "cnt",
        F.round("avg_val", 4).alias("avg_val"),
        F.round("stddev_val", 4).alias("stddev_val"),
        F.round("min_val", 4).alias("min_val"),
        F.round("max_val", 4).alias("max_val"),
        F.round("p50", 4).alias("p50"),
        F.round("p90", 4).alias("p90"),
        F.round("p95", 4).alias("p95"),
        F.round("p99", 4).alias("p99"),
    )


def q_histogram(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.operators.aggregate import histogram

    ev = _t(spark, sf, "events")
    return histogram(ev, "value", bins=10)


def q_top_event_types(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.operators import categorical_stats

    ev = _t(spark, sf, "events")
    return categorical_stats(ev, "event_type", top_n=3)


def q_latest_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.operators.dedup import exact_dedup

    ev = _t(spark, sf, "events")
    return exact_dedup(ev.select("user_id", "event_type"))


# ---------------------------------------------------------------------------
# §2.8 scalar functions
# ---------------------------------------------------------------------------


def q_row_id_synthesis(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.functions import row_id

    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey", row_id(["o_custkey", "o_orderkey"]).alias("entity_row_id")
    ).filter(F.col("o_orderkey") < 100)


def q_interval_arithmetic(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts_plus_1h"),
        (F.col("ts") - F.expr("INTERVAL 90 SECONDS")).alias("ts_minus_90s"),
        F.floor("value").cast("long").alias("value_floor"),
    ).filter(F.col("event_id") < 1000)


def q_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    # JSON validity/extraction (spark/nodes.py:693-724 validation analogue)
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    ).filter(F.col("event_id") < 1000)


# ---------------------------------------------------------------------------
# training-data operators: documents / embeddings
# ---------------------------------------------------------------------------


def q_doc_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.functions import digit_count, symbol_count, token_count

    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("token_cnt"),
        digit_count("text").alias("digit_cnt"),
        symbol_count("text").alias("symbol_cnt"),
        F.length("text").alias("char_cnt"),
    )


def q_doc_bpe_tokens(spark: SparkSession, sf: str) -> DataFrame:
    # BPE-ish pre-tokenizer counting (lookahead-free GPT-2-style split,
    # identical under Java regex and RE2)
    from feast_spark.functions import bpe_token_count, token_count

    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        bpe_token_count("text").alias("bpe_tokens"),
        token_count("text").alias("ws_tokens"),
    )


def q_doc_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        d.groupBy(norm.alias("norm_text"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
    )


def q_doc_bigram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf, "documents")
    out = ngram_jaccard_pairs(d, "doc_id", "text", n=2, threshold=0.05)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r"))


def q_doc_minhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return _minhash_pairs_shared(spark, sf)


def q_minhash_profile(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 7: similarity profile / retention curve of the
    # banded candidate table — sizes the verify stage and the expected
    # dup mass for EVERY threshold in one job, before committing to a
    # full dedup pass. The oracle replays only the per-pair candidate
    # estimates (numpy twin of the signature math); the histogram +
    # cumulative window is GENUINE SQL.
    from feast_spark.operators.dedup import (
        minhash_est_histogram,
        release_dedup_caches,
    )

    # result is <= num_hashes+1 rows: materialize eagerly, release the
    # scope-persisted signature relation here (the q_bm25_topk lesson)
    out = minhash_est_histogram(
        _t(spark, sf, "documents"), "doc_id", "text"
    ).localCheckpoint()
    release_dedup_caches()
    return out


def q_neardup_verify(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 5: edit-similarity confirmation of the shared
    # MinHash candidate pairs (Lee et al. 2022's verify step). The
    # oracle is GENUINE SQL: DuckDB re-derives levenshtein + the integer
    # similarity itself over the replayed pair table — only the LSH
    # candidates come from the naive replay.
    from feast_spark.operators.dedup import neardup_verify

    pairs = _minhash_pairs_shared(spark, sf)
    d = _t(spark, sf, "documents")
    return neardup_verify(pairs, d, "doc_id", "text", threshold=0.5)


def q_doc_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    # t=4: 5 pigeonhole blocks of ~13 bits — exact, and the block buckets
    # stay sparse (t=8 would mean 7-bit blocks whose dense buckets explode
    # the candidate join quadratically; simhash's useful radius on 64 bits
    # is 3-4 anyway, Charikar '02 / Manku '07)
    from feast_spark.operators.dedup import release_dedup_caches, simhash_dup_pairs

    release_dedup_caches()  # previous dedup pass was consumed by now
    d = _t(spark, sf, "documents")
    return simhash_dup_pairs(d, "doc_id", "text", hamming_threshold=4)


def q_doc_winnow_pairs(spark: SparkSession, sf: str) -> DataFrame:
    # winnowing fingerprints (Schleimer et al. SIGMOD'03): partial-overlap
    # pairs via shared window-min k-gram hashes; boilerplate fingerprints
    # (doc frequency > 50) dropped before the self-join
    from feast_spark.operators.dedup import winnow_overlap_pairs

    d = _t(spark, sf, "documents")
    return winnow_overlap_pairs(
        d, "doc_id", "text", k=5, window=4, min_shared=2, max_fingerprint_df=50
    )


def q_doc_quality_scores(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.pipeline.quality import QualityConfig, score_transcripts

    d = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    # single-file table -> one partition -> the scoring pass would run on
    # one core; widen to the session's parallelism first
    d = d.repartition(spark.sparkContext.defaultParallelism)
    out = score_transcripts(d, QualityConfig())
    # ppl is emitted RAW: the oracle is the same numpy kernel run on the
    # driver (oracles.quality_scores_pdf), so doubles match bit-for-bit
    return out.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        "lang",
        F.col("perplexity").alias("ppl"),
        F.col("keep_turn").alias("keep"),
        F.col("drop_reason_turn").alias("drop_reason"),
    )


def q_ann_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = cosine_topk(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 4).alias("cosine_r")
    )


def q_ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.operators.similarity import lsh_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, queries, k=5, dim=64, num_bits=8)


def q_ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    # IVF coarse-quantizer ANN (second family next to hyperplane LSH)
    from feast_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, queries, k=5, n_clusters=32, n_probe=4)


def q_session_window_agg(spark: SparkSession, sf: str) -> DataFrame:
    # session windows (reference gap: SURVEY §2.10 "not implemented";
    # native in Spark). 30-min inactivity gap per user.
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events", "session_value",
        )
    )


def q_pivot_event_types(spark: SparkSession, sf: str) -> DataFrame:
    # pivot (§2.6/guide): per-user counts by event type as columns
    ev = _t(spark, sf, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "error"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        F.coalesce("click", F.lit(0)).alias("n_click"),
        F.coalesce("purchase", F.lit(0)).alias("n_purchase"),
        F.coalesce("error", F.lit(0)).alias("n_error"),
    )


def q_semi_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    # §2.3 semi/anti joins ("available for free in Spark"): customers with
    # orders but no high-value order
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    has_order = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    big = o.filter(F.col("o_totalprice") > 300000)
    return has_order.join(
        big, has_order.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def q_intersect_except(spark: SparkSession, sf: str) -> DataFrame:
    # §2.7 INTERSECT/EXCEPT: (user, day) pairs with clicks but no errors
    ev = _t(spark, sf, "events")
    clicks = (
        ev.filter("event_type = 'click'")
        .select("user_id", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .distinct()
    )
    errors = (
        ev.filter("event_type = 'error'")
        .select("user_id", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .distinct()
    )
    return clicks.subtract(errors)


def q_rollup_orders(spark: SparkSession, sf: str) -> DataFrame:
    # §2.4 rollup ("free in Spark"): order counts by (status, priority)
    # with subtotals
    o = _t(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


def q_cube_events(spark: SparkSession, sf: str) -> DataFrame:
    # §2.4 cube (reference gap, free in Spark): counts/sums over all
    # (event_type, user_id % 10) combinations incl. subtotals
    ev = _t(spark, sf, "events").withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("long")
    )
    return ev.cube("event_type", "user_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def q_pit_created_cutoff(spark: SparkSession, sf: str) -> DataFrame:
    # created-timestamp cutoff: blank features created after entity ts,
    # keep the row (offline_store.py:454-462, dask.py:1203-1226).
    # Deterministic created column: click created = ts + (event_id % 3) hours
    from feast_spark.operators import point_in_time_join

    ev = _t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value",
        (F.col("ts") + F.make_interval(hours=F.col("event_id") % 3)).alias("created"),
    )
    out = point_in_time_join(
        purchases, clicks, ["user_id"],
        feature_ts_col="ts", entity_ts_col="ts",
        created_ts_col="created", created_cutoff=True,
    )
    return out.select("user_id", "ts", F.col("value").alias("last_click_value"))


def q_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    # embedding-cosine near-dup pairs (brute force; LSH path is
    # ann_lsh_topk). Low threshold so pairs exist on random test vectors.
    from feast_spark.operators.similarity import _dot_expr, _norm_expr

    emb = _t(spark, sf, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    ).filter(F.col("id") < 200)
    a = emb.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = emb.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sims = pairs.withColumn(
        "cosine",
        F.expr(_dot_expr("va", "vb"))
        / (F.expr(_norm_expr("va")) * F.expr(_norm_expr("vb"))),
    )
    return sims.filter(F.col("cosine") > 0.35).select(
        "id_a", "id_b", F.round("cosine", 4).alias("cosine_r")
    )


def q_doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    # document fingerprint of whitespace-normalized lowercase text. The
    # md5 method is the portable/verifiable form (DuckDB recomputes it
    # 1:1); the xxhash64 method (default) is the 8-byte scale path.
    from feast_spark.functions import doc_fingerprint

    d = _t(spark, sf, "documents")
    return d.select("doc_id", doc_fingerprint("text", method="md5").alias("fingerprint"))


def q_image_metadata(spark: SparkSession, sf: str) -> DataFrame:
    # multimodal: binary image column -> typed metadata (stub codec;
    # rows-only). Payloads derived deterministically from doc_id.
    from feast_spark.functions.multimodal import image_metadata

    d = _t(spark, sf, "documents").select("doc_id").filter(F.col("doc_id") < 200)

    def make(batches):
        from feast_spark.functions.multimodal import encode_fake_image
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "img_id": pdf["doc_id"],
                    "data": [
                        encode_fake_image(64 + int(i) % 128, 48 + int(i) % 64, int(i))
                        for i in pdf["doc_id"]
                    ],
                }
            )

    imgs = d.mapInPandas(make, "img_id long, data binary")
    return image_metadata(imgs, "data", "img_id")


def q_dup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    # transitive near-dup clustering: minhash LSH pairs -> connected
    # components (large-star/small-star); cluster_id = min doc_id reachable.
    # The pair table is shared with q_doc_minhash_pairs (memoized,
    # checkpointed) — identical params, so recomputing the whole minhash
    # pipeline here would only re-measure the other query.
    from feast_spark.operators.dedup import connected_components

    pairs = _minhash_pairs_shared(spark, sf)
    comp = connected_components(pairs)
    return comp.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def q_embedding_neardup_lsh(spark: SparkSession, sf: str) -> DataFrame:
    # package-level LSH-bucketed embedding near-dup (the scale path; the
    # brute-force embedding_neardup query is the capped exact baseline)
    from feast_spark.operators.similarity import embedding_neardup_pairs

    emb = _t(spark, sf, "embeddings")
    return embedding_neardup_pairs(
        emb, "vec_id", "embedding", dim=64,
        cosine_threshold=0.2, num_bits=6, seed=7,
    )


def q_historical_two_views(spark: SparkSession, sf: str) -> DataFrame:
    # FeatureStore.get_historical_features with TWO views accumulated
    # left-to-right (dask.py:212-349 driver loop) through the facade
    import tempfile

    from feast_spark.core import Entity, FeatureStore, FeatureView, Field
    from feast_spark.core.model import SparkSqlSource

    _t(spark, sf, "events").createOrReplaceTempView("__events_src")
    store = FeatureStore(spark, tempfile.mkdtemp(prefix="fs_hist_"))
    user = Entity("user", "user_id")
    clicks = FeatureView(
        "clicks",
        [user],
        SparkSqlSource(
            "SELECT user_id, ts, value AS click_value FROM __events_src "
            "WHERE event_type = 'click'",
            timestamp_field="ts",
        ),
        schema=[Field("user_id", "int64"), Field("click_value", "float64")],
    )
    views = FeatureView(
        "views",
        [user],
        SparkSqlSource(
            "SELECT user_id, ts, value AS view_value FROM __events_src "
            "WHERE event_type = 'view'",
            timestamp_field="ts",
        ),
        schema=[Field("user_id", "int64"), Field("view_value", "float64")],
    )
    store.apply([clicks, views])
    entity_df = (
        _t(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("event_timestamp"))
    )
    return store.get_historical_features(
        entity_df, ["clicks:click_value", "views:view_value"]
    )


def q_derived_view_historical(spark: SparkSession, sf: str) -> DataFrame:
    # derived FeatureView (source_views DAG): hourly click aggregates view
    # derived from a raw clicks view, PIT-joined as-of purchase times
    # through the store facade (feature_view.py:148,232-239,
    # feature_resolver.py:28-95)
    import tempfile

    from feast_spark.core import (
        BatchFeatureView, Entity, FeatureStore, FeatureView, Field,
    )
    from feast_spark.core.model import SparkSqlSource

    _t(spark, sf, "events").createOrReplaceTempView("__events_dv")
    store = FeatureStore(spark, tempfile.mkdtemp(prefix="fs_dv_"))
    user = Entity("user", "user_id")
    base = FeatureView(
        "clicks_raw",
        [user],
        SparkSqlSource(
            "SELECT user_id, ts, value FROM __events_dv WHERE event_type = 'click'",
            timestamp_field="ts",
        ),
        schema=[Field("user_id", "int64"), Field("value", "float64")],
    )

    def hourly(df: DataFrame) -> DataFrame:
        # feature ts = window END: the aggregate only becomes known when
        # the hour closes (leak-free as-of semantics)
        return (
            df.groupBy("user_id", F.window("ts", "1 hour").alias("w"))
            .agg(
                F.round(F.sum("value"), 2).alias("hour_click_value"),
                F.count(F.lit(1)).alias("hour_click_cnt"),
            )
            .select("user_id", F.col("w.end").alias("ts"),
                    "hour_click_value", "hour_click_cnt")
        )

    derived = BatchFeatureView(
        "clicks_hourly",
        [user],
        source_views=[base],
        udf=hourly,
        mode="spark",
        schema=[
            Field("user_id", "int64"),
            Field("hour_click_value", "double"),
            Field("hour_click_cnt", "long"),
        ],
    )
    store.apply([base, derived])
    entity = (
        _t(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("event_timestamp"))
    )
    return store.get_historical_features(
        entity, ["clicks_hourly:hour_click_value", "clicks_hourly:hour_click_cnt"]
    )


def q_odfv_request_scale(spark: SparkSession, sf: str) -> DataFrame:
    # RequestSource + python-mode ODFV: request-time 'scale' column
    # multiplies the PIT-joined click value (data_source.py:591,
    # on_demand_feature_view.py:1101-1134, validation
    # feature_store.py:2057-2068)
    import tempfile

    from feast_spark.core import (
        Entity, FeatureStore, FeatureView, Field, OnDemandFeatureView,
        RequestSource,
    )
    from feast_spark.core.model import SparkSqlSource

    _t(spark, sf, "events").createOrReplaceTempView("__events_rq")
    store = FeatureStore(spark, tempfile.mkdtemp(prefix="fs_rq_"))
    user = Entity("user", "user_id")
    clicks = FeatureView(
        "clicks_rq",
        [user],
        SparkSqlSource(
            "SELECT user_id, ts, value AS click_value FROM __events_rq "
            "WHERE event_type = 'click'",
            timestamp_field="ts",
        ),
        schema=[Field("user_id", "int64"), Field("click_value", "float64")],
    )
    req = RequestSource("req", (Field("scale", "double"),))

    def scale_udf(cols: dict) -> dict:
        cols["scaled_click"] = cols["click_value"] * cols["scale"]
        return cols

    odfv = OnDemandFeatureView(
        "scaled",
        scale_udf,
        schema=[Field("scaled_click", "double")],
        mode="python",
        sources=[req, clicks],
    )
    store.apply([clicks, odfv])
    entity = (
        _t(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("event_timestamp"),
            (F.col("event_id") % 5).cast("double").alias("scale"),
        )
    )
    return store.get_historical_features(
        entity, ["clicks_rq:click_value", "scaled:scaled_click"]
    )


def q_dqm_profile(spark: SparkSession, sf: str) -> DataFrame:
    # DQM profile (ge_profiler.py:77-161 analogue): one aggregation pass ->
    # per-column expectations; emitted as rows so DuckDB can recompute the
    # exact same stats
    from feast_spark.operators.profile import profile_dataset

    ev = _t(spark, sf, "events")
    prof = profile_dataset(ev, ["value", "user_id"])
    rows = [
        (
            c.name,
            round(c.null_fraction, 6),
            round(c.min, 4),
            round(c.max, 4),
        )
        for c in prof.columns.values()
    ]
    return spark.createDataFrame(
        rows, "column string, null_fraction double, min_val double, max_val double"
    )


def q_transcript_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.quality import QualityConfig, run_quality_pipeline

    transcripts = transcripts_spark(spark, 100, seed=42, mega_every=50, mega_turns=200)
    res = run_quality_pipeline(
        spark, transcripts, QualityConfig(), run_id="q",
        decision_ts=datetime(2026, 1, 1, tzinfo=timezone.utc),
    )
    return res.labels


def q_transcript_pipeline_loop(spark: SparkSession, sf: str) -> DataFrame:
    # opt-in agent-loop rule: fixtures plant 3-5 verbatim re-emissions of
    # one turn in ~30% of conversations; later copies must drop as
    # 'agent_loop' (first occurrence + under-threshold repeats survive)
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.quality import QualityConfig, run_quality_pipeline

    transcripts = transcripts_spark(
        spark, 100, seed=42, mega_every=50, mega_turns=200, loop_prob=0.3
    )
    res = run_quality_pipeline(
        spark, transcripts, QualityConfig(loop_min_repeats=3), run_id="ql",
        decision_ts=datetime(2026, 1, 1, tzinfo=timezone.utc),
    )
    return res.labels


def _transcripts_fixture(spark: SparkSession):
    from feast_spark.fixtures import transcripts_spark

    return transcripts_spark(spark, 100, seed=42, mega_every=50, mega_turns=200)


def q_conv_structure(spark: SparkSession, sf: str) -> DataFrame:
    # per-conversation structural validation (role alternation, orphan
    # tool turns, tool-name consistency) — one conv_id shuffle total
    from feast_spark.operators.conversation import conversation_structure

    return conversation_structure(_transcripts_fixture(spark))


def q_conv_windows(spark: SparkSession, sf: str) -> DataFrame:
    # token-budgeted training-context assembly: maximal contiguous
    # preceding-turn suffix fitting a 64-token budget, via prefix sums +
    # a budget-bounded conv_id self-join
    from feast_spark.operators.conversation import conversation_windows

    return conversation_windows(_transcripts_fixture(spark), token_budget=64)


def q_conv_render(spark: SparkSession, sf: str) -> DataFrame:
    # conversation -> one training string with per-turn loss-mask offsets
    # (JVM-side aggregate() prefix scan; no UDF)
    from feast_spark.operators.conversation import render_conversations

    return render_conversations(_transcripts_fixture(spark))


def q_gopher_repetition(spark: SparkSession, sf: str) -> DataFrame:
    # full Gopher dup-line / top-ngram / dup-ngram + bullet/ellipsis
    # line-format family, map-only vectorized kernel; '. ' as the line
    # separator (testdata documents are single-line) so the line stats
    # are non-trivial, plus the shared DEMO_LINE_SUFFIX so bullet and
    # ellipsis fractions are non-zero
    from feast_spark.operators.repetition import (
        DEMO_LINE_SUFFIX,
        gopher_repetition,
    )

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.coalesce("text", F.lit("")), F.lit(DEMO_LINE_SUFFIX)
        ).alias("text"),
    )
    return gopher_repetition(docs, line_sep=". ")


def q_clean_lines(spark: SparkSession, sf: str) -> DataFrame:
    # C4 line-level cleaning (higher-order array lambdas, map-only).
    # Testdata docs are single-line, so line breaks are synthesized
    # deterministically: every literal ' join ' becomes '.\n' (left-to-
    # right non-overlapping literal replace — identical in DuckDB), which
    # yields multi-line docs where interior lines end in '.' and the last
    # line doesn't; 'window' as the blocklist phrase makes all three
    # predicates non-trivial on this vocabulary.
    from feast_spark.operators.lines import clean_lines

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.expr("replace(text, ' join ', concat('.', chr(10)))").alias(
            "text"
        ),
    )
    return clean_lines(docs, blocklist=("window",))


def q_conv_curate(spark: SparkSession, sf: str) -> DataFrame:
    # conversation-grain curation flagship (structure -> quality frac ->
    # near-dup -> sample) on the planted-clone corpus; the decisions
    # audit is the driver row. Oracle: full naive replay
    # (oracles.conv_curation_pdf — pandas structure flags, shared
    # score_turns kernel, naive LSH + union-find, md5 sampler).
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.conv_curation import curate_conversations

    t = transcripts_spark(spark, 80, seed=42, mega_every=40, mega_turns=150)
    idx = F.substring("conv_id", 2, 9).cast("int")
    clones = (
        t.filter(F.pmod(idx, F.lit(5)) == 0)
        .filter(F.pmod(F.col("turn_idx"), F.lit(11)) != 3)
        .withColumn("conv_id", F.concat("conv_id", F.lit("d")))
    )
    res = curate_conversations(
        spark, t.unionByName(clones), materialize=False
    )
    return res.decisions


def q_conv_pii(spark: SparkSession, sf: str) -> DataFrame:
    # conversation-grain PII/toxicity exposure (the fixture plants real
    # emails): scrub-order counters per turn, one conv_id hash agg
    from feast_spark.operators.conversation import conversation_pii

    return conversation_pii(_transcripts_fixture(spark))


def q_conv_pack(spark: SparkSession, sf: str) -> DataFrame:
    # the transcript last mile: conversations -> fixed-length BPE token
    # sequences with a per-token assistant loss mask (role-prefixed
    # rendering; mask rides the packer as id*2+m, split back map-side).
    # Oracle is the pure-python BPE/packing twin in oracles.conv_pack_pdf.
    from feast_spark.operators.bpe import train_bpe
    from feast_spark.operators.conversation import (
        _deduped,
        pack_conversations,
    )

    turns = _transcripts_fixture(spark)
    rendered = _deduped(turns).select(
        F.concat(
            "role", F.lit(": "), F.coalesce("text", F.lit(""))
        ).alias("text")
    )
    model = train_bpe(rendered, num_merges=8)
    seqs = pack_conversations(turns, model, seq_len=48)
    return seqs.select(
        "seq_id",
        F.array_join(
            F.transform("token_ids", lambda t: t.cast("string")), " "
        ).alias("ids_str"),
        F.array_join(
            F.transform("loss_mask", lambda t: t.cast("string")), " "
        ).alias("mask_str"),
        "n_tokens",
        "n_convs",
    )


def q_pii_stats(spark: SparkSession, sf: str) -> DataFrame:
    # per-doc PII/toxicity hit counters under the exact scrub order;
    # even doc_ids get the shared PII_DEMO_SUFFIX so counts are
    # non-trivial (odd docs pin the zero path)
    from feast_spark.rules import PII_DEMO_SUFFIX, pii_stats

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(2)) == 0,
            F.concat(F.coalesce("text", F.lit("")), F.lit(PII_DEMO_SUFFIX)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return pii_stats(docs)


def q_exact_k_sample(spark: SparkSession, sf: str) -> DataFrame:
    # exactly 40 docs per source, picked by md5(doc_id) order — the
    # fixed-size complement of stratified_sample; WindowGroupLimit keeps
    # the per-stratum shuffle bounded at k rows/map task
    from feast_spark.operators.selection import exact_k_sample

    return exact_k_sample(
        _t(spark, sf, "documents"),
        F.col("doc_id").cast("string"),
        40,
        stratum=F.col("source"),
    ).select("doc_id", "source", "sample_rank")


def q_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    # BM25 sparse retrieval top-10 for the DEFAULT_QUERIES term sets;
    # oracle is an independent Counter-loop replay sharing the driver-
    # side math.log idf and the quantized-contribution integer sum
    from feast_spark.operators.bm25 import bm25_topk
    from feast_spark.operators.dedup import release_dedup_caches

    # the result is tiny (n_queries x k rows): materialize it eagerly so
    # the scope-persisted tf relation inside bm25_topk can be released
    # HERE instead of living until some later release_dedup_caches()
    # call (it would otherwise hold executor memory for the whole app)
    out = bm25_topk(_t(spark, sf, "documents")).localCheckpoint()
    release_dedup_caches()
    return out


def q_paragraph_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # Dolma-style exact paragraph dedup, portable arm (window keyed on
    # the paragraph = what DuckDB replays; xxhash64 arm is parity-pinned
    # in pytest). Paragraph structure is synthesized deterministically:
    # every literal ' merge ' becomes a paragraph break and a shared
    # boilerplate footer paragraph is appended to EVERY doc — the
    # lowest-doc_id occurrence keeps it, every other doc drops it.
    from feast_spark.operators.selection import paragraph_dedup

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.expr(
            "concat(replace(text, ' merge ', concat(chr(10), chr(10))),"
            " chr(10), chr(10),"
            " 'every page shares this exact boilerplate footer paragraph')"
        ).alias("text"),
    )
    return paragraph_dedup(docs)


def q_lexical_stats(spark: SparkSession, sf: str) -> DataFrame:
    # lexical-diversity stats (TTR / hapax / entropy), map-only Arrow
    # kernel; oracle is an independent Counter-loop replay sharing only
    # the elementwise entropy quantization (integer 2^-40 units)
    from feast_spark.operators.lexical import lexical_stats

    return lexical_stats(_t(spark, sf, "documents"))


def q_text_normalize(spark: SparkSession, sf: str) -> DataFrame:
    # unicode NFC + whitespace-collapse normalization; combining marks
    # are injected so NFC does real work (testdata text is ASCII)
    from feast_spark.functions.text import normalize_text

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit("  cafe\u0301 \t A\u030Ax ")
        ).alias("text"),
    )
    out = normalize_text(docs, text_col="text")
    return out.select(
        "doc_id",
        F.col("text_norm"),
        F.length("text_norm").cast("long").alias("n_chars_norm"),
    )


def q_bpe_tokens(spark: SparkSession, sf: str) -> DataFrame:
    # corpus-trained BPE tokenizer (doc_id%5==0 training subset, 16
    # merges) -> per-doc token counts over the full table
    from pyspark.sql import functions as F

    from feast_spark.operators.bpe import bpe_token_counts, train_bpe

    docs = _t(spark, sf, "documents")
    model = train_bpe(
        docs.filter(F.pmod("doc_id", F.lit(5)) == 0), num_merges=16
    )
    return bpe_token_counts(docs, model)


def q_tokenize_pack(spark: SparkSession, sf: str) -> DataFrame:
    # last-mile tokenization: train BPE on the doc_id%5==0 subset (16
    # merges), encode the whole corpus to token ids, pack the corpus-wide
    # stream into fixed 64-token training sequences (docs cross
    # boundaries). ids emitted space-joined so both engines hash strings.
    from pyspark.sql import functions as F

    from feast_spark.operators.bpe import bpe_encode, train_bpe
    from feast_spark.operators.selection import pack_token_sequences

    docs = _t(spark, sf, "documents")
    model = train_bpe(
        docs.filter(F.pmod("doc_id", F.lit(5)) == 0), num_merges=16
    )
    seqs = pack_token_sequences(bpe_encode(docs, model), seq_len=64)
    return seqs.select(
        "seq_id",
        F.array_join(F.transform("token_ids", lambda t: t.cast("string")), " ").alias(
            "ids_str"
        ),
        "n_tokens",
        "n_docs",
    )


def q_conv_neardup(spark: SparkSession, sf: str) -> DataFrame:
    # conversation-level near-dup: every 5th fixture conversation is
    # cloned (conv_id||'d') minus its turn_idx%11==3 turns -> a planted
    # high-Jaccard whole-conversation copy the pair join must find
    from pyspark.sql import functions as F

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.dedup import conversation_neardup_pairs

    t = transcripts_spark(spark, 80, seed=42, mega_every=40, mega_turns=150)
    idx = F.substring("conv_id", 2, 9).cast("int")
    clones = (
        t.filter(F.pmod(idx, F.lit(5)) == 0)
        .filter(F.pmod(F.col("turn_idx"), F.lit(11)) != 3)
        .withColumn("conv_id", F.concat("conv_id", F.lit("d")))
    )
    return conversation_neardup_pairs(
        t.unionByName(clones), jaccard_threshold=0.5
    )


def q_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # C4-style corpus-wide span dedup: every distinct 10-word span keeps
    # its first (doc_id, span_idx) occurrence; later copies are cut and
    # the surviving text reconstructed per doc.
    from feast_spark.operators.selection import span_dedup

    return span_dedup(_t(spark, sf, "documents"), span_words=10)


def q_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # Lee-et-al ExactSubstr dedup: every repeated word sequence >= 8
    # words keeps its first corpus occurrence; later occurrences are cut
    # at token granularity (stride-1 grams, maximal covered regions).
    from feast_spark.operators.selection import substring_dedup

    return substring_dedup(_t(spark, sf, "documents"), k=8)


def q_contamination_check(spark: SparkSession, sf: str) -> DataFrame:
    # benchmark decontamination: 8-gram overlap vs a benchmark derived
    # deterministically from the corpus (every 41st doc's first 12 words
    # = one benchmark item), so contaminated docs provably exist.
    from feast_spark.operators.selection import contamination_check

    d = _t(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("bench_text")
    )
    return contamination_check(d, bench, n=8)


def q_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    # DSIR hashed-bigram importance weights; target domain = sources
    # src1/src2/src3. Integer micro-log-ratio scores (order-independent
    # sums -> engine-portable).
    from feast_spark.operators.selection import dsir_weights

    d = _t(spark, sf, "documents")
    return dsir_weights(d, F.col("source").isin("src1", "src2", "src3"))


def q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    # deterministic md5-bucket sampling for data mixing: even-numbered
    # sources keep ~70%, odd ~30%; re-runs select the same rows.
    from feast_spark.operators.selection import deterministic_sample

    d = _t(spark, sf, "documents")
    rate = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(0.7)
    ).otherwise(F.lit(0.3))
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source"))
    return deterministic_sample(d.select("doc_id", "source"), key, rate)


def q_top_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    # corpus-level boilerplate mining: 20 most frequent 5-grams.
    from feast_spark.operators.selection import top_ngrams

    return top_ngrams(_t(spark, sf, "documents"), n=5, k=20)


def q_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # SemDeDup: k-means clusters (shared IVF quantizer) + within-cluster
    # greedy cosine pruning. Threshold 0.4 so duplicates exist on the
    # near-random fixture vectors (cf. embedding_neardup's 0.35).
    from feast_spark.operators.similarity import semantic_dedup

    emb = _t(spark, sf, "embeddings")
    return semantic_dedup(emb, n_clusters=16, threshold=0.4)


def q_diverse_sample(spark: SparkSession, sf: str) -> DataFrame:
    # greedy k-center coreset selection per k-means cluster (shared
    # quantizer): picks ~10% of vectors maximizing embedding coverage.
    from feast_spark.operators.similarity import diverse_sample

    return diverse_sample(_t(spark, sf, "embeddings"), rate=0.1, n_clusters=16)


def q_doc_jaccard_prefix(spark: SparkSession, sf: str) -> DataFrame:
    # EXACT trigram-Jaccard join via PPJoin-style prefix filtering — the
    # scale path for what doc_bigram_jaccard computes quadratically; the
    # oracle is the brute-force all-pairs SQL.
    from feast_spark.operators.dedup import prefix_jaccard_pairs

    d = _t(spark, sf, "documents")
    out = prefix_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.4)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r"))


def q_doc_chunks(spark: SparkSession, sf: str) -> DataFrame:
    # context-window chunking: 60-word chunks, 10-word overlap (stride
    # 50). Map-only — zero shuffles.
    from feast_spark.operators.selection import chunk_documents

    return chunk_documents(_t(spark, sf, "documents"), chunk_words=60, overlap=10)


def q_doc_packing(spark: SparkSession, sf: str) -> DataFrame:
    # sequence packing via distributed two-phase prefix sum (bucket_docs
    # forced small so multiple buckets exercise the offset join even at
    # sf0.001); the oracle is the plain single-window SQL.
    from feast_spark.operators.selection import pack_documents

    return pack_documents(
        _t(spark, sf, "documents"), budget_words=1000, bucket_docs=64
    )


def q_doc_curation(spark: SparkSession, sf: str) -> DataFrame:
    # five-stage corpus curation flagship: span dedup -> quality ->
    # decontamination -> DSIR selection -> stratified sampling; returns
    # the per-doc audit table (first-failing stage wins).
    from feast_spark.pipeline.curation import run_curation

    d = _t(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("bench_text")
    )
    return run_curation(spark, d, bench).decisions


def q_doc_curation_clf(spark: SparkSession, sf: str) -> DataFrame:
    # classifier-arm curation (DCLM-style stage 4b): the five-stage chain
    # plus the hashed-bigram classifier trained on the DSIR survivors
    # (md5 portable arm so the naive int64 oracle replays it bit-exactly);
    # returns the audit table with margin_units + the classifier stage.
    # pytest-window query (the driver registry is at its 50-entry cap).
    from feast_spark.pipeline.curation import CurationConfig, run_curation

    d = _t(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("bench_text")
    )
    cfg = CurationConfig(use_classifier=True, clf_method="portable")
    return run_curation(spark, d, bench, cfg).decisions


def q_doc_curation_lm(spark: SparkSession, sf: str) -> DataFrame:
    # LM-arm curation (CCNet-style stage 2b): the staged chain plus the
    # stupid-backoff 5-gram LM trained on the target-source quality
    # survivors (portable md5 arm so the naive Counter/python oracle
    # replays it bit-exactly); drops the high-perplexity tail above the
    # 0.7 corpus quantile; audit table gains lm_ppl + the lm_ppl stage.
    from feast_spark.pipeline.curation import CurationConfig, run_curation

    d = _t(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("bench_text")
    )
    cfg = CurationConfig(use_lm=True, lm_method="portable")
    return run_curation(spark, d, bench, cfg).decisions


def q_langid_classifier(spark: SparkSession, sf: str) -> DataFrame:
    # fastText-lid-style multiclass classifier: hashed char-trigram
    # features + multinomial logistic regression trained distributed with
    # integer-exact determinism, labels = the lang column on even
    # doc_ids. The fixture's labels are not text-derived, so this row
    # verifies the TRAINING KERNEL against the naive per-doc python
    # replay bit-for-bit; planted-corpus accuracy lives in test_langid.py.
    from feast_spark.operators.langid import (
        char_ngram_features,
        predict_langid,
        train_langid,
    )

    d = _t(spark, sf, "documents").select("doc_id", "text", "lang")
    classes = sorted(r["lang"] for r in d.select("lang").distinct().collect())
    lab = F.when(
        F.col("doc_id") % 2 == 0,
        F.array_position(F.lit(classes), F.col("lang")) - 1,
    ).otherwise(F.lit(-1))
    feats = char_ngram_features(d, lab).persist()
    feats.count()  # materialization barrier
    model = train_langid(spark, feats, classes, n_iter=6)
    out = predict_langid(model, feats)
    feats.unpersist()
    return out


def q_lm_buckets(spark: SparkSession, sf: str) -> DataFrame:
    # CCNet head/middle/tail: per-source exact-tercile cuts over the
    # corpus-trained LM's perplexities (same model as lm_perplexity)
    from feast_spark.operators.lm import (
        lm_perplexity,
        perplexity_buckets,
        train_ngram_lm,
    )

    d = _t(spark, sf, "documents").select("doc_id", "text", "source")
    model = train_ngram_lm(
        d.where(F.col("source").isin("src1", "src2", "src3")),
        method="portable", order=5, n_buckets=1 << 20,
    )
    scored = lm_perplexity(d, model).join(
        d.select("doc_id", "source"), "doc_id"
    )
    return perplexity_buckets(scored, "source").select(
        "doc_id", "source", "ppl", "bucket"
    )


def q_lm_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    # corpus-trained stupid-backoff 5-gram LM (the north-star "hashed
    # 5-gram KenLM-style perplexity scorer"): train on the src1-3
    # in-domain slice, score every document — the CCNet shape. Portable
    # md5 arm so the naive Counter/python oracle replays it bit-exactly;
    # the xxhash64 scale arm is parity-pinned in tests/test_lm.py.
    from feast_spark.operators.lm import lm_perplexity, train_ngram_lm

    d = _t(spark, sf, "documents").select("doc_id", "text", "source")
    model = train_ngram_lm(
        d.where(F.col("source").isin("src1", "src2", "src3")),
        method="portable", order=5, n_buckets=1 << 20,
    )
    return lm_perplexity(d, model)


def q_source_cap(spark: SparkSession, sf: str) -> DataFrame:
    # RefinedWeb-style per-source frequency cap: at most 17 docs per
    # source, chosen by ascending md5(doc_id) — key-stable. At sf0.01
    # every source holds 25 docs (all over cap → window branch); at
    # sf0.001 sources sit under the cap (map-side anti-join branch).
    from feast_spark.operators.selection import source_cap

    d = _t(spark, sf, "documents").select("doc_id", "source")
    return source_cap(d, group_col="source", cap=17)


def q_quality_calibrate(spark: SparkSession, sf: str) -> DataFrame:
    # FineWeb-style threshold calibration: keep docs whose n_chars is at
    # or above the corpus-wide exact 30th percentile; the broadcast
    # threshold rides along so the oracle pins the interpolated value too.
    from feast_spark.operators.selection import quantile_filter

    d = _t(spark, sf, "documents").select("doc_id", "n_chars")
    return quantile_filter(d, F.col("n_chars"), 0.3, keep="upper")


def q_label_resolve_recency(spark: SparkSession, sf: str) -> DataFrame:
    # reference-fidelity majority vote (conflict_resolver.py:102-157):
    # every label column resolved INDEPENDENTLY, count ties broken by
    # recency (latest ts among rows holding a tied value), resolved row
    # stamped with the group-max timestamp. event_type exercises the
    # modal path (3 values, real majorities); value is near-unique so
    # nearly every group resolves through the recency tie-break.
    import uuid as _uuid

    from feast_spark.core import Entity, FeatureStore, ParquetSource
    from feast_spark.operators.labels import LabelView

    repo = f"/tmp/feast_spark_label_q/repo_{_uuid.uuid4().hex}"
    store = FeatureStore(spark, repo)
    lv = LabelView(
        name="user_labels_ref",
        entities=[Entity("user", "user_id")],
        source=ParquetSource(path=f"{sf}/events.parquet", timestamp_field="ts"),
        label_col=["event_type", "value"],
        conflict_policy="majority_vote",
        tie_break="recency",
    )
    store.apply([lv])
    out = store.get_labels("user_labels_ref")
    import shutil as _shutil

    _shutil.rmtree(repo, ignore_errors=True)  # see q_label_majority_vote
    return out


def q_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    # trained model-based quality filter (DCLM/FineWeb-style): hashed-
    # bigram logistic regression, distributed full-batch training with
    # integer-quantized gradients (order-independent => engine-portable);
    # the oracle replays the identical kernel in pure numpy. The portable
    # md5 arm is oracle-matched; the xxhash64 string-free arm is the
    # scale path (benched + pytest-verified separately).
    from feast_spark.operators.classifier import (
        hashed_bigram_features,
        score_with_classifier,
        train_quality_classifier,
    )

    d = _t(spark, sf, "documents")
    feats = hashed_bigram_features(
        d, F.col("source").isin("src1", "src2", "src3"),
        n_buckets=1024, method="portable",
    )
    model = train_quality_classifier(spark, feats, n_buckets=1024, n_iter=6)
    out = score_with_classifier(model, feats)
    # the persisted feature table is released with the rest of the query
    # layer's caches (clear_query_memo) once the result is consumed
    _PAIRS_MEMO[("clf_feats", spark.sparkContext.applicationId, sf)] = feats
    return out


def q_mixture_sample(spark: SparkSession, sf: str) -> DataFrame:
    # DoReMi-style domain-mixture sampling: counts per source (one tiny
    # hash agg) -> per-stratum keep rates toward the target mixture ->
    # map-only deterministic md5 sampling. pytest-window query (the
    # driver registry is at its 50-entry cap).
    from feast_spark.operators.selection import mixture_sample

    d = _t(spark, sf, "documents")
    return mixture_sample(
        d.select("doc_id", "source"),
        "source",
        {"src1": 0.5, "src2": 0.3, "src3": 0.2},
        target_rows=200,
        key=F.col("doc_id").cast("string"),
    )


def q_export_shards(spark: SparkSession, sf: str) -> DataFrame:
    # Training-shard export (pipeline/export.py): key-stable md5 shard
    # assignment -> one repartition(shard) exchange -> partitionBy write
    # -> manifest computed from the PUBLISHED files. The query returns
    # the manifest, so the oracle checks the whole write-read path.
    # pytest-window query (the driver registry is at its 50-entry cap).
    from feast_spark.pipeline.export import export_training_shards

    out = f"/tmp/feast_spark_export/{os.path.basename(sf.rstrip('/'))}"
    res = export_training_shards(
        spark,
        _t(spark, sf, "documents").select("doc_id", "text", "source"),
        F.col("doc_id").cast("string"),
        out,
        n_shards=8,
        salt="e0",
        overwrite=True,
    )
    return res.manifest.select(
        F.col("shard_id").cast("long").alias("shard_id"),
        F.col("n_docs").alias("n_docs"),
        F.col("n_tokens").alias("n_tokens"),
        F.col("fingerprint").alias("fingerprint"),
    ).orderBy("shard_id")


# ---------------------------------------------------------------------------
# merged queries — the driver evaluates at most 50 queries() entries
# (CORRECTNESS_r03 recorded exactly the first 50 of 61), so families of
# small scalar/grouping queries are unioned into one frame each with a
# `kind` discriminator column. The original single-purpose forms stay in
# extra_queries() for the pytest gate.
# ---------------------------------------------------------------------------


def q_scalar_exprs(spark: SparkSession, sf: str) -> DataFrame:
    # §2.8 scalar surface in one frame: CONCAT/sha row-id synthesis,
    # interval arithmetic + FLOOR, JSON extraction.
    from feast_spark.functions import row_id

    o = _t(spark, sf, "orders")
    ev = _t(spark, sf, "events")
    # sentinels instead of NULLs for the not-applicable columns: mixed
    # null/int64 would coerce the whole pandas column to float64 and NaT
    # handling differs between comparison layers
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp")
    r1 = o.filter(F.col("o_orderkey") < 100).select(
        F.lit("row_id").alias("kind"),
        F.col("o_orderkey").alias("id"),
        row_id(["o_custkey", "o_orderkey"]).alias("s"),
        epoch.alias("t1"),
        epoch.alias("t2"),
        F.lit(-1).cast("long").alias("n"),
    )
    r2 = ev.filter(F.col("event_id") < 1000).select(
        F.lit("interval").alias("kind"),
        F.col("event_id").alias("id"),
        F.lit("").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t1"),
        (F.col("ts") - F.expr("INTERVAL 90 SECONDS")).alias("t2"),
        F.floor("value").cast("long").alias("n"),
    )
    r3 = ev.filter(F.col("event_id") < 1000).select(
        F.lit("json").alias("kind"),
        F.col("event_id").alias("id"),
        F.lit("").alias("s"),
        epoch.alias("t1"),
        epoch.alias("t2"),
        F.get_json_object("props", "$.k").cast("long").alias("n"),
    )
    return r1.unionByName(r2).unionByName(r3)


def q_rollup_cube(spark: SparkSession, sf: str) -> DataFrame:
    # §2.4 rollup + cube in one frame (reference gaps, free in Spark).
    o = _t(spark, sf, "orders")
    ev = _t(spark, sf, "events").withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("long")
    )
    r = (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.lit("rollup_orders").alias("kind"),
            F.col("o_orderstatus").alias("g1"),
            F.col("o_orderpriority").alias("g2"),
            "n",
            "total",
        )
    )
    c = (
        ev.cube("event_type", "user_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .select(
            F.lit("cube_events").alias("kind"),
            F.col("event_type").alias("g1"),
            F.col("user_bucket").cast("string").alias("g2"),
            "n",
            "total",
        )
    )
    return r.unionByName(c)


def q_pull_scan(spark: SparkSession, sf: str) -> DataFrame:
    # §2.1 pull_all time-range scan + pull_latest latest-per-key scan.
    from feast_spark.operators import pull_all, pull_latest

    ev = _t(spark, sf, "events")
    r1 = pull_all(
        ev, ["user_id"], ["value"], "ts",
        start="2024-01-10 00:00:00", end="2024-01-20 00:00:00",
    ).select(
        F.lit("all").alias("kind"),
        "user_id",
        F.lit("").alias("last_type"),
        "value",
        "ts",
    )
    r2 = pull_latest(
        ev, ["user_id"], ["event_type", "value"], "ts", tiebreak_cols=["event_id"],
    ).select(
        F.lit("latest").alias("kind"),
        "user_id",
        F.col("event_type").alias("last_type"),
        "value",
        "ts",
    )
    return r1.unionByName(r2)


def q_setops(spark: SparkSession, sf: str) -> DataFrame:
    # §2.3 semi/anti joins + §2.7 EXCEPT in one frame.
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    ev = _t(spark, sf, "events")
    has_order = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    big = o.filter(F.col("o_totalprice") > 300000)
    r1 = (
        has_order.join(big, has_order.c_custkey == big.o_custkey, "left_anti")
        .select(
            F.lit("semi_anti").alias("kind"),
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("s"),
        )
    )
    clicks = (
        ev.filter("event_type = 'click'")
        .select("user_id", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .distinct()
    )
    errors = (
        ev.filter("event_type = 'error'")
        .select("user_id", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .distinct()
    )
    r2 = clicks.subtract(errors).select(
        F.lit("except").alias("kind"),
        F.col("user_id").alias("id"),
        F.col("d").alias("s"),
    )
    return r1.unionByName(r2)


def q_para_neardup(spark: SparkSession, sf: str) -> DataFrame:
    # round 5: fuzzy near-dup at the PARAGRAPH grain (MinHash-LSH over
    # individual paragraphs, int64 packed doc*2^16+idx surrogates through
    # every shuffle). Paragraph structure synthesized deterministically:
    # ' merge ' becomes a break; every doc gains a COHORT footer
    # ('shared footer ' + md5(doc_id % 97)) — identical within a cohort
    # (the planted pairs), hex-distinct across cohorts so the pair table
    # stays cohort-local. Oracle = the shared naive-LSH core at the same
    # grain (oracles.paragraph_neardup_pdf).
    from feast_spark.operators.dedup import (
        paragraph_neardup_pairs,
        release_dedup_caches,
    )

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.expr("replace(text, ' merge ', '\n\n')"),
            F.lit("\n\nshared footer "),
            F.md5((F.col("doc_id") % 97).cast("string")),
        ).alias("text"),
    )
    # result is pair-table-sized (cohort-local): materialize eagerly and
    # release the LSH scoped caches here (the bm25 pattern)
    out = paragraph_neardup_pairs(docs).localCheckpoint()
    release_dedup_caches()
    return out


def q_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    # round 5: Efraimidis-Spirakis weighted sampling without replacement —
    # exactly 20 docs per source, inclusion probability proportional to
    # n_chars, ranked by the 2^-30-quantized -ln(u)/w key (u from
    # md5('ws1' || doc_id), never 0). Oracle replays the identical
    # integer ranking in pure SQL (DuckDB parses '0x…' hex casts).
    from feast_spark.operators.selection import weighted_sample_k

    d = _t(spark, sf, "documents").select("doc_id", "source", "n_chars")
    return weighted_sample_k(
        d, F.col("doc_id"), F.col("n_chars"), 20, stratum=F.col("source")
    )


def q_token_budget(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 7: quality-ordered token-budget carving — keep the
    # most lexically diverse docs (integer TTR units) until 30k tokens
    # are spent, crossing doc included. GENUINE SQL oracle: DuckDB
    # re-derives the score, the integer quantization, the md5-48 tie
    # order and the exclusive running-sum cut natively (the bucket
    # decomposition is provably the global (bucket DESC, h, id) order).
    from feast_spark.operators.selection import select_token_budget

    # regex built as a PYTHON string (the explicit ASCII-ws class) — a
    # SQL literal would mangle \x0b (Spark SQL has no \x escapes)
    words = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), "[ \t\n\x0b\f\r]+"),
        lambda x: x != "",
    )
    scored = (
        _t(spark, sf, "documents")
        .select(
            "doc_id",
            "text",
            F.size(F.array_distinct(words)).cast("long").alias("__nd"),
            F.size(words).cast("long").alias("__n"),
        )
        .withColumn("ttr_units", F.expr("(__nd * 1048576) div (__n + 1)"))
    )
    return select_token_budget(scored, 30_000, "ttr_units")


def q_conv_pack_isolated(spark: SparkSession, sf: str) -> DataFrame:
    # round 5: document-isolated packing (no cross-conversation
    # attention): each conversation chunks independently into seq_len
    # sequences keyed (conv_id, chunk_idx) — map-only past the conv agg,
    # no global numbering pass. Oracle = per-conv chunking over the same
    # python BPE twin streams (oracles.conv_pack_isolated_pdf).
    from feast_spark.operators.bpe import train_bpe
    from feast_spark.operators.conversation import (
        _deduped,
        pack_conversations,
    )

    turns = _transcripts_fixture(spark)
    rendered = _deduped(turns).select(
        F.concat(
            "role", F.lit(": "), F.coalesce("text", F.lit(""))
        ).alias("text")
    )
    model = train_bpe(rendered, num_merges=8)
    seqs = pack_conversations(
        turns, model, seq_len=48, cross_boundaries=False
    )
    return seqs.select(
        "conv_id",
        "chunk_idx",
        F.array_join(
            F.transform("token_ids", lambda t: t.cast("string")), " "
        ).alias("ids_str"),
        F.array_join(
            F.transform("loss_mask", lambda t: t.cast("string")), " "
        ).alias("mask_str"),
        "n_tokens",
    )


def q_moore_lewis(spark: SparkSession, sf: str) -> DataFrame:
    # round 5: Moore-Lewis cross-entropy-difference selection — the
    # two-LM contrast (in-domain src1-3 vs whole-corpus general model)
    # that cancels the generic-fluency signal a single perplexity gate
    # conflates with domain fit. ce_diff_units is an exact int64
    # difference of the engine's micro-log sums; portable md5 arm +
    # 2^20 buckets so the Counter-replay oracle is bit-exact.
    from feast_spark.operators.lm import moore_lewis_scores

    d = _t(spark, sf, "documents").select("doc_id", "text", "source")
    return moore_lewis_scores(
        d,
        d.where(F.col("source").isin("src1", "src2", "src3")),
        order=3,
        method="portable",
        n_buckets=1 << 20,
    )


def q_source_vocab(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 5: per-source vocabulary health (types, tokens,
    # hapax, integer TTR) — the Heaps'-law drift alarm. GENUINE SQL
    # oracle (unnest + two-level agg).
    from feast_spark.operators.lexical import source_vocab_stats

    return source_vocab_stats(_t(spark, sf, "documents"))


def q_compressibility(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 5: zlib compressibility per document (Dolma/DCLM
    # compression filter) — map-only Arrow kernel; oracle is a plain
    # python zlib loop (oracles.compressibility_pdf), no shared kernel.
    from feast_spark.operators.lexical import compression_stats

    d = _t(spark, sf, "documents")
    return compression_stats(
        d.repartition(spark.sparkContext.defaultParallelism)
    )


def q_source_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    # round 5: c-TF-IDF distinctive terms per source (BERTopic
    # formulation): tf(term, source) * ln(1 + n_sources/df_sources),
    # 2^-20 floor-quantized for integer-exact top-10 ranking with term
    # tie-break. Two hash-agg shuffles + WindowGroupLimit — the
    # corpus-analysis dual of top_ngrams.
    from feast_spark.operators.lexical import source_top_terms

    return source_top_terms(_t(spark, sf, "documents"), k=10)


def q_cdc_neardup(spark: SparkSession, sf: str) -> DataFrame:
    # round 5: content-defined-chunking near-dup (Gear/FastCDC) — byte
    # grain, insertion-shift-robust: every doc gains a 12-block md5
    # cohort footer (doc_id % 97) that lands at a DIFFERENT byte offset
    # per doc, so only content-defined cuts align the planted shared
    # chunks (fixed-size blocking finds none of them). Oracle replays
    # the sequential scalar gear + naive dict bucketing
    # (oracles.cdc_neardup_pdf).
    from feast_spark.operators.dedup import cdc_neardup_pairs

    blocks = F.array(
        *[
            F.md5(F.concat((F.col("doc_id") % 97).cast("string"), F.lit(f":{i}")))
            for i in range(12)
        ]
    )
    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" "), F.array_join(blocks, " ")
        ).alias("text"),
    )
    return cdc_neardup_pairs(docs, avg_bits=6, min_shared=2)


def q_blocklist_hits(spark: SparkSession, sf: str) -> DataFrame:
    # round 5: literal-phrase blocklist scan — the phrase set compiles
    # into ONE trie-shaped lookahead pattern (shared prefixes collapse;
    # Aho-Corasick behavior from the C regex engine), counting every
    # position where any phrase starts. Oracle replays per-position
    # per-phrase startswith — no trie, no regex (oracles.blocklist_pdf).
    from feast_spark.operators.blocklist import DEMO_PHRASES, blocklist_hits

    return blocklist_hits(_t(spark, sf, "documents"), DEMO_PHRASES)


def q_token_fertility(spark: SparkSession, sf: str) -> DataFrame:
    # round 5: per-language tokenizer fertility (tokens/word, UTF-8
    # bytes/token as 2^-20 integer units) under the corpus-trained BPE —
    # the UniMax/tokenizer-eval lens. Oracle = python-twin BPE replay
    # with the same integer quantization (oracles.token_fertility_pdf).
    from feast_spark.operators.bpe import token_fertility, train_bpe

    docs = _t(spark, sf, "documents")
    model = train_bpe(
        docs.filter(F.pmod("doc_id", F.lit(5)) == 0), num_merges=16
    )
    return token_fertility(docs, model, group_col="lang")


def q_turn_dedup(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 3: cross-conversation turn-grain exact dedup (the
    # synthetic-SFT template killer) — every 5th conversation is cloned
    # under a later-sorting id, so cloned assistant turns repeat across
    # conversations; the xxhash64 arm keys the exchange on 8 bytes
    # (portable-arm parity pinned in tests). Oracle: GENUINE DuckDB SQL
    # over the raw turns with the same SQL-synthesized clones.
    from feast_spark.operators.conversation import turn_dedup

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    clones = t.filter(F.pmod(idx, F.lit(5)) == 0).withColumn(
        "conv_id", F.concat("conv_id", F.lit("d"))
    )
    return turn_dedup(t.unionByName(clones), key_method="xxhash64")


def q_conv_repetition(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 3: per-conversation self-repetition / agent-loop
    # stats (run-length structure of consecutive identical assistant
    # turns) on the loop-planted fixture. Oracle: GENUINE DuckDB SQL
    # (lag + run-id prefix sum + run-length window) over the raw turns.
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import conversation_repetition

    t = transcripts_spark(
        spark, 100, seed=42, mega_every=50, mega_turns=200, loop_prob=0.3
    )
    return conversation_repetition(t, min_repeats=3)


def q_unimax_sample(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 3: UniMax language-balanced corpus carving at 70%
    # of the corpus token mass — at sf0.01 the epoch cap binds for the
    # small languages while the dominant 'en' absorbs their unused fair
    # share (both allocation branches live). Oracle: pandas replay with
    # the SHARED integer allocation fold (oracles.unimax_pdf).
    from feast_spark.operators.selection import unimax_sample

    docs = _t(spark, sf, "documents")
    w = F.size(
        F.filter(
            F.split(F.coalesce(F.col("text"), F.lit("")), "[ \t\n\x0b\f\r]+"),
            lambda x: x != "",
        )
    ).cast("long")
    total = int(docs.select(F.sum(w)).first()[0])
    return unimax_sample(docs, budget=total * 7 // 10, max_epochs=1)


def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 3: time-gap sessionization inside conversations
    # (1-minute gap on the fixture's 1-120s turn gaps, so both branches
    # fire constantly). Oracle: GENUINE DuckDB SQL (epoch_us lag diff +
    # session-id prefix sum) over the raw turns.
    from feast_spark.operators.conversation import sessionize_turns

    return sessionize_turns(_transcripts_fixture(spark), gap_minutes=1)


def q_conv_contamination(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 3: benchmark decontamination at the CONVERSATION
    # grain — the benchmark is SQL-derivable from the corpus itself
    # (first 12 words of every 7th conversation's deduped turn 0), so
    # the oracle is GENUINE DuckDB SQL: lateral-unnest 8-gram streams
    # joined against the distinct benchmark gram set.
    from feast_spark.operators.conversation import (
        _ASCII_WS,
        _deduped,
        conversation_contamination,
    )

    t = _transcripts_fixture(spark)
    d = _deduped(t)
    idx = F.substring("conv_id", 2, 9).cast("int")
    toks = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), _ASCII_WS),
        lambda x: x != "",
    )
    bench = (
        d.filter((F.pmod(idx, F.lit(7)) == 0) & (F.col("turn_idx") == 0))
        .select(F.array_join(F.slice(toks, 1, 12), " ").alias("bench_text"))
    )
    return conversation_contamination(t, bench, n=8)


def q_pii_exposure(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 3: cross-conversation PII ENTITY exposure (which
    # concrete emails/phones recur across conversations — the
    # re-identification view); clones guarantee cross-conv entities.
    # Oracle: GENUINE DuckDB SQL — regexp_extract_all with the SAME
    # patterns (backslashes pass through single-quoted SQL literals
    # untouched), per-conv pre-agg, entity agg.
    from feast_spark.operators.conversation import pii_entity_exposure

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    clones = t.filter(F.pmod(idx, F.lit(5)) == 0).withColumn(
        "conv_id", F.concat("conv_id", F.lit("d"))
    )
    return pii_entity_exposure(t.unionByName(clones))


def q_reply_latency(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 4: per-conversation assistant responsiveness —
    # exact int64 microsecond latency sums over (user -> assistant|tool)
    # adjacent pairs. Oracle: GENUINE DuckDB SQL (lead window over the
    # deduped turns, conditional agg). -1 sentinel max when a
    # conversation has no reply pair.
    from feast_spark.operators.conversation import reply_latency

    return reply_latency(_transcripts_fixture(spark))


def q_conv_integrity(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 8: key/temporal integrity QA over the RAW delivery
    # (pre-dedup). The fixture already plants duplicate (conv, turn) keys
    # (dup_prob edits with +1s ts); on top of that every 7th conversation
    # gets turn 2's ts shifted back an hour (a ts inversion) and every
    # 9th%3 conversation loses turn 1 entirely (an index gap). Oracle:
    # GENUINE DuckDB SQL — same plant, key-grain agg, lag window, conv
    # rollup, epoch-millis span.
    from feast_spark.operators.conversation import conversation_integrity

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    planted = t.filter(
        ~((F.pmod(idx, F.lit(9)) == 3) & (F.col("turn_idx") == 1))
    ).withColumn(
        "ts",
        F.when(
            (F.pmod(idx, F.lit(7)) == 0) & (F.col("turn_idx") == 2),
            F.col("ts") - F.expr("INTERVAL 1 HOUR"),
        ).otherwise(F.col("ts")),
    )
    return conversation_integrity(planted)


def q_role_diversity(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 8: distinct-n mode-collapse lens — every 4th
    # conversation's assistant turns are rewritten to one fixed sentence,
    # so the assistant side's distinct-bigram mass craters relative to
    # the user side while each turn stays individually fluent. Oracle:
    # GENUINE DuckDB SQL (same plant, list_transform bigrams, two aggs).
    from feast_spark.operators.textqa import role_ngram_diversity

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    planted = t.withColumn(
        "text",
        F.when(
            (F.pmod(idx, F.lit(4)) == 0) & (F.col("role") == "assistant"),
            F.lit("the request completed successfully without further action"),
        ).otherwise(F.col("text")),
    )
    return role_ngram_diversity(planted, n=2)


def q_alpha_rates(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 8: temperature mixture allocation (p^alpha,
    # alpha=0.5) over per-source char mass — dyadic alpha composes from
    # correctly-rounded sqrt only, so s_units is bit-identical on both
    # engines; everything downstream is int64. Oracle: FULL genuine SQL.
    from feast_spark.operators.selection import temperature_sample_rates

    d = _t(spark, sf, "documents")
    counts = d.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("char_mass")
    )
    return temperature_sample_rates(
        counts, "source", "char_mass", alpha=0.5, budget=1_000_000
    )


def q_pii_echo(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 9: cross-ROLE PII leakage — entities a user turn
    # introduces that the assistant repeats verbatim. Plants: every user
    # turn carries u<cid>@example.com (first occurrence = first user
    # turn); every 3rd conversation's assistant turns echo it; every 5th
    # conversation's assistant turns introduce a<cid>@relay.net with no
    # user occurrence (exercises the first-role filter). Oracle: GENUINE
    # DuckDB SQL — same plants, regexp_extract_all with the shared
    # patterns, one entity-grain agg with arg_min as the introducing
    # role.
    from feast_spark.operators.conversation import pii_echo

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    cid = F.col("conv_id")
    txt = F.coalesce(F.col("text"), F.lit(""))
    planted = t.withColumn(
        "text",
        F.concat(
            txt,
            F.when(
                F.col("role") == "user",
                F.concat(F.lit(" u"), cid, F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                (F.pmod(idx, F.lit(3)) == 0) & (F.col("role") == "assistant"),
                F.concat(F.lit(" resent to u"), cid, F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                (F.pmod(idx, F.lit(5)) == 0) & (F.col("role") == "assistant"),
                F.concat(F.lit(" via a"), cid, F.lit("@relay.net")),
            ).otherwise(F.lit("")),
        ),
    )
    return pii_echo(planted, kinds=("email", "phone"))


def q_tool_errors(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 9: per-tool invocation/failure census. Plant:
    # tool turns where (cid*7 + turn_idx) % 4 == 0 are prefixed with an
    # error banner, so every tool name accumulates a deterministic error
    # fraction; embedded words (terror/exceptional) in organic text stay
    # unmatched (anchored explicit-case alternation, no (?i)). Oracle:
    # GENUINE DuckDB SQL — same plant, same regex via RE2, (tool, conv)
    # pre-agg then tool agg.
    from feast_spark.operators.conversation import tool_error_stats

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    planted = t.withColumn(
        "text",
        F.when(
            (F.col("role") == "tool")
            & (
                F.pmod(
                    idx.cast("long") * 7 + F.col("turn_idx"), F.lit(4)
                )
                == 0
            ),
            F.concat(
                F.lit("Error: upstream timed out; "),
                F.coalesce(F.col("text"), F.lit("")),
            ),
        ).otherwise(F.col("text")),
    )
    return tool_error_stats(planted)


def q_fork_mask(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 9: the curation ACTION for fork groups — keep every
    # sibling's distinct tail but mask the shared k-turn prefix on all
    # non-representative members (reps = min conv_id). Same clone plant
    # as conv_forks (every 5th conversation cloned under 'd' with its
    # tail rewritten). Oracle: GENUINE DuckDB SQL — digest replay via
    # string_agg, group agg, two joins back to the ranked turns.
    from feast_spark.operators.conversation import mask_fork_prefixes

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    clones = t.filter(F.pmod(idx, F.lit(5)) == 0).withColumn(
        "conv_id", F.concat("conv_id", F.lit("d"))
    ).withColumn(
        "text",
        F.when(
            F.col("turn_idx") >= 2,
            F.concat(F.coalesce("text", F.lit("")), F.lit(" fork variant")),
        ).otherwise(F.col("text")),
    )
    u = t.unionByName(clones)
    return mask_fork_prefixes(u, k=2, min_group=2).select(
        "conv_id", "turn_idx", "fork_md5", "is_rep", "keep_turn"
    )


def q_pref_pairs(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 9: DPO preference-pair construction from fork
    # groups — conv_forks' clone plant gives shared-prefix siblings with
    # divergent tails; score = total assistant chars over the RAW
    # delivery (exact int64, ASCII fixture), so the tail-rewritten clone
    # outscores its original and every >=2-member group with a score gap
    # emits one (chosen, rejected) pair. 2-turn conversations clone to
    # identical twins (no tail to rewrite) -> score tie -> provably no
    # pair. Oracle: FULL GENUINE SQL (digest replay, score agg, window
    # rank extrema).
    from feast_spark.operators.conversation import preference_pairs

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    clones = t.filter(F.pmod(idx, F.lit(5)) == 0).withColumn(
        "conv_id", F.concat("conv_id", F.lit("d"))
    ).withColumn(
        "text",
        F.when(
            F.col("turn_idx") >= 2,
            F.concat(F.coalesce("text", F.lit("")), F.lit(" fork variant")),
        ).otherwise(F.col("text")),
    )
    u = t.unionByName(clones)
    scores = (
        u.filter(F.col("role") == "assistant")
        .groupBy("conv_id")
        .agg(
            F.sum(F.length(F.coalesce("text", F.lit(""))))
            .cast("long")
            .alias("score")
        )
    )
    return preference_pairs(u, scores, k=2)


def q_code_blocks(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 8: fenced code-block census — three plant classes
    # (tagged python on every 3rd conversation's assistant turns, inline
    # sql on every 5th's user turns, bare fences on every 7th%4's
    # assistant turns; first CASE arm wins) so tag histogram, code mass
    # and doc counts all bind. Oracle: GENUINE DuckDB SQL — same plant,
    # same RE2-compatible fence regex, lateral unnest, two aggs.
    from feast_spark.operators.textqa import code_block_stats

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    txt = F.coalesce(F.col("text"), F.lit(""))
    planted = t.withColumn(
        "text",
        F.when(
            (F.pmod(idx, F.lit(3)) == 1) & (F.col("role") == "assistant"),
            F.concat(F.lit("```python\n"), txt, F.lit("\n```")),
        )
        .when(
            (F.pmod(idx, F.lit(5)) == 2) & (F.col("role") == "user"),
            F.concat(F.lit("see ```sql\n"), txt, F.lit("\n``` done")),
        )
        .when(
            (F.pmod(idx, F.lit(7)) == 4) & (F.col("role") == "assistant"),
            F.concat(F.lit("```\n"), txt, F.lit("\n```")),
        )
        .otherwise(F.col("text")),
    )
    return code_block_stats(planted, id_col="conv_id")


def q_assistant_echo(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 5: context-echo fraction per assistant turn —
    # distinct word-trigram overlap with the immediately preceding turn.
    # Every 6th conversation gets a fixed sentence appended to EVERY
    # turn so planted echo exists (the raw fixture's turns rarely share
    # trigrams); the oracle replays the plant + the whole window in
    # GENUINE DuckDB SQL (list comprehensions + lag over lists).
    from feast_spark.operators.conversation import assistant_echo

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    t = t.withColumn(
        "text",
        F.when(
            F.pmod(idx, F.lit(6)) == 0,
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(ECHO_PLANT),
            ),
        ).otherwise(F.col("text")),
    )
    return assistant_echo(t, n=3)


# fixed sentence planted by q_assistant_echo (module-level so the oracle
# f-string interpolates the exact same bytes)
ECHO_PLANT = " please review the attached report carefully today"


def q_truncation(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 6: truncated-generation QA per assistant turn
    # (odd code fence / long turn ending mid-sentence — the token-budget
    # cut signature per-turn quality rules score as healthy text).
    # Every 9th conversation's assistant turns get a planted artifact:
    # even turn_idx an unterminated fence, odd turn_idx a 96-char tail
    # cut mid-word. Map-only; oracle: GENUINE DuckDB SQL (same
    # length-difference counts, right/contains verdicts).
    from feast_spark.operators.textqa import generation_artifacts

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    plantable = (F.pmod(idx, F.lit(9)) == 0) & (F.col("role") == "assistant")
    t = t.withColumn(
        "text",
        F.when(
            plantable & (F.pmod(F.col("turn_idx"), F.lit(2)) == 0),
            F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(TRUNC_PLANT_FENCE)),
        )
        .when(
            plantable,
            F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(TRUNC_PLANT_CUT)),
        )
        .otherwise(F.col("text")),
    )
    return generation_artifacts(t, min_chars=80)


# planted by q_truncation (module-level so the oracle f-string
# interpolates the exact same bytes; no braces/quotes that would need
# f-string or SQL escaping beyond the chr(10) newlines)
TRUNC_PLANT_FENCE = "\n```\ndef f(:"
TRUNC_PLANT_CUT = (
    " and the generation kept going until the token budget was"
    " exhausted and the text was cut right at"
)
SUFFIX_LOOP_PLANT = " let me check that again"


def q_suffix_loops(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 6: trailing-periodicity decode-loop detector —
    # the intra-turn repetition lens gopher_repetition (doc-grain
    # fractions) and conv_repetition (identical consecutive TURNS)
    # both miss. Every 8th conversation's assistant turns get a 5-word
    # phrase appended 5x (period 5, repeats 5). Map-only higher-order
    # slice comparisons; oracle: GENUINE DuckDB SQL (lateral unnest of
    # periods 1..8, list-slice mismatch scan, ROW_NUMBER argmax).
    from feast_spark.operators.conversation import _deduped
    from feast_spark.operators.textqa import suffix_loop_stats

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    t = t.withColumn(
        "text",
        F.when(
            (F.pmod(idx, F.lit(8)) == 0) & (F.col("role") == "assistant"),
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.repeat(F.lit(SUFFIX_LOOP_PLANT), 5),
            ),
        ).otherwise(F.col("text")),
    )
    return suffix_loop_stats(
        _deduped(t), id_cols=("conv_id", "turn_idx"), max_period=8
    )


def q_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 6: pairwise exact-content overlap matrix between
    # ingest sources (CCNet/RefinedWeb per-dump dedup matrices) — every
    # 10th document re-ingested under a planted 'mirror' source so
    # containment/jaccard have known mass. One corpus hash-agg + a
    # digest-keyed self-join; dimension-sized frames broadcast. Oracle:
    # GENUINE DuckDB SQL (distinct digests, self-join, zero-filled
    # pair frame).
    from feast_spark.operators.dedup import cross_source_overlap

    d = _t(spark, sf, "documents").select("doc_id", "source", "text")
    clones = d.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0).withColumn(
        "source", F.lit("mirror")
    )
    return cross_source_overlap(d.unionByName(clones))


def q_readability(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 6: Flesch-Kincaid grade level per document,
    # integer-quantized ([aeiouy]+ syllable nuclei, [.!?]+ sentence
    # groups, one fixed float op order so DuckDB floors the identical
    # double). Map-only. Oracle: GENUINE DuckDB SQL.
    from feast_spark.operators.lexical import readability_scores

    return readability_scores(_t(spark, sf, "documents"))


def q_label_drift(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 6: keep/drop transition matrix between two
    # pipeline runs (default rules vs rules.strict_config()) on the SAME
    # fixture — the filter-ablation diff. Oracle: GENUINE SQL full-outer
    # join of the two derived label tables (default run's naive replay +
    # the strict-run replay), transition agg re-derived in SQL.
    from feast_spark import rules
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.labels import label_drift
    from feast_spark.pipeline.quality import QualityConfig, run_quality_pipeline

    transcripts = transcripts_spark(
        spark, 100, seed=42, mega_every=50, mega_turns=200
    )
    a = run_quality_pipeline(
        spark, transcripts, QualityConfig(), run_id="da",
        decision_ts=datetime(2026, 1, 1, tzinfo=timezone.utc),
    ).labels
    b = run_quality_pipeline(
        spark, transcripts, QualityConfig(rules=rules.strict_config()),
        run_id="db",
        decision_ts=datetime(2026, 1, 1, tzinfo=timezone.utc),
    ).labels
    return label_drift(a, b)


def q_keep_drop_eval(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 11: the north-rule acceptance gate as an operator —
    # precision/recall/F1 of a candidate labeling's keep decision vs a
    # reference labeling, plus exact scrubbed-text equality among
    # both-kept turns. The two runs use asymmetric rule variants
    # (rules.eval_pred_config / eval_ref_config — shared with the naive
    # replays) so fp, fn AND kept-text diffs are all non-zero. Oracle:
    # GENUINE SQL — confusion matrix, text equality, and the 2^-20
    # integer metric units all re-derived by DuckDB over the two replay
    # label tables.
    from feast_spark import rules
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.labels import keep_drop_eval
    from feast_spark.pipeline.quality import QualityConfig, run_quality_pipeline

    transcripts = transcripts_spark(
        spark, 100, seed=42, mega_every=50, mega_turns=200
    )
    pred = run_quality_pipeline(
        spark, transcripts, QualityConfig(rules=rules.eval_pred_config()),
        run_id="ea",
        decision_ts=datetime(2026, 1, 1, tzinfo=timezone.utc),
    ).labels
    ref = run_quality_pipeline(
        spark, transcripts, QualityConfig(rules=rules.eval_ref_config()),
        run_id="eb",
        decision_ts=datetime(2026, 1, 1, tzinfo=timezone.utc),
    ).labels
    return keep_drop_eval(pred, ref)


def q_tool_latency(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 11: per-tool response-latency histogram from turn
    # timestamps (exact integer log2 buckets via length(bin(lat_us)) —
    # the same minimal binary string on both engines). Completes the
    # tool-ops trio: tool_errors (outcomes), tool_json (payloads),
    # tool_latency (timing). Oracle: GENUINE DuckDB SQL (lag window,
    # epoch_us, bin-length bucket, same div-1000 per call).
    from feast_spark.operators.conversation import tool_latency_histogram

    return tool_latency_histogram(_transcripts_fixture(spark))


def q_conv_language(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 6: per-conversation language profile + turn-level
    # code-switch count (langs alternating inside one conversation — a
    # retrieval/translation artifact per-turn gates can't see). langid
    # is the shared kernel (derived turn_langs relation); the
    # mode/switch rollup is GENUINE SQL (counts + ROW_NUMBER mode with
    # lexicographic tie, lag window for switches).
    from feast_spark.operators.conversation import conversation_language

    return conversation_language(_transcripts_fixture(spark))


def q_tool_transitions(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 4: corpus tool-call transition graph (prev_tool ->
    # tool bigrams per conversation, ^START sentinel) — the agent-fleet
    # behavioral fingerprint. Oracle: GENUINE DuckDB SQL (lag window
    # over tool turns, two-level agg).
    from feast_spark.operators.conversation import tool_transitions

    return tool_transitions(_transcripts_fixture(spark))


def q_turn_novelty(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 4: per-turn global-first-occurrence 8-gram novelty
    # counts (the scoring complement of span/substring dedup). Oracle:
    # GENUINE DuckDB SQL — lateral-unnest gram streams, ROW_NUMBER over
    # (gram -> conv_id, turn_idx) for first occurrence, per-turn agg.
    from feast_spark.operators.conversation import turn_novelty

    return turn_novelty(_transcripts_fixture(spark), n=8)


def q_turn_length_trend(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 4: per-conversation assistant response-length
    # trend as the EXACT integer least-squares slope numerator /
    # denominator (degeneration / rambling detection). Oracle: GENUINE
    # DuckDB SQL replaying the same integer sums.
    from feast_spark.operators.conversation import turn_length_trend

    return turn_length_trend(_transcripts_fixture(spark))


def q_conv_forks(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 4: shared-prefix fork detection (k=2) — every 5th
    # conversation is cloned with its tail (turn_idx >= 2) rewritten, so
    # each such pair shares exactly the 2-turn prefix: a genuine fork,
    # not a whole-conversation dup. Oracle: GENUINE DuckDB SQL (same
    # md5-of-joined-prefix digest via string_agg + chr(30)).
    from feast_spark.operators.conversation import conversation_forks

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    forked = (
        t.filter(F.pmod(idx, F.lit(5)) == 0)
        .withColumn(
            "text",
            F.when(
                F.col("turn_idx") >= 2,
                F.concat(
                    F.coalesce(F.col("text"), F.lit("")),
                    F.lit(" fork variant"),
                ),
            ).otherwise(F.col("text")),
        )
        .withColumn("conv_id", F.concat("conv_id", F.lit("d")))
    )
    return conversation_forks(t.unionByName(forked), k=2, min_group=2)


def q_conv_templates(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 4: masked template mining — two clone sets rewrite
    # assistant turns to "request completed in <varying digits> ms", so
    # every copy is UNIQUE text (invisible to exact turn_dedup) but one
    # template after digit masking. Oracle: GENUINE DuckDB SQL replaying
    # the normalize+mask chain with portable regexes.
    from feast_spark.operators.conversation import assistant_templates

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")

    def clone(suffix: str, mult: int) -> DataFrame:
        return (
            t.filter(F.pmod(idx, F.lit(5)) == 0)
            .withColumn(
                "text",
                F.when(
                    F.col("role") == "assistant",
                    F.concat(
                        F.lit("request completed in "),
                        (idx * mult + F.col("turn_idx")).cast("string"),
                        F.lit(" ms"),
                    ),
                ).otherwise(F.col("text")),
            )
            .withColumn("conv_id", F.concat("conv_id", F.lit(suffix)))
        )

    planted = t.unionByName(clone("d1", 7)).unionByName(clone("d2", 13))
    return assistant_templates(planted, min_count=2, min_words=3)


def q_role_patterns(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 4: conversation-shape histogram (role sequences,
    # first 8 roles — the mega-conversation fixture exercises the
    # truncation branch while count(*) still sees every turn). Oracle:
    # GENUINE DuckDB SQL (filtered ordered string_agg).
    from feast_spark.operators.conversation import role_patterns

    return role_patterns(_transcripts_fixture(spark), max_turns=8)


def q_pseudonymize(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 4: consistent PII pseudonymization — even doc_ids
    # get a VARYING planted entity pair (email keyed by doc_id%7, phone
    # by doc_id%50) so the consistency property is visible in the
    # artifact: colliding ids share tokens across documents. Oracle:
    # independent per-row re.subn + md5 replay (oracles.pseudonymize_pdf).
    from feast_spark.operators.privacy import pseudonymize_entities

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    planted = docs.withColumn(
        "text",
        F.when(
            F.pmod("doc_id", F.lit(2)) == 0,
            F.concat(
                F.coalesce("text", F.lit("")),
                F.format_string(
                    " contact user%d@example.com or call 415-555-%04d",
                    F.pmod("doc_id", F.lit(7)).cast("int"),
                    (F.lit(1000) + F.pmod("doc_id", F.lit(50))).cast("int"),
                ),
            ),
        ).otherwise(F.col("text")),
    )
    out = pseudonymize_entities(planted, kinds=("email", "phone"))
    return out.select(
        "doc_id", "text_pseudo", "n_pseudo", "n_pseudo_email", "n_pseudo_phone"
    )


def q_drift_psi(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 4: PSI distribution drift between two snapshot
    # halves of the events table — the odd half's value column scaled
    # 1.2x (real drift, psi >> 0) while user_id stays unshifted (psi
    # near 0). Oracle: GENUINE DuckDB SQL replaying the exact bucket
    # arithmetic (same float op order -> identical floor results).
    from feast_spark.operators.profile import drift_psi

    ev = spark.read.parquet(f"{sf}/events.parquet")
    ref = ev.filter(F.pmod("event_id", F.lit(2)) == 0)
    cur = ev.filter(F.pmod("event_id", F.lit(2)) == 1).withColumn(
        "value", F.col("value") * F.lit(1.2)
    )
    return drift_psi(ref, cur, ["value", "user_id"], bins=10)


def q_holdout_split(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 4: leak-free conversation-grain train/valid/test
    # assignment over the transcript fixture — every turn of a
    # conversation lands in one split by construction. Oracle: GENUINE
    # DuckDB SQL (same md5-48 hash, same integer cut points).
    from feast_spark.operators.selection import assign_split

    t = _transcripts_fixture(spark)
    return assign_split(
        t, "conv_id", {"train": 0.8, "valid": 0.1, "test": 0.1}, seed="hs1"
    ).select("conv_id", "turn_idx", "split")


def q_turn_neardup(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 4: turn-grain FUZZY near-dup — every 5th
    # conversation cloned with ' edited copy note' appended to each
    # assistant turn, so the copies are near- but never exact-duplicates
    # (invisible to turn_dedup). Oracle: shared-kernel naive-LSH replay
    # (oracles.turn_neardup_pdf).
    from feast_spark.operators.conversation import turn_neardup_pairs

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    clones = (
        t.filter(F.pmod(idx, F.lit(5)) == 0)
        .withColumn(
            "text",
            F.when(
                F.col("role") == "assistant",
                F.concat(
                    F.coalesce(F.col("text"), F.lit("")),
                    F.lit(" edited copy note"),
                ),
            ).otherwise(F.col("text")),
        )
        .withColumn("conv_id", F.concat("conv_id", F.lit("d")))
    )
    return turn_neardup_pairs(t.unionByName(clones))


def q_drift_categorical(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 4: categorical PSI drift — the odd half remaps
    # lang to 'xx' for doc_id%10<3 (a planted language-mix shift);
    # top_k=3 forces the <OTHER> fold on the real category tails.
    # Oracle: GENUINE DuckDB SQL (same top-k tie-break, fold, psi tail).
    from feast_spark.operators.profile import drift_psi_categorical

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    ref = docs.filter(F.pmod("doc_id", F.lit(2)) == 0)
    cur = docs.filter(F.pmod("doc_id", F.lit(2)) == 1).withColumn(
        "lang",
        F.when(F.pmod("doc_id", F.lit(10)) < 3, F.lit("xx")).otherwise(
            F.col("lang")
        ),
    )
    return drift_psi_categorical(ref, cur, ["lang", "source"], top_k=3)


def q_doc_curation_blocklist(spark: SparkSession, sf: str) -> DataFrame:
    # blocklist-arm curation (stage 0b): the trie-regex phrase gate runs
    # BEFORE span dedup, so blocked docs never claim first-occurrence
    # span slots; audit gains blocklist_hits + a 'blocklist' stage.
    # pytest-window query (the driver registry is at its 50-entry cap).
    from feast_spark.pipeline.curation import CurationConfig, run_curation

    d = _t(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("bench_text")
    )
    cfg = CurationConfig(
        use_blocklist=True,
        blocklist_phrases=("scan slow", "value part", "sparkle"),
        blocklist_max_hits=2,
    )
    return run_curation(spark, d, bench, cfg).decisions


def q_doc_curation_neardup(spark: SparkSession, sf: str) -> DataFrame:
    # near-dup-arm curation (stage 1a): MinHash-LSH + connected
    # components keep each duplicate component's min-id representative
    # BEFORE span dedup (span dedup would strip the shared spans from the
    # later copy and hide the pair). Oracle = naive LSH core + union-find
    # + the shared stage replay. pytest-window query (driver cap is 50).
    from feast_spark.pipeline.curation import CurationConfig, run_curation

    d = _t(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("bench_text")
    )
    return run_curation(
        spark, d, bench, CurationConfig(use_neardup=True)
    ).decisions


def q_html_extract(spark: SparkSession, sf: str) -> DataFrame:
    # round 5: HTML boilerplate removal (jusText/C4-style): script/style
    # payloads dropped, block split, word-count + link-density gates —
    # all JVM-side regex/lambda, zero shuffles. Page synthesis: nav bar
    # of anchors (must fail density), style + script payloads (must
    # vanish), ' merge ' becomes a paragraph break. Oracle replays the
    # identical regex program in python re (oracles.html_extract_pdf).
    from feast_spark.operators.html import extract_html_text

    body = F.expr("replace(text, ' merge ', '</p><p>')")
    html = F.concat(
        F.lit(
            '<html><head><title>page</title><style>p{color:red}</style>'
            '</head><body><div class="nav"><a href="/">home page</a> '
            '<a href="/a">about us</a> <a href="/c">contact now</a></div>'
            "<h1>heading "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        body,
        F.lit("</p><script>var x = 1;</script></body></html>"),
    )
    docs = _t(spark, sf, "documents").select("doc_id", html.alias("html"))
    return extract_html_text(docs)


def q_alternation_repair(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 10: alternation REPAIR after a turn-grain filter —
    # dropping turns where (cid*3 + turn_idx) % 5 == 2 leaves same-role
    # runs behind (exactly the post-quality-filter state), which merge
    # into single turns with texts joined in turn order. Oracle: GENUINE
    # DuckDB SQL — same filter, dedup, lag/run windows, ordered
    # string_agg.
    from feast_spark.operators.conversation import repair_alternation

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("long")
    filt = t.filter(F.pmod(idx * 3 + F.col("turn_idx"), F.lit(5)) != 2)
    return repair_alternation(filt)


def q_context_fit(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 10: context-window FIT — keep the system prompt
    # plus the longest suffix of remaining turns fitting a 48-token
    # budget (mega-conversations keep only their tail). Oracle: GENUINE
    # DuckDB SQL — same word counts, system-pin charge, suffix-sum
    # window.
    from feast_spark.operators.conversation import fit_context_budget

    return fit_context_budget(_transcripts_fixture(spark), 48)


def q_system_prompts(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 10: fleet system-prompt census. Plant: system
    # turns carry one of three canned profile prompts (cid % 3), so the
    # census has three real buckets plus <none>. Oracle: GENUINE DuckDB
    # SQL — same plant, dedup, first-system arg_min, md5 digest, agg.
    from feast_spark.operators.conversation import system_prompt_census

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    planted = t.withColumn(
        "text",
        F.when(
            F.col("role") == "system",
            F.concat(
                F.lit("You are agent profile "),
                F.pmod(idx, F.lit(3)).cast("string"),
            ),
        ).otherwise(F.col("text")),
    )
    return system_prompt_census(planted)


def q_special_tokens(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 10: chat-template special-token leakage census.
    # Plants: (cid*5+turn_idx)%11==0 appends an im_start/im_end pair,
    # %13==1 appends </s>, (cid*7+turn_idx)%17==2 appends an INST pair —
    # deterministic leak mass per (marker, role). Oracle: GENUINE DuckDB
    # SQL — same plants, dedup, replace-based counting over a markers
    # VALUES table, (marker, role, conv) pre-agg.
    from feast_spark.operators.textqa import special_token_stats

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("long")
    txt = F.coalesce(F.col("text"), F.lit(""))
    planted = t.withColumn(
        "text",
        F.when(
            F.pmod(idx * 5 + F.col("turn_idx"), F.lit(11)) == 0,
            F.concat(txt, F.lit(" <|im_start|>assistant oops <|im_end|>")),
        )
        .when(
            F.pmod(idx * 5 + F.col("turn_idx"), F.lit(13)) == 1,
            F.concat(txt, F.lit("</s>")),
        )
        .when(
            F.pmod(idx * 7 + F.col("turn_idx"), F.lit(17)) == 2,
            F.concat(txt, F.lit(" [INST] retry [/INST]")),
        )
        .otherwise(F.col("text")),
    )
    return special_token_stats(planted)


def q_refusal_stats(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 10: per-conversation refusal/boilerplate census.
    # Plant: every 6th conversation's assistant turns at turn_idx%4==1
    # open with a canned refusal carrying TWO markers ("I'm sorry" +
    # "I can't"), so hit counts, first indices and units are all
    # deterministic. Oracle: GENUINE DuckDB SQL — same plant, markers
    # VALUES table, per-turn hit sums, conv agg.
    from feast_spark.operators.conversation import assistant_refusals

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    planted = t.withColumn(
        "text",
        F.when(
            (F.col("role") == "assistant")
            & (F.pmod(idx, F.lit(6)) == 0)
            & (F.pmod(F.col("turn_idx"), F.lit(4)) == 1),
            F.concat(
                F.lit("I'm sorry, but I can't help with that. "),
                F.coalesce(F.col("text"), F.lit("")),
            ),
        ).otherwise(F.col("text")),
    )
    return assistant_refusals(planted)


def q_tool_json(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 10: per-tool JSON payload health. Tool-turn text
    # is OVERWRITTEN with five controlled variants by (cid*11 +
    # turn_idx) % 5 — valid+status, valid+status, truncated, unquoted
    # key, non-object — shapes on which Jackson (Spark) and yyjson
    # (DuckDB) provably agree (trailing commas / single quotes, where
    # they diverge, are never planted). Oracle: GENUINE DuckDB SQL —
    # same plant, json_valid + guarded json_extract, (tool, conv)
    # pre-agg.
    from feast_spark.operators.conversation import tool_call_json_stats

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("long")
    variant = F.pmod(idx * 11 + F.col("turn_idx"), F.lit(5))
    planted = t.withColumn(
        "text",
        F.when(
            F.col("role") == "tool",
            F.when(variant == 0, F.lit('{"status": "ok", "rows": 12}'))
            .when(variant == 1, F.lit('{"status": "error", "msg": "boom"}'))
            .when(variant == 2, F.lit('{"partial": true'))
            .when(variant == 3, F.lit('{bad: "key"}'))
            .otherwise(F.lit("plain text output")),
        ).otherwise(F.col("text")),
    )
    return tool_call_json_stats(planted)


def q_tool_args(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 12: per-tool JSON argument-key census (the
    # schema-drift lens). Tool-turn text is OVERWRITTEN with six
    # controlled variants by (cid*13 + turn_idx) % 6 — two canonical
    # status payloads, a nested object (top-level keys only), a RENAMED
    # key (the drift story), a truncated object and a non-object; the
    # parity surface (json_object_keys vs json_valid+json_type+json_keys)
    # was verified identical on all shapes incl. '{bad: "key"}' and
    # '[1, 2]'. Oracle: GENUINE DuckDB SQL — same plant, json_keys
    # unnest, (tool, key, conv) pre-agg, broadcast-equivalent totals
    # join.
    from feast_spark.operators.conversation import tool_arg_key_stats

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("long")
    variant = F.pmod(idx * 13 + F.col("turn_idx"), F.lit(6))
    planted = t.withColumn(
        "text",
        F.when(
            F.col("role") == "tool",
            F.when(variant == 0, F.lit('{"status": "ok", "rows": 12}'))
            .when(variant == 1, F.lit('{"status": "error", "msg": "boom"}'))
            .when(variant == 2, F.lit('{"status": "ok", "data": {"x": 1}}'))
            .when(variant == 3, F.lit('{"row_count": 12}'))
            .when(variant == 4, F.lit('{"partial": true'))
            .otherwise(F.lit("plain text output")),
        ).otherwise(F.col("text")),
    )
    return tool_arg_key_stats(planted)


def q_repair_order(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 12: timestamp-order repair — the ACTION for the
    # inversions conv_integrity detects. Same ts plant as
    # q_conv_integrity (every 7th conversation's turn 2 shifted back an
    # hour; both duplicate deliveries of that turn shift equally, so the
    # latest-ts dedup winner is unchanged). Oracle: GENUINE DuckDB SQL —
    # same plant, same dedup, the same (ts, turn_idx) rank window.
    from feast_spark.operators.conversation import repair_turn_order

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    planted = t.withColumn(
        "ts",
        F.when(
            (F.pmod(idx, F.lit(7)) == 0) & (F.col("turn_idx") == 2),
            F.col("ts") - F.expr("INTERVAL 1 HOUR"),
        ).otherwise(F.col("ts")),
    )
    return repair_turn_order(planted)


def q_rule_sweep(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 12: stopword-ratio threshold tuning curve over the
    # organic fixture — the gated '<'-direction rule exercises both the
    # gate bypass (non-en / short turns pass at every threshold) and the
    # complementary-cumulative bucket arm. Oracle: per-turn sweep cells
    # come from the SHARED rules.sweep_cells kernel (pandas replay, same
    # dedup); the histogram, curve join and 2^-20 unit math are GENUINE
    # DuckDB SQL.
    from feast_spark import rules
    from feast_spark.pipeline.quality import rule_threshold_sweep

    t = _transcripts_fixture(spark)
    return rule_threshold_sweep(t, "stopword_ratio", rules.RULE_SWEEP_GRID)


def q_rule_matrix(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 11: rule co-fire / ablation matrix. Plants
    # (cidx%6==1, variant=turn_idx%4, constants in rules.RULE_MATRIX_
    # PLANTS) force a 4-way co-fire, an exclusive too_short, a
    # repetition+toxicity pair and an exclusive stopword_ratio on top of
    # the fixture's organic co-occurrence. Oracle: per-turn bits come
    # from the SHARED rule_fail_bits kernel (pandas replay, same plants
    # + dedup); the pair explode and matrix are GENUINE DuckDB SQL.
    from feast_spark import rules
    from feast_spark.pipeline.quality import rule_cooccurrence

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    plantable = F.pmod(idx, F.lit(6)) == 1
    variant = F.pmod(F.col("turn_idx"), F.lit(4))
    expr = None
    for v, plant in enumerate(rules.RULE_MATRIX_PLANTS):
        cond = plantable & (variant == v)
        expr = (
            F.when(cond, F.lit(plant))
            if expr is None
            else expr.when(cond, F.lit(plant))
        )
    t = t.withColumn("text", expr.otherwise(F.col("text")))
    return rule_cooccurrence(t)


# planted by q_unicode_anomalies — one short payload per anomaly class
# (counts per plant: bidi 2, zero_width 3, replacement 2, c0 2, c1 2)
UANOM_PLANTS = [
    " \u202eover\u2069",
    "\u200bzw\u200d\ufeff",
    " bad\ufffd\ufffd",
    " c\x01tl\x7f",
    " mj\x80\x9f",
]


def _sql_str(s: str) -> str:
    """Render a Python string as a DuckDB expression, using chr() for
    every non-printable / non-ASCII codepoint so the SQL file stays
    visibly ASCII and the bytes match Spark's F.lit exactly."""
    parts: list[str] = []
    buf = ""
    for ch in s:
        if 32 <= ord(ch) < 127 and ch != "'":
            buf += ch
        else:
            if buf:
                parts.append(f"'{buf}'")
                buf = ""
            parts.append(f"chr({ord(ch)})")
    if buf:
        parts.append(f"'{buf}'")
    return "(" + " || ".join(parts) + ")" if parts else "''"


def q_unicode_anomalies(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 11: invisible/malformed-codepoint census. Turns at
    # (cidx*3 + turn_idx) % 10 == v (v in 0..4) get one class's payload
    # appended (bidi override, zero-width, U+FFFD, C0, C1). Oracle:
    # GENUINE DuckDB SQL — same plants via chr() concatenation, same
    # dedup, per-class regexp_replace('g') length-difference counts.
    from feast_spark.operators.textqa import unicode_anomaly_stats

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("long")
    variant = F.pmod(idx * 3 + F.col("turn_idx"), F.lit(10))
    txt = F.coalesce(F.col("text"), F.lit(""))
    expr = None
    for v, plant in enumerate(UANOM_PLANTS):
        cond = variant == v
        arm = F.concat(txt, F.lit(plant))
        expr = F.when(cond, arm) if expr is None else expr.when(cond, arm)
    t = t.withColumn("text", expr.otherwise(F.col("text")))
    return unicode_anomaly_stats(t)


def q_length_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 13: exact words-per-turn quantiles by role via the
    # global-sort-free grouped_quantiles kernel (one (role, value) hash
    # agg bounds everything by distinct-value cardinality; DECIMAL(38,0)
    # rank thresholds). Oracle: FULL genuine DuckDB SQL — same dedup,
    # same explicit-ASCII-class word counts, cumulative window over
    # distinct values, HUGEINT ceil-div rank.
    from feast_spark.operators.conversation import turn_length_quantiles

    return turn_length_quantiles(_transcripts_fixture(spark))


def q_script_mix(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 13: writing-script codepoint census per (script,
    # role) — the model-free complement of conv_language (codepoint
    # EVIDENCE vs classifier label). The fixture's organic multilingual
    # text exercises latin/digit/han/cyrillic; a deterministic plant
    # adds kana+hangul+arabic so more bands carry rows. Oracle: FULL
    # genuine DuckDB SQL — same plant via chr() concatenation, same
    # per-class regexp_replace('g') length-difference counts, HUGEINT
    # share units over role totals.
    from feast_spark.operators.textqa import script_mix_stats

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    txt = F.coalesce(F.col("text"), F.lit(""))
    planted = t.withColumn(
        "text",
        F.when(
            (F.pmod(idx, F.lit(8)) == 2) & (F.col("role") == "user"),
            F.concat(txt, F.lit(SCRIPT_MIX_PLANT)),
        ).otherwise(F.col("text")),
    )
    return script_mix_stats(planted)


# kana + hangul + arabic payload appended by q_script_mix (9 kana, 4
# hangul syllables, 5 arabic letters, 2 spaces — ws counts toward the
# role total only)
SCRIPT_MIX_PLANT = " こんにちはカタカナ 안녕하세مرحبا"


def q_zipf_profile(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 13: Zipf rank-frequency slope per source over the
    # documents table — exact integer log2 axes (length(bin(x)) - 1), so
    # the OLS numerator/denominator and the truncated-toward-zero
    # slope_units are bit-identical cross-engine. Every 7th doc is
    # remapped to a planted '__flood' source with a two-term vocabulary
    # (exercises the tiny-R arm and a maximal planted slope). Oracle:
    # FULL genuine DuckDB SQL.
    from feast_spark.operators.lexical import zipf_profile

    d = _t(spark, sf, "documents")
    flood = F.pmod("doc_id", F.lit(7)) == 0
    planted = d.withColumn(
        "source", F.when(flood, F.lit("__flood")).otherwise(F.col("source"))
    ).withColumn(
        "text",
        F.when(flood, F.expr("repeat('spam ham spam ', 20)")).otherwise(
            F.col("text")
        ),
    )
    return zipf_profile(planted, top_r=64)


def q_frequent_terms(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 13b: threshold heavy hitters — Misra-Gries
    # candidate sketch + exact broadcast-semi-join verify; the OUTPUT is
    # partitioning-independent and exactly "terms with cnt * k >
    # n_tokens", so the oracle is FULL genuine SQL (GROUP BY ... HAVING
    # with HUGEINT strict threshold). Every 2nd doc carries a planted
    # heavy bigram so qualification is exercised on both organic and
    # planted mass.
    from feast_spark.operators.lexical import frequent_terms

    d = _t(spark, sf, "documents")
    planted = d.withColumn(
        "text",
        F.concat(
            F.coalesce("text", F.lit("")),
            F.when(
                F.pmod("doc_id", F.lit(2)) == 0, F.lit(" zzheavy zzheavy")
            ).otherwise(F.lit("")),
        ),
    )
    return frequent_terms(planted, k=120)


def q_dataset_profile(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 14: integer data card — one melted (metric, value)
    # frame over the fixture (counts, role mix, exact length quantiles,
    # TTR, script chars, PII hit totals, global Zipf slope). Oracle:
    # FULL genuine DuckDB SQL — a UNION ALL of the proven per-lens
    # fragments (dedup CTE shared; PII/script patterns interpolated via
    # variables, never literally into the f-string).
    from feast_spark.operators.profile import dataset_profile

    return dataset_profile(_transcripts_fixture(spark))


def q_profile_drift(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 14: corpus drift report — the fixture split into
    # even/odd conv-index halves, one data card per side, full-outer
    # joined on metric with integer delta + guarded relative units.
    # Oracle: FULL genuine SQL (the SAME parameterized card SQL
    # instantiated per side).
    from feast_spark.operators.profile import profile_drift

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    return profile_drift(
        t.filter(F.pmod(idx, F.lit(2)) == 0),
        t.filter(F.pmod(idx, F.lit(2)) == 1),
    )


def q_tool_latency_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 14: exact per-tool latency quantiles (pytest-gate
    # extra — the window is full; tool_latency keeps the histogram form
    # in the driver artifact). Oracle: FULL genuine SQL — epoch_us lag,
    # positive-gap filter, ms quantization, the quantile fragment.
    from feast_spark.operators.conversation import tool_latency_quantiles

    return tool_latency_quantiles(_transcripts_fixture(spark))


def q_lang_script_agreement(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 14: classifier-vs-codepoint language agreement
    # (pytest-gate extra). Organic fixture: multilingual conversations
    # exercise en/es/zh labels against latin/han dominance and the
    # 'und'/no-script NULL arms. Oracle: turn langs from the SHARED
    # kernel relation (conv_language's pattern); mode, script dominance,
    # expectation map and agree flag all GENUINE SQL.
    from feast_spark.operators.conversation import language_script_agreement

    return language_script_agreement(_transcripts_fixture(spark))


def q_packing_sweep(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 15: seq-len tuning curve for document-isolated
    # packing — per-conversation word counts swept over 5 candidate
    # context lengths in ONE scan (broadcast literal dimension + one
    # dimension-sized agg). Every 11th conversation's text is blanked so
    # the n_empty arm carries rows. Oracle: FULL genuine DuckDB SQL —
    # same plant, same dedup, the proven word-count fragment, integer
    # ceil-div chunk counts, HUGEINT util units.
    from feast_spark.operators.conversation import _deduped, _word_count
    from feast_spark.operators.selection import packing_sweep

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    planted = t.withColumn(
        "text",
        F.when(F.pmod(idx, F.lit(11)) == 3, F.lit("")).otherwise(
            F.col("text")
        ),
    )
    counts = (
        _deduped(planted)
        .groupBy("conv_id")
        .agg(F.sum(_word_count("text")).cast("long").alias("n_tokens"))
    )
    return packing_sweep(counts, [32, 64, 128, 256, 512])


def q_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 15: shuffle-partition skew diagnostic on the raw
    # transcript delivery keyed by conv_id at 16 simulated partitions —
    # the fixture's organic mega-conversations (every 50th conv, 200
    # turns) produce a real hot bucket and a salt_hint > 1. Oracle: FULL
    # genuine DuckDB SQL (md5-48 partition simulation, deterministic
    # max-cnt-then-max-key hot key, HUGEINT balance/salt arithmetic).
    from feast_spark.operators.salting import shuffle_skew_report

    return shuffle_skew_report(
        _transcripts_fixture(spark), ["conv_id"], n_partitions=16
    )


def q_grounding(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 15: fabricated-figure / fabricated-link detector.
    # Plant (every 5th conversation): user turn 0 introduces number 4242
    # and https://ok.example/a; every later assistant turn repeats both
    # AND fabricates number 9191 + https://fab.example/b — so each
    # planted assistant turn carries exactly one grounded and one
    # ungrounded entity of each kind, on top of the fixture's organic
    # numbers. Oracle: FULL genuine DuckDB SQL (same plant, same
    # patterns via variable interpolation, distinct-entity streams,
    # min-source-index resolution, strict < comparison).
    from feast_spark.operators.conversation import assistant_grounding

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    sel = F.pmod(idx, F.lit(5)) == 1
    txt = F.coalesce(F.col("text"), F.lit(""))
    planted = t.withColumn(
        "text",
        F.when(
            sel & (F.col("role") == "user") & (F.col("turn_idx") == 0),
            F.concat(txt, F.lit(" ref 4242 see https://ok.example/a")),
        )
        .when(
            sel & (F.col("role") == "assistant") & (F.col("turn_idx") >= 1),
            F.concat(
                txt,
                F.lit(
                    " ref 4242 total 9191 https://ok.example/a"
                    " https://fab.example/b"
                ),
            ),
        )
        .otherwise(F.col("text")),
    )
    return assistant_grounding(planted)


def q_kmv_distinct(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 15: K-minimum-values distinct-count sketch — the
    # cardinality member of the sketch family (frequent_terms =
    # Misra-Gries mass): per-source vocabulary estimate from the k=256
    # smallest md5-48 term hashes. Deterministic hash -> the estimate is
    # bit-reproducible and the oracle is FULL genuine DuckDB SQL
    # (DISTINCT hash, ROW_NUMBER <= k, (k-1)*2^48 // max HUGEINT). The
    # exact contrast lives in source_vocab_stats (documented).
    from feast_spark.operators.lexical import kmv_estimate, kmv_sketch

    d = _t(spark, sf, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.coalesce("text", F.lit("")), "[ \t\n\x0b\f\r]+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    sk = kmv_sketch(toks, ["source"], "term", k=256)
    return kmv_estimate(sk, ["source"], k=256)


# driver-query weights for interleave_sources: 20 fixture sources at
# ratios 1..5 (W = 60); generated here so the oracle VALUES table is
# produced from the SAME dict (no hand-retyped dimension rows)
INTERLEAVE_WEIGHTS = {f"src{i}": 1 + i % 5 for i in range(20)}


def q_interleave(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 15b: stride-scheduling source-mixing order — every
    # prefix of the (sched_key, source, id) order holds the target
    # mixture (until a source exhausts). Oracle: FULL genuine DuckDB SQL
    # (md5-48 per-source rank replay + HUGEINT key arithmetic; weights
    # VALUES generated from INTERLEAVE_WEIGHTS).
    from feast_spark.operators.selection import interleave_sources

    return interleave_sources(
        _t(spark, sf, "documents"), INTERLEAVE_WEIGHTS
    )


def q_tool_loops(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 15b: stuck-agent / polling-loop detector —
    # identical tool payloads repeated within one conversation. Plant:
    # every 3rd conversation's tool turns all carry the same payload
    # AND tool name ('poll'), on top of any organic repeats (the
    # fixture has only ~10 organic same-(conv, tool) repeat pairs, all
    # with distinct payloads — the denser plant keeps the row count
    # meaningful at the fixture's 100 conversations). Oracle:
    # FULL genuine DuckDB SQL (same plant, same ws-normalization, md5-16
    # digest, HAVING >= 2).
    from feast_spark.operators.conversation import repeated_tool_calls

    t = _transcripts_fixture(spark)
    idx = F.substring("conv_id", 2, 9).cast("int")
    sel = (F.pmod(idx, F.lit(3)) == 1) & (F.col("role") == "tool")
    planted = t.withColumn(
        "text",
        F.when(sel, F.lit("status pending retry")).otherwise(F.col("text")),
    ).withColumn(
        "tool", F.when(sel, F.lit("poll")).otherwise(F.col("tool"))
    )
    return repeated_tool_calls(planted, min_calls=2)


def q_pack_ffd(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 15b: minimal-padding first-fit-decreasing packing
    # of whole turns into 96-token bins within md5 buckets — the waste
    # optimizer packing_sweep measures. Turn grain: id = conv_id:idx,
    # per-turn word counts, oversize turns filtered (the documented
    # chunk-first contract). Oracle: the SHARED ffd_pack_kernel replay
    # (FFD is sequential — no SQL form; the kernel IS the contract).
    from feast_spark.operators.conversation import _deduped, _word_count
    from feast_spark.operators.selection import pack_best_fit

    d = _deduped(_transcripts_fixture(spark))
    counts = d.select(
        F.concat_ws(
            ":", "conv_id", F.col("turn_idx").cast("string")
        ).alias("id"),
        _word_count("text").cast("long").alias("n_tokens"),
    ).filter("n_tokens > 0 and n_tokens <= 96")
    return pack_best_fit(counts, seq_len=96, bucket_docs=512)


def q_embedding_qa(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 15c: embedding-column health gate (the QA step
    # before ANN/semantic-dedup). Plants: every 17th vector NULLed,
    # every 13th zeroed, every 9th gets a NaN head element (dim
    # preserved via slice-concat) — CASE order matters and the oracle
    # replays it verbatim. Oracle: FULL genuine DuckDB SQL
    # (list_transform/list_filter/list_sum on the same double-widened
    # integer-quantized arithmetic; non-finite terms guarded on BOTH
    # engines).
    from feast_spark.operators.similarity import embedding_qa

    e = _t(spark, sf, "embeddings")
    planted = e.withColumn(
        "embedding",
        F.when(F.pmod("vec_id", F.lit(17)) == 8, F.lit(None))
        .when(
            F.pmod("vec_id", F.lit(13)) == 6,
            F.expr("transform(embedding, x -> cast(0.0 as float))"),
        )
        .when(
            F.pmod("vec_id", F.lit(9)) == 4,
            F.expr(
                "concat(array(cast('NaN' as float)),"
                " slice(embedding, 2, size(embedding) - 1))"
            ),
        )
        .otherwise(F.col("embedding")),
    )
    return embedding_qa(planted, expected_dim=64)


def q_bucketed_batches(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 15d (pytest-gate extra — the window is full):
    # length-bucketed batch assignment over per-doc word counts —
    # exact-log2 buckets, deterministic md5-order batches of 32.
    # Oracle: FULL genuine DuckDB SQL (bin() length, per-bucket
    # ROW_NUMBER over the md5-48 order, integer div/mod).
    from feast_spark.operators.selection import bucketed_batches

    from feast_spark.operators.selection import ws_word_count

    d = _t(spark, sf, "documents")
    counts = d.select("doc_id", ws_word_count("text").alias("n_tokens"))
    return bucketed_batches(counts, 32, id_col="doc_id")


def q_sentence_chunks(spark: SparkSession, sf: str) -> DataFrame:
    # round 5 session 16 (pytest-gate extra — the window is full):
    # sentence-aware chunking over documents at a 60-word target —
    # streaming-fill on sentence boundaries ([.!?]+ groups, the
    # readability boundary), chunks never split a sentence. Oracle:
    # FULL genuine DuckDB SQL (generate_subscripts ordinal unnest +
    # the same cumulative window + ordered string_agg).
    from feast_spark.operators.selection import sentence_chunks

    return sentence_chunks(_t(spark, sf, "documents"), target_words=60)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver correctness window: AT MOST 50 entries (the driver records
    only the first 50 — CORRECTNESS_r03 proved it), newest-first so every
    operator family added in the latest round lands a driver row. Rotated
    stable queries and the pre-merge single-purpose forms live in
    :func:`extra_queries`, which the pytest gate unions in.
    ``tests/test_entry_oracle.py::test_driver_query_window`` enforces the
    cap."""
    return {
        # round 5 session 13: exact grouped quantiles (words-per-turn by
        # role), writing-script codepoint census, and the Zipf
        # rank-frequency slope — all with FULL genuine DuckDB SQL
        # oracles. Rotated to extras: lm_perplexity (the LM family stays
        # driver-covered via doc_curation_lm), dsir_weights (importance
        # selection stays via token_budget/alpha_rates; moore_lewis
        # pytest-oracled), dup_clusters (the minhash family stays via
        # minhash_profile/neardup_verify/turn_dedup/semantic_dedup) —
        # all three carry green driver rows in r03+r04.
        # round 5 session 13b: threshold heavy hitters
        # (langid_classifier rotated to extras — the language family
        # stays driver-covered via conv_language + script_mix)
        # round 5 session 14: melted integer data card (conv_pii rotated
        # to extras — the PII family stays driver-covered via pii_echo +
        # the card's pii_*_hits rows)
        # round 5 session 15: packing seq-len tuning curve, shuffle-skew
        # diagnostic + salt hint, assistant grounding (fabricated
        # figures/links), KMV distinct-count sketch — all FULL genuine
        # DuckDB SQL oracles. Rotated to extras: quality_classifier
        # (trained-model family stays via doc_curation_lm + langid in
        # extras), conv_pack (packing stays via packing_sweep +
        # conv_pack_isolated/tokenize_pack extras), substring_dedup
        # (span family stays via doc_curation's span stage + span/para
        # extras), semantic_dedup (near-dup stays via minhash_profile +
        # neardup_verify + turn_dedup; ann/ivf/diverse extras) — all
        # four carry green r03+r04 driver rows.
        # round 5 session 15b: stride-scheduling mixture order, stuck-
        # agent tool-loop detector, FFD minimal-padding packing. Rotated
        # to extras: doc_curation_lm (LM family stays pytest-oracled;
        # perplexity rules stay in-window inside transcript_pipeline),
        # stream_window_parity and pit_last_click (green r01-r04 driver
        # rows — four artifacts of evidence; streaming + PIT stay
        # pytest-covered) — all three green in r03+r04.
        # round 5 session 15c: embedding health gate (label_drift
        # rotated to extras — the labels family stays in-window via
        # keep_drop_eval; embedding family regains its driver row)
        "embedding_qa": q_embedding_qa,
        "interleave": q_interleave,
        "tool_loops": q_tool_loops,
        "pack_ffd": q_pack_ffd,
        "packing_sweep": q_packing_sweep,
        "skew_report": q_skew_report,
        "grounding": q_grounding,
        "kmv_distinct": q_kmv_distinct,
        # round 5 session 14b: card-diff drift report (bm25_topk rotated
        # to extras — sparse retrieval stays pytest-oracled and benched)
        "profile_drift": q_profile_drift,
        "dataset_profile": q_dataset_profile,
        "frequent_terms": q_frequent_terms,
        "length_quantiles": q_length_quantiles,
        "script_mix": q_script_mix,
        "zipf_profile": q_zipf_profile,
        # round 5 session 12: rule threshold tuning curve (shared
        # sweep_cells kernel + genuine-SQL histogram/curve;
        # source_top_terms rotated to extras — the per-source family
        # stays driver-covered via source_vocab), per-tool JSON
        # argument-key census (schema drift; tool_errors rotated — the
        # tool family stays via tool_json/tool_latency/tool_args) and
        # timestamp-order repair (the conv_integrity ACTION;
        # conv_repetition rotated — repetition stays via suffix_loops +
        # the flagship's agent-loop gate)
        "rule_sweep": q_rule_sweep,
        "tool_args": q_tool_args,
        "repair_order": q_repair_order,
        # round 5 session 11: north-rule F1/agreement gate as an operator
        # (genuine-SQL confusion matrix + metric units) and the per-tool
        # latency histogram (integer log2 buckets)
        "keep_drop_eval": q_keep_drop_eval,
        "tool_latency": q_tool_latency,
        # round 5 session 11b: rule co-fire/ablation matrix (shared
        # rule_fail_bits kernel + genuine-SQL pair matrix) and the
        # invisible-codepoint census (fully genuine SQL oracle)
        "rule_matrix": q_rule_matrix,
        "unicode_anomalies": q_unicode_anomalies,
        # round 5 session 10: alternation repair, context-window fit,
        # system-prompt census, special-token leakage census — all with
        # genuine DuckDB SQL oracles over the raw turns
        "alternation_repair": q_alternation_repair,
        "context_fit": q_context_fit,
        "system_prompts": q_system_prompts,
        "special_tokens": q_special_tokens,
        "refusal_stats": q_refusal_stats,
        "tool_json": q_tool_json,
        # round 5 session 7: MinHash threshold-retention profile
        # (candidate-estimate histogram, genuine-SQL aggregation oracle)
        # + quality-ordered token-budget carving (full genuine-SQL
        # oracle incl. the md5-48 tie order and running-sum cut)
        "minhash_profile": q_minhash_profile,
        "token_budget": q_token_budget,
        # round 5 session 6: truncated-generation QA, decode-loop
        # detector
        "truncation": q_truncation,
        "suffix_loops": q_suffix_loops,
        "conv_language": q_conv_language,
        # round 5 session 5: edit-similarity verification of LSH
        # candidate pairs (genuine-SQL levenshtein oracle)
        "neardup_verify": q_neardup_verify,
        "assistant_echo": q_assistant_echo,
        "source_vocab": q_source_vocab,
        "code_blocks": q_code_blocks,
        # round 5 session 4: reply latency, tool-transition graph,
        # per-turn n-gram novelty, response-length trend
        "conv_integrity": q_conv_integrity,
        "role_diversity": q_role_diversity,
        # round 5 session 4b: fork detection, template mining, shape
        # histogram
        "conv_forks": q_conv_forks,
        "conv_templates": q_conv_templates,
        # round 5 session 9: cross-role PII leakage, per-tool failure
        # census, fork-prefix masking (the conv_forks curation action)
        # (tool_errors rotated to extras in s12)
        "pii_echo": q_pii_echo,
        "fork_mask": q_fork_mask,
        "pref_pairs": q_pref_pairs,
        # round 5 session 3: turn-grain cross-conversation dedup
        # (conv_repetition rotated to extras in s12)
        "turn_dedup": q_turn_dedup,
        "conv_contamination": q_conv_contamination,
        # round 5 session 2: per-language tokenizer fertility
        # (cdc_neardup, and in s11b blocklist_hits + html_extract,
        # rotated to extras — the fuzzy near-dup family stays
        # driver-covered via dup_clusters, neardup_verify,
        # minhash_profile, turn_dedup, semantic_dedup)
        "token_fertility": q_token_fertility,
        # round 5: weighted sampling (para_neardup and, in s12,
        # source_top_terms rotated to extras — same family coverage
        # notes)
        "alpha_rates": q_alpha_rates,
        # round 4 session 6: conversation-level operators (transcripts)
        # + Gopher repetition rule family + NFC normalization + C4 line
        # cleaning + lexical diversity
        "conv_curate": q_conv_curate,
        # round 4: trained langid + LM + source cap + quantile calibration
        # + reference-fidelity label resolution + trained classifier
        # flagship + round-3 selection family
        "transcript_pipeline": q_transcript_pipeline,
        "doc_curation": q_doc_curation,
        # round 2-3 operators
        # core relational / PIT surface
    }


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Oracle-checked queries OUTSIDE the driver's 50-entry window: rotated
    stable queries plus the single-purpose originals of the merged
    families. pytest runs queries() ∪ extra_queries() against
    oracle_sql() ∪ extra_oracle_sql() — coverage is unchanged, only the
    driver artifact is capped."""
    return {
        # round 5 session 15d/16 pytest-gate extras (no window cost)
        "bucketed_batches": q_bucketed_batches,
        "sentence_chunks": q_sentence_chunks,
        # rotated round 5 session 15c (labels family stays in-window
        # via keep_drop_eval)
        "label_drift": q_label_drift,
        # rotated round 5 session 15b (green r03+r04 rows; pit/stream
        # green since r01)
        "doc_curation_lm": q_doc_curation_lm,
        "stream_window_parity": q_stream_window_parity,
        "pit_last_click": q_pit_last_click,
        # rotated round 5 session 15 (all four carry green r03+r04
        # driver rows — family coverage notes in queries())
        "quality_classifier": q_quality_classifier,
        "conv_pack": q_conv_pack,
        "substring_dedup": q_substring_dedup,
        "semantic_dedup": q_semantic_dedup,
        # rotated round 5 session 13 (still pytest-oracled here; all
        # three carry green r03+r04 driver rows — family coverage notes
        # in queries())
        "tool_latency_q": q_tool_latency_quantiles,
        "lang_script_agree": q_lang_script_agreement,
        "lm_perplexity": q_lm_perplexity,
        "dsir_weights": q_dsir_weights,
        "dup_clusters": q_dup_clusters,
        "langid_classifier": q_langid_classifier,
        "conv_pii": q_conv_pii,
        "bm25_topk": q_bm25_topk,
        # rotated round 5 session 12 (still pytest-oracled here; the
        # per-source family stays driver-covered via source_vocab, the
        # tool family via tool_json/tool_latency/tool_args, repetition
        # via suffix_loops + the flagship's agent-loop gate)
        "source_top_terms": q_source_top_terms,
        "tool_errors": q_tool_errors,
        "conv_repetition": q_conv_repetition,
        # rotated round 5 session 11 (still pytest-oracled here; the
        # fuzzy near-dup family stays driver-covered via dup_clusters,
        # neardup_verify, minhash_profile, turn_dedup, semantic_dedup)
        "para_neardup": q_para_neardup,
        "cdc_neardup": q_cdc_neardup,
        "blocklist_hits": q_blocklist_hits,
        "html_extract": q_html_extract,
        # rotated round 5 session 10 (still pytest-oracled here; window
        # keeps same-family siblings: truncation/suffix_loops for textqa,
        # token_budget/alpha_rates for selection, cross-source lenses via
        # source_vocab/source_top_terms)
        "readability": q_readability,
        "source_overlap": q_source_overlap,
        "holdout_split": q_holdout_split,
        "unimax_sample": q_unimax_sample,
        "pseudonymize": q_pseudonymize,
        "drift_psi": q_drift_psi,
        # rotated round 5 session 9 (still pytest-oracled here; PII stays
        # driver-covered via conv_pii + pii_echo, drift via drift_psi,
        # conv shape via conv_forks/conv_templates/role_diversity)
        "pii_exposure": q_pii_exposure,
        "role_patterns": q_role_patterns,
        "drift_categorical": q_drift_categorical,
        "turn_neardup": q_turn_neardup,
        # rotated round 5 session 8 (still pytest-oracled here; conv-grain
        # analytics stay driver-covered via conv_integrity, assistant_echo,
        # conv_repetition)
        "reply_latency": q_reply_latency,
        "turn_novelty": q_turn_novelty,
        "compressibility": q_compressibility,
        "conv_pack_isolated": q_conv_pack_isolated,
        # rotated round 5 session 7 (still pytest-oracled here; the span
        # family stays driver-covered via substring_dedup, sampling via
        # unimax_sample + token_budget)
        "span_dedup": q_span_dedup,
        "weighted_sample": q_weighted_sample,
        # rotated round 5 session 6 (still pytest-oracled here; driver
        # siblings: conv_contamination keeps decontamination in-window,
        # semantic_dedup keeps the embedding family, pit_last_click +
        # transcript_pipeline keep scan/PIT/scalar surfaces covered)
        "contamination_check": q_contamination_check,
        "diverse_sample": q_diverse_sample,
        "scalar_exprs": q_scalar_exprs,
        "pull_scan": q_pull_scan,
        "tool_transitions": q_tool_transitions,
        "turn_length_trend": q_turn_length_trend,
        # rotated round 5 session 5 (still pytest-oracled here; packing
        # stays driver-covered via conv_pack/conv_pack_isolated, fuzzy
        # near-dup via minhash/cdc/turn/para + the new verify stage)
        "tokenize_pack": q_tokenize_pack,
        "doc_jaccard_prefix": q_doc_jaccard_prefix,
        "moore_lewis": q_moore_lewis,
        "label_resolve_recency": q_label_resolve_recency,
        # rotated round 5 session 4b (still pytest-oracled here; driver
        # siblings: reply_latency/conv_repetition cover the transcript
        # window family, clean_lines/gopher cover lexical, labels stay
        # covered via label_resolve_recency)
        "conv_structure": q_conv_structure,
        "gopher_repetition": q_gopher_repetition,
        "derived_view_historical": q_derived_view_historical,
        "session_window_agg": q_session_window_agg,
        "historical_two_views": q_historical_two_views,
        "sessionize": q_sessionize,
        "lexical_stats": q_lexical_stats,
        "label_majority_vote": q_label_majority_vote,
        # rotated round 5 session 4 (still pytest-oracled here; each has
        # a same-family sibling left in the driver window: conv_pii,
        # weighted_sample, lexical_stats, para_neardup)
        "pii_stats": q_pii_stats,
        "exact_k_sample": q_exact_k_sample,
        "clean_lines": q_clean_lines,
        "paragraph_dedup": q_paragraph_dedup,
        # rotated round 5 session 3 (still pytest-oracled here)
        "lm_buckets": q_lm_buckets,
        "conv_windows": q_conv_windows,
        "conv_render": q_conv_render,
        "text_normalize": q_text_normalize,
        "source_cap": q_source_cap,
        "quality_calibrate": q_quality_calibrate,
        # round 5 session 2 pytest-window additions + rotations
        "doc_curation_blocklist": q_doc_curation_blocklist,
        "doc_curation_neardup": q_doc_curation_neardup,
        "ann_lsh_topk": q_ann_lsh_topk,
        "doc_quality_scores": q_doc_quality_scores,
        "doc_simhash_pairs": q_doc_simhash_pairs,
        "doc_minhash_pairs": q_doc_minhash_pairs,
        # rotated round 5 (still pytest-oracled here)
        "doc_bpe_tokens": q_doc_bpe_tokens,
        "stratified_sample": q_stratified_sample,
        "top_ngrams": q_top_ngrams,
        "doc_chunks": q_doc_chunks,
        "doc_packing": q_doc_packing,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "doc_winnow_pairs": q_doc_winnow_pairs,
        "latest_dedup": q_latest_dedup,
        "pit_entityless": q_pit_entityless,
        "image_metadata": q_image_metadata,
        "field_mapping_scan": q_field_mapping_scan,
        "odfv_post_agg": q_odfv_post_agg,
        "dqm_profile": q_dqm_profile,
        "pit_created_cutoff": q_pit_created_cutoff,
        "two_role_join": q_two_role_join,
        "entity_union": q_entity_union,
        "agg_spec": q_agg_spec,
        "odfv_request_scale": q_odfv_request_scale,
        "pit_ttl_1h": q_pit_ttl_1h,
        "ann_cosine_topk": q_ann_cosine_topk,
        "setops": q_setops,
        "rollup_cube": q_rollup_cube,
        "sliding_window_agg": q_sliding_window_agg,
        "histogram": q_histogram,
        "top_event_types": q_top_event_types,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_exact_dedup": q_doc_exact_dedup,
        "pull_all_window": q_pull_all_window,
        "pull_latest_events": q_pull_latest_events,
        "cross_join_share": q_cross_join_share,
        "tpch_q1": q_tpch_q1,
        "hourly_window_agg": q_hourly_window_agg,
        "numeric_stats": q_numeric_stats,
        "row_id_synthesis": q_row_id_synthesis,
        "interval_arithmetic": q_interval_arithmetic,
        "json_extract": q_json_extract,
        "doc_token_stats": q_doc_token_stats,
        "doc_bigram_jaccard": q_doc_bigram_jaccard,
        "pivot_event_types": q_pivot_event_types,
        "semi_anti_join": q_semi_anti_join,
        "intersect_except": q_intersect_except,
        "rollup_orders": q_rollup_orders,
        "cube_events": q_cube_events,
        "embedding_neardup": q_embedding_neardup,
        "mixture_sample": q_mixture_sample,
        "export_shards": q_export_shards,
        "doc_curation_clf": q_doc_curation_clf,
        "transcript_pipeline_loop": q_transcript_pipeline_loop,
        "conv_neardup": q_conv_neardup,
        "bpe_tokens": q_bpe_tokens,
    }


def oracle_sql() -> dict[str, str]:
    """Oracles for the driver window — keys ⊆ queries() keys."""
    qs = queries()
    return {k: v for k, v in _all_oracle_sql().items() if k in qs}


def extra_oracle_sql() -> dict[str, str]:
    """Oracles for the rotated/pre-merge queries (pytest gate only)."""
    qs = queries()
    return {k: v for k, v in _all_oracle_sql().items() if k not in qs}


def _all_oracle_sql() -> dict[str, str]:
    # hash/model-based relations get an INDEPENDENT driver-side naive
    # recomputation (numpy/pandas, no Spark) materialized to parquet —
    # see feast_spark/oracles.py for the method and bit-exactness notes.
    from feast_spark.oracles import ensure_oracles

    derived = ensure_oracles(_oracle_sf_dir())

    def _rp(name: str) -> str:
        return f"SELECT * FROM read_parquet('{derived[name]}')"

    # PII patterns interpolated as VARIABLES: embedding them literally in
    # an f-string would re-parse {2,} as a format field and \b as a
    # backspace escape (single-quoted SQL literals then keep whatever
    # survived) — the variable hop passes the exact pattern bytes through
    from feast_spark.rules import SCRUB_PATTERNS as _SP

    from feast_spark.operators.textqa import _FENCE_PATTERN as _fence

    _ascii_pat = r"[^\x20-\x7E]"  # printable-ASCII projection (verify)
    _epat = dict((n, p) for n, p, _ in _SP)["email"]
    _ppat = dict((n, p) for n, p, _ in _SP)["phone"]

    from feast_spark.operators.conversation import TOOL_ERROR_PATTERN as _terr

    # holdout_split cut points: EXACTLY assign_split's accumulation
    # (cum += frac per split name, int(cum * 2^48)) so the SQL compares
    # against bit-identical integers
    _hs_cum, _hs_cuts = 0.0, []
    for _frac in (0.8, 0.1):
        _hs_cum += _frac
        _hs_cuts.append(int(_hs_cum * (1 << 48)))

    # rule_matrix: the rules dimension as a VALUES table (name, bit pos)
    from feast_spark import rules as _rules_mod
    from feast_spark.operators.textqa import (
        UNICODE_ANOMALY_CLASSES as _uanom_classes,
    )

    _rule_values = ", ".join(
        f"('{n}', {i})" for i, n in enumerate(_rules_mod.RULE_ORDER)
    )
    # unicode_anomalies: plants rendered via chr() (exact byte parity
    # with the Spark F.lit constants) and one counting arm per class —
    # the class patterns hop through variables so their braces/
    # backslashes never meet the f-string parser (the conv_contamination
    # lesson)
    _uanom_case = " ".join(
        f"WHEN {v} THEN coalesce(text, '') || {_sql_str(p)}"
        for v, p in enumerate(UANOM_PLANTS)
    )
    _uanom_arms = " UNION ALL ".join(
        f"SELECT conv_id, role, '{k}' AS kind, length(t) -"
        f" length(regexp_replace(t, '{p}', '', 'g')) AS cnt FROM d"
        for k, p in _uanom_classes
    )
    # refusal_stats / special_tokens marker dimensions: generated from
    # the SAME Python constants the Spark operators default to, so an
    # edit to either list cannot drift the oracle (the _rule_values
    # pattern — no hand-retyped VALUES rows).
    from feast_spark.operators.conversation import (
        DEFAULT_REFUSAL_MARKERS as _refusal_markers,
    )
    from feast_spark.operators.textqa import (
        DEFAULT_SPECIAL_MARKERS as _special_markers,
    )

    _refusal_values = ", ".join(f"({_sql_str(m)})" for m in _refusal_markers)
    _special_values = ", ".join(f"({_sql_str(m)})" for m in _special_markers)
    # rule_sweep grid dimension — generated from the SAME constant the
    # Spark query sweeps (repr() keeps the exact double literal text;
    # CAST AS DOUBLE because bare DuckDB decimals parse as DECIMAL)
    _sweep_values = ", ".join(
        f"({i}, CAST({t!r} AS DOUBLE))"
        for i, t in enumerate(_rules_mod.RULE_SWEEP_GRID)
    )

    # session 13: probes / script classes generated from the SAME
    # constants the Spark operators use (no hand-retyped dimensions);
    # script patterns hop through f-string VARIABLES (their \x{..}
    # braces would otherwise parse as format fields)
    from feast_spark.operators.conversation import (
        DEFAULT_LENGTH_PROBES as _len_probes,
    )
    from feast_spark.operators.textqa import SCRIPT_CLASSES as _script_classes

    _probe_values = ", ".join(
        f"(CAST({int(v)} AS BIGINT))" for v in _len_probes
    )
    from feast_spark.rules import SCRUB_PATTERNS as _scrub_all

    _card_pii_arms = "\n              UNION ALL ".join(
        f"SELECT 'pii_{k}_hits' AS metric,"
        f" CAST(COALESCE(SUM(len(regexp_extract_all(t, '{pat}'))), 0)"
        f" AS BIGINT) AS value FROM d2"
        for k, pat, _ in _scrub_all
    )
    _card_script_arms = "\n              UNION ALL ".join(
        f"SELECT 'script_chars_{k}' AS metric,"
        f" CAST(SUM(length(t) - length(regexp_replace(t, '{pat}', '',"
        f" 'g'))) AS BIGINT) AS value FROM d2"
        for k, pat in _script_classes
    )
    from feast_spark.operators.conversation import (
        LANG_SCRIPT_EXPECTATIONS as _lang_script_map,
    )

    _agree_script_arms = "\n              UNION ALL ".join(
        f"SELECT conv_id, '{k}' AS script, length(t) -"
        f" length(regexp_replace(t, '{pat}', '', 'g')) AS cnt FROM d2"
        for k, pat in _script_classes
    )
    _agree_exp_values = ", ".join(
        f"('{lang}', '{script}')"
        for lang, script in sorted(_lang_script_map.items())
    )
    _card_probe_values = ", ".join(
        f"({p_}, '{n_}')"
        for p_, n_ in (
            (524288, "words_p50"), (943718, "words_p90"),
            (1038090, "words_p99"),
        )
    )
    _script_arms = "\n              UNION ALL ".join(
        f"SELECT conv_id, role, '{k}' AS script, length(t) -"
        f" length(regexp_replace(t, '{pat}', '', 'g')) AS cnt FROM d2"
        for k, pat in _script_classes
    )

    def _card_sql(raw_where: str) -> str:
        # the dataset_profile card as a self-contained SELECT (CTEs
        # inside), parameterized by a raw-relation predicate so
        # profile_drift can instantiate it once per side
        return f"""
            -- FULL genuine-SQL twin of dataset_profile: shared dedup
            -- CTE, one arm per lens, UNION ALL melt. Script classes
            -- with zero hits are absent BY CONTRACT; zero-hit PII
            -- patterns stay (a vanished pattern is drift).
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
              WHERE {raw_where}
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM raw
              ) WHERE rn = 1
            ), d2 AS (
              SELECT conv_id, role, COALESCE(text, '') AS t FROM d
            ), wc AS (
              SELECT CAST(len(list_filter(string_split_regex(t,
                '[ \t\n\x0b\f\r]+'), x -> x <> '')) AS BIGINT) AS v
              FROM d2
            ), wcc AS (
              SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM wc GROUP BY v
            ), wcum AS (
              SELECT v,
                CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cum,
                CAST(SUM(cnt) OVER () AS BIGINT) AS n
              FROM wcc
            ), qprobes AS (
              SELECT * FROM (VALUES {_card_probe_values})
                p(probe_units, metric)
            ), qhit AS (
              SELECT metric, v, cum,
                CAST((CAST(probe_units AS HUGEINT) * n + 1048575)
                     // 1048576 AS BIGINT) AS rnk
              FROM wcum CROSS JOIN qprobes
            ), tf AS (
              SELECT term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM (
                SELECT unnest(list_filter(string_split_regex(t,
                  '[ \t\n\x0b\f\r]+'), x -> x <> '')) AS term
                FROM d2
              ) GROUP BY term
            ), zrk AS (
              SELECT *, ROW_NUMBER() OVER (
                ORDER BY tf DESC, term) AS rank
              FROM tf
            ), ztop AS (
              SELECT CAST(length(bin(rank)) - 1 AS BIGINT) AS lx,
                CAST(length(bin(tf)) - 1 AS BIGINT) AS ly
              FROM zrk WHERE rank <= 256
            ), za AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
                SUM(lx) AS sx, SUM(ly) AS sy,
                SUM(lx * ly) AS sxy, SUM(lx * lx) AS sxx
              FROM ztop
            ), melted AS (
              SELECT 'n_turns_raw' AS metric,
                CAST(COUNT(*) AS BIGINT) AS value FROM raw
              UNION ALL SELECT 'n_turns', CAST(COUNT(*) AS BIGINT) FROM d
              UNION ALL SELECT 'n_convs',
                CAST(COUNT(DISTINCT conv_id) AS BIGINT) FROM d
              UNION ALL SELECT 'n_words',
                CAST(COALESCE(SUM(len(list_filter(string_split_regex(t,
                  '[ \t\n\x0b\f\r]+'), x -> x <> ''))), 0)
                  AS BIGINT) FROM d2
              UNION ALL SELECT 'n_chars',
                CAST(COALESCE(SUM(length(t)), 0) AS BIGINT) FROM d2
              UNION ALL SELECT 'turns_role_' || role,
                CAST(COUNT(*) AS BIGINT) FROM d2 GROUP BY role
              UNION ALL {_card_script_arms}
              UNION ALL {_card_pii_arms}
              UNION ALL
              SELECT metric, CAST(MIN(v) AS BIGINT)
              FROM qhit WHERE cum >= rnk GROUP BY metric
              UNION ALL SELECT 'ttr_units',
                CAST((CAST(COUNT(*) AS HUGEINT) * 1048576) // SUM(tf)
                  AS BIGINT) FROM tf HAVING SUM(tf) IS NOT NULL
              UNION ALL
              SELECT 'zipf_slope_units',
                CAST(((n_terms * sxy - sx * sy) * 1048576)
                     // (n_terms * sxx - sx * sx) AS BIGINT)
              FROM za WHERE n_terms * sxx - sx * sx <> 0
            )
            SELECT metric, value FROM melted
            WHERE metric NOT LIKE 'script_chars_%' OR value > 0
        """

    # session 15b: interleave weights VALUES generated from the SAME
    # INTERLEAVE_WEIGHTS dict the Spark query passes (sorted for
    # stability); W is its sum
    _ilw_values = ", ".join(
        f"('{k}', {int(v)})" for k, v in sorted(INTERLEAVE_WEIGHTS.items())
    )
    _ilw_total = sum(int(v) for v in INTERLEAVE_WEIGHTS.values())

    # session 15: grounding entity arms generated from the SAME
    # GROUNDING_PATTERNS constant the Spark operator scans (kind,
    # pattern, min_len) — patterns reach the SQL through plain string
    # concatenation, never through an f-string literal (the
    # conv_contamination format-field lesson)
    from feast_spark.operators.conversation import (
        GROUNDING_PATTERNS as _gpats,
    )

    _ground_arms = "\n              UNION ALL\n".join(
        f"""              SELECT conv_id, turn_idx, role, '{k}' AS kind,
                unnest(list_distinct(list_filter(regexp_extract_all(
                  COALESCE(text, ''), '{pat}'), x -> length(x) >= {ml})))
                AS ent
              FROM gd"""
        for k, pat, ml in _gpats
    )

    return {
        "sentence_chunks": """
            -- FULL genuine-SQL twin of sentence_chunks(60) over
            -- documents: [.!?]+ sentence groups, ws-collapse trim,
            -- empty fragments dropped, cumulative-words streaming
            -- fill, ordered string_agg re-join
            WITH lst AS (
              SELECT doc_id,
                string_split_regex(COALESCE(text, ''), '[.!?]+') AS l
              FROM documents
            ), sp AS (
              SELECT doc_id, unnest(l) AS s0,
                generate_subscripts(l, 1) AS i
              FROM lst
            ), tr AS (
              SELECT doc_id, i,
                trim(regexp_replace(s0, '[ \t\n\x0b\f\r]+', ' ', 'g'))
                  AS s
              FROM sp
            ), ne AS (
              SELECT doc_id,
                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS i,
                s, CAST(len(string_split(s, ' ')) AS BIGINT) AS w
              FROM tr WHERE s <> ''
            ), cu AS (
              SELECT *, CAST(COALESCE(SUM(w) OVER (
                  PARTITION BY doc_id ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // 60 AS BIGINT) AS chunk_idx
              FROM ne
            )
            SELECT doc_id, chunk_idx,
              string_agg(s, ' ' ORDER BY i) AS chunk_text,
              CAST(COUNT(*) AS BIGINT) AS n_sentences,
              CAST(SUM(w) AS BIGINT) AS n_words
            FROM cu GROUP BY 1, 2
        """,
        "bucketed_batches": """
            -- FULL genuine-SQL twin of bucketed_batches(32) over
            -- per-doc word counts: bin()-length log2 buckets, md5-48
            -- order ROW_NUMBER, integer div/mod batch coordinates
            WITH wc AS (
              SELECT doc_id,
                CAST(len(list_filter(string_split_regex(
                  COALESCE(text, ''), '[ \t\n\x0b\f\r]+'),
                  x -> x <> '')) AS BIGINT) AS n
              FROM documents
            ), it AS (
              SELECT doc_id, n FROM wc WHERE n > 0
            ), r AS (
              SELECT doc_id, n,
                CAST(length(bin(n)) - 1 AS BIGINT) AS bucket,
                ROW_NUMBER() OVER (
                  PARTITION BY length(bin(n))
                  ORDER BY CAST('0x' || substr(
                    md5('bb1' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT),
                    doc_id
                ) - 1 AS rnk
              FROM it
            )
            SELECT doc_id, n AS n_tokens, bucket,
              CAST(rnk // 32 AS BIGINT) AS batch_idx,
              CAST(rnk % 32 AS BIGINT) AS slot
            FROM r
        """,
        "embedding_qa": """
            -- FULL genuine-SQL twin of embedding_qa under the
            -- NULL/zero/NaN plants (CASE order identical to the Spark
            -- query): per-element double-widened floor(x^2 * 2^30)
            -- with NULL/NaN/Inf terms guarded to 0, BIGINT sums,
            -- the same qa_ok conjunction
            WITH pl AS (
              SELECT vec_id,
                CASE
                  WHEN vec_id % 17 = 8 THEN NULL
                  WHEN vec_id % 13 = 6
                    THEN list_transform(embedding, x -> 0.0::FLOAT)
                  WHEN vec_id % 9 = 4
                    THEN list_concat(['NaN'::FLOAT], embedding[2:])
                  ELSE embedding END AS v
              FROM embeddings
            ), m AS (
              SELECT vec_id,
                CAST(CASE WHEN v IS NULL THEN -1 ELSE len(v) END AS BIGINT)
                  AS dim,
                CAST(CASE WHEN v IS NULL THEN 0 ELSE
                  len(list_filter(v, x -> isnan(x))) END AS BIGINT) AS n_nan,
                CAST(CASE WHEN v IS NULL THEN 0 ELSE
                  len(list_filter(v, x -> isinf(x))) END AS BIGINT) AS n_inf,
                CAST(CASE WHEN v IS NULL THEN 0 ELSE
                  len(list_filter(v, x -> x IS NULL)) END AS BIGINT)
                  AS n_null,
                CAST(CASE WHEN v IS NULL THEN 0 ELSE
                  len(list_filter(v, x -> x = 0.0)) END AS BIGINT) AS n_zero,
                CAST(CASE WHEN v IS NULL THEN -1 ELSE
                  COALESCE(list_sum(list_transform(v, x ->
                    CASE WHEN x IS NULL OR isnan(x) OR isinf(x) THEN 0
                         ELSE CAST(floor(CAST(x AS DOUBLE) *
                              CAST(x AS DOUBLE) * 1073741824.0) AS BIGINT)
                    END)), 0) END AS BIGINT) AS norm2_units
              FROM pl
            )
            SELECT vec_id, dim, n_nan, n_inf, n_null, n_zero, norm2_units,
              dim = 64 AND n_nan = 0 AND n_inf = 0 AND n_null = 0
                AND norm2_units > 0 AS qa_ok
            FROM m
        """,
        "interleave": f"""
            -- FULL genuine-SQL twin of interleave_sources over the
            -- documents table: per-source md5-48 rank order, stride key
            -- src_rank * W div w (HUGEINT numerator); weights VALUES
            -- generated from INTERLEAVE_WEIGHTS
            WITH w AS (
              SELECT * FROM (VALUES {_ilw_values}) w(source, wt)
            ), j AS (
              SELECT doc_id, d.source, wt
              FROM documents d JOIN w USING (source)
            ), r AS (
              SELECT doc_id, source, wt,
                ROW_NUMBER() OVER (
                  PARTITION BY source
                  ORDER BY CAST('0x' || substr(
                    md5('il1' || CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT),
                    doc_id
                ) AS src_rank
              FROM j
            )
            SELECT doc_id, source, CAST(src_rank AS BIGINT) AS src_rank,
              CAST((CAST(src_rank AS HUGEINT) * {_ilw_total}) // wt
                   AS BIGINT) AS sched_key
            FROM r
        """,
        "tool_loops": f"""
            -- FULL genuine-SQL twin of repeated_tool_calls under the
            -- every-3rd-conversation plant (all tool turns carry the
            -- same payload and the 'poll' tool name): same ws
            -- normalization, md5-16 digest, HAVING n_calls >= 2
            WITH pl AS (
              SELECT conv_id, turn_idx, role, tool, ts,
                CASE WHEN CAST(substring(conv_id, 2, 9) AS INTEGER) % 3 = 1
                          AND role = 'tool'
                     THEN 'status pending retry' ELSE text END AS text,
                CASE WHEN CAST(substring(conv_id, 2, 9) AS INTEGER) % 3 = 1
                          AND role = 'tool'
                     THEN 'poll' ELSE tool END AS tool2
              FROM read_parquet('{derived["transcripts_raw"]}')
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM pl
              ) WHERE rn = 1
            ), c AS (
              SELECT conv_id, tool2 AS tool, turn_idx,
                trim(regexp_replace(COALESCE(text, ''),
                     '[ \t\n\x0b\f\r]+', ' ', 'g')) AS norm
              FROM d WHERE role = 'tool' AND tool2 IS NOT NULL
            ), c2 AS (
              SELECT conv_id, tool, turn_idx,
                substr(md5(norm), 1, 16) AS call_digest
              FROM c WHERE length(norm) > 0
            )
            SELECT conv_id, tool, call_digest,
              CAST(COUNT(*) AS BIGINT) AS n_calls,
              MIN(turn_idx) AS first_idx,
              MAX(turn_idx) AS last_idx
            FROM c2 GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
        """,
        "pack_ffd": _rp("pack_ffd"),
        "packing_sweep": f"""
            -- FULL genuine-SQL twin of packing_sweep over per-conv word
            -- counts (every 11th conversation blanked -> the n_empty
            -- arm): same plant, same dedup, the proven word-count
            -- fragment, integer ceil-div chunk counts, HUGEINT util
            WITH pl AS (
              SELECT conv_id, turn_idx, role, tool, ts,
                CASE WHEN CAST(substring(conv_id, 2, 9) AS INTEGER) % 11 = 3
                     THEN '' ELSE text END AS text
              FROM read_parquet('{derived["transcripts_raw"]}')
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM pl
              ) WHERE rn = 1
            ), wc AS (
              SELECT conv_id, CAST(SUM(len(list_filter(string_split_regex(
                COALESCE(text, ''), '[ \t\n\x0b\f\r]+'),
                x -> x <> ''))) AS BIGINT) AS n
              FROM d GROUP BY conv_id
            ), dim AS (
              SELECT CAST(seq_len AS BIGINT) AS seq_len
              FROM (VALUES (32), (64), (128), (256), (512)) v(seq_len)
            ), per AS (
              SELECT seq_len, n, (n + seq_len - 1) // seq_len AS nseq
              FROM wc CROSS JOIN dim
            ), agg AS (
              SELECT seq_len,
                CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_items,
                CAST(SUM(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_empty,
                CAST(SUM(nseq) AS BIGINT) AS n_seqs,
                CAST(SUM(n) AS BIGINT) AS n_tokens
              FROM per GROUP BY seq_len
            )
            SELECT seq_len, n_items, n_empty, n_seqs,
              n_seqs - n_items AS n_splits, n_tokens,
              n_seqs * seq_len - n_tokens AS n_pad,
              CASE WHEN n_seqs = 0 THEN CAST(-1 AS BIGINT)
                   ELSE CAST((CAST(n_tokens AS HUGEINT) * 1048576)
                             // (n_seqs * seq_len) AS BIGINT)
              END AS util_units
            FROM agg
        """,
        "skew_report": f"""
            -- FULL genuine-SQL twin of shuffle_skew_report(conv_id, 16)
            -- over the RAW delivery: md5-48 partition simulation,
            -- deterministic max-cnt-then-max-key hot key, HUGEINT
            -- balance/salt arithmetic, empty partitions zero-filled
            WITH k AS (
              SELECT COALESCE(CAST(conv_id AS VARCHAR), '<null>') AS key,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM read_parquet('{derived["transcripts_raw"]}') GROUP BY 1
            ), kp AS (
              SELECT key, cnt,
                CAST('0x' || substr(md5(key), 1, 12) AS BIGINT) % 16 AS p
              FROM k
            ), pa AS (
              SELECT p, CAST(SUM(cnt) AS BIGINT) AS n_rows,
                     CAST(COUNT(*) AS BIGINT) AS n_keys,
                     CAST(MAX(cnt) AS BIGINT) AS max_key_rows
              FROM kp GROUP BY p
            ), hot AS (
              SELECT p, MAX(key) AS hot_key
              FROM kp JOIN pa USING (p) WHERE cnt = max_key_rows GROUP BY p
            ), tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM pa),
            dim AS (SELECT unnest(range(16)) AS pt)
            SELECT CAST(pt AS BIGINT) AS "partition",
              CAST(COALESCE(n_rows, 0) AS BIGINT) AS n_rows,
              CAST(COALESCE(n_keys, 0) AS BIGINT) AS n_keys,
              CAST(COALESCE(max_key_rows, 0) AS BIGINT) AS max_key_rows,
              hot_key,
              CAST(CASE WHEN n_rows IS NULL THEN 0
                   ELSE (CAST(n_rows AS HUGEINT) * 16 * 1048576) // total
                   END AS BIGINT) AS balance_units,
              CAST(CASE WHEN n_rows IS NULL THEN 0
                   ELSE (CAST(max_key_rows AS HUGEINT) * 16 + total - 1)
                        // total
                   END AS BIGINT) AS salt_hint
            FROM dim LEFT JOIN pa ON pt = pa.p LEFT JOIN hot ON pt = hot.p
            CROSS JOIN tot
        """,
        "grounding": f"""
            -- FULL genuine-SQL twin of assistant_grounding under the
            -- every-5th-conversation plant (user turn 0 introduces
            -- 4242 + ok-URL; later assistant turns repeat both and
            -- fabricate 9191 + fab-URL): same plant, entity arms
            -- GENERATED from GROUNDING_PATTERNS, distinct per-turn
            -- entities, min non-assistant source index, strict <
            WITH pl AS (
              SELECT conv_id, turn_idx, role, tool, ts,
                CASE
                  WHEN CAST(substring(conv_id, 2, 9) AS INTEGER) % 5 = 1
                       AND role = 'user' AND turn_idx = 0
                  THEN COALESCE(text, '') ||
                       ' ref 4242 see https://ok.example/a'
                  WHEN CAST(substring(conv_id, 2, 9) AS INTEGER) % 5 = 1
                       AND role = 'assistant' AND turn_idx >= 1
                  THEN COALESCE(text, '') ||
                       ' ref 4242 total 9191 https://ok.example/a' ||
                       ' https://fab.example/b'
                  ELSE text END AS text
              FROM read_parquet('{derived["transcripts_raw"]}')
            ), gd AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM pl
              ) WHERE rn = 1
            ), e AS (
{_ground_arms}
            ), src AS (
              SELECT conv_id, kind, ent,
                MIN(CASE WHEN role <> 'assistant' THEN turn_idx END) AS fsi
              FROM e GROUP BY 1, 2, 3
            ), a AS (SELECT * FROM e WHERE role = 'assistant')
            SELECT conv_id, turn_idx, kind,
              CAST(COUNT(*) AS BIGINT) AS n_entities,
              CAST(SUM(CASE WHEN fsi IS NOT NULL AND fsi < turn_idx
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_grounded,
              CAST(((COUNT(*) - SUM(CASE WHEN fsi IS NOT NULL
                                         AND fsi < turn_idx
                                    THEN 1 ELSE 0 END)) * 1048576)
                   // COUNT(*) AS BIGINT) AS ungrounded_units
            FROM a JOIN src USING (conv_id, kind, ent)
            GROUP BY 1, 2, 3
        """,
        "kmv_distinct": """
            -- FULL genuine-SQL twin of kmv_sketch + kmv_estimate
            -- (k=256) over per-source document terms: DISTINCT md5-48
            -- hashes, ROW_NUMBER <= k, exact-below-k arm, unbiased
            -- (k-1) * 2^48 // max_hash HUGEINT estimate
            WITH tok AS (
              SELECT source, unnest(list_filter(string_split_regex(
                COALESCE(text, ''), '[ \t\n\x0b\f\r]+'),
                x -> x <> '')) AS term
              FROM documents
            ), h AS (
              SELECT DISTINCT source,
                CAST('0x' || substr(md5(term), 1, 12) AS BIGINT) AS hv
              FROM tok
            ), r AS (
              SELECT source, hv, ROW_NUMBER() OVER (
                PARTITION BY source ORDER BY hv) AS rn
              FROM h
            ), s AS (SELECT * FROM r WHERE rn <= 256)
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sketch,
              CAST(MAX(hv) AS BIGINT) AS max_hash,
              CAST(CASE WHEN COUNT(*) >= 256
                   THEN (CAST(255 AS HUGEINT) * 281474976710656) // MAX(hv)
                   ELSE COUNT(*) END AS BIGINT) AS est_distinct
            FROM s GROUP BY source
        """,
        "pseudonymize": _rp("pseudonymize"),
        "turn_neardup": _rp("turn_neardup"),
        "lang_script_agree": f"""
            -- language_script_agreement twin: lang per turn from the
            -- shared-kernel relation; mode (cnt DESC, lang ASC — the
            -- Spark mode(lang, true) tie rule), per-conv script mass,
            -- dominance rank (cnt DESC, script ASC), expectation map
            -- and the NULL-aware string verdict — all GENUINE SQL
            WITH l AS (
              SELECT conv_id, lang
              FROM read_parquet('{derived["turn_langs"]}')
            ), lc AS (
              SELECT conv_id, lang, COUNT(*) AS cnt FROM l GROUP BY 1, 2
            ), m AS (
              SELECT conv_id, lang AS lang_mode FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id ORDER BY cnt DESC, lang) AS rn
                FROM lc
              ) WHERE rn = 1
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM read_parquet('{derived["transcripts_raw"]}')
              ) WHERE rn = 1
            ), d2 AS (
              SELECT conv_id, COALESCE(text, '') AS t FROM d
            ), h AS (
              {_agree_script_arms}
            ), pc AS (
              SELECT conv_id, script, CAST(SUM(cnt) AS BIGINT) AS cnt
              FROM h WHERE cnt > 0 GROUP BY conv_id, script
            ), dom AS (
              SELECT conv_id, script AS dominant_script,
                cnt AS script_chars
              FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id ORDER BY cnt DESC, script) AS rn
                FROM pc
              ) WHERE rn = 1
            ), exp AS (
              SELECT * FROM (VALUES {_agree_exp_values})
                e(lang, expected_script)
            )
            SELECT m.conv_id, m.lang_mode, dom.dominant_script,
              CAST(COALESCE(dom.script_chars, 0) AS BIGINT)
                AS script_chars,
              exp.expected_script,
              CASE WHEN exp.expected_script IS NOT NULL
                    AND dom.dominant_script IS NOT NULL
                   THEN CASE WHEN exp.expected_script = dom.dominant_script
                             THEN 'agree' ELSE 'disagree' END
              END AS verdict
            FROM m
            LEFT JOIN dom ON m.conv_id = dom.conv_id
            LEFT JOIN exp ON m.lang_mode = exp.lang
        """,
        "tool_latency_q": f"""
            -- FULL genuine-SQL twin of tool_latency_quantiles: same
            -- dedup, epoch_us lag gap, positive-gap tool filter, ms
            -- quantization (// 1000, positive-only so truncation
            -- direction is moot), the grouped-quantile fragment
            WITH d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM read_parquet('{derived["transcripts_raw"]}')
              ) WHERE rn = 1
            ), lat AS (
              SELECT tool, role,
                epoch_us(ts) - epoch_us(lag(ts) OVER (
                  PARTITION BY conv_id ORDER BY turn_idx)) AS lat_us
              FROM d
            ), calls AS (
              SELECT tool, CAST(lat_us // 1000 AS BIGINT) AS v
              FROM lat
              WHERE role = 'tool' AND tool IS NOT NULL AND lat_us > 0
            ), c AS (
              SELECT tool, v, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM calls GROUP BY tool, v
            ), cum AS (
              SELECT tool, v,
                CAST(SUM(cnt) OVER (
                  PARTITION BY tool ORDER BY v) AS BIGINT) AS cum,
                CAST(SUM(cnt) OVER (PARTITION BY tool) AS BIGINT) AS n
              FROM c
            ), pr AS (
              SELECT * FROM (VALUES (CAST(524288 AS BIGINT)), (943718),
                (1038090)) p(probe_units)
            ), hit AS (
              SELECT tool, probe_units, v, cum, n,
                CAST((CAST(probe_units AS HUGEINT) * n + 1048575)
                     // 1048576 AS BIGINT) AS rnk
              FROM cum CROSS JOIN pr
            )
            SELECT tool, CAST(probe_units AS BIGINT) AS probe_units,
              CAST(MAX(n) AS BIGINT) AS n_rows,
              CAST(MAX(rnk) AS BIGINT) AS "rank",
              CAST(MIN(v) AS BIGINT) AS q_value
            FROM hit WHERE cum >= rnk
            GROUP BY tool, probe_units
        """,
        "dataset_profile": _card_sql("TRUE"),
        "profile_drift": f"""
            -- FULL genuine-SQL twin of profile_drift over the
            -- even/odd conv-index split: one card per side (the SAME
            -- parameterized card SQL), full-outer join on metric,
            -- HUGEINT relative units with the value_a > 0 guard
            SELECT COALESCE(a.metric, b.metric) AS metric,
              a.value AS value_a, b.value AS value_b,
              CAST(b.value - a.value AS BIGINT) AS delta,
              CAST(CASE WHEN a.value > 0 THEN
                (CAST(b.value - a.value AS HUGEINT) * 1048576) // a.value
              END AS BIGINT) AS rel_units
            FROM (
              {_card_sql("CAST(substring(conv_id, 2, 9) AS INTEGER) % 2 = 0")}
            ) a
            FULL JOIN (
              {_card_sql("CAST(substring(conv_id, 2, 9) AS INTEGER) % 2 = 1")}
            ) b
            ON a.metric = b.metric
        """,
        "frequent_terms": """
            -- FULL genuine-SQL twin of frequent_terms (k=120) under the
            -- every-2nd-doc ' zzheavy zzheavy' plant: exact token
            -- counts, strict HUGEINT threshold cnt * k > n_tokens — the
            -- Misra-Gries sketch is pure mechanism and never appears in
            -- the contract
            WITH base AS (
              SELECT COALESCE(text, '') ||
                CASE WHEN doc_id % 2 = 0 THEN ' zzheavy zzheavy'
                     ELSE '' END AS text
              FROM documents
            ), tok AS (
              SELECT unnest(list_filter(string_split_regex(
                text, '[ \t\n\x0b\f\r]+'), x -> x <> '')) AS term
              FROM base
            ), tot AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok
            ), c AS (
              SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM tok GROUP BY term
            )
            SELECT term, cnt, n AS n_tokens,
              CAST((CAST(cnt AS HUGEINT) * 1048576) // n AS BIGINT)
                AS ratio_units
            FROM c, tot WHERE CAST(cnt AS HUGEINT) * 120 > n
        """,
        "length_quantiles": f"""
            -- FULL genuine-SQL twin of turn_length_quantiles: same
            -- dedup, explicit-ASCII-class word counts, distinct-value
            -- cumulative window, HUGEINT ceil-div rank thresholds,
            -- lower discrete quantile = min value whose cum >= rank
            WITH d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM read_parquet('{derived["transcripts_raw"]}')
              ) WHERE rn = 1
            ), wc AS (
              SELECT role,
                CAST(len(list_filter(string_split_regex(
                  COALESCE(text, ''), '[ \t\n\x0b\f\r]+'),
                  x -> x <> '')) AS BIGINT) AS v
              FROM d
            ), c AS (
              SELECT role, v, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM wc GROUP BY role, v
            ), cum AS (
              SELECT role, v,
                CAST(SUM(cnt) OVER (
                  PARTITION BY role ORDER BY v) AS BIGINT) AS cum,
                CAST(SUM(cnt) OVER (PARTITION BY role) AS BIGINT) AS n
              FROM c
            ), pr AS (
              SELECT * FROM (VALUES {_probe_values}) p(probe_units)
            ), hit AS (
              SELECT role, probe_units, v, cum, n,
                CAST((CAST(probe_units AS HUGEINT) * n + 1048575)
                     // 1048576 AS BIGINT) AS rnk
              FROM cum CROSS JOIN pr
            )
            SELECT role, CAST(probe_units AS BIGINT) AS probe_units,
              CAST(MAX(n) AS BIGINT) AS n_rows,
              CAST(MAX(rnk) AS BIGINT) AS "rank",
              CAST(MIN(v) AS BIGINT) AS q_value
            FROM hit WHERE cum >= rnk
            GROUP BY role, probe_units
        """,
        "script_mix": f"""
            -- FULL genuine-SQL twin of script_mix_stats under the kana/
            -- hangul/arabic plant (every 8th conversation's user turns,
            -- rendered via chr() for exact byte parity): same dedup,
            -- one regexp_replace('g') length-difference arm per script
            -- class, (script, role, conv) pre-agg, HUGEINT share units
            -- over role total codepoints
            WITH pl AS (
              SELECT conv_id, turn_idx, role, tool, ts,
                CASE WHEN CAST(substring(conv_id, 2, 9) AS INTEGER) % 8 = 2
                      AND role = 'user'
                     THEN COALESCE(text, '') || {_sql_str(SCRIPT_MIX_PLANT)}
                     ELSE text END AS text
              FROM read_parquet('{derived["transcripts_raw"]}')
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM pl
              ) WHERE rn = 1
            ), d2 AS (
              SELECT conv_id, role, COALESCE(text, '') AS t FROM d
            ), h AS (
              {_script_arms}
            ), pre AS (
              SELECT script, role, conv_id,
                CAST(COUNT(*) AS BIGINT) AS nt,
                CAST(SUM(cnt) AS BIGINT) AS nc
              FROM h WHERE cnt > 0
              GROUP BY script, role, conv_id
            ), agg AS (
              SELECT script, role,
                CAST(SUM(nc) AS BIGINT) AS n_chars,
                CAST(SUM(nt) AS BIGINT) AS n_turns,
                CAST(COUNT(*) AS BIGINT) AS n_convs
              FROM pre GROUP BY script, role
            ), tot AS (
              SELECT role,
                CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS total
              FROM d GROUP BY role
            )
            SELECT script, agg.role, n_chars, n_turns, n_convs,
              CAST((CAST(n_chars AS HUGEINT) * 1048576) // total
                   AS BIGINT) AS share_units
            FROM agg JOIN tot ON agg.role = tot.role
        """,
        "zipf_profile": """
            -- FULL genuine-SQL twin of zipf_profile (top_r=64) under
            -- the '__flood' plant (every 7th doc remapped to a two-term
            -- synthetic source): exact integer log2 via length(bin(x)),
            -- integer OLS sums, truncated-toward-zero slope units
            -- (DuckDB // and Spark div agree on negatives)
            WITH base AS (
              SELECT
                CASE WHEN doc_id % 7 = 0 THEN '__flood'
                     ELSE source END AS grp,
                CASE WHEN doc_id % 7 = 0 THEN repeat('spam ham spam ', 20)
                     ELSE text END AS text
              FROM documents
            ), tok AS (
              SELECT grp, unnest(list_filter(string_split_regex(
                COALESCE(text, ''), '[ \t\n\x0b\f\r]+'),
                x -> x <> '')) AS term
              FROM base
            ), tf AS (
              SELECT grp, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM tok GROUP BY grp, term
            ), rk AS (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY grp ORDER BY tf DESC, term) AS rank
              FROM tf
            ), top AS (
              SELECT *,
                CAST(length(bin(rank)) - 1 AS BIGINT) AS lx,
                CAST(length(bin(tf)) - 1 AS BIGINT) AS ly
              FROM rk WHERE rank <= 64
            ), a AS (
              SELECT grp,
                CAST(COUNT(*) AS BIGINT) AS n_terms,
                MIN(CASE WHEN rank = 1 THEN term END) AS top_term,
                MAX(CASE WHEN rank = 1 THEN tf END) AS top_tf,
                SUM(lx) AS sx, SUM(ly) AS sy,
                SUM(lx * ly) AS sxy, SUM(lx * lx) AS sxx
              FROM top GROUP BY grp
            )
            SELECT grp AS "group", n_terms, top_term,
              CAST(top_tf AS BIGINT) AS top_tf,
              CAST(n_terms * sxy - sx * sy AS BIGINT) AS slope_num,
              CAST(n_terms * sxx - sx * sx AS BIGINT) AS slope_den,
              CAST(CASE WHEN n_terms * sxx - sx * sx <> 0
                   THEN ((n_terms * sxy - sx * sy) * 1048576)
                        // (n_terms * sxx - sx * sx) END
                   AS BIGINT) AS slope_units
            FROM a
        """,
        "tool_args": f"""
            -- GENUINE SQL twin of tool_arg_key_stats on the planted
            -- corpus (tool-turn text overwritten with six controlled
            -- variants by (cid*13 + turn_idx) % 6; json_object_keys and
            -- json_valid+json_type+json_keys verified to agree on every
            -- planted shape): keys unnest, (tool, key, conv) pre-agg,
            -- per-tool parsed totals joined back
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
            ), pl AS (
              SELECT conv_id, turn_idx, role, tool, ts,
                CASE WHEN role = 'tool' THEN
                  CASE (CAST(substring(conv_id, 2, 9) AS BIGINT) * 13
                        + turn_idx) % 6
                    WHEN 0 THEN '{{"status": "ok", "rows": 12}}'
                    WHEN 1 THEN '{{"status": "error", "msg": "boom"}}'
                    WHEN 2 THEN '{{"status": "ok", "data": {{"x": 1}}}}'
                    WHEN 3 THEN '{{"row_count": 12}}'
                    WHEN 4 THEN '{{"partial": true'
                    ELSE 'plain text output' END
                ELSE text END AS text
              FROM raw
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM pl
              ) WHERE rn = 1
            ), parsed AS (
              SELECT COALESCE(tool, '<unknown>') AS tool, conv_id,
                json_keys(COALESCE(text, '')) AS ks
              FROM d
              WHERE role = 'tool'
                AND json_valid(COALESCE(text, ''))
                AND json_type(json(COALESCE(text, ''))) = 'OBJECT'
            ), tot AS (
              SELECT tool, CAST(COUNT(*) AS BIGINT) AS n_parsed
              FROM parsed GROUP BY 1
            ), pk AS (
              SELECT tool, conv_id, unnest(ks) AS key FROM parsed
            ), pre AS (
              SELECT tool, key, conv_id, CAST(COUNT(*) AS BIGINT) AS n
              FROM pk GROUP BY 1, 2, 3
            ), agg AS (
              SELECT tool, key,
                CAST(SUM(n) AS BIGINT) AS n_calls,
                CAST(COUNT(*) AS BIGINT) AS n_convs
              FROM pre GROUP BY 1, 2
            )
            SELECT a.tool, a.key, a.n_calls, a.n_convs, t.n_parsed,
              CAST((CAST(a.n_calls AS HUGEINT) * 1048576) // t.n_parsed
                   AS BIGINT) AS coverage_units
            FROM agg a JOIN tot t USING (tool)
        """,
        "repair_order": f"""
            -- GENUINE SQL twin of repair_turn_order under the
            -- conv_integrity ts plant (every 7th conversation's turn 2
            -- shifted back an hour BEFORE dedup — both duplicate
            -- deliveries shift equally, so the latest-ts winner is
            -- unchanged): same dedup, same stable (ts, turn_idx) rank
            WITH r AS (
              SELECT conv_id, turn_idx, role, text, tool,
                CASE WHEN CAST(substring(conv_id, 2, 9) AS INTEGER) % 7 = 0
                      AND turn_idx = 2
                     THEN ts - INTERVAL 1 HOUR ELSE ts END AS ts
              FROM read_parquet('{derived["transcripts_raw"]}')
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM r
              ) WHERE rn = 1
            ), x AS (
              SELECT conv_id, role, text, tool, ts,
                turn_idx AS src_turn_idx,
                CAST(ROW_NUMBER() OVER (
                  PARTITION BY conv_id ORDER BY ts, turn_idx) - 1
                  AS INTEGER) AS new_idx
              FROM d
            )
            SELECT conv_id, new_idx AS turn_idx, role, text, tool, ts,
              src_turn_idx, (new_idx != src_turn_idx) AS moved
            FROM x
        """,
        "rule_sweep": f"""
            -- per-turn sweep cells come from the SHARED
            -- rules.sweep_cells kernel (pandas replay, same dedup as the
            -- Spark arm); the histogram, curve join ('lt' rule: kept at
            -- grid point i iff bucket > i, ungated turns always kept)
            -- and 2^-20 unit math are GENUINE SQL
            WITH h AS (
              SELECT others_pass, gated, bucket,
                CAST(COUNT(*) AS BIGINT) AS cnt
              FROM read_parquet('{derived["sweep_cells"]}')
              GROUP BY 1, 2, 3
            ), g AS (
              SELECT * FROM (VALUES {_sweep_values}) AS t(i, threshold)
            ), curve AS (
              SELECT g.threshold,
                SUM(CASE WHEN h.others_pass
                          AND ((NOT h.gated) OR h.bucket > g.i)
                     THEN h.cnt ELSE 0 END) AS n_kept,
                SUM(CASE WHEN h.others_pass THEN h.cnt ELSE 0 END)
                  AS n_pass_others,
                SUM(h.cnt) AS n_total
              FROM h CROSS JOIN g
              GROUP BY g.i, g.threshold
            )
            SELECT threshold,
              CAST(n_kept AS BIGINT) AS n_kept,
              CAST(n_pass_others AS BIGINT) AS n_pass_others,
              CAST(n_total AS BIGINT) AS n_total,
              CASE WHEN n_total = 0 THEN CAST(-1 AS BIGINT)
                   ELSE CAST((CAST(n_kept AS HUGEINT) * 1048576)
                             // n_total AS BIGINT) END AS keep_frac_units
            FROM curve ORDER BY threshold
        """,
        "rule_matrix": f"""
            -- per-turn fail bitmasks come from the SHARED
            -- rules.rule_fail_bits kernel (pandas replay, same plants +
            -- dedup as the Spark arm); the pair explode, co-fail counts
            -- and exclusive (single-bit) diagonal are GENUINE SQL
            WITH b AS (
              SELECT bits
              FROM read_parquet('{derived["rule_bits"]}')
              WHERE bits > 0
            ), r AS (
              SELECT * FROM (VALUES {_rule_values}) AS t(name, i)
            )
            SELECT ra.name AS rule_a, rb.name AS rule_b,
              CAST(COUNT(*) AS BIGINT) AS n_cofail,
              CAST(SUM(CASE WHEN ra.i = rb.i
                             AND b.bits = (CAST(1 AS BIGINT) << ra.i)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_exclusive
            FROM b
            JOIN r ra ON ((b.bits >> ra.i) & 1) = 1
            JOIN r rb ON ((b.bits >> rb.i) & 1) = 1 AND rb.i >= ra.i
            GROUP BY 1, 2
        """,
        "unicode_anomalies": f"""
            -- GENUINE SQL twin of unicode_anomaly_stats: same plants
            -- (chr()-rendered), same latest-per-(conv,turn) dedup, and
            -- the same length-difference counts under
            -- regexp_replace(..., 'g') per anomaly class
            WITH r AS (
              SELECT conv_id, turn_idx, role, ts,
                CASE ((CAST(substring(conv_id, 2, 9) AS BIGINT) * 3
                       + turn_idx) % 10)
                  {_uanom_case}
                  ELSE text END AS text
              FROM read_parquet('{derived["transcripts_raw"]}')
            ), d AS (
              SELECT conv_id, role, coalesce(text, '') AS t FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM r
              ) WHERE rn = 1
            ), c AS ({_uanom_arms}),
            pre AS (
              SELECT kind, role, conv_id,
                CAST(COUNT(*) AS BIGINT) AS nt,
                CAST(SUM(cnt) AS BIGINT) AS nc
              FROM c WHERE cnt > 0 GROUP BY 1, 2, 3
            )
            SELECT kind, role,
              CAST(SUM(nc) AS BIGINT) AS n_chars,
              CAST(SUM(nt) AS BIGINT) AS n_turns,
              CAST(COUNT(*) AS BIGINT) AS n_convs
            FROM pre GROUP BY 1, 2
        """,
        "keep_drop_eval": f"""
            -- GENUINE SQL twin of keep_drop_eval: both label tables are
            -- the pipeline's NAIVE pandas replays (asymmetric rule
            -- variants — see rules.eval_pred_config/eval_ref_config);
            -- the confusion matrix, kept-text equality, and the 2^-20
            -- integer metric units are all re-derived in SQL (HUGEINT
            -- numerator mirrors the Spark DECIMAL(38,0) discipline)
            WITH p AS (
              SELECT conv_id, turn_idx, keep, scrubbed_text
              FROM read_parquet('{derived["transcript_labels_eval_a"]}')
            ), r AS (
              SELECT conv_id, turn_idx, keep, scrubbed_text
              FROM read_parquet('{derived["transcript_labels_eval_b"]}')
            ), j AS (
              SELECT
                p.conv_id IS NOT NULL AS pp,
                r.conv_id IS NOT NULL AS pr,
                COALESCE(p.keep, FALSE) AS kp,
                COALESCE(r.keep, FALSE) AS kr,
                p.scrubbed_text IS NOT DISTINCT FROM r.scrubbed_text
                  AS teq
              FROM p FULL OUTER JOIN r
                ON p.conv_id = r.conv_id AND p.turn_idx = r.turn_idx
            ), s AS (
              SELECT
                SUM(CASE WHEN pp AND pr THEN 1 ELSE 0 END) AS n_turns,
                SUM(CASE WHEN pp AND NOT pr THEN 1 ELSE 0 END)
                  AS n_only_pred,
                SUM(CASE WHEN pr AND NOT pp THEN 1 ELSE 0 END)
                  AS n_only_ref,
                SUM(CASE WHEN pp AND pr AND kp AND kr THEN 1 ELSE 0 END)
                  AS tp,
                SUM(CASE WHEN pp AND pr AND kp AND NOT kr
                    THEN 1 ELSE 0 END) AS fp,
                SUM(CASE WHEN pp AND pr AND NOT kp AND kr
                    THEN 1 ELSE 0 END) AS fn,
                SUM(CASE WHEN pp AND pr AND NOT kp AND NOT kr
                    THEN 1 ELSE 0 END) AS tn,
                SUM(CASE WHEN pp AND pr AND kp AND kr AND teq
                    THEN 1 ELSE 0 END) AS n_kept_text_equal,
                SUM(CASE WHEN pp AND pr AND kp AND kr AND NOT teq
                    THEN 1 ELSE 0 END) AS n_kept_text_diff
              FROM j
            )
            SELECT
              CAST(n_turns AS BIGINT) AS n_turns,
              CAST(n_only_pred AS BIGINT) AS n_only_pred,
              CAST(n_only_ref AS BIGINT) AS n_only_ref,
              CAST(tp AS BIGINT) AS tp,
              CAST(fp AS BIGINT) AS fp,
              CAST(fn AS BIGINT) AS fn,
              CAST(tn AS BIGINT) AS tn,
              CAST(n_kept_text_equal AS BIGINT) AS n_kept_text_equal,
              CAST(n_kept_text_diff AS BIGINT) AS n_kept_text_diff,
              CASE WHEN tp + fp = 0 THEN CAST(-1 AS BIGINT)
                   ELSE CAST((CAST(tp AS HUGEINT) * 1048576)
                             // (tp + fp) AS BIGINT) END
                AS precision_units,
              CASE WHEN tp + fn = 0 THEN CAST(-1 AS BIGINT)
                   ELSE CAST((CAST(tp AS HUGEINT) * 1048576)
                             // (tp + fn) AS BIGINT) END
                AS recall_units,
              CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(-1 AS BIGINT)
                   ELSE CAST((CAST(tp AS HUGEINT) * 2097152)
                             // (2 * tp + fp + fn) AS BIGINT) END
                AS f1_units
            FROM s
        """,
        "tool_latency": f"""
            -- GENUINE SQL twin of tool_latency_histogram: latest-per-key
            -- dedup, lag window over turn_idx, epoch_us gap, integer
            -- log2 bucket via length(bin(x)) (identical minimal binary
            -- string on both engines), per-call div-1000 into total_ms
            WITH d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM read_parquet('{derived["transcripts_raw"]}')
              ) WHERE rn = 1
            ), g AS (
              SELECT role, tool,
                epoch_us(ts) - lag(epoch_us(ts)) OVER (
                  PARTITION BY conv_id ORDER BY turn_idx) AS lat
              FROM d
            ), c AS (
              SELECT tool, lat,
                CASE WHEN lat <= 0 THEN CAST(-1 AS INTEGER)
                     ELSE CAST(length(bin(lat)) AS INTEGER) END
                  AS lat_bucket,
                CASE WHEN lat > 0 THEN lat // 1000 ELSE 0 END AS ms
              FROM g
              WHERE role = 'tool' AND tool IS NOT NULL
                AND lat IS NOT NULL
            )
            SELECT tool, lat_bucket,
              CAST(COUNT(*) AS BIGINT) AS n_calls,
              CAST(SUM(ms) AS BIGINT) AS total_ms,
              CAST(MIN(lat) AS BIGINT) AS min_us,
              CAST(MAX(lat) AS BIGINT) AS max_us
            FROM c GROUP BY 1, 2
        """,
        "refusal_stats": f"""
            -- GENUINE SQL twin of assistant_refusals on the planted
            -- corpus (every 6th conversation's assistant turns at
            -- turn_idx%4==1 open with a two-marker refusal): markers
            -- VALUES table, per-turn hit sums, conv agg
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
            ), pl AS (
              SELECT conv_id, turn_idx, role, tool, ts,
                CASE WHEN role = 'assistant'
                      AND CAST(substring(conv_id, 2, 9) AS INTEGER) % 6 = 0
                      AND turn_idx % 4 = 1
                     THEN 'I''m sorry, but I can''t help with that. '
                          || COALESCE(text, '')
                     ELSE text END AS text
              FROM raw
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM pl
              ) WHERE rn = 1
            ), m(marker) AS (
              VALUES {_refusal_values}
            ), th AS (
              SELECT d.conv_id, d.turn_idx,
                SUM(CAST((length(COALESCE(d.text, ''))
                          - length(replace(COALESCE(d.text, ''),
                                           m.marker, '')))
                         / length(m.marker) AS BIGINT)) AS hits
              FROM d CROSS JOIN m
              WHERE d.role = 'assistant'
              GROUP BY 1, 2
            )
            SELECT conv_id,
              CAST(COUNT(*) AS BIGINT) AS n_assistant_turns,
              CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_refusal_turns,
              CAST(SUM(hits) AS BIGINT) AS n_refusal_hits,
              CAST(COALESCE(MIN(CASE WHEN hits > 0 THEN turn_idx END), -1)
                   AS INTEGER) AS first_refusal_idx,
              CAST((CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END)
                         AS HUGEINT) * 1048576) // COUNT(*)
                   AS BIGINT) AS refusal_units
            FROM th GROUP BY 1
        """,
        "tool_json": f"""
            -- GENUINE SQL twin of tool_call_json_stats on the planted
            -- corpus (tool-turn text overwritten with five controlled
            -- variants by (cid*11 + turn_idx) % 5; Jackson and yyjson
            -- provably agree on all five); json_valid + guarded
            -- json_extract, (tool, conv) pre-agg then tool agg
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
            ), pl AS (
              SELECT conv_id, turn_idx, role, tool, ts,
                CASE WHEN role = 'tool' THEN
                  CASE (CAST(substring(conv_id, 2, 9) AS BIGINT) * 11
                        + turn_idx) % 5
                    WHEN 0 THEN '{{"status": "ok", "rows": 12}}'
                    WHEN 1 THEN '{{"status": "error", "msg": "boom"}}'
                    WHEN 2 THEN '{{"partial": true'
                    WHEN 3 THEN '{{bad: "key"}}'
                    ELSE 'plain text output' END
                ELSE text END AS text
              FROM raw
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM pl
              ) WHERE rn = 1
            ), calls AS (
              SELECT COALESCE(tool, '<unknown>') AS tool, conv_id,
                CASE WHEN trim(COALESCE(text, '')) LIKE '{{%'
                     THEN 1 ELSE 0 END AS o,
                CASE WHEN trim(COALESCE(text, '')) LIKE '{{%'
                      AND json_valid(COALESCE(text, ''))
                     THEN 1 ELSE 0 END AS p,
                CASE WHEN trim(COALESCE(text, '')) LIKE '{{%'
                      AND json_valid(COALESCE(text, ''))
                      AND json_extract(COALESCE(text, ''), '$.status')
                          IS NOT NULL
                     THEN 1 ELSE 0 END AS s
              FROM d WHERE role = 'tool'
            ), pc AS (
              SELECT tool, conv_id,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(o) AS BIGINT) AS o,
                CAST(SUM(p) AS BIGINT) AS p,
                CAST(SUM(s) AS BIGINT) AS s
              FROM calls GROUP BY 1, 2
            ), a AS (
              SELECT tool,
                CAST(SUM(n) AS BIGINT) AS n_calls,
                CAST(COUNT(*) AS BIGINT) AS n_convs,
                CAST(SUM(o) AS BIGINT) AS n_object_like,
                CAST(SUM(p) AS BIGINT) AS n_parsed,
                CAST(SUM(s) AS BIGINT) AS n_with_status
              FROM pc GROUP BY 1
            )
            SELECT tool, n_calls, n_convs, n_object_like, n_parsed,
              n_object_like - n_parsed AS n_malformed, n_with_status,
              CASE WHEN n_object_like = 0 THEN CAST(-1 AS BIGINT)
                   ELSE CAST((CAST(n_parsed AS HUGEINT) * 1048576)
                             // n_object_like AS BIGINT)
              END AS parse_units
            FROM a
        """,
        "alternation_repair": f"""
            -- GENUINE SQL twin of repair_alternation on the filtered
            -- corpus ((cid*3 + turn_idx) % 5 == 2 turns dropped): dedup,
            -- lag/run windows, ordered string_agg with the \\n\\n join
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
            ), f AS (
              SELECT * FROM raw
              WHERE (CAST(substring(conv_id, 2, 9) AS BIGINT) * 3
                     + turn_idx) % 5 != 2
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM f
              ) WHERE rn = 1
            ), r AS (
              SELECT conv_id, turn_idx, role, tool, ts,
                COALESCE(text, '') AS t,
                CASE WHEN role = lag(role) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx)
                     THEN 0 ELSE 1 END AS nr
              FROM d
            ), rr AS (
              SELECT *, SUM(nr) OVER (
                PARTITION BY conv_id ORDER BY turn_idx
                ROWS UNBOUNDED PRECEDING) AS run
              FROM r
            )
            SELECT conv_id, CAST(run - 1 AS INTEGER) AS turn_idx,
              MIN(role) AS role,
              string_agg(t, chr(10) || chr(10) ORDER BY turn_idx) AS text,
              MIN(tool) AS tool,
              CAST(epoch_ms(MIN(ts)) AS BIGINT) AS ts_ms,
              CAST(COUNT(*) AS BIGINT) AS n_merged,
              CAST(MIN(turn_idx) AS INTEGER) AS src_first_idx
            FROM rr GROUP BY conv_id, run
        """,
        "context_fit": f"""
            -- GENUINE SQL twin of fit_context_budget(48, keep_system):
            -- same word counts, whole-conv system-token charge, suffix
            -- sum over non-system turns in turn_idx DESC order
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM raw
              ) WHERE rn = 1
            ), t AS (
              SELECT conv_id, turn_idx, role,
                CAST(CASE WHEN length(trim(COALESCE(text, ''))) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END AS INTEGER) AS n_tokens
              FROM d
            ), w AS (
              SELECT conv_id, turn_idx, role, n_tokens,
                SUM(CASE WHEN role = 'system' THEN n_tokens ELSE 0 END)
                  OVER (PARTITION BY conv_id) AS sys_total,
                SUM(CASE WHEN role = 'system' THEN 0 ELSE n_tokens END)
                  OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                        ROWS UNBOUNDED PRECEDING) AS revcum
              FROM t
            )
            SELECT conv_id, turn_idx, role, n_tokens,
              (role = 'system' OR revcum <= 48 - sys_total) AS keep_turn
            FROM w
        """,
        "system_prompts": f"""
            -- GENUINE SQL twin of system_prompt_census on the planted
            -- corpus (system turns carry 'You are agent profile cid%3');
            -- dedup, first-system arg_min, md5-16 digest, census agg
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
            ), pl AS (
              SELECT conv_id, turn_idx, role, tool, ts,
                CASE WHEN role = 'system'
                     THEN 'You are agent profile ' || CAST(
                       CAST(substring(conv_id, 2, 9) AS INTEGER) % 3
                       AS VARCHAR)
                     ELSE text END AS text
              FROM raw
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM pl
              ) WHERE rn = 1
            ), conv AS (
              SELECT conv_id, COUNT(*) AS n_turns FROM d GROUP BY 1
            ), sys AS (
              SELECT conv_id,
                arg_min(trim(regexp_replace(COALESCE(text, ''),
                  '[ \t\n\x0b\f\r]+', ' ', 'g')), turn_idx) AS p
              FROM d WHERE role = 'system' GROUP BY 1
            )
            SELECT
              CASE WHEN s.p IS NULL THEN '<none>'
                   ELSE substring(md5(s.p), 1, 16) END AS digest,
              CAST(COUNT(*) AS BIGINT) AS n_convs,
              CAST(SUM(c.n_turns) AS BIGINT) AS n_turns,
              MIN(substring(s.p, 1, 120)) AS sample_text
            FROM conv c LEFT JOIN sys s USING (conv_id)
            GROUP BY 1
        """,
        "special_tokens": f"""
            -- GENUINE SQL twin of special_token_stats on the planted
            -- corpus (im_start/im_end, </s>, [INST] pairs appended to
            -- deterministic turn subsets); replace-based counting over
            -- a markers VALUES table, (marker, role, conv) pre-agg
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
            ), pl AS (
              SELECT conv_id, turn_idx, role, tool, ts,
                CASE
                  WHEN (CAST(substring(conv_id, 2, 9) AS BIGINT) * 5
                        + turn_idx) % 11 = 0
                    THEN COALESCE(text, '')
                         || ' <|im_start|>assistant oops <|im_end|>'
                  WHEN (CAST(substring(conv_id, 2, 9) AS BIGINT) * 5
                        + turn_idx) % 13 = 1
                    THEN COALESCE(text, '') || '</s>'
                  WHEN (CAST(substring(conv_id, 2, 9) AS BIGINT) * 7
                        + turn_idx) % 17 = 2
                    THEN COALESCE(text, '') || ' [INST] retry [/INST]'
                  ELSE text END AS text
              FROM raw
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM pl
              ) WHERE rn = 1
            ), m(marker) AS (
              VALUES {_special_values}
            ), h AS (
              SELECT d.conv_id, d.role, m.marker,
                CAST((length(COALESCE(d.text, ''))
                      - length(replace(COALESCE(d.text, ''), m.marker, '')))
                     / length(m.marker) AS BIGINT) AS cnt
              FROM d CROSS JOIN m
            ), hh AS (
              SELECT * FROM h WHERE cnt > 0
            ), pc AS (
              SELECT marker, role, conv_id,
                CAST(COUNT(*) AS BIGINT) AS nt,
                CAST(SUM(cnt) AS BIGINT) AS nh
              FROM hh GROUP BY 1, 2, 3
            )
            SELECT marker, role,
              CAST(SUM(nt) AS BIGINT) AS n_turns,
              CAST(COUNT(*) AS BIGINT) AS n_convs,
              CAST(SUM(nh) AS BIGINT) AS n_hits
            FROM pc GROUP BY 1, 2
        """,
        "drift_psi": """
            -- GENUINE SQL twin of drift_psi (bins=10, eps=1e-6) on the
            -- half-split events table with the odd half's value scaled
            -- 1.2x; identical float op order ((v-lo)/(hi-lo))*10 makes
            -- the floor'd buckets bit-identical
            WITH r AS (
              SELECT 'value' AS "column", CAST(value AS DOUBLE) AS v
              FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL
              UNION ALL
              SELECT 'user_id', CAST(user_id AS DOUBLE)
              FROM events WHERE event_id % 2 = 0 AND user_id IS NOT NULL
            ), c AS (
              SELECT 'value' AS "column",
                     CAST(value * CAST(1.2 AS DOUBLE) AS DOUBLE) AS v
              FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL
              UNION ALL
              SELECT 'user_id', CAST(user_id AS DOUBLE)
              FROM events WHERE event_id % 2 = 1 AND user_id IS NOT NULL
            ), b AS (
              SELECT "column", MIN(v) AS lo, MAX(v) AS hi
              FROM r GROUP BY 1
            ), rb AS (
              SELECT r."column",
                CASE WHEN hi = lo THEN 0 ELSE LEAST(9, GREATEST(0,
                  CAST(FLOOR((v - lo) / (hi - lo) * 10) AS INT)))
                END AS bucket
              FROM r JOIN b USING ("column")
            ), cb AS (
              SELECT c."column",
                CASE WHEN hi = lo THEN 0 ELSE LEAST(9, GREATEST(0,
                  CAST(FLOOR((v - lo) / (hi - lo) * 10) AS INT)))
                END AS bucket
              FROM c JOIN b USING ("column")
            ), rc AS (
              SELECT "column", bucket, COUNT(*) AS cnt_ref
              FROM rb GROUP BY 1, 2
            ), cc AS (
              SELECT "column", bucket, COUNT(*) AS cnt_cur
              FROM cb GROUP BY 1, 2
            ), j AS (
              SELECT COALESCE(rc."column", cc."column") AS "column",
                COALESCE(rc.bucket, cc.bucket) AS bucket,
                rc.cnt_ref, cc.cnt_cur
              FROM rc FULL OUTER JOIN cc
                ON rc."column" = cc."column" AND rc.bucket = cc.bucket
            ), tr AS (
              SELECT "column", SUM(cnt_ref) AS n_ref FROM rc GROUP BY 1
            ), tc AS (
              SELECT "column", SUM(cnt_cur) AS n_cur FROM cc GROUP BY 1
            ), f AS (
              SELECT j."column",
                GREATEST(COALESCE(cnt_ref, 0) / CAST(n_ref AS DOUBLE),
                         1e-6) AS p,
                GREATEST(COALESCE(cnt_cur, 0) / CAST(n_cur AS DOUBLE),
                         1e-6) AS q,
                n_ref, n_cur
              FROM j JOIN tr USING ("column") JOIN tc USING ("column")
            )
            SELECT "column", SUM((p - q) * ln(p / q)) AS psi,
              CAST(MIN(n_ref) AS BIGINT) AS n_ref,
              CAST(MIN(n_cur) AS BIGINT) AS n_cur
            FROM f GROUP BY 1
        """,
        "drift_categorical": """
            -- GENUINE SQL twin of drift_psi_categorical (top_k=3,
            -- eps=1e-6) on the half-split documents table with the odd
            -- half's lang remapped to 'xx' for doc_id%10<3
            WITH r AS (
              SELECT 'lang' AS "column",
                COALESCE(CAST(lang AS VARCHAR), '<NULL>') AS v
              FROM documents WHERE doc_id % 2 = 0
              UNION ALL
              SELECT 'source', COALESCE(CAST(source AS VARCHAR), '<NULL>')
              FROM documents WHERE doc_id % 2 = 0
            ), c AS (
              SELECT 'lang' AS "column",
                COALESCE(CAST(CASE WHEN doc_id % 10 < 3 THEN 'xx'
                               ELSE lang END AS VARCHAR), '<NULL>') AS v
              FROM documents WHERE doc_id % 2 = 1
              UNION ALL
              SELECT 'source', COALESCE(CAST(source AS VARCHAR), '<NULL>')
              FROM documents WHERE doc_id % 2 = 1
            ), rc0 AS (
              SELECT "column", v, COUNT(*) AS cnt FROM r GROUP BY 1, 2
            ), cc0 AS (
              SELECT "column", v, COUNT(*) AS cnt FROM c GROUP BY 1, 2
            ), tk AS (
              SELECT "column", v FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY "column" ORDER BY cnt DESC, v ASC) AS rk
                FROM rc0
              ) WHERE rk <= 3
            ), rc AS (
              SELECT rc0."column",
                CASE WHEN tk.v IS NOT NULL THEN rc0.v
                     ELSE '<OTHER>' END AS bucket,
                SUM(cnt) AS cnt_ref
              FROM rc0 LEFT JOIN tk
                ON rc0."column" = tk."column" AND rc0.v = tk.v
              GROUP BY 1, 2
            ), cc AS (
              SELECT cc0."column",
                CASE WHEN tk.v IS NOT NULL THEN cc0.v
                     ELSE '<OTHER>' END AS bucket,
                SUM(cnt) AS cnt_cur
              FROM cc0 LEFT JOIN tk
                ON cc0."column" = tk."column" AND cc0.v = tk.v
              GROUP BY 1, 2
            ), j AS (
              SELECT COALESCE(rc."column", cc."column") AS "column",
                COALESCE(rc.bucket, cc.bucket) AS bucket,
                rc.cnt_ref, cc.cnt_cur
              FROM rc FULL OUTER JOIN cc
                ON rc."column" = cc."column" AND rc.bucket = cc.bucket
            ), tr AS (
              SELECT "column", SUM(cnt_ref) AS n_ref FROM rc GROUP BY 1
            ), tc AS (
              SELECT "column", SUM(cnt_cur) AS n_cur FROM cc GROUP BY 1
            ), f AS (
              SELECT j."column",
                GREATEST(COALESCE(cnt_ref, 0) / CAST(n_ref AS DOUBLE),
                         1e-6) AS p,
                GREATEST(COALESCE(cnt_cur, 0) / CAST(n_cur AS DOUBLE),
                         1e-6) AS q,
                n_ref, n_cur
              FROM j JOIN tr USING ("column") JOIN tc USING ("column")
            )
            SELECT "column", SUM((p - q) * ln(p / q)) AS psi,
              CAST(MIN(n_ref) AS BIGINT) AS n_ref,
              CAST(MIN(n_cur) AS BIGINT) AS n_cur
            FROM f GROUP BY 1
        """,
        "holdout_split": f"""
            -- GENUINE SQL twin of assign_split (seed 'hs1',
            -- train/valid/test .8/.1/.1): md5-48 group hash vs the same
            -- integer cut points
            SELECT conv_id, turn_idx,
              CASE
                WHEN CAST('0x' || substr(
                       md5('hs1' || conv_id), 1, 12) AS BIGINT)
                     < {_hs_cuts[0]} THEN 'train'
                WHEN CAST('0x' || substr(
                       md5('hs1' || conv_id), 1, 12) AS BIGINT)
                     < {_hs_cuts[1]} THEN 'valid'
                ELSE 'test'
              END AS split
            FROM read_parquet('{derived["transcripts_raw"]}')
        """,
        "unimax_sample": _rp("unimax_sample"),
        "conv_language": f"""
            -- conv_language twin: per-turn langs from the shared-kernel
            -- derived relation; mode re-derived via counts + ROW_NUMBER
            -- (cnt DESC, lang ASC — Spark's mode(lang, true) tie rule),
            -- switches via lag over turn order — GENUINE SQL rollup
            WITH l AS (
              SELECT conv_id, turn_idx, lang
              FROM read_parquet('{derived["turn_langs"]}')
            ), c AS (
              SELECT conv_id, lang, COUNT(*) AS cnt FROM l GROUP BY 1, 2
            ), m AS (
              SELECT conv_id, lang AS lang_mode,
                ROW_NUMBER() OVER (
                  PARTITION BY conv_id ORDER BY cnt DESC, lang ASC) AS rk
              FROM c
            ), p AS (
              SELECT conv_id, lang,
                lag(lang) OVER (
                  PARTITION BY conv_id ORDER BY turn_idx) AS prev
              FROM l
            ), s AS (
              SELECT conv_id,
                CAST(COUNT(*) AS BIGINT) AS n_turns,
                CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> lang
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_switches
              FROM p GROUP BY 1
            )
            SELECT s.conv_id, n_turns, lang_mode, n_langs, n_switches
            FROM s JOIN m ON s.conv_id = m.conv_id AND m.rk = 1
        """,
        "label_drift": f"""
            -- GENUINE SQL twin of label_drift: both sides are the
            -- pipeline's NAIVE pandas replays (default + strict rules,
            -- same fixture); the transition matrix itself is re-derived
            -- in SQL (full outer join + null-safe text compare + agg)
            WITH a AS (
              SELECT conv_id, turn_idx,
                CASE WHEN keep THEN '<kept>'
                     ELSE coalesce(drop_reason, '<none>') END AS state_a,
                scrubbed_text AS ta
              FROM read_parquet('{derived["transcript_pipeline"]}')
            ), b AS (
              SELECT conv_id, turn_idx,
                CASE WHEN keep THEN '<kept>'
                     ELSE coalesce(drop_reason, '<none>') END AS state_b,
                scrubbed_text AS tb
              FROM read_parquet('{derived["transcript_labels_strict"]}')
            ), j AS (
              SELECT
                coalesce(state_a, '<absent>') AS state_a,
                coalesce(state_b, '<absent>') AS state_b,
                (a.conv_id IS NOT NULL AND b.conv_id IS NOT NULL
                 AND ta IS DISTINCT FROM tb) AS chg
              FROM a FULL OUTER JOIN b
                ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
            )
            SELECT state_a, state_b,
              CAST(COUNT(*) AS BIGINT) AS n_turns,
              CAST(SUM(CASE WHEN chg THEN 1 ELSE 0 END) AS BIGINT)
                AS n_text_changed
            FROM j GROUP BY 1, 2
        """,
        "truncation": f"""
            -- GENUINE SQL twin of generation_artifacts: replant the
            -- truncation artifacts (fence on even turn_idx, mid-word cut
            -- on odd), dedup latest-per-(conv,turn), then re-derive every
            -- signal with length-difference counts and right/contains
            WITH r AS (
              SELECT conv_id, turn_idx, role, ts,
                CASE WHEN CAST(substring(conv_id, 2, 9) AS INT) % 9 = 0
                          AND role = 'assistant'
                     THEN CASE WHEN turn_idx % 2 = 0
                          THEN coalesce(text, '') || '{TRUNC_PLANT_FENCE}'
                          ELSE coalesce(text, '') || '{TRUNC_PLANT_CUT}'
                          END
                     ELSE text END AS text
              FROM read_parquet('{derived["transcripts_raw"]}')
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM r
              ) WHERE rn = 1
            ), b AS (
              SELECT conv_id, turn_idx, coalesce(text, '') AS t,
                regexp_replace(coalesce(text, ''),
                               '[ \t\n\x0b\f\r]+$', '') AS st
              FROM d WHERE role = 'assistant'
            ), m AS (
              SELECT conv_id, turn_idx,
                CAST(length(t) AS BIGINT) AS n_chars,
                CAST((length(t) - length(replace(t, '```', ''))) // 3
                     AS BIGINT) AS n_fences,
                CAST(length(t) - length(replace(t, '(', '')) AS BIGINT)
                  - CAST(length(t) - length(replace(t, ')', '')) AS BIGINT)
                  AS paren_delta,
                CAST(length(t) - length(replace(t, '[', '')) AS BIGINT)
                  - CAST(length(t) - length(replace(t, ']', '')) AS BIGINT)
                  AS bracket_delta,
                CAST(length(t) - length(replace(t, '{{', '')) AS BIGINT)
                  - CAST(length(t) - length(replace(t, '}}', '')) AS BIGINT)
                  AS brace_delta,
                (length(st) = 0
                 OR contains('.!?"''`)]}}*_。！？；）」』】》”’…',
                             right(st, 1))) AS ends_clean,
                (right(st, 3) = '...' OR right(st, 1) = '…')
                  AS trailing_ellipsis
              FROM b
            )
            SELECT conv_id, turn_idx, n_chars, n_fences,
              (n_fences % 2 = 0) AS fence_balanced,
              paren_delta, bracket_delta, brace_delta,
              ends_clean, trailing_ellipsis,
              ((n_fences % 2 = 1)
               OR (n_chars >= 80 AND NOT ends_clean)) AS truncated
            FROM m
        """,
        "suffix_loops": f"""
            -- GENUINE SQL twin of suffix_loop_stats: replant the 5x
            -- loop phrase, dedup, then for each period p in 1..8 scan
            -- trailing block repeats via list slicing; ROW_NUMBER argmax
            -- on (loop_words DESC, p ASC)
            WITH r AS (
              SELECT conv_id, turn_idx, ts,
                CASE WHEN CAST(substring(conv_id, 2, 9) AS INT) % 8 = 0
                          AND role = 'assistant'
                     THEN coalesce(text, '')
                          || repeat('{SUFFIX_LOOP_PLANT}', 5)
                     ELSE text END AS text
              FROM read_parquet('{derived["transcripts_raw"]}')
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM r
              ) WHERE rn = 1
            ), w AS (
              SELECT conv_id, turn_idx,
                list_filter(string_split_regex(coalesce(text, ''),
                  '[ \t\n\x0b\f\r]+'), x -> x <> '') AS ws
              FROM d
            ), c AS (
              SELECT conv_id, turn_idx, len(ws) AS n, pp.p AS p,
                CASE WHEN len(ws) >= 2 * pp.p
                          AND (len(ws) // pp.p) >= 2 THEN
                  coalesce(
                    (list_filter(generate_series(2, len(ws) // pp.p),
                       i -> ws[len(ws) - i*pp.p + 1 : len(ws) - i*pp.p + pp.p]
                            <> ws[len(ws) - pp.p + 1 : len(ws)]))[1] - 1,
                    len(ws) // pp.p)
                ELSE 1 END AS reps
              FROM w, (SELECT unnest(generate_series(1, 8)) AS p) pp
            ), s AS (
              SELECT conv_id, turn_idx, n, p, reps,
                CASE WHEN reps >= 2 THEN reps * p ELSE 0 END AS lw,
                ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY (CASE WHEN reps >= 2 THEN reps * p ELSE 0 END)
                           DESC, p ASC) AS rk
              FROM c
            )
            SELECT conv_id, turn_idx, CAST(n AS BIGINT) AS n_words,
              CAST(CASE WHEN lw > 0 THEN p ELSE 0 END AS INT) AS period,
              CAST(CASE WHEN lw > 0 THEN reps ELSE 1 END AS INT)
                AS n_repeats,
              CAST(lw AS BIGINT) AS loop_words,
              CASE WHEN n > 0
                   THEN (CAST(lw AS BIGINT) * 1048576) // n
                   ELSE CAST(0 AS BIGINT) END AS loop_units
            FROM s WHERE rk = 1
        """,
        "source_overlap": """
            -- GENUINE SQL twin of cross_source_overlap + the mirror
            -- plant: distinct (source, md5-of-normalized-text) relation,
            -- digest self-join, zero-filled all-pairs frame. regexp
            -- needs the 'g' flag (DuckDB replaces first match only by
            -- default; Spark replaces all)
            WITH base AS (
              SELECT source, text FROM documents
              UNION ALL
              SELECT 'mirror' AS source, text FROM documents
              WHERE doc_id % 10 = 0
            ), nz AS (
              SELECT source AS g,
                trim(regexp_replace(coalesce(text, ''),
                     '[ \t\n\x0b\f\r]+', ' ', 'g')) AS nt
              FROM base
            ), d AS (
              SELECT DISTINCT g, md5(nt) AS h FROM nz WHERE nt <> ''
            ), sizes AS (
              SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
            ), sh AS (
              SELECT a.g AS source_a, b.g AS source_b,
                     CAST(COUNT(*) AS BIGINT) AS n_shared
              FROM d a JOIN d b USING (h) WHERE a.g < b.g GROUP BY 1, 2
            )
            SELECT sa.g AS source_a, sb.g AS source_b,
              sa.n AS n_a, sb.n AS n_b,
              coalesce(n_shared, 0) AS n_shared,
              (coalesce(n_shared, 0) * 1048576) // sa.n
                AS containment_a_units,
              (coalesce(n_shared, 0) * 1048576) // sb.n
                AS containment_b_units,
              (coalesce(n_shared, 0) * 1048576)
                // (sa.n + sb.n - coalesce(n_shared, 0)) AS jaccard_units
            FROM sizes sa JOIN sizes sb ON sa.g < sb.g
            LEFT JOIN sh ON sh.source_a = sa.g AND sh.source_b = sb.g
        """,
        "readability": """
            -- GENUINE SQL twin of readability_scores: [aeiouy]+ nuclei,
            -- [.!?]+ sentence groups clamped >= 1, FK formula in the
            -- exact Spark float op order, every literal CAST to DOUBLE
            -- (DuckDB parses 0.39 as DECIMAL)
            WITH b AS (
              SELECT doc_id,
                len(list_filter(string_split_regex(coalesce(text, ''),
                  '[ \t\n\x0b\f\r]+'), x -> x <> '')) AS w,
                greatest(len(regexp_extract_all(coalesce(text, ''),
                  '[.!?]+')), 1) AS s,
                len(regexp_extract_all(lower(coalesce(text, '')),
                  '[aeiouy]+')) AS syl
              FROM documents
            )
            SELECT doc_id, CAST(w AS BIGINT) AS n_words,
              CAST(s AS BIGINT) AS n_sentences,
              CAST(syl AS BIGINT) AS n_syllables,
              CAST(FLOOR((CAST(0.39 AS DOUBLE)
                    * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                  + CAST(11.8 AS DOUBLE)
                    * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE))
                  - CAST(15.59 AS DOUBLE))
                  * CAST(1048576.0 AS DOUBLE)) AS BIGINT) AS fk_units
            FROM b WHERE w > 0
        """,
        "assistant_echo": f"""
            -- GENUINE SQL twin of assistant_echo: replant the echo
            -- sentence, dedup latest-per-(conv,turn), build distinct
            -- word-trigram lists per turn (list comprehension), lag the
            -- list over the conv window, integer echo fraction
            WITH r AS (
              SELECT conv_id, turn_idx, role, ts,
                CASE WHEN CAST(substring(conv_id, 2, 9) AS INT) % 6 = 0
                     THEN coalesce(text, '') || '{ECHO_PLANT}'
                     ELSE text END AS text
              FROM read_parquet('{derived["transcripts_raw"]}')
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM r
              ) WHERE rn = 1
            ), w AS (
              SELECT conv_id, turn_idx, role,
                list_filter(
                  string_split_regex(coalesce(text, ''),
                                     '[ \t\n\x0b\f\r]+'),
                  x -> x <> '') AS ws
              FROM d
            ), g AS (
              SELECT conv_id, turn_idx, role,
                CASE WHEN len(ws) >= 3 THEN
                  list_distinct(list_transform(
                    range(1, len(ws) - 1),
                    i -> array_to_string(ws[i:i+2], ' ')))
                ELSE [] END AS gs
              FROM w
            ), lg AS (
              SELECT *, lag(gs) OVER (
                PARTITION BY conv_id ORDER BY turn_idx) AS pg
              FROM g
            )
            SELECT conv_id, turn_idx,
              CAST(len(gs) AS BIGINT) AS n_grams,
              CAST(len(list_intersect(gs, pg)) AS BIGINT) AS n_echoed,
              (CAST(len(list_intersect(gs, pg)) AS BIGINT) * 1048576)
                // len(gs) AS echo_units
            FROM lg
            WHERE role = 'assistant' AND pg IS NOT NULL AND len(gs) > 0
        """,
        "conv_integrity": f"""
            -- GENUINE SQL twin of conversation_integrity on the planted
            -- corpus: every 9th%3 conversation loses turn 1 (index gap),
            -- every 7th gets turn 2's ts shifted back an hour (inversion);
            -- key-grain agg -> lag window -> conv rollup, epoch-ms span
            WITH planted AS (
              SELECT conv_id, turn_idx,
                CASE WHEN CAST(substring(conv_id, 2, 9) AS INT) % 7 = 0
                          AND turn_idx = 2
                     THEN ts - INTERVAL 1 HOUR ELSE ts END AS ts
              FROM read_parquet('{derived["transcripts_raw"]}')
              WHERE NOT (CAST(substring(conv_id, 2, 9) AS INT) % 9 = 3
                         AND turn_idx = 1)
            ), key AS (
              SELECT conv_id, turn_idx,
                CAST(COUNT(*) AS BIGINT) AS copies, MAX(ts) AS kts
              FROM planted GROUP BY conv_id, turn_idx
            ), w AS (
              SELECT *, LAG(kts) OVER (
                PARTITION BY conv_id ORDER BY turn_idx) AS prev_ts
              FROM key
            ), agg AS (
              SELECT conv_id,
                CAST(SUM(copies) AS BIGINT) AS n_rows_raw,
                CAST(COUNT(*) AS BIGINT) AS n_turns,
                CAST(SUM(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dup_keys,
                MIN(turn_idx) AS first_idx,
                CAST(MAX(turn_idx) AS BIGINT) - CAST(MIN(turn_idx) AS BIGINT)
                  + 1 - CAST(COUNT(*) AS BIGINT) AS n_idx_gaps,
                CAST(SUM(CASE WHEN prev_ts IS NOT NULL AND kts < prev_ts
                              THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_ts_inversions,
                epoch_ms(MAX(kts)) - epoch_ms(MIN(kts)) AS span_ms
              FROM w GROUP BY conv_id
            )
            SELECT *,
              (n_dup_keys = 0 AND first_idx = 0 AND n_idx_gaps = 0
               AND n_ts_inversions = 0) AS integrity_ok
            FROM agg
        """,
        "reply_latency": f"""
            -- GENUINE SQL twin of reply_latency: lead window over the
            -- deduped turns, conditional integer agg; -1 sentinel max
            WITH d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM read_parquet('{derived["transcripts_raw"]}')
              ) WHERE rn = 1
            ), g AS (
              SELECT conv_id, role,
                lead(role) OVER (
                  PARTITION BY conv_id ORDER BY turn_idx) AS nxt_role,
                epoch_us(lead(ts) OVER (
                  PARTITION BY conv_id ORDER BY turn_idx))
                  - epoch_us(ts) AS lat
              FROM d
            ), f AS (
              SELECT conv_id,
                role = 'user' AS is_user,
                COALESCE(role = 'user'
                  AND nxt_role IN ('assistant', 'tool'), FALSE) AS replied,
                lat
              FROM g
            )
            SELECT conv_id,
              CAST(SUM(CASE WHEN is_user THEN 1 ELSE 0 END) AS BIGINT)
                AS n_user_turns,
              CAST(SUM(CASE WHEN replied THEN 1 ELSE 0 END) AS BIGINT)
                AS n_replies,
              CAST(COALESCE(SUM(CASE WHEN replied THEN lat END), 0)
                AS BIGINT) AS total_latency_us,
              CAST(COALESCE(MAX(CASE WHEN replied THEN lat END), -1)
                AS BIGINT) AS max_latency_us
            FROM f GROUP BY conv_id
        """,
        "tool_transitions": f"""
            -- GENUINE SQL twin of tool_transitions: lag window over tool
            -- turns only, (edge, conv) pre-agg, edge agg
            WITH d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM read_parquet('{derived["transcripts_raw"]}')
              ) WHERE rn = 1
            ), t AS (
              SELECT conv_id, turn_idx, tool FROM d WHERE tool IS NOT NULL
            ), g AS (
              SELECT conv_id,
                COALESCE(lag(tool) OVER (
                  PARTITION BY conv_id ORDER BY turn_idx),
                  '^START') AS prev_tool,
                tool
              FROM t
            ), pc AS (
              SELECT prev_tool, tool, conv_id,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM g GROUP BY 1, 2, 3
            )
            SELECT prev_tool, tool,
              CAST(SUM(n) AS BIGINT) AS n_transitions,
              CAST(COUNT(*) AS BIGINT) AS n_convs
            FROM pc GROUP BY 1, 2
        """,
        "alpha_rates": """
            -- FULL genuine-SQL twin of temperature_sample_rates
            -- (alpha=0.5, budget 1e6) over per-source char mass; sqrt is
            -- IEEE-correctly-rounded on both engines and the
            -- power-of-two units scale is exact, so s_units matches
            -- bit-for-bit; shares/budgets are pure int64 floor division
            WITH counts AS (
              SELECT source, CAST(SUM(n_chars) AS BIGINT) AS char_mass
              FROM documents GROUP BY source
            ), s AS (
              SELECT source, char_mass,
                CAST(floor(sqrt(CAST(char_mass AS DOUBLE)) * 1048576)
                     AS BIGINT) AS s_units
              FROM counts
            ), tot AS (
              SELECT CAST(SUM(char_mass) AS BIGINT) AS tw,
                     CAST(SUM(s_units) AS BIGINT) AS ts
              FROM s
            )
            SELECT source, char_mass,
              CAST((CAST(char_mass AS HUGEINT) * 1048576) // tw
                   AS BIGINT) AS p_units,
              s_units,
              CAST((CAST(s_units AS HUGEINT) * 1048576) // ts
                   AS BIGINT) AS q_units,
              CAST((CAST(s_units AS HUGEINT) * 1000000) // ts
                   AS BIGINT) AS budget_tokens
            FROM s, tot
        """,
        "code_blocks": f"""
            -- GENUINE SQL twin of code_block_stats on the fence-planted
            -- corpus. The fence regex is interpolated through a VARIABLE
            -- (same bytes as Spark's F.lit pattern; the embedded literal
            -- newline is legal inside a quoted SQL literal and RE2
            -- matches it as itself).
            WITH planted AS (
              SELECT conv_id, turn_idx, role, tool, ts,
                CASE
                  WHEN CAST(substring(conv_id, 2, 9) AS INT) % 3 = 1
                       AND role = 'assistant'
                  THEN '```python' || chr(10) || COALESCE(text, '')
                       || chr(10) || '```'
                  WHEN CAST(substring(conv_id, 2, 9) AS INT) % 5 = 2
                       AND role = 'user'
                  THEN 'see ```sql' || chr(10) || COALESCE(text, '')
                       || chr(10) || '``` done'
                  WHEN CAST(substring(conv_id, 2, 9) AS INT) % 7 = 4
                       AND role = 'assistant'
                  THEN '```' || chr(10) || COALESCE(text, '')
                       || chr(10) || '```'
                  ELSE text END AS text
              FROM read_parquet('{derived["transcripts_raw"]}')
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM planted
              ) WHERE rn = 1
            ), ex AS (
              SELECT conv_id,
                regexp_extract_all(COALESCE(text, ''), '{_fence}', 1) AS tags,
                regexp_extract_all(COALESCE(text, ''), '{_fence}', 2) AS bodies
              FROM d
            ), b AS (
              SELECT conv_id, tags, bodies,
                unnest(generate_series(1, len(tags))) AS i
              FROM ex WHERE len(tags) > 0
            ), blk AS (
              SELECT conv_id,
                CASE WHEN tags[i] = '' THEN '<none>' ELSE tags[i] END AS lang,
                length(bodies[i]) AS chars
              FROM b
            ), pd AS (
              SELECT lang, conv_id,
                CAST(COUNT(*) AS BIGINT) AS blocks,
                CAST(SUM(chars) AS BIGINT) AS chrs
              FROM blk GROUP BY lang, conv_id
            )
            SELECT lang,
              CAST(SUM(blocks) AS BIGINT) AS n_blocks,
              CAST(SUM(chrs) AS BIGINT) AS n_code_chars,
              CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM pd GROUP BY lang
        """,
        "role_diversity": f"""
            -- GENUINE SQL twin of role_ngram_diversity (n=2) on the
            -- collapse-planted corpus: every 4th conversation's assistant
            -- turns become one fixed sentence; deduped turns, ASCII-ws
            -- normalized, RS-joined bigrams, (role, gram) agg + rollup
            WITH planted AS (
              SELECT conv_id, turn_idx, role, tool, ts,
                CASE WHEN CAST(substring(conv_id, 2, 9) AS INT) % 4 = 0
                          AND role = 'assistant'
                     THEN 'the request completed successfully without further action'
                     ELSE text END AS text
              FROM read_parquet('{derived["transcripts_raw"]}')
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM planted
              ) WHERE rn = 1
            ), e AS (
              SELECT role,
                trim(regexp_replace(COALESCE(text, ''),
                     '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS nt
              FROM d
            ), wds AS (
              SELECT role, string_split(nt, ' ') AS w
              FROM e WHERE length(nt) > 0
            ), g AS (
              SELECT role,
                unnest(list_transform(generate_series(1, len(w) - 1),
                       i -> w[i] || chr(30) || w[i + 1])) AS gram
              FROM wds WHERE len(w) >= 2
            ), c AS (
              SELECT role, gram, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM g GROUP BY role, gram
            )
            SELECT role,
              CAST(SUM(cnt) AS BIGINT) AS total_ngrams,
              CAST(COUNT(*) AS BIGINT) AS distinct_ngrams,
              CAST(MAX(cnt) AS BIGINT) AS max_gram_count,
              CAST((CAST(COUNT(*) AS HUGEINT) * 1048576) // SUM(cnt)
                   AS BIGINT) AS diversity_units,
              CAST((CAST(MAX(cnt) AS HUGEINT) * 1048576) // SUM(cnt)
                   AS BIGINT) AS top_units
            FROM c GROUP BY role
        """,
        "turn_novelty": f"""
            -- GENUINE SQL twin of turn_novelty (n=8): lateral-unnest
            -- per-turn DISTINCT 8-gram streams, global first occurrence
            -- via ROW_NUMBER over (gram -> conv_id, turn_idx), per-turn
            -- integer agg; turns with <8 words carry no row
            WITH d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM read_parquet('{derived["transcripts_raw"]}')
              ) WHERE rn = 1
            ), tk AS (
              SELECT conv_id, turn_idx,
                list_filter(string_split_regex(COALESCE(text, ''),
                  '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS w
              FROM d
            ), tg AS (
              SELECT DISTINCT conv_id, turn_idx,
                array_to_string(w[i:i+7], ' ') AS gram
              FROM tk, LATERAL (
                SELECT unnest(generate_series(1, len(w) - 7)) AS i) g
              WHERE len(w) >= 8
            ), fo AS (
              SELECT conv_id, turn_idx,
                ROW_NUMBER() OVER (
                  PARTITION BY gram ORDER BY conv_id, turn_idx) = 1
                  AS novel
              FROM tg
            )
            SELECT conv_id, turn_idx,
              CAST(COUNT(*) AS BIGINT) AS n_grams,
              CAST(SUM(CASE WHEN novel THEN 1 ELSE 0 END) AS BIGINT)
                AS n_novel
            FROM fo GROUP BY conv_id, turn_idx
        """,
        "turn_length_trend": f"""
            -- GENUINE SQL twin of turn_length_trend (role='assistant'):
            -- 0-based position among role turns, exact integer
            -- least-squares slope numerator/denominator
            WITH d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM read_parquet('{derived["transcripts_raw"]}')
              ) WHERE rn = 1
            ), a0 AS (
              SELECT conv_id, turn_idx,
                CAST(len(list_filter(string_split_regex(
                  COALESCE(text, ''), '[ \\t\\n\\x0b\\f\\r]+'),
                  x -> x <> '')) AS BIGINT) AS w
              FROM d WHERE role = 'assistant'
            ), a AS (
              SELECT conv_id, w,
                CAST(ROW_NUMBER() OVER (
                  PARTITION BY conv_id ORDER BY turn_idx) - 1
                  AS BIGINT) AS i
              FROM a0
            )
            SELECT conv_id,
              CAST(COUNT(*) AS BIGINT) AS n_role_turns,
              CAST(SUM(w) AS BIGINT) AS total_words,
              CAST(COUNT(*) * SUM(i * w) - SUM(i) * SUM(w) AS BIGINT)
                AS slope_num,
              CAST(COUNT(*) * SUM(i * i) - SUM(i) * SUM(i) AS BIGINT)
                AS slope_den
            FROM a GROUP BY conv_id
        """,
        "pii_echo": f"""
            -- GENUINE SQL twin of pii_echo on the echo-planted corpus:
            -- every user turn carries u<conv>@example.com, every 3rd
            -- conversation's assistant turns echo it, every 5th's
            -- assistant turns introduce a<conv>@relay.net (filtered —
            -- the first occurrence is not a user turn). One entity-grain
            -- agg; arg_min resolves the introducing role.
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
            ), pl AS (
              SELECT conv_id, turn_idx, role,
                COALESCE(text, '')
                || CASE WHEN role = 'user'
                     THEN ' u' || conv_id || '@example.com' ELSE '' END
                || CASE WHEN CAST(substring(conv_id, 2, 9) AS INT) % 3 = 0
                          AND role = 'assistant'
                     THEN ' resent to u' || conv_id || '@example.com'
                     ELSE '' END
                || CASE WHEN CAST(substring(conv_id, 2, 9) AS INT) % 5 = 0
                          AND role = 'assistant'
                     THEN ' via a' || conv_id || '@relay.net' ELSE '' END
                AS text, tool, ts
              FROM raw
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM pl
              ) WHERE rn = 1
            ), e AS (
              SELECT conv_id, turn_idx, role, 'email' AS kind,
                unnest(regexp_extract_all(COALESCE(text, ''),
                  '{_epat}', 0)) AS entity
              FROM d
              UNION ALL
              SELECT conv_id, turn_idx, role, 'phone' AS kind,
                unnest(regexp_extract_all(COALESCE(text, ''),
                  '{_ppat}', 0)) AS entity
              FROM d
            ), a AS (
              SELECT conv_id, kind, entity,
                CAST(MIN(turn_idx) AS INTEGER) AS first_src_idx,
                arg_min(role, turn_idx) AS first_role,
                CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_echoes,
                CAST(COALESCE(MIN(CASE WHEN role = 'assistant'
                                       THEN turn_idx END), -1)
                     AS INTEGER) AS first_echo_idx
              FROM e GROUP BY 1, 2, 3
            )
            SELECT conv_id, kind, entity, first_src_idx, n_echoes,
              first_echo_idx, n_echoes > 0 AS echoed
            FROM a WHERE first_role = 'user'
        """,
        "tool_errors": f"""
            -- GENUINE SQL twin of tool_error_stats on the error-planted
            -- corpus ((cid*7 + turn_idx) % 4 == 0 tool turns prefixed
            -- with an error banner); same anchored explicit-case
            -- alternation via RE2, (tool, conv) pre-agg then tool agg
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
            ), pl AS (
              SELECT conv_id, turn_idx, role,
                CASE WHEN role = 'tool'
                      AND (CAST(substring(conv_id, 2, 9) AS BIGINT) * 7
                           + turn_idx) % 4 = 0
                     THEN 'Error: upstream timed out; ' || COALESCE(text, '')
                     ELSE text END AS text,
                tool, ts
              FROM raw
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM pl
              ) WHERE rn = 1
            ), calls AS (
              SELECT COALESCE(tool, '<unknown>') AS tool, conv_id,
                CASE WHEN regexp_matches(COALESCE(text, ''), '{_terr}')
                     THEN 1 ELSE 0 END AS err
              FROM d WHERE role = 'tool'
            ), pc AS (
              SELECT tool, conv_id,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(err) AS BIGINT) AS n_err
              FROM calls GROUP BY 1, 2
            ), a AS (
              SELECT tool,
                CAST(SUM(n) AS BIGINT) AS n_calls,
                CAST(COUNT(*) AS BIGINT) AS n_convs,
                CAST(SUM(n_err) AS BIGINT) AS n_errors,
                MIN(CASE WHEN n_err > 0 THEN conv_id END)
                  AS first_error_conv
              FROM pc GROUP BY 1
            )
            SELECT tool, n_calls, n_convs, n_errors, first_error_conv,
              CAST((CAST(n_errors AS HUGEINT) * 1048576) // n_calls
                   AS BIGINT) AS error_units
            FROM a
        """,
        "fork_mask": f"""
            -- GENUINE SQL twin of mask_fork_prefixes (k=2, min_group=2)
            -- on the fork-planted corpus (conv_forks' clone plant):
            -- digest replay via string_agg, group agg, joins back onto
            -- the ranked deduped turns
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
            ), u AS (
              SELECT * FROM raw
              UNION ALL
              SELECT conv_id || 'd' AS conv_id, turn_idx, role,
                CASE WHEN turn_idx >= 2
                     THEN COALESCE(text, '') || ' fork variant'
                     ELSE text END AS text,
                tool, ts
              FROM raw
              WHERE CAST(substring(conv_id, 2, 9) AS INT) % 5 = 0
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM u
              ) WHERE rn = 1
            ), r AS (
              SELECT conv_id, turn_idx,
                ROW_NUMBER() OVER (
                  PARTITION BY conv_id ORDER BY turn_idx) AS trn
              FROM d
            ), p AS (
              SELECT conv_id, turn_idx, role,
                trim(regexp_replace(COALESCE(text, ''),
                     '[ \t\n\x0b\f\r]+', ' ', 'g')) AS norm,
                ROW_NUMBER() OVER (
                  PARTITION BY conv_id ORDER BY turn_idx) AS trn
              FROM d
            ), pc AS (
              SELECT conv_id,
                md5(string_agg(role || ':' || norm,
                    chr(30) ORDER BY turn_idx)) AS prefix_md5
              FROM p WHERE trn <= 2
              GROUP BY conv_id
              HAVING COUNT(*) = 2
            ), g AS (
              SELECT prefix_md5, MIN(conv_id) AS rep
              FROM pc GROUP BY 1 HAVING COUNT(*) >= 2
            ), cf AS (
              SELECT pc.conv_id, pc.prefix_md5,
                pc.conv_id = g.rep AS is_rep
              FROM pc JOIN g USING (prefix_md5)
            )
            SELECT r.conv_id, r.turn_idx,
              cf.prefix_md5 AS fork_md5,
              COALESCE(cf.is_rep, FALSE) AS is_rep,
              NOT (cf.prefix_md5 IS NOT NULL AND NOT cf.is_rep
                   AND r.trn <= 2) AS keep_turn
            FROM r LEFT JOIN cf USING (conv_id)
        """,
        "pref_pairs": f"""
            -- FULL GENUINE SQL twin of preference_pairs (k=2) on the
            -- fork-planted corpus: assistant-char scores over the RAW
            -- delivery, digest replay over the deduped turns, window
            -- rank extrema with the (score, conv_id) tie order
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
            ), u AS (
              SELECT * FROM raw
              UNION ALL
              SELECT conv_id || 'd' AS conv_id, turn_idx, role,
                CASE WHEN turn_idx >= 2
                     THEN COALESCE(text, '') || ' fork variant'
                     ELSE text END AS text,
                tool, ts
              FROM raw
              WHERE CAST(substring(conv_id, 2, 9) AS INT) % 5 = 0
            ), sc AS (
              SELECT conv_id,
                CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS score
              FROM u WHERE role = 'assistant' GROUP BY 1
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM u
              ) WHERE rn = 1
            ), p AS (
              SELECT conv_id, turn_idx, role,
                trim(regexp_replace(COALESCE(text, ''),
                     '[ \t\n\x0b\f\r]+', ' ', 'g')) AS norm,
                ROW_NUMBER() OVER (
                  PARTITION BY conv_id ORDER BY turn_idx) AS trn
              FROM d
            ), pc AS (
              SELECT conv_id,
                md5(string_agg(role || ':' || norm,
                    chr(30) ORDER BY turn_idx)) AS prefix_md5
              FROM p WHERE trn <= 2
              GROUP BY conv_id
              HAVING COUNT(*) = 2
            ), j AS (
              SELECT pc.conv_id, pc.prefix_md5, sc.score
              FROM pc JOIN sc USING (conv_id)
            ), a AS (
              SELECT prefix_md5,
                CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
              FROM j GROUP BY 1
            ), r AS (
              SELECT *,
                ROW_NUMBER() OVER (PARTITION BY prefix_md5
                  ORDER BY score DESC, conv_id DESC) AS rhi,
                ROW_NUMBER() OVER (PARTITION BY prefix_md5
                  ORDER BY score ASC, conv_id ASC) AS rlo
              FROM j
            )
            SELECT a.prefix_md5, a.n_convs,
              hi.conv_id AS chosen_conv, lo.conv_id AS rejected_conv,
              hi.score AS chosen_score, lo.score AS rejected_score,
              hi.score - lo.score AS margin
            FROM a
            JOIN (SELECT * FROM r WHERE rhi = 1) hi USING (prefix_md5)
            JOIN (SELECT * FROM r WHERE rlo = 1) lo USING (prefix_md5)
            WHERE a.n_convs >= 2 AND hi.score > lo.score
              AND hi.conv_id <> lo.conv_id
        """,
        "pii_exposure": f"""
            -- GENUINE SQL twin of pii_entity_exposure on the
            -- clone-planted corpus: raw regexp_extract_all per kind
            -- (patterns interpolated verbatim — single-quoted SQL
            -- literals keep backslashes), per-conv pre-agg, entity agg
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
            ), u AS (
              SELECT * FROM raw
              UNION ALL
              SELECT conv_id || 'd' AS conv_id, turn_idx, role, text,
                     tool, ts
              FROM raw
              WHERE CAST(substring(conv_id, 2, 9) AS INT) % 5 = 0
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM u
              ) WHERE rn = 1
            ), e AS (
              SELECT 'email' AS kind,
                unnest(regexp_extract_all(COALESCE(text, ''),
                  '{_epat}', 0)) AS entity,
                conv_id
              FROM d
              UNION ALL
              SELECT 'phone' AS kind,
                unnest(regexp_extract_all(COALESCE(text, ''),
                  '{_ppat}', 0)) AS entity,
                conv_id
              FROM d
            ), pc AS (
              SELECT kind, entity, conv_id,
                CAST(COUNT(*) AS BIGINT) AS n_in_conv
              FROM e GROUP BY 1, 2, 3
            ), pe AS (
              SELECT kind, entity,
                CAST(SUM(n_in_conv) AS BIGINT) AS n_occurrences,
                CAST(COUNT(*) AS BIGINT) AS n_convs,
                MIN(conv_id) AS first_conv
              FROM pc GROUP BY 1, 2
            )
            SELECT *, n_convs > 1 AS cross_conv FROM pe
        """,
        "sessionize": f"""
            -- GENUINE SQL twin of sessionize_turns (gap_minutes=1):
            -- epoch_us lag diff -> threshold -> session-id prefix sum
            WITH d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM read_parquet('{derived["transcripts_raw"]}')
              ) WHERE rn = 1
            ), g AS (
              SELECT conv_id, turn_idx,
                epoch_us(ts) - lag(epoch_us(ts)) OVER (
                  PARTITION BY conv_id ORDER BY turn_idx) AS gap
              FROM d
            ), f AS (
              SELECT conv_id, turn_idx,
                CAST(COALESCE(gap, -1) AS BIGINT) AS gap_us,
                COALESCE(gap > 60000000, TRUE) AS session_start
              FROM g
            )
            SELECT conv_id, turn_idx,
              CAST(SUM(CASE WHEN session_start THEN 1 ELSE 0 END) OVER (
                PARTITION BY conv_id ORDER BY turn_idx
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx,
              gap_us, session_start
            FROM f
        """,
        "conv_contamination": f"""
            -- GENUINE SQL twin of conversation_contamination (n=8):
            -- benchmark = first 12 words of every 7th conversation's
            -- deduped turn 0; lateral-unnest 8-gram streams on both
            -- sides, distinct (conv, gram) hits, zero-filled misses
            WITH d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM read_parquet('{derived["transcripts_raw"]}')
              ) WHERE rn = 1
            ), tk AS (
              SELECT conv_id, turn_idx,
                list_filter(string_split_regex(COALESCE(text, ''),
                  '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS w
              FROM d
            ), bench AS (
              SELECT list_filter(string_split_regex(
                  array_to_string(w[1:12], ' '),
                  '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '') AS w
              FROM tk
              WHERE CAST(substring(conv_id, 2, 9) AS INT) % 7 = 0
                AND turn_idx = 0
            ), bg AS (
              SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS gram
              FROM bench, LATERAL (
                SELECT unnest(generate_series(1, len(w) - 7)) AS i) g
              WHERE len(w) >= 8
            ), tg AS (
              SELECT DISTINCT conv_id,
                array_to_string(w[i:i+7], ' ') AS gram
              FROM tk, LATERAL (
                SELECT unnest(generate_series(1, len(w) - 7)) AS i) g
              WHERE len(w) >= 8
            ), h AS (
              SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_hit_grams
              FROM tg JOIN bg USING (gram) GROUP BY conv_id
            )
            SELECT c.conv_id,
              CAST(COALESCE(h.n_hit_grams, 0) AS BIGINT) AS n_hit_grams,
              COALESCE(h.n_hit_grams, 0) > 0 AS contaminated
            FROM (SELECT DISTINCT conv_id FROM d) c
            LEFT JOIN h USING (conv_id)
        """,
        "conv_forks": f"""
            -- GENUINE SQL twin of conversation_forks (k=2, min_group=2)
            -- on the fork-planted corpus: every 5th conversation cloned
            -- under conv_id || 'd' with its tail (turn_idx >= 2)
            -- rewritten, so each pair shares exactly the 2-turn prefix;
            -- md5 of role:normtext prefix turns joined by chr(30)
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
            ), u AS (
              SELECT * FROM raw
              UNION ALL
              SELECT conv_id || 'd' AS conv_id, turn_idx, role,
                CASE WHEN turn_idx >= 2
                     THEN COALESCE(text, '') || ' fork variant'
                     ELSE text END AS text,
                tool, ts
              FROM raw
              WHERE CAST(substring(conv_id, 2, 9) AS INT) % 5 = 0
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM u
              ) WHERE rn = 1
            ), p AS (
              SELECT conv_id, turn_idx, role,
                trim(regexp_replace(COALESCE(text, ''),
                     '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS norm,
                ROW_NUMBER() OVER (
                  PARTITION BY conv_id ORDER BY turn_idx) AS trn
              FROM d
            ), pc AS (
              SELECT conv_id,
                md5(string_agg(role || ':' || norm,
                    chr(30) ORDER BY turn_idx)) AS prefix_md5
              FROM p WHERE trn <= 2
              GROUP BY conv_id
              HAVING COUNT(*) = 2
            )
            SELECT prefix_md5,
              CAST(COUNT(*) AS BIGINT) AS n_convs,
              MIN(conv_id) AS first_conv
            FROM pc GROUP BY 1 HAVING COUNT(*) >= 2
        """,
        "conv_templates": f"""
            -- GENUINE SQL twin of assistant_templates (min_count=2,
            -- min_words=3) on the template-planted corpus: two clone
            -- sets rewrite assistant turns to 'request completed in
            -- <idx*mult+turn_idx> ms' — unique text, one template after
            -- digit masking
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
            ), cl AS (
              SELECT conv_id || m.sfx AS conv_id, turn_idx, role,
                CASE WHEN role = 'assistant'
                     THEN 'request completed in ' || CAST(
                       CAST(substring(conv_id, 2, 9) AS INT) * m.mult
                       + turn_idx AS VARCHAR) || ' ms'
                     ELSE text END AS text,
                tool, ts
              FROM raw, (VALUES ('d1', 7), ('d2', 13)) AS m(sfx, mult)
              WHERE CAST(substring(conv_id, 2, 9) AS INT) % 5 = 0
            ), u AS (
              SELECT * FROM raw UNION ALL SELECT * FROM cl
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM u
              ) WHERE rn = 1
            ), a AS (
              SELECT conv_id,
                regexp_replace(
                  trim(regexp_replace(COALESCE(text, ''),
                       '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')),
                  '[0-9]+', '0', 'g') AS template
              FROM d WHERE role = 'assistant'
            ), f AS (
              SELECT * FROM a
              WHERE len(list_filter(string_split(template, ' '),
                        x -> x <> '')) >= 3
            ), pc AS (
              SELECT template, conv_id,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM f GROUP BY 1, 2
            )
            SELECT template,
              CAST(SUM(n) AS BIGINT) AS n_turns,
              CAST(COUNT(*) AS BIGINT) AS n_convs,
              MIN(conv_id) AS first_conv
            FROM pc GROUP BY 1 HAVING SUM(n) >= 2
        """,
        "role_patterns": f"""
            -- GENUINE SQL twin of role_patterns (max_turns=8): deduped
            -- turns, per-conversation comma-joined role prefix (first 8
            -- roles in turn_idx order), n_turns_total sums FULL lengths
            WITH d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM read_parquet('{derived["transcripts_raw"]}')
              ) WHERE rn = 1
            ), p AS (
              SELECT conv_id, turn_idx, role,
                ROW_NUMBER() OVER (
                  PARTITION BY conv_id ORDER BY turn_idx) AS trn
              FROM d
            ), pat AS (
              SELECT conv_id,
                string_agg(role, ',' ORDER BY turn_idx) AS role_pattern
              FROM p WHERE trn <= 8 GROUP BY conv_id
            ), cnt AS (
              SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n
              FROM d GROUP BY conv_id
            )
            SELECT role_pattern,
              CAST(COUNT(*) AS BIGINT) AS n_convs,
              CAST(SUM(n) AS BIGINT) AS n_turns_total
            FROM pat JOIN cnt USING (conv_id) GROUP BY 1
        """,
        "turn_dedup": f"""
            -- GENUINE SQL twin of operators/conversation.turn_dedup on
            -- the clone-planted corpus: every 5th conversation unioned
            -- back under conv_id || 'd', latest-per-(conv,turn) dedup,
            -- ASCII-ws-normalized assistant texts with >= 3 words ranked
            -- by first occurrence in (conv_id, turn_idx) order
            WITH raw AS (
              SELECT * FROM read_parquet('{derived["transcripts_raw"]}')
            ), u AS (
              SELECT * FROM raw
              UNION ALL
              SELECT conv_id || 'd' AS conv_id, turn_idx, role, text,
                     tool, ts
              FROM raw
              WHERE CAST(substring(conv_id, 2, 9) AS INT) % 5 = 0
            ), d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM u
              ) WHERE rn = 1
            ), e AS (
              SELECT conv_id, turn_idx,
                trim(regexp_replace(COALESCE(text, ''),
                     '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS norm
              FROM d WHERE role = 'assistant'
            ), g AS (
              SELECT conv_id, turn_idx, norm,
                CASE WHEN length(norm) = 0 THEN 0
                     ELSE len(string_split(norm, ' ')) END AS n_words
              FROM e
            ), r AS (
              SELECT conv_id, turn_idx,
                CAST(n_words AS BIGINT) AS n_words,
                CAST(COUNT(*) OVER (PARTITION BY norm) AS BIGINT)
                  AS n_copies,
                CAST(ROW_NUMBER() OVER (
                  PARTITION BY norm ORDER BY conv_id, turn_idx
                ) AS BIGINT) AS copy_rank
              FROM g WHERE n_words >= 3
            )
            SELECT *, copy_rank = 1 AS keep FROM r
        """,
        "conv_repetition": f"""
            -- GENUINE SQL twin of conversation_repetition on the
            -- loop-planted fixture: lag equality -> run-id prefix sum ->
            -- run-length window -> per-conversation aggregates
            WITH d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM read_parquet('{derived["transcripts_loop_raw"]}')
              ) WHERE rn = 1
            ), a AS (
              SELECT conv_id, turn_idx,
                trim(regexp_replace(COALESCE(text, ''),
                     '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS norm
              FROM d WHERE role = 'assistant'
            ), f AS (
              SELECT conv_id, turn_idx, norm,
                CASE WHEN norm = lag(norm) OVER (
                  PARTITION BY conv_id ORDER BY turn_idx
                ) THEN 1 ELSE 0 END AS rep
              FROM a
            ), r AS (
              SELECT *, SUM(1 - rep) OVER (
                PARTITION BY conv_id ORDER BY turn_idx
                ROWS UNBOUNDED PRECEDING) AS run_id
              FROM f
            ), rl AS (
              SELECT *, COUNT(*) OVER (PARTITION BY conv_id, run_id)
                AS run_len
              FROM r
            )
            SELECT conv_id,
              CAST(COUNT(*) AS BIGINT) AS n_role_turns,
              CAST(COUNT(DISTINCT norm) AS BIGINT) AS n_distinct_texts,
              CAST(SUM(rep) AS BIGINT) AS n_consec_repeats,
              CAST(MAX(run_len) AS BIGINT) AS max_run,
              MAX(run_len) >= 3 AS is_loop
            FROM rl GROUP BY conv_id
        """,
        "cdc_neardup": _rp("cdc_neardup"),
        "blocklist_hits": _rp("blocklist_hits"),
        "token_fertility": _rp("token_fertility"),
        "html_extract": _rp("html_extract"),
        "doc_curation_blocklist": _rp("doc_curation_blocklist"),
        "doc_curation_neardup": _rp("doc_curation_neardup"),
        "para_neardup": _rp("para_neardup"),
        "conv_pack_isolated": _rp("conv_pack_isolated"),
        "moore_lewis": _rp("moore_lewis"),
        "weighted_sample": """
            -- Efraimidis-Spirakis replay: identical u derivation
            -- (md5('ws1' || id) first 48 bits, +1, /2^48), identical
            -- association order (-ln(u)/w)*2^30, floor-quantized BIGINT
            -- ranking with doc_id tie-break — selection is integer-exact
            WITH t AS (
              SELECT doc_id, source, n_chars,
                CAST(FLOOR(
                  -ln((CAST('0x' || substr(
                         md5('ws1' || CAST(doc_id AS VARCHAR)), 1, 12)
                       AS BIGINT) + 1) / 281474976710656.0)
                  / CAST(n_chars AS DOUBLE) * 1073741824.0
                ) AS BIGINT) AS sample_key
              FROM documents WHERE n_chars > 0
            ), r AS (
              SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY source ORDER BY sample_key, doc_id
                ) AS sample_rank
              FROM t
            )
            SELECT doc_id, source, n_chars, sample_key,
                   CAST(sample_rank AS INT) AS sample_rank
            FROM r WHERE sample_rank <= 20
        """,
        "token_budget": """
            -- GENUINE SQL twin of select_token_budget over TTR-scored
            -- documents: same ASCII-ws tokenizer class, integer TTR
            -- units, integer score quantization (n_buckets=4096, step =
            -- ceil((mx-mn+1)/4096) as (mx-mn+4096)//4096), md5-48 tie
            -- order, exclusive running-sum cut at 30000 tokens with the
            -- crossing doc kept. The operator's bucket decomposition is
            -- provably this global (bkt DESC, h, doc_id) order.
            WITH ws AS (
              SELECT doc_id, list_filter(
                       string_split_regex(coalesce(text, ''),
                                          '[ \t\n\x0b\f\r]+'),
                       x -> x <> '') AS w
              FROM documents
            ), sized AS (
              SELECT doc_id,
                     CAST((len(list_distinct(w)) * 1048576)
                          // (len(w) + 1) AS BIGINT) AS score,
                     CAST(len(w) AS BIGINT) AS n_tokens
              FROM ws
            ), mm AS (
              SELECT min(score) AS mn, max(score) AS mx FROM sized
            ), b AS (
              SELECT s.doc_id, s.score, s.n_tokens,
                     (s.score - mm.mn)
                       // GREATEST(1, (mm.mx - mm.mn + 4096) // 4096)
                       AS bkt,
                     CAST('0x' || substr(md5('tb1' ||
                       CAST(s.doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS h
              FROM sized s CROSS JOIN mm
            ), o AS (
              SELECT doc_id, score, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (
                       ORDER BY bkt DESC, h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS cb
              FROM b
            )
            SELECT doc_id, score, n_tokens FROM o WHERE cb < 30000
        """,
        "source_vocab": """
            -- GENUINE SQL twin of source_vocab_stats: explicit Java-\\s
            -- ASCII class (VT included — RE2 \\s lacks it), no case
            -- fold, two-level agg, integer TTR
            WITH toks AS (
              SELECT source, unnest(list_filter(
                string_split_regex(coalesce(text, ''),
                                   '[ \t\n\x0b\f\r]+'),
                x -> x <> '')) AS term
              FROM documents
            ), tf AS (
              SELECT source, term, COUNT(*) AS cnt
              FROM toks GROUP BY 1, 2
            ), v AS (
              SELECT source,
                     CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                     CAST(COUNT(*) AS BIGINT) AS n_types,
                     CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_hapax
              FROM tf GROUP BY 1
            ), d AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
              FROM documents GROUP BY 1
            )
            SELECT d.source AS "group", n_docs,
                   coalesce(n_tokens, 0) AS n_tokens,
                   coalesce(n_types, 0) AS n_types,
                   coalesce(n_hapax, 0) AS n_hapax,
                   (n_types * 1048576) // n_tokens AS ttr_units
            FROM d LEFT JOIN v USING (source)
        """,
        "source_top_terms": """
            -- c-TF-IDF: same tokenizer class (ASCII \\s+ regex), same
            -- association order tf * ln(1 + n_groups/df) * 2^20, floored
            WITH toks AS (
              SELECT source, unnest(list_filter(
                string_split_regex(lower(trim(text)), '\\s+'),
                x -> length(x) > 0)) AS term
              FROM documents
            ), tf AS (
              SELECT source AS "group", term,
                     CAST(COUNT(*) AS BIGINT) AS tf
              FROM toks GROUP BY 1, 2
            ), dfg AS (
              SELECT term, CAST(COUNT(*) AS BIGINT) AS df_groups
              FROM tf GROUP BY 1
            ), ng AS (
              SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS n
              FROM documents
            ), s AS (
              SELECT "group", term, tf, df_groups,
                CAST(FLOOR(CAST(tf AS DOUBLE)
                     * ln(1.0 + n / CAST(df_groups AS DOUBLE))
                     * 1048576.0) AS BIGINT) AS score_units
              FROM tf JOIN dfg USING (term), ng
            ), r AS (
              SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY "group"
                  ORDER BY score_units DESC, term
                ) AS rank
              FROM s
            )
            SELECT "group", term, tf, df_groups, score_units,
                   CAST(rank AS INT) AS rank
            FROM r WHERE rank <= 10
        """,
        "mixture_sample": """
            -- every literal CAST to DOUBLE (DuckDB parses 0.5 as DECIMAL)
            -- and the arithmetic in the exact order the Python driver
            -- computes rates, so the md5 threshold matches bit-for-bit
            WITH n AS (
              SELECT source, COUNT(*) AS n_s FROM documents GROUP BY 1
            ), r AS (
              SELECT source,
                     LEAST(CAST(1.0 AS DOUBLE),
                       (200 * CASE source
                          WHEN 'src1' THEN CAST(0.5 AS DOUBLE)
                          WHEN 'src2' THEN CAST(0.3 AS DOUBLE)
                          WHEN 'src3' THEN CAST(0.2 AS DOUBLE) END
                        / (CAST(0.5 AS DOUBLE) + CAST(0.3 AS DOUBLE)
                           + CAST(0.2 AS DOUBLE)))
                       / n_s) AS rate
              FROM n WHERE source IN ('src1', 'src2', 'src3')
            )
            SELECT d.doc_id, d.source,
                   substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS sample_bucket
            FROM documents d JOIN r USING (source)
            WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) <
                  CASE WHEN rate >= CAST(1.0 AS DOUBLE) THEN 'g'
                       ELSE lower(lpad(to_hex(CAST(LEAST(FLOOR(rate * 65536),
                                                         65535) AS INT)),
                                       4, '0')) END
        """,
        # conversation operators: GENUINE SQL over the raw fixture turns
        # (transcripts_raw is the untouched input, not a replica) — dedup
        # is latest-per-(conv_id,turn_idx) by (ts DESC, text DESC),
        # matching latest_per_key(strategy='agg') exactly
        "conv_structure": f"""
            WITH d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM read_parquet('{derived["transcripts_raw"]}')
              ) WHERE rn = 1
            ), f AS (
              SELECT conv_id, turn_idx, role, tool, text,
                lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                  AS prev_role
              FROM d
            ), g AS (
              SELECT conv_id,
                COUNT(*) AS n_turns,
                CAST(SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_role_repeats,
                CAST(SUM(CASE WHEN role = 'tool'
                          AND COALESCE(prev_role, '') <> 'user'
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_tools,
                CAST(SUM(CASE WHEN role = 'tool' AND tool IS NULL
                          THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_missing_tool_name,
                CAST(SUM(CASE WHEN role <> 'tool' AND tool IS NOT NULL
                          THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_stray_tool_name,
                CAST(SUM(CASE WHEN length(trim(COALESCE(text, ''))) = 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
                (min_by(role, turn_idx) NOT IN ('user', 'system'))
                  AS bad_start
              FROM f GROUP BY conv_id
            )
            SELECT *,
              (n_role_repeats = 0 AND n_orphan_tools = 0
               AND n_missing_tool_name = 0 AND n_stray_tool_name = 0
               AND n_empty = 0 AND NOT bad_start) AS structure_ok
            FROM g
        """,
        "conv_windows": f"""
            WITH d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM read_parquet('{derived["transcripts_raw"]}')
              ) WHERE rn = 1
            ), t AS (
              SELECT conv_id, turn_idx,
                CASE WHEN length(trim(COALESCE(text, ''))) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END AS n_tokens
              FROM d
            ), c AS (
              SELECT *, SUM(n_tokens) OVER (
                PARTITION BY conv_id ORDER BY turn_idx
                ROWS UNBOUNDED PRECEDING) AS cum
              FROM t
            )
            SELECT a.conv_id, a.turn_idx,
              CAST(a.n_tokens AS BIGINT) AS n_tokens,
              COUNT(b.turn_idx) AS ctx_turns,
              CAST(COALESCE(MIN(b.turn_idx), -1) AS INT) AS ctx_start,
              CAST(COALESCE(SUM(b.n_tokens), 0) AS BIGINT) AS ctx_tokens
            FROM c a LEFT JOIN c b
              ON a.conv_id = b.conv_id AND b.turn_idx <= a.turn_idx
             AND a.cum - b.cum + b.n_tokens <= 64
            GROUP BY a.conv_id, a.turn_idx, a.n_tokens
        """,
        "conv_render": f"""
            WITH d AS (
              SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY conv_id, turn_idx
                  ORDER BY ts DESC, text DESC) AS rn
                FROM read_parquet('{derived["transcripts_raw"]}')
              ) WHERE rn = 1
            ), o AS (
              SELECT conv_id, turn_idx, role,
                COALESCE(text, '') AS text,
                CAST(COALESCE(SUM(length(role) + 2
                                  + length(COALESCE(text, '')) + 1) OVER (
                  PARTITION BY conv_id ORDER BY turn_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS off
              FROM d
            )
            SELECT conv_id,
              string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
                AS text,
              COUNT(*) AS n_turns,
              CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                   AS BIGINT) AS assistant_spans,
              string_agg(CAST(off AS VARCHAR), ',' ORDER BY turn_idx)
                AS offsets,
              CAST(length(string_agg(role || ': ' || text, chr(10)
                                     ORDER BY turn_idx)) AS BIGINT)
                AS n_chars
            FROM o GROUP BY conv_id
        """,
        "gopher_repetition": _rp("gopher_repetition"),
        "lexical_stats": _rp("lexical_stats"),
        "bm25_topk": _rp("bm25_topk"),
        "pii_stats": _rp("pii_stats"),
        "conv_pack": _rp("conv_pack"),
        "conv_pii": _rp("conv_pii"),
        "conv_curate": _rp("conv_curation"),
        "exact_k_sample": """
            -- identical md5-hex ordering (both engines emit lowercase
            -- hex), key string as the digest tie-break
            SELECT doc_id, source, sample_rank FROM (
              SELECT doc_id, source, ROW_NUMBER() OVER (
                PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                         CAST(doc_id AS VARCHAR)) AS sample_rank
              FROM documents
            ) WHERE sample_rank <= 40
        """,
        "paragraph_dedup": """
            -- same synthesized paragraph structure as the Spark side
            -- (literal replace + appended shared footer), then the
            -- identical first-occurrence-wins window
            WITH src AS (
              SELECT doc_id,
                string_split(
                  replace(text, ' merge ', chr(10) || chr(10))
                    || chr(10) || chr(10)
                    || 'every page shares this exact boilerplate footer paragraph',
                  chr(10) || chr(10)) AS paras
              FROM documents
            ), e AS (
              SELECT doc_id, trim(paras[g.i]) AS para,
                     g.i - 1 AS para_idx
              FROM src,
                LATERAL (SELECT unnest(generate_series(1, len(paras))) AS i) g
            ), f AS (
              SELECT * FROM e WHERE length(para) >= 1
            ), t AS (
              SELECT doc_id, COUNT(*) AS n_paras_total FROM f GROUP BY doc_id
            ), k AS (
              SELECT * FROM (
                SELECT f.*, ROW_NUMBER() OVER (
                  PARTITION BY para ORDER BY doc_id, para_idx) AS rn
                FROM f
              ) WHERE rn = 1
            )
            SELECT k.doc_id,
              string_agg(para, chr(10) || chr(10) ORDER BY para_idx)
                AS dedup_text,
              COUNT(*) AS n_paras_kept,
              CAST(ANY_VALUE(t.n_paras_total) AS BIGINT) AS n_paras_total
            FROM k JOIN t USING (doc_id)
            GROUP BY k.doc_id
        """,
        "clean_lines": """
            -- same synthesized line breaks as the Spark side (literal
            -- left-to-right replace), then the identical C4 line
            -- predicate spelled in DuckDB list_filter lambdas
            WITH l AS (
              SELECT doc_id,
                list_filter(
                  list_transform(
                    string_split(replace(text, ' join ', '.' || chr(10)),
                                 chr(10)),
                    x -> trim(x)),
                  x -> length(x) > 0) AS all_lines
              FROM documents
            ), k AS (
              SELECT doc_id, all_lines,
                list_filter(all_lines,
                  x -> len(string_split_regex(x, '\\s+')) >= 3
                       AND right(x, 1) IN ('.', '!', '?')
                       AND NOT contains(lower(x), 'window')) AS kept
              FROM l
            )
            SELECT doc_id,
              CAST(len(all_lines) AS BIGINT) AS n_lines,
              CAST(len(kept) AS BIGINT) AS n_kept,
              CASE WHEN len(all_lines) > 0
                   THEN CAST(len(kept) AS DOUBLE)
                        / CAST(len(all_lines) AS DOUBLE)
                   ELSE CAST(0.0 AS DOUBLE) END AS kept_frac,
              -- DuckDB array_to_string([]) is NULL; Spark array_join is ''
              COALESCE(array_to_string(kept, chr(10)), '') AS text_clean,
              CAST(length(COALESCE(array_to_string(kept, chr(10)), ''))
                   AS BIGINT) AS n_chars_clean,
              len(kept) >= 2 AS doc_ok
            FROM k
        """,
        "text_normalize": """
            -- same injected decomposed-marks suffix as the Spark side;
            -- nfc_normalize == pandas Series.str.normalize('NFC'); the
            -- explicit ASCII whitespace class keeps RE2/Python parity
            WITH t AS (
              SELECT doc_id,
                trim(regexp_replace(
                  nfc_normalize(text || '  cafe' || chr(769) || ' '
                                || chr(9) || ' A' || chr(778) || 'x '),
                  '[ \t\r\n\f]+', ' ', 'g')) AS text_norm
              FROM documents
            )
            SELECT doc_id, text_norm,
                   CAST(length(text_norm) AS BIGINT) AS n_chars_norm
            FROM t
        """,
        "langid_classifier": _rp("langid_classifier"),
        "doc_curation_lm": _rp("doc_curation_lm"),
        "lm_perplexity": _rp("lm_perplexity"),
        "lm_buckets": f"""
            -- per-source exact terciles over the naive-LM relation;
            -- quantile_cont == Spark exact percentile (pinned round 1);
            -- double division literals so both sides cut at the same
            -- IEEE value; ties fall to the lower bucket (<=) both sides
            WITH s AS (
              SELECT l.doc_id, l.ppl, d.source
              FROM read_parquet('{derived["lm_perplexity"]}') l
              JOIN documents d USING (doc_id)
            ), c AS (
              SELECT source,
                     quantile_cont(ppl, CAST(1 AS DOUBLE)/CAST(3 AS DOUBLE)) AS c1,
                     quantile_cont(ppl, CAST(2 AS DOUBLE)/CAST(3 AS DOUBLE)) AS c2
              FROM s GROUP BY source
            )
            SELECT s.doc_id, s.source, s.ppl,
                   CASE WHEN s.ppl <= c.c1 THEN 'head'
                        WHEN s.ppl <= c.c2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM s JOIN c USING (source)
        """,
        "quality_classifier": _rp("quality_classifier"),
        "export_shards": _rp("export_shards"),
        "doc_curation_clf": _rp("doc_curation_clf"),
        "transcript_pipeline_loop": _rp("transcript_pipeline_loop"),
        "conv_neardup": _rp("conv_neardup"),
        "bpe_tokens": _rp("bpe_tokens"),
        "source_cap": """
            WITH ranked AS (
              SELECT doc_id, source,
                     ROW_NUMBER() OVER (
                         PARTITION BY source
                         ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                  CAST(doc_id AS VARCHAR)) AS rk
              FROM documents)
            SELECT doc_id, source FROM ranked WHERE rk <= 17
        """,
        "quality_calibrate": """
            WITH t AS (
              SELECT quantile_cont(n_chars, CAST(0.3 AS DOUBLE)) AS thr
              FROM documents)
            SELECT d.doc_id, d.n_chars, CAST(t.thr AS DOUBLE) AS thr
            FROM documents d, t
            WHERE d.n_chars >= t.thr
        """,
        "label_resolve_recency": """
            WITH spine AS (
              SELECT user_id, MAX(ts) AS ts FROM events GROUP BY 1
            ), c1 AS (
              SELECT user_id, event_type AS v, COUNT(*) AS cnt, MAX(ts) AS mts
              FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
            ), r1 AS (
              SELECT user_id, v, ROW_NUMBER() OVER (
                  PARTITION BY user_id
                  ORDER BY cnt DESC, mts DESC, v ASC) AS rn
              FROM c1
            ), c2 AS (
              SELECT user_id, value AS v, COUNT(*) AS cnt, MAX(ts) AS mts
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2
            ), r2 AS (
              SELECT user_id, v, ROW_NUMBER() OVER (
                  PARTITION BY user_id
                  ORDER BY cnt DESC, mts DESC, v ASC) AS rn
              FROM c2
            )
            SELECT s.ts, s.user_id, a.v AS event_type, b.v AS value
            FROM spine s
            LEFT JOIN r1 a ON a.user_id = s.user_id AND a.rn = 1
            LEFT JOIN r2 b ON b.user_id = s.user_id AND b.rn = 1
        """,
        "scalar_exprs": """
            SELECT 'row_id' AS kind, o_orderkey AS id,
                   sha256(concat_ws(chr(31),
                          CAST(o_custkey AS VARCHAR),
                          CAST(o_orderkey AS VARCHAR))) AS s,
                   TIMESTAMP '1970-01-01 00:00:00' AS t1,
                   TIMESTAMP '1970-01-01 00:00:00' AS t2,
                   CAST(-1 AS BIGINT) AS n
            FROM orders WHERE o_orderkey < 100
            UNION ALL
            SELECT 'interval', event_id, '',
                   ts + INTERVAL 1 HOUR, ts - INTERVAL 90 SECONDS,
                   CAST(FLOOR(value) AS BIGINT)
            FROM events WHERE event_id < 1000
            UNION ALL
            SELECT 'json', event_id, '',
                   TIMESTAMP '1970-01-01 00:00:00',
                   TIMESTAMP '1970-01-01 00:00:00',
                   CAST(json_extract(props, '$.k') AS BIGINT)
            FROM events WHERE event_id < 1000
        """,
        "rollup_cube": """
            SELECT 'rollup_orders' AS kind,
                   o_orderstatus AS g1, o_orderpriority AS g2,
                   COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
            UNION ALL
            SELECT 'cube_events', event_type,
                   CAST(user_id % 10 AS VARCHAR),
                   COUNT(*), ROUND(SUM(value), 2)
            FROM events
            GROUP BY CUBE (event_type, (user_id % 10))
        """,
        "pull_scan": """
            SELECT 'all' AS kind, user_id, '' AS last_type,
                   value, ts
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
              AND ts <= TIMESTAMP '2024-01-20 00:00:00'
            UNION ALL
            SELECT 'latest', user_id, event_type, value, ts
            FROM (
              SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "setops": """
            SELECT 'semi_anti' AS kind, c_custkey AS id, c_name AS s
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 300000)
            UNION ALL
            SELECT 'except', user_id, d FROM (
              SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS d
              FROM events WHERE event_type = 'click'
              EXCEPT
              SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS d
              FROM events WHERE event_type = 'error'
            )
        """,
        "doc_minhash_pairs": _rp("doc_minhash_pairs"),
        # genuine-SQL aggregation: only the per-pair candidate estimates
        # come from the numpy replay; DuckDB derives the histogram, the
        # integer jaccard units, and the top-down cumulative retention
        # column natively. num_hashes=32 = the operator default. SUM()
        # OVER on BIGINT is HUGEINT in DuckDB — cast back.
        "minhash_profile": f"""
            WITH h AS (
              SELECT est AS est_matches, COUNT(*) AS n_pairs
              FROM read_parquet('{derived["minhash_cand_est"]}')
              GROUP BY est
            )
            SELECT est_matches,
                   (est_matches * 1048576) // 32 AS est_jaccard_units,
                   n_pairs,
                   CAST(SUM(n_pairs) OVER (
                     ORDER BY est_matches DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS pairs_at_or_above
            FROM h
        """,
        "compressibility": _rp("compressibility"),
        # genuine-SQL verify stage: only the LSH candidate pairs come
        # from the replay; DuckDB re-derives the edit-similarity verdict
        # natively. ASCII projection interpolated through a VARIABLE
        # (see the PII-pattern gotcha above) so RE2 receives the \x
        # escapes, matching Spark's Java-regex arm byte-for-byte.
        "neardup_verify": f"""
            WITH t AS (
              SELECT doc_id,
                     regexp_replace(coalesce(text, ''), '{_ascii_pat}',
                                    '', 'g') AS vt
              FROM documents
            ), j AS (
              SELECT p.id_a, p.id_b,
                     CAST(greatest(length(a.vt), length(b.vt)) AS BIGINT)
                       AS ml,
                     CAST(levenshtein(a.vt, b.vt) AS BIGINT) AS lev
              FROM read_parquet('{derived["doc_minhash_pairs"]}') p
              JOIN t a ON a.doc_id = p.id_a
              JOIN t b ON b.doc_id = p.id_b
            )
            SELECT id_a, id_b,
                   CASE WHEN ml = 0 THEN CAST(1048576 AS BIGINT)
                        ELSE ((ml - lev) * 1048576) // ml END AS sim_units,
                   (CASE WHEN ml = 0 THEN CAST(1048576 AS BIGINT)
                         ELSE ((ml - lev) * 1048576) // ml END)
                     >= 524288 AS is_dup
            FROM j
        """,
        "doc_simhash_pairs": _rp("doc_simhash_pairs"),
        "doc_winnow_pairs": _rp("doc_winnow_pairs"),
        "doc_quality_scores": _rp("doc_quality_scores"),
        "ann_lsh_topk": _rp("ann_lsh_topk"),
        "ann_ivf_topk": _rp("ann_ivf_topk"),
        "dup_clusters": _rp("dup_clusters"),
        "embedding_neardup_lsh": _rp("embedding_neardup_lsh"),
        "transcript_pipeline": _rp("transcript_pipeline"),
        "semantic_dedup": _rp("semantic_dedup"),
        "diverse_sample": _rp("diverse_sample"),
        "tokenize_pack": _rp("tokenize_pack"),
        "doc_curation": _rp("doc_curation"),
        "doc_jaccard_prefix": """
            WITH docs AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
              FROM documents
            ), grams AS (
              SELECT DISTINCT doc_id,
                     w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS gram
              FROM docs, UNNEST(range(1, len(w) - 1)) AS t(i)
              WHERE len(w) >= 3
            ), sizes AS (
              SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY 1
            ), co AS (
              SELECT g1.doc_id AS id_a, g2.doc_id AS id_b, COUNT(*) AS inter
              FROM grams g1 JOIN grams g2
                ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id
              GROUP BY 1, 2
            )
            SELECT co.id_a, co.id_b,
                   ROUND(inter * 1.0 / (sa.n_grams + sb.n_grams - inter), 6) AS jaccard_r
            FROM co
            JOIN sizes sa ON co.id_a = sa.doc_id
            JOIN sizes sb ON co.id_b = sb.doc_id
            WHERE inter * 1.0 / (sa.n_grams + sb.n_grams - inter) >= 0.4
        """,
        "doc_chunks": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents
            )
            SELECT doc_id, CAST(g.i AS INT) AS chunk_idx,
                   array_to_string(w[(g.i*50+1):(g.i*50+60)], ' ') AS chunk_text,
                   CAST(len(string_split(
                       array_to_string(w[(g.i*50+1):(g.i*50+60)], ' '), ' '))
                       AS INT) AS n_words
            FROM toks, LATERAL (
              SELECT unnest(generate_series(
                  0, CAST(ceil(len(w)/50.0) AS BIGINT) - 1)) AS i) g
        """,
        "doc_packing": """
            WITH sized AS (
              SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS INT) AS n_words
              FROM documents
            ), c AS (
              SELECT doc_id, n_words,
                     COALESCE(SUM(n_words) OVER (
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS start
              FROM sized
            )
            SELECT doc_id, n_words,
                   CAST(FLOOR(start / 1000.0) AS BIGINT) AS pack_id,
                   CAST(start % 1000 AS BIGINT) AS pack_offset
            FROM c
        """,
        "span_dedup": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ), spans AS (
              SELECT doc_id, g.i AS span_idx,
                     CAST(ceil(len(w) / 10.0) AS BIGINT) AS n_spans_total,
                     array_to_string(w[(g.i*10+1):(g.i*10+10)], ' ') AS span
              FROM toks, LATERAL (
                SELECT unnest(generate_series(
                    0, CAST(ceil(len(w)/10.0) AS BIGINT) - 1)) AS i) g
            ), ranked AS (
              SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY span ORDER BY doc_id, span_idx) AS rn
              FROM spans
            )
            SELECT doc_id,
                   string_agg(span, ' ' ORDER BY span_idx) AS dedup_text,
                   COUNT(*) AS n_spans_kept,
                   MIN(n_spans_total) AS n_spans_total
            FROM ranked WHERE rn = 1 GROUP BY doc_id
        """,
        "substring_dedup": """
            -- ExactSubstr: stride-1 8-grams; non-first instances cut
            -- [pos, pos+8) in their doc; tokens outside every cut
            -- interval survive. DuckDB slices are 1-based inclusive.
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ), grams AS (
              SELECT doc_id, g.i AS pos,
                     array_to_string(w[(g.i+1):(g.i+8)], ' ') AS gram
              FROM toks, LATERAL (
                SELECT unnest(generate_series(0, len(w)-8)) AS i) g
              WHERE len(w) >= 8
            ), ranked AS (
              SELECT doc_id, pos, ROW_NUMBER() OVER (
                  PARTITION BY gram ORDER BY doc_id, pos) AS rn
              FROM grams
            ), cut AS (
              SELECT doc_id, pos FROM ranked WHERE rn > 1
            ), tokpos AS (
              SELECT doc_id, t.i - 1 AS t, w[t.i] AS tok,
                     len(w) AS n_tokens
              FROM toks, LATERAL (
                SELECT unnest(generate_series(1, len(w))) AS i) t
            ), kept AS (
              SELECT tp.doc_id, tp.t, tp.tok, tp.n_tokens
              FROM tokpos tp
              WHERE NOT EXISTS (
                SELECT 1 FROM cut c
                WHERE c.doc_id = tp.doc_id
                  AND c.pos <= tp.t AND tp.t < c.pos + 8)
            )
            SELECT doc_id,
                   string_agg(tok, ' ' ORDER BY t) AS dedup_text,
                   CAST(MIN(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_kept
            FROM kept GROUP BY doc_id
        """,
        "contamination_check": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ), bw AS (
              SELECT string_split(array_to_string(w[1:12], ' '), ' ') AS w
              FROM toks WHERE doc_id % 41 = 0
            ), bgrams AS (
              SELECT DISTINCT array_to_string(w[g.i:g.i+7], ' ') AS gram
              FROM bw, LATERAL (
                SELECT unnest(generate_series(1, len(w)-7)) AS i) g
            ), dgrams AS (
              SELECT DISTINCT doc_id, array_to_string(w[g.i:g.i+7], ' ') AS gram
              FROM toks, LATERAL (
                SELECT unnest(generate_series(1, len(w)-7)) AS i) g
            ), hits AS (
              SELECT doc_id, COUNT(*) AS n_hit_grams
              FROM dgrams JOIN bgrams USING (gram) GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(h.n_hit_grams, 0) AS n_hit_grams,
                   COALESCE(h.n_hit_grams, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        """,
        "dsir_weights": """
            WITH toks AS (
              SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
            ), grams AS (
              SELECT doc_id, source IN ('src1','src2','src3') AS tgt,
                     substr(md5(array_to_string(w[g.i:g.i+1], ' ')), 1, 3) AS bucket
              FROM toks, LATERAL (
                SELECT unnest(generate_series(1, len(w)-1)) AS i) g
            ), bucket_counts AS (
              SELECT bucket, COUNT(*) AS raw_cnt,
                     CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS tgt_cnt
              FROM grams GROUP BY bucket
            ), tot AS (
              SELECT CAST(SUM(raw_cnt) AS BIGINT) AS raw_total,
                     CAST(SUM(tgt_cnt) AS BIGINT) AS tgt_total
              FROM bucket_counts
            ), scores AS (
              SELECT bucket,
                     CAST(FLOOR(1000000.0 * LN(
                         ((CAST(tgt_cnt AS DOUBLE) + 0.5) / (CAST(tgt_total AS DOUBLE) + 2048.0))
                         / ((CAST(raw_cnt AS DOUBLE) + 0.5) / (CAST(raw_total AS DOUBLE) + 2048.0))
                     )) AS BIGINT) AS bscore
              FROM bucket_counts, tot
            ), doc_scores AS (
              SELECT doc_id, COUNT(*) AS n_bigrams,
                     CAST(SUM(bscore) AS BIGINT) AS dsir_score
              FROM grams JOIN scores USING (bucket) GROUP BY doc_id
            )
            SELECT d.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams,
                   COALESCE(s.dsir_score, 0) AS dsir_score
            FROM documents d LEFT JOIN doc_scores s ON d.doc_id = s.doc_id
        """,
        "stratified_sample": """
            SELECT doc_id, source,
                   substr(md5(concat(CAST(doc_id AS VARCHAR), ':', source)), 1, 4)
                       AS sample_bucket
            FROM documents
            WHERE substr(md5(concat(CAST(doc_id AS VARCHAR), ':', source)), 1, 4) <
                  CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                       THEN 'b333' ELSE '4ccc' END
        """,
        "top_ngrams": """
            WITH toks AS (
              SELECT string_split(text, ' ') AS w FROM documents
            ), grams AS (
              SELECT array_to_string(w[g.i:g.i+4], ' ') AS gram
              FROM toks, LATERAL (
                SELECT unnest(generate_series(1, len(w)-4)) AS i) g
            ), counted AS (
              SELECT gram, COUNT(*) AS cnt FROM grams GROUP BY gram
            )
            SELECT gram, cnt,
                   CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, gram) AS INT) AS "rank"
            FROM counted ORDER BY cnt DESC, gram LIMIT 20
        """,
        "derived_view_historical": """
            WITH entity AS (
              SELECT user_id, ts AS event_timestamp FROM events
              WHERE event_type = 'purchase'
            ), feat AS (
              SELECT user_id,
                     date_trunc('hour', ts) + INTERVAL 1 HOUR AS fts,
                     ROUND(SUM(value), 2) AS hour_click_value,
                     COUNT(*) AS hour_click_cnt
              FROM events WHERE event_type = 'click'
              GROUP BY 1, 2
            ), latest AS (
              SELECT e.user_id, e.event_timestamp,
                     f.hour_click_value, f.hour_click_cnt,
                     ROW_NUMBER() OVER (
                         PARTITION BY e.user_id, e.event_timestamp
                         ORDER BY f.fts DESC) AS rn
              FROM entity e JOIN feat f
                ON e.user_id = f.user_id AND f.fts <= e.event_timestamp
            )
            SELECT e.user_id, e.event_timestamp,
                   l.hour_click_value, l.hour_click_cnt
            FROM entity e LEFT JOIN latest l
              ON e.user_id = l.user_id
             AND e.event_timestamp = l.event_timestamp AND l.rn = 1
        """,
        "odfv_request_scale": """
            WITH entity AS (
              SELECT user_id, ts AS event_timestamp,
                     CAST(event_id % 5 AS DOUBLE) AS scale
              FROM events WHERE event_type = 'purchase'
            ), feat AS (
              SELECT user_id, ts AS fts, value AS click_value FROM events
              WHERE event_type = 'click'
            ), latest AS (
              SELECT e.user_id, e.event_timestamp, f.click_value,
                     ROW_NUMBER() OVER (
                         PARTITION BY e.user_id, e.event_timestamp
                         ORDER BY f.fts DESC) AS rn
              FROM entity e JOIN feat f
                ON e.user_id = f.user_id AND f.fts <= e.event_timestamp
            )
            SELECT e.user_id, e.event_timestamp, e.scale,
                   l.click_value,
                   l.click_value * e.scale AS scaled_click
            FROM entity e LEFT JOIN latest l
              ON e.user_id = l.user_id
             AND e.event_timestamp = l.event_timestamp AND l.rn = 1
        """,
        "dqm_profile": """
            SELECT 'value' AS "column",
                   ROUND(AVG(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END), 6)
                       AS null_fraction,
                   ROUND(MIN(value), 4) AS min_val,
                   ROUND(MAX(value), 4) AS max_val
            FROM events
            UNION ALL
            SELECT 'user_id',
                   ROUND(AVG(CASE WHEN user_id IS NULL THEN 1.0 ELSE 0.0 END), 6),
                   ROUND(CAST(MIN(user_id) AS DOUBLE), 4),
                   ROUND(CAST(MAX(user_id) AS DOUBLE), 4)
            FROM events
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                       AS fingerprint
            FROM documents
        """,
        "image_metadata": """
            -- closed form: the fake payloads are deterministic in doc_id
            -- (encode_fake_image(64 + id%128, 48 + id%64, id): 16-byte
            -- header + min(w*h, 4096)-byte payload)
            SELECT doc_id AS id,
                   CAST(64 + doc_id % 128 AS INT) AS width,
                   CAST(48 + doc_id % 64 AS INT) AS height,
                   CAST(16 + LEAST((64 + doc_id % 128) * (48 + doc_id % 64),
                                   4096) AS BIGINT) AS n_bytes,
                   'fsim' AS format,
                   TRUE AS valid
            FROM documents WHERE doc_id < 200
        """,
        "pull_all_window": """
            SELECT user_id, value, ts FROM events
            WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
              AND ts <= TIMESTAMP '2024-01-20 00:00:00'
        """,
        "pull_latest_events": """
            SELECT user_id,
                   event_type AS last_type,
                   value AS last_value,
                   ts AS last_ts
            FROM (
              SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "field_mapping_scan": """
            SELECT event_id, ts AS event_timestamp, value AS amount
            FROM events WHERE value > 150
        """,
        "pit_last_click": """
            WITH entity AS (
              SELECT user_id, ts FROM events WHERE event_type = 'purchase'
            ), feat AS (
              SELECT user_id, ts AS fts, value FROM events WHERE event_type = 'click'
            ), base AS (
              SELECT e.user_id, e.ts, f.fts, f.value
              FROM entity e JOIN feat f
                ON e.user_id = f.user_id AND f.fts <= e.ts
            ), latest AS (
              SELECT user_id, ts, value, ROW_NUMBER() OVER (
                  PARTITION BY user_id, ts ORDER BY fts DESC) AS rn
              FROM base
            )
            SELECT e.user_id, e.ts, l.value AS last_click_value
            FROM entity e LEFT JOIN latest l
              ON e.user_id = l.user_id AND e.ts = l.ts AND l.rn = 1
        """,
        "odfv_post_agg": """
            WITH entity AS (
              SELECT user_id, ts FROM events WHERE event_type = 'purchase'
            ), feat AS (
              SELECT user_id, ts AS fts, value FROM events WHERE event_type = 'click'
            ), base AS (
              SELECT e.user_id, e.ts, f.fts, f.value
              FROM entity e JOIN feat f
                ON e.user_id = f.user_id AND f.fts <= e.ts
            ), latest AS (
              SELECT user_id, ts, value, ROW_NUMBER() OVER (
                  PARTITION BY user_id, ts ORDER BY fts DESC) AS rn
              FROM base
            ), resp AS (
              SELECT e.user_id, e.ts, l.value AS last_click_value
              FROM entity e LEFT JOIN latest l
                ON e.user_id = l.user_id AND e.ts = l.ts AND l.rn = 1
            )
            SELECT user_id,
                   ROUND(AVG(last_click_value), 6) AS avg_last_click,
                   COUNT(last_click_value) AS n_last_click,
                   MAX(last_click_value) AS max_last_click
            FROM resp GROUP BY 1
        """,
        "label_majority_vote": """
            WITH c AS (
              SELECT user_id, event_type, COUNT(*) AS cnt
              FROM events GROUP BY 1, 2
            ), r AS (
              SELECT user_id, event_type, cnt,
                     ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY cnt DESC, event_type ASC
                     ) AS rn,
                     SUM(cnt) OVER (PARTITION BY user_id) AS n_votes
              FROM c
            )
            SELECT user_id, event_type, CAST(n_votes AS BIGINT) AS n_votes
            FROM r WHERE rn = 1
        """,
        "pit_ttl_1h": """
            WITH entity AS (
              SELECT user_id, ts FROM events WHERE event_type = 'purchase'
            ), feat AS (
              SELECT user_id, ts AS fts, value FROM events WHERE event_type = 'click'
            ), base AS (
              SELECT e.user_id, e.ts, f.fts, f.value
              FROM entity e JOIN feat f
                ON e.user_id = f.user_id
               AND f.fts <= e.ts
               AND f.fts >= e.ts - INTERVAL 3600 SECONDS
            ), latest AS (
              SELECT user_id, ts, value, ROW_NUMBER() OVER (
                  PARTITION BY user_id, ts ORDER BY fts DESC) AS rn
              FROM base
            )
            SELECT e.user_id, e.ts, l.value AS last_click_value
            FROM entity e LEFT JOIN latest l
              ON e.user_id = l.user_id AND e.ts = l.ts AND l.rn = 1
        """,
        "pit_entityless": """
            WITH entity AS (
              SELECT user_id, ts FROM events WHERE event_type = 'purchase'
            ), feat AS (
              SELECT ts AS fts, value, event_id FROM events
              WHERE event_type = 'click'
            ), latest AS (
              -- one global as-of pick per distinct entity ts
              SELECT e.ts, f.value, ROW_NUMBER() OVER (
                  PARTITION BY e.ts
                  ORDER BY f.fts DESC, f.event_id DESC) AS rn
              FROM (SELECT DISTINCT ts FROM entity) e
              JOIN feat f ON f.fts <= e.ts
            )
            SELECT e.user_id, e.ts, l.value AS global_last_click
            FROM entity e LEFT JOIN latest l ON e.ts = l.ts AND l.rn = 1
        """,
        "two_role_join": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   ROUND(SUM(l.l_extendedprice), 2) AS volume,
                   COUNT(*) AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            GROUP BY 1, 2
        """,
        "entity_union": """
            SELECT CAST(user_id AS VARCHAR) AS entity_key FROM events
            WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <= TIMESTAMP '2024-01-15 00:00:00'
            UNION
            SELECT CAST(o_custkey AS VARCHAR) AS entity_key FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <= TIMESTAMP '1996-12-31 00:00:00'
        """,
        "cross_join_share": """
            SELECT event_type, cnt, ROUND(cnt * 1.0 / total, 6) AS share
            FROM (SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1)
            CROSS JOIN (SELECT COUNT(*) AS total FROM events)
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 6) AS avg_qty,
                   ROUND(AVG(l_extendedprice), 6) AS avg_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "agg_spec": """
            SELECT event_type,
                   ROUND(SUM(value), 2) AS sum_value,
                   MAX(value) AS max_value,
                   MIN(value) AS min_value,
                   COUNT(value) AS count_value,
                   ROUND(AVG(value), 6) AS avg_value,
                   COUNT(DISTINCT user_id) AS count_distinct_user_id
            FROM events GROUP BY event_type
        """,
        "hourly_window_agg": """
            SELECT event_type,
                   date_trunc('hour', ts) AS window_start,
                   ROUND(SUM(value), 2) AS hour_sum,
                   COUNT(value) AS hour_cnt
            FROM events GROUP BY 1, 2
        """,
        "sliding_window_agg": """
            SELECT date_trunc('hour', ts) - (h * INTERVAL 1 HOUR) AS window_start,
                   COUNT(*) AS n_events
            FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS h)
            GROUP BY 1
        """,
        # the STREAMED hourly agg must hash-match the plain batch SQL —
        # that equality is the streaming-vs-batch parity proof
        "stream_window_parity": """
            SELECT event_type,
                   date_trunc('hour', ts) AS window_start,
                   ROUND(SUM(value), 2) AS hour_sum,
                   COUNT(value) AS hour_cnt
            FROM events GROUP BY 1, 2
        """,
        "numeric_stats": """
            SELECT COUNT(value) AS cnt,
                   ROUND(AVG(value), 4) AS avg_val,
                   ROUND(STDDEV_SAMP(value), 4) AS stddev_val,
                   ROUND(MIN(value), 4) AS min_val,
                   ROUND(MAX(value), 4) AS max_val,
                   ROUND(QUANTILE_CONT(value, 0.5), 4) AS p50,
                   ROUND(QUANTILE_CONT(value, 0.9), 4) AS p90,
                   ROUND(QUANTILE_CONT(value, 0.95), 4) AS p95,
                   ROUND(QUANTILE_CONT(value, 0.99), 4) AS p99
            FROM events
        """,
        "histogram": """
            WITH mm AS (SELECT MIN(value) AS lo,
                               (MAX(value) - MIN(value)) / 10 AS w
                        FROM events)
            SELECT LEAST(GREATEST(CAST(FLOOR((value - lo) / w) + 1 AS INT), 1), 10) AS bucket,
                   COUNT(*) AS cnt
            FROM events, mm
            WHERE value IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        "top_event_types": """
            SELECT event_type, COUNT(*) AS cnt FROM events
            GROUP BY 1 ORDER BY cnt DESC, event_type LIMIT 3
        """,
        "latest_dedup": """
            SELECT DISTINCT user_id, event_type FROM events
        """,
        "row_id_synthesis": """
            SELECT o_orderkey,
                   sha256(concat_ws(chr(31),
                          CAST(o_custkey AS VARCHAR),
                          CAST(o_orderkey AS VARCHAR))) AS entity_row_id
            FROM orders WHERE o_orderkey < 100
        """,
        "interval_arithmetic": """
            SELECT event_id,
                   ts + INTERVAL 1 HOUR AS ts_plus_1h,
                   ts - INTERVAL 90 SECONDS AS ts_minus_90s,
                   CAST(FLOOR(value) AS BIGINT) AS value_floor
            FROM events WHERE event_id < 1000
        """,
        "json_extract": """
            SELECT event_id,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
            FROM events WHERE event_id < 1000
        """,
        "doc_token_stats": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split(
                               regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '))
                        END AS token_cnt,
                   length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digit_cnt,
                   length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS symbol_cnt,
                   length(text) AS char_cnt
            FROM documents
        """,
        "doc_bpe_tokens": """
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s'']+'))
                       AS bpe_tokens,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split(
                               regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '))
                        END AS ws_tokens
            FROM documents
        """,
        "doc_exact_dedup": """
            SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
            FROM documents
            GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
        """,
        "doc_bigram_jaccard": """
            WITH docs AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
              FROM documents
            ), grams AS (
              SELECT DISTINCT doc_id, w[i] || ' ' || w[i + 1] AS gram
              FROM docs, UNNEST(range(1, len(w))) AS t(i)
            ), sizes AS (
              SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY 1
            ), co AS (
              SELECT g1.doc_id AS id_a, g2.doc_id AS id_b, COUNT(*) AS inter
              FROM grams g1 JOIN grams g2
                ON g1.gram = g2.gram AND g1.doc_id < g2.doc_id
              GROUP BY 1, 2
            )
            SELECT co.id_a, co.id_b,
                   ROUND(inter * 1.0 / (sa.n_grams + sb.n_grams - inter), 6) AS jaccard_r
            FROM co
            JOIN sizes sa ON co.id_a = sa.doc_id
            JOIN sizes sb ON co.id_b = sb.doc_id
            WHERE inter * 1.0 / (sa.n_grams + sb.n_grams - inter) >= 0.05
        """,
        "ann_cosine_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10
            ), sims AS (
              SELECT q.query_id, c.vec_id AS neighbor_id,
                     list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[])) AS cosine
              FROM embeddings c, q WHERE c.vec_id <> q.query_id
            ), ranked AS (
              SELECT query_id, neighbor_id, cosine,
                     ROW_NUMBER() OVER (
                         PARTITION BY query_id
                         ORDER BY cosine DESC, neighbor_id) AS rank
              FROM sims
            )
            SELECT query_id, neighbor_id, rank, ROUND(cosine, 4) AS cosine_r
            FROM ranked WHERE rank <= 5
        """,
        "session_window_agg": """
            WITH ordered AS (
              SELECT user_id, ts, value,
                     CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               > INTERVAL 30 MINUTES
                          OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                          THEN 1 ELSE 0 END AS new_session
              FROM events
            ), sessions AS (
              SELECT user_id, ts, value,
                     SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS session_id
              FROM ordered
            )
            SELECT user_id, MIN(ts) AS session_start,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS session_value
            FROM sessions GROUP BY user_id, session_id
        """,
        "pivot_event_types": """
            SELECT user_id,
                   COUNT(*) FILTER (event_type = 'click') AS n_click,
                   COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
                   COUNT(*) FILTER (event_type = 'error') AS n_error
            FROM events GROUP BY user_id
        """,
        "semi_anti_join": """
            SELECT c_custkey, c_name FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 300000)
        """,
        "intersect_except": """
            SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS d
            FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS d
            FROM events WHERE event_type = 'error'
        """,
        "rollup_orders": """
            SELECT o_orderstatus, o_orderpriority,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS total
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "cube_events": """
            SELECT event_type, user_id % 10 AS user_bucket,
                   COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
            FROM events
            GROUP BY CUBE (event_type, (user_id % 10))
        """,
        "pit_created_cutoff": """
            WITH entity AS (
              SELECT user_id, ts FROM events WHERE event_type = 'purchase'
            ), feat AS (
              SELECT user_id, ts AS fts, value,
                     ts + (event_id % 3) * INTERVAL 1 HOUR AS created
              FROM events WHERE event_type = 'click'
            ), base AS (
              SELECT e.user_id, e.ts, f.fts, f.created, f.value
              FROM entity e JOIN feat f
                ON e.user_id = f.user_id AND f.fts <= e.ts
            ), latest AS (
              -- cutoff-before-dedup: qualified rows (created <= entity ts)
              -- outrank every too-new row (dask.py:1203-1270)
              SELECT user_id, ts, value, created, ROW_NUMBER() OVER (
                  PARTITION BY user_id, ts
                  ORDER BY (created <= ts) DESC, fts DESC, created DESC) AS rn
              FROM base
            )
            SELECT e.user_id, e.ts,
                   CASE WHEN l.created <= e.ts THEN l.value END AS last_click_value
            FROM entity e LEFT JOIN latest l
              ON e.user_id = l.user_id AND e.ts = l.ts AND l.rn = 1
        """,
        "embedding_neardup": """
            WITH emb AS (
              SELECT vec_id AS id, embedding AS v FROM embeddings WHERE vec_id < 200
            ), sims AS (
              SELECT a.id AS id_a, b.id AS id_b,
                     list_cosine_similarity(CAST(a.v AS DOUBLE[]),
                                            CAST(b.v AS DOUBLE[])) AS cosine
              FROM emb a JOIN emb b ON a.id < b.id
            )
            SELECT id_a, id_b, ROUND(cosine, 4) AS cosine_r
            FROM sims WHERE cosine > 0.35
        """,
        "historical_two_views": """
            WITH entity AS (
              SELECT user_id, ts AS event_timestamp FROM events
              WHERE event_type = 'purchase'
            ), c AS (
              SELECT user_id, ts, value AS click_value FROM events
              WHERE event_type = 'click'
            ), v AS (
              SELECT user_id, ts, value AS view_value FROM events
              WHERE event_type = 'view'
            ), lc AS (
              SELECT e.user_id, e.event_timestamp, f.click_value,
                     ROW_NUMBER() OVER (PARTITION BY e.user_id, e.event_timestamp
                                        ORDER BY f.ts DESC) AS rn
              FROM entity e JOIN c f
                ON e.user_id = f.user_id AND f.ts <= e.event_timestamp
            ), lv AS (
              SELECT e.user_id, e.event_timestamp, f.view_value,
                     ROW_NUMBER() OVER (PARTITION BY e.user_id, e.event_timestamp
                                        ORDER BY f.ts DESC) AS rn
              FROM entity e JOIN v f
                ON e.user_id = f.user_id AND f.ts <= e.event_timestamp
            )
            SELECT e.user_id, e.event_timestamp, lc.click_value, lv.view_value
            FROM entity e
            LEFT JOIN lc ON e.user_id = lc.user_id
                        AND e.event_timestamp = lc.event_timestamp AND lc.rn = 1
            LEFT JOIN lv ON e.user_id = lv.user_id
                        AND e.event_timestamp = lv.event_timestamp AND lv.rn = 1
        """,
    }
