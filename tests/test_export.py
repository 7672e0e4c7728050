"""Training-shard export (pipeline/export.py): determinism, balance,
exactness of the manifest against the published files, atomic publish."""

from __future__ import annotations

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from feast_spark.pipeline.export import (
    assign_shards,
    export_training_shards,
    shard_manifest,
)

SF = "/root/testdata/sf0.001"
N_SHARDS = 8


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_assign_shards_is_key_stable_and_map_only(spark):
    docs = _docs(spark)
    a = assign_shards(docs, F.col("doc_id").cast("string"), N_SHARDS, salt="s1")
    b = assign_shards(
        docs.repartition(7), F.col("doc_id").cast("string"), N_SHARDS, salt="s1"
    )
    pa = {r["doc_id"]: r["shard_id"] for r in a.select("doc_id", "shard_id").collect()}
    pb = {r["doc_id"]: r["shard_id"] for r in b.select("doc_id", "shard_id").collect()}
    assert pa == pb  # partitioning-independent
    # map-only: no Exchange in the plan
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # matches the reference md5 definition exactly
    some = list(pa.items())[:50]
    for doc_id, shard in some:
        h = int(hashlib.md5(f"s1{doc_id}".encode()).hexdigest()[:8], 16)
        assert shard == h % N_SHARDS


def test_salt_redeals_shards(spark):
    docs = _docs(spark)
    key = F.col("doc_id").cast("string")
    a = assign_shards(docs, key, N_SHARDS, salt="epoch0")
    b = assign_shards(docs, key, N_SHARDS, salt="epoch1")
    moved = (
        a.select("doc_id", F.col("shard_id").alias("sa"))
        .join(b.select("doc_id", F.col("shard_id").alias("sb")), "doc_id")
        .filter("sa != sb")
        .count()
    )
    assert moved > 0


def test_shards_are_balanced(spark):
    docs = _docs(spark)
    n = docs.count()
    counts = [
        r["n"]
        for r in assign_shards(docs, F.col("doc_id").cast("string"), N_SHARDS)
        .groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    ]
    assert len(counts) == N_SHARDS
    mean = n / N_SHARDS
    assert max(counts) < 2 * mean and min(counts) > mean / 2


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export") / "corpus")
    res = export_training_shards(
        spark,
        _docs(spark),
        F.col("doc_id").cast("string"),
        out,
        N_SHARDS,
        salt="e0",
        max_records_per_file=200,
    )
    return res


def test_export_roundtrip_is_exact(spark, exported):
    docs = _docs(spark)
    back = spark.read.parquet(f"{exported.path}/shards")
    assert back.count() == docs.count()
    assert back.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0
    assert docs.select("doc_id").exceptAll(back.select("doc_id")).count() == 0
    # every shard directory exists
    dirs = sorted(glob.glob(f"{exported.path}/shards/shard_id=*"))
    assert len(dirs) == N_SHARDS


def test_manifest_matches_published_files(spark, exported):
    back = spark.read.parquet(f"{exported.path}/shards")
    fresh = shard_manifest(
        back, F.col("doc_id").cast("string"), salt="e0"
    ).toPandas()
    stored = exported.manifest.toPandas().sort_values("shard_id").reset_index(drop=True)
    fresh = fresh.sort_values("shard_id").reset_index(drop=True)
    assert stored.equals(fresh)
    assert int(stored["n_docs"].sum()) == _docs(spark).count()
    # token totals match a direct corpus count
    n_tok = _docs(spark).select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).first()["t"]
    assert int(stored["n_tokens"].sum()) == n_tok


def test_export_is_deterministic(spark, tmp_path):
    out2 = str(tmp_path / "corpus2")
    res2 = export_training_shards(
        spark, _docs(spark), F.col("doc_id").cast("string"), out2, N_SHARDS,
        salt="e0", max_records_per_file=200,
    )
    m2 = res2.manifest.toPandas().sort_values("shard_id").reset_index(drop=True)
    # same salt + corpus => identical manifests across independent exports
    # (compare against the md5 reference recomputed here, not the fixture,
    # so this test stands alone)
    import hashlib as hl
    import pandas as pd

    docs = _docs(spark).select("doc_id", "text").toPandas()
    docs["shard_id"] = docs["doc_id"].map(
        lambda d: int(hl.md5(f"e0{d}".encode()).hexdigest()[:8], 16) % N_SHARDS
    )
    docs["h"] = docs["doc_id"].map(
        lambda d: int(hl.md5(f"e0{d}".encode()).hexdigest()[:8], 16)
    )
    docs["n_tok"] = docs["text"].map(lambda t: len(t.split(" ")))
    import numpy as np

    exp = (
        docs.groupby("shard_id")
        .agg(
            n_docs=("doc_id", "size"),
            n_tokens=("n_tok", "sum"),
            fingerprint=("h", lambda s: int(np.bitwise_xor.reduce(
                s.to_numpy(dtype=np.int64)))),
        )
        .reset_index()
        .sort_values("shard_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        m2.astype({"n_docs": "int64", "n_tokens": "int64",
                   "fingerprint": "int64", "shard_id": "int64"}),
        exp.astype({"n_docs": "int64", "n_tokens": "int64",
                    "fingerprint": "int64", "shard_id": "int64"}),
    )


def test_within_shard_order_is_deterministic(spark, exported, tmp_path):
    out2 = str(tmp_path / "corpus3")
    export_training_shards(
        spark, _docs(spark).repartition(13),  # different input layout
        F.col("doc_id").cast("string"), out2, N_SHARDS, salt="e0",
        max_records_per_file=200,
    )
    for shard in (0, N_SHARDS - 1):
        a = spark.read.parquet(
            f"{exported.path}/shards/shard_id={shard}"
        ).select("doc_id").toPandas()["doc_id"].tolist()
        b = spark.read.parquet(
            f"{out2}/shards/shard_id={shard}"
        ).select("doc_id").toPandas()["doc_id"].tolist()
        assert a == b and len(a) > 0


def test_empty_export_publishes_empty_manifest(spark, tmp_path):
    out = str(tmp_path / "empty")
    res = export_training_shards(
        spark, _docs(spark).filter("doc_id < 0"),
        F.col("doc_id").cast("string"), out, 4,
    )
    assert res.manifest.count() == 0
    assert os.path.exists(f"{out}/manifest")


def test_export_plan_has_single_exchange(spark):
    """The sharded-write plan shuffles exactly once (the explicit
    repartition on shard_id); assignment and ordering add no further
    exchanges — at 100 TB the write is one shuffle wide, period."""
    from feast_spark.pipeline.export import assign_shards

    docs = _docs(spark)
    key = F.col("doc_id").cast("string")
    sharded = assign_shards(docs, key, N_SHARDS, salt="e0")
    plan = (
        sharded.repartition(N_SHARDS, "shard_id")
        .sortWithinPartitions("shard_id", key)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    # and the sort is partition-local, not global (Sort [...], false, 0)
    import re

    assert re.search(r"Sort \[[^\]]*\], false, 0", plan)


def test_curation_to_shards_end_to_end(spark, tmp_path):
    """The full training-data story: raw corpus -> staged curation ->
    reproducible shard export whose manifest accounts for exactly the
    kept documents."""
    from feast_spark.pipeline.curation import run_curation

    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("bench_text")
    )
    res = run_curation(spark, docs, bench)
    try:
        out = str(tmp_path / "curated")
        exp = export_training_shards(
            spark,
            res.kept.withColumnRenamed("dedup_text", "text"),
            F.col("doc_id").cast("string"),
            out,
            n_shards=4,
            salt="e0",
        )
        n_kept = res.kept.count()
        m = exp.manifest.toPandas()
        assert int(m["n_docs"].sum()) == n_kept > 0
        back = spark.read.parquet(f"{out}/shards")
        assert back.count() == n_kept
        assert back.select("doc_id").exceptAll(
            res.kept.select("doc_id")).count() == 0
    finally:
        res.release()


def test_publish_is_atomic_and_guarded(spark, exported, tmp_path):
    # existing dir without overwrite -> refuse
    with pytest.raises(FileExistsError):
        export_training_shards(
            spark, _docs(spark), F.col("doc_id").cast("string"),
            exported.path, N_SHARDS,
        )
    # no staging debris next to the published dir
    parent = os.path.dirname(exported.path)
    assert not [p for p in os.listdir(parent) if ".staging-" in p]
    # overwrite=True republishes cleanly
    res = export_training_shards(
        spark, _docs(spark).limit(50), F.col("doc_id").cast("string"),
        exported.path, 4, overwrite=True,
    )
    assert spark.read.parquet(f"{res.path}/shards").count() == 50


def test_conversations_to_packed_shards_e2e(spark, tmp_path):
    # the full transcript last mile: fixture conversations -> masked
    # fixed-length sequences -> reproducible training shards; every
    # token of every packed sequence survives to the published files
    from pyspark.sql import functions as F

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.bpe import train_bpe
    from feast_spark.operators.conversation import pack_conversations
    from feast_spark.pipeline.export import export_training_shards

    turns = transcripts_spark(spark, 40, seed=11, mega_every=20, mega_turns=80)
    model = train_bpe(
        turns.select(
            F.concat("role", F.lit(": "), F.coalesce("text", F.lit(""))
                     ).alias("text")
        ),
        num_merges=8,
    )
    seqs = pack_conversations(turns, model, seq_len=64).persist()
    n_seqs = seqs.count()
    n_tok = seqs.agg(F.sum("n_tokens")).first()[0]
    out = str(tmp_path / "shards")
    res = export_training_shards(
        spark,
        seqs,
        F.col("seq_id").cast("string"),
        out,
        n_shards=4,
        token_col="n_tokens",
        overwrite=True,
    )
    m = res.manifest.agg(
        F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")
    ).first()
    assert m["d"] == n_seqs and m["t"] == n_tok
    back = spark.read.parquet(f"{out}/shards")
    assert back.count() == n_seqs
    # mask survives the round trip aligned with ids
    bad = back.filter(F.size("token_ids") != F.size("loss_mask")).count()
    assert bad == 0
    assert back.agg(F.sum("n_tokens")).first()[0] == n_tok
    seqs.unpersist()
