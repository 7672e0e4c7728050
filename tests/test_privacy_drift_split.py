"""Round-5 session-4c operators: consistent PII pseudonymization
(operators/privacy.py), PSI distribution drift (operators/profile.py),
and leak-free group-grain holdout splitting (operators/selection.py) —
value tests against hand-computed / naive references plus plan audits
for the map-only / bounded-shuffle claims."""

from __future__ import annotations

import contextlib
import hashlib
import io
import math

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# pseudonymize_entities
# ---------------------------------------------------------------------------


def _tok(kind: str, entity: str, salt: str = "") -> str:
    h = hashlib.md5((salt + entity).encode()).hexdigest()[:10]
    return f"<{kind.upper()}:{h}>"


def test_pseudonymize_consistency_and_counts(spark):
    """Same entity -> same token across rows; different entities get
    different tokens; per-kind counts follow the SCRUB order contract
    (email digits never double-count as phone); NULL text -> ''."""
    from feast_spark.operators.privacy import pseudonymize_entities

    rows = [
        (1, "mail jane.doe@example.com and call 415-555-2671 now"),
        (2, "jane.doe@example.com again, also bob@corp.io"),
        (3, "no pii here at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = (
        pseudonymize_entities(df, kinds=("email", "phone"))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    jane = _tok("email", "jane.doe@example.com")
    assert out.loc[1, "text_pseudo"] == (
        f"mail {jane} and call {_tok('phone', '415-555-2671')} now"
    )
    assert out.loc[2, "text_pseudo"] == (
        f"{jane} again, also {_tok('email', 'bob@corp.io')}"
    )
    assert jane in out.loc[1, "text_pseudo"] and jane in out.loc[2, "text_pseudo"]
    assert (
        out.loc[1, ["n_pseudo_email", "n_pseudo_phone", "n_pseudo"]].tolist()
        == [1, 1, 2]
    )
    assert out.loc[2, "n_pseudo_email"] == 2 and out.loc[2, "n_pseudo_phone"] == 0
    assert out.loc[3, "n_pseudo"] == 0
    assert out.loc[4, "text_pseudo"] == "" and out.loc[4, "n_pseudo"] == 0


def test_pseudonymize_salt_rekeys_tokens(spark):
    from feast_spark.operators.privacy import pseudonymize_entities

    df = spark.createDataFrame(
        [(1, "jane.doe@example.com")], "doc_id int, text string"
    )
    a = pseudonymize_entities(df, kinds=("email",)).collect()[0]["text_pseudo"]
    b = pseudonymize_entities(df, kinds=("email",), salt="r2").collect()[0][
        "text_pseudo"
    ]
    assert a == _tok("email", "jane.doe@example.com")
    assert b == _tok("email", "jane.doe@example.com", salt="r2")
    assert a != b


def test_pseudonymize_unknown_kind_raises(spark):
    from feast_spark.operators.privacy import pseudonymize_entities

    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError, match="unknown PII kinds"):
        pseudonymize_entities(df, kinds=("email", "nope"))


def test_pseudonymize_map_only_plan(spark):
    """Content-hash tokens need no entity table: the plan must hold no
    Exchange at all (the whole operator is one Arrow projection)."""
    from pyspark.sql import functions as F

    from feast_spark.operators.privacy import pseudonymize_entities

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u"), F.col("id").cast("string"),
                 F.lit("@example.com")).alias("text"),
    )
    plan = _plan(pseudonymize_entities(df))
    assert "Exchange" not in plan, plan[:2000]
    assert "ArrowEvalPython" in plan or "EvalPython" in plan, plan[:2000]


# ---------------------------------------------------------------------------
# drift_psi
# ---------------------------------------------------------------------------


def test_drift_psi_identical_snapshots_zero(spark):
    from feast_spark.operators.profile import drift_psi

    df = spark.range(1000).selectExpr("CAST(id AS DOUBLE) AS x")
    out = drift_psi(df, df, ["x"], bins=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["column"] == "x" and abs(r["psi"]) < 1e-12
    assert r["n_ref"] == r["n_cur"] == 1000


def test_drift_psi_hand_computed(spark):
    """2 bins, known masses: ref 50/50, cur 80/20 ->
    psi = (0.5-0.8)ln(0.5/0.8) + (0.5-0.2)ln(0.5/0.2)."""
    from feast_spark.operators.profile import drift_psi

    ref = spark.createDataFrame(
        [(0.0,)] * 50 + [(1.0,)] * 50, "x double"
    )
    cur = spark.createDataFrame(
        [(0.0,)] * 80 + [(1.0,)] * 20, "x double"
    )
    r = drift_psi(ref, cur, ["x"], bins=2).collect()[0]
    expected = (0.5 - 0.8) * math.log(0.5 / 0.8) + (0.5 - 0.2) * math.log(
        0.5 / 0.2
    )
    assert abs(r["psi"] - expected) < 1e-12
    assert r["n_ref"] == 100 and r["n_cur"] == 100


def test_drift_psi_clamps_out_of_range_and_nulls(spark):
    """Cur values outside the ref [min,max] land in edge buckets (the
    standard PSI convention); NULLs are excluded from both sides."""
    from feast_spark.operators.profile import drift_psi

    ref = spark.createDataFrame([(0.0,), (1.0,), (None,)], "x double")
    cur = spark.createDataFrame([(-5.0,), (9.0,), (None,)], "x double")
    r = drift_psi(ref, cur, ["x"], bins=2, eps=1e-6).collect()[0]
    # ref: one per bucket (p=.5,.5); cur: one clamped low, one clamped
    # high (q=.5,.5) -> psi == 0 exactly
    assert abs(r["psi"]) < 1e-12
    assert r["n_ref"] == 2 and r["n_cur"] == 2


def test_drift_psi_constant_ref_column(spark):
    """hi == lo: everything lands in bucket 0 on both sides."""
    from feast_spark.operators.profile import drift_psi

    ref = spark.createDataFrame([(7.0,)] * 10, "x double")
    cur = spark.createDataFrame([(7.0,)] * 3 + [(8.0,)] * 3, "x double")
    r = drift_psi(ref, cur, ["x"], bins=4).collect()[0]
    assert abs(r["psi"]) < 1e-12  # all mass in bucket 0 on both sides
    assert r["n_cur"] == 6


def test_drift_psi_multi_column_single_scan_plan(spark):
    """All columns melt in ONE projection per snapshot pass — never one
    scan per column. The reference side pays exactly its two inherent
    passes (bounds, bucketing; the bounds broadcast is built once —
    ReusedExchange); the CURRENT side scans exactly once, proving the
    totals come from the window over joined counts rather than a second
    aggregation over the melted input."""
    import tempfile

    from feast_spark.operators.profile import drift_psi

    # a SHORT tmp dir: plan toString truncates long paths, which would
    # hide the Location markers this test counts
    d = tempfile.mkdtemp(prefix="psi")
    rp, cp = f"{d}/ref_snap", f"{d}/cur_snap"
    df = spark.range(100).selectExpr(
        "CAST(id AS DOUBLE) AS a", "CAST(id % 7 AS DOUBLE) AS b"
    )
    df.write.parquet(rp)
    df.write.parquet(cp)
    out = drift_psi(
        spark.read.parquet(rp), spark.read.parquet(cp), ["a", "b"], bins=5
    )
    plan = _plan(out)
    assert plan.count("cur_snap") == 1, plan[:3000]
    # static plan may repeat the bounds subtree per broadcast use; the
    # runtime builds it once (ReusedExchange in the adaptive final plan)
    assert plan.count("ref_snap") <= 3, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]
    out.collect()
    final = _plan(out)
    assert "ReusedExchange" in final or final.count("ref_snap") <= 2, final[:3000]


# ---------------------------------------------------------------------------
# assign_split
# ---------------------------------------------------------------------------


def test_assign_split_group_grain_no_leak(spark):
    """Every turn of one conversation gets the same split — the whole
    point; fractions land near the targets at the group grain."""
    from pyspark.sql import functions as F

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.selection import assign_split

    t = transcripts_spark(spark, 400, seed=11, mega_every=0)
    out = assign_split(t, "conv_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
    per_conv = out.groupBy("conv_id").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_conv.filter("n_splits != 1").count() == 0
    frac = {
        r["split"]: r["n"]
        for r in out.select("conv_id", "split")
        .distinct()
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n = sum(frac.values())
    assert n == 400
    assert 0.7 < frac["train"] / n < 0.9
    assert frac.get("valid", 0) > 0 and frac.get("test", 0) > 0


def test_assign_split_deterministic_and_seed_sensitive(spark):
    from feast_spark.operators.selection import assign_split

    df = spark.range(500).selectExpr("CAST(id AS STRING) AS g")
    a = {r["g"]: r["split"] for r in assign_split(df, "g").collect()}
    b = {r["g"]: r["split"] for r in assign_split(df, "g").collect()}
    c = {r["g"]: r["split"] for r in assign_split(df, "g", seed="other").collect()}
    assert a == b
    assert any(a[k] != c[k] for k in a)


def test_assign_split_growth_stability(spark):
    """Adding new groups never moves an existing group between splits."""
    from feast_spark.operators.selection import assign_split

    small = spark.range(200).selectExpr("CAST(id AS STRING) AS g")
    big = spark.range(400).selectExpr("CAST(id AS STRING) AS g")
    a = {r["g"]: r["split"] for r in assign_split(small, "g").collect()}
    b = {r["g"]: r["split"] for r in assign_split(big, "g").collect()}
    assert all(b[k] == v for k, v in a.items())


def test_assign_split_validation(spark):
    from feast_spark.operators.selection import assign_split

    df = spark.range(5).selectExpr("CAST(id AS STRING) AS g")
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split(df, "g", {"train": 0.5, "test": 0.4})
    with pytest.raises(ValueError, match="non-negative"):
        assign_split(df, "g", {"train": 1.5, "test": -0.5})


def test_assign_split_map_only_plan(spark):
    from feast_spark.operators.selection import assign_split

    df = spark.range(100).selectExpr("CAST(id AS STRING) AS g")
    plan = _plan(assign_split(df, "g"))
    assert "Exchange" not in plan, plan[:2000]


# ---------------------------------------------------------------------------
# drift_psi_categorical
# ---------------------------------------------------------------------------


def test_drift_categorical_hand_computed(spark):
    """2 categories, known masses: ref a/b = 60/40, cur a/b = 30/70."""
    from feast_spark.operators.profile import drift_psi_categorical

    ref = spark.createDataFrame([("a",)] * 60 + [("b",)] * 40, "lang string")
    cur = spark.createDataFrame([("a",)] * 30 + [("b",)] * 70, "lang string")
    r = drift_psi_categorical(ref, cur, ["lang"], top_k=5).collect()[0]
    expected = (0.6 - 0.3) * math.log(0.6 / 0.3) + (0.4 - 0.7) * math.log(
        0.4 / 0.7
    )
    assert abs(r["psi"] - expected) < 1e-12
    assert r["n_ref"] == 100 and r["n_cur"] == 100


def test_drift_categorical_other_fold_and_null(spark):
    """Categories past top_k fold to <OTHER> (bounding state against a
    unique-garbage flood); NULL is its own category; unseen cur
    categories fold rather than explode the bucket space."""
    from pyspark.sql import functions as F

    from feast_spark.operators.profile import drift_psi_categorical

    ref = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 10 + [(None,)] * 10,
        "lang string",
    )
    # cur floods with 40 distinct junk values
    cur = spark.range(40).select(
        F.concat(F.lit("junk"), F.col("id").cast("string")).alias("lang")
    ).unionByName(spark.createDataFrame([("a",)] * 60, "lang string"))
    out = drift_psi_categorical(ref, cur, ["lang"], top_k=2)
    r = out.collect()[0]
    assert r["n_ref"] == 100 and r["n_cur"] == 100
    # exact replay: ref buckets a=50 b=30 OTHER=20 (c + <NULL> fold);
    # cur a=60 OTHER=40
    p = {"a": 0.5, "b": 0.3, "<OTHER>": 0.2}
    q = {"a": 0.6, "b": 1e-6, "<OTHER>": 0.4}
    expected = sum(
        (p[k] - q[k]) * math.log(p[k] / q[k]) for k in p
    )
    assert abs(r["psi"] - expected) < 1e-12


def test_drift_categorical_identical_zero(spark):
    from feast_spark.operators.profile import drift_psi_categorical

    df = spark.createDataFrame(
        [("x",), ("y",), ("y",), (None,)], "src string"
    )
    r = drift_psi_categorical(df, df, ["src"], top_k=10).collect()[0]
    assert abs(r["psi"]) < 1e-12


def test_drift_categorical_topk_tiebreak_deterministic(spark):
    """Equal counts break ties by category ASC — swap-stable output."""
    from feast_spark.operators.profile import drift_psi_categorical

    ref = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "lang string"
    )
    cur = spark.createDataFrame([("a",)] * 4, "lang string")
    # top_k=2 with all-equal counts must keep {a, b} (asc tie-break):
    # ref buckets a=.25 b=.25 OTHER=.5; cur a=1, b=eps, OTHER=eps
    r = drift_psi_categorical(ref, cur, ["lang"], top_k=2).collect()[0]
    e = 1e-6
    expected = (
        (0.25 - 1.0) * math.log(0.25 / 1.0)
        + (0.25 - e) * math.log(0.25 / e)
        + (0.5 - e) * math.log(0.5 / e)
    )
    assert abs(r["psi"] - expected) < 1e-12


# ---------------------------------------------------------------------------
# drift over materialized feature snapshots (composition, DQM flow)
# ---------------------------------------------------------------------------


def test_drift_over_materialized_conv_features(spark, tmp_path):
    """The feast-shaped monitoring loop end-to-end: two quality-pipeline
    runs materialize conversation features into the same feature table;
    drift_psi compares the two runs' snapshots (numeric features) and
    drift_psi_categorical the language mode. A corpus change (different
    fixture seed + perturbed timing) must register as finite PSI; the
    self-comparison is exactly zero."""
    from datetime import datetime, timezone

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.profile import drift_psi, drift_psi_categorical
    from feast_spark.pipeline.quality import (
        QualityConfig,
        run_quality_pipeline,
    )

    path = str(tmp_path / "conv_features")
    d0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    run_quality_pipeline(
        spark, transcripts_spark(spark, 120, seed=5, mega_every=0),
        QualityConfig(), run_id="m0", decision_ts=d0,
        feature_table_path=path,
    )
    run_quality_pipeline(
        spark, transcripts_spark(spark, 120, seed=9, mega_every=40,
                                 mega_turns=120),
        QualityConfig(), run_id="m1", decision_ts=d0,
        feature_table_path=path,
    )
    hist = spark.read.parquet(path)
    created = sorted(r["created_ts"] for r in
                     hist.select("created_ts").distinct().collect())
    assert len(created) == 2
    snap0 = hist.filter(hist.created_ts == created[0])
    snap1 = hist.filter(hist.created_ts == created[1])

    num = drift_psi(
        snap0, snap1, ["mean_perplexity", "tool_call_density"], bins=10
    ).toPandas().set_index("column")
    assert set(num.index) == {"mean_perplexity", "tool_call_density"}
    assert (num["psi"] >= 0).all()  # PSI is a sum of non-negative terms
    assert num["n_ref"].iloc[0] == snap0.count()

    cat = drift_psi_categorical(snap0, snap1, ["lang_mode"]).collect()[0]
    assert cat["psi"] >= 0.0

    self_num = drift_psi(
        snap0, snap0, ["mean_perplexity", "tool_call_density"], bins=10
    ).toPandas()
    assert (self_num["psi"].abs() < 1e-12).all()


# ---------------------------------------------------------------------------
# pipeline scrub_mode = pseudonymize (opt-in; redact contract unchanged)
# ---------------------------------------------------------------------------


def test_pipeline_pseudonymize_scrub_mode(spark):
    """The flagship pipeline with RuleConfig(scrub_mode='pseudonymize')
    emits stable per-entity tokens in scrubbed_text; defaults stay
    byte-identical to the redact contract (same labels, same text)."""
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    from feast_spark import rules
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.pipeline.quality import (
        QualityConfig,
        run_quality_pipeline,
    )

    t = transcripts_spark(spark, 60, seed=21, mega_every=0)
    # plant one recurring entity across conversations
    t = t.withColumn(
        "text",
        F.when(
            F.pmod(F.xxhash64("conv_id"), F.lit(4)) == 0,
            F.concat(
                F.coalesce("text", F.lit("")),
                F.lit(" contact jane.doe@example.com"),
            ),
        ).otherwise(F.col("text")),
    )
    d0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    base = run_quality_pipeline(
        spark, t, QualityConfig(), run_id="rb", decision_ts=d0
    ).labels.toPandas()
    pseudo = run_quality_pipeline(
        spark, t,
        QualityConfig(rules=rules.RuleConfig(scrub_mode="pseudonymize")),
        run_id="rp", decision_ts=d0,
    ).labels.toPandas()

    jane = _tok("email", "jane.doe@example.com")
    hit_b = base[base["scrubbed_text"].str.contains("<EMAIL>", regex=False)]
    hit_p = pseudo[pseudo["scrubbed_text"].str.contains(jane, regex=False)]
    assert len(hit_p) > 0
    # every row carrying the planted entity's token was a redacted row
    # in base mode (the fixture also plants OTHER organic emails, so
    # base's <EMAIL> rows are a superset), and the planted entity maps
    # to ONE token corpus-wide
    assert set(zip(hit_p["conv_id"], hit_p["turn_idx"])) <= set(
        zip(hit_b["conv_id"], hit_b["turn_idx"])
    )
    assert not pseudo["scrubbed_text"].str.contains("<EMAIL>", regex=False).any()
    # labels (keep/drop) are scrub-mode-independent
    b = base.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    p = pseudo.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (b["keep"] == p["keep"]).all()
    assert (b["drop_reason"].fillna("") == p["drop_reason"].fillna("")).all()


def test_scrub_text_mode_validation_and_default_parity():
    import pandas as pd

    from feast_spark import rules

    s = pd.Series(["mail a@b.co now", None, "call 415-555-2671"])
    with pytest.raises(ValueError, match="unknown scrub mode"):
        rules.scrub_text(s, mode="nope")
    # default call == explicit redact (the reference-parity contract)
    assert rules.scrub_text(s).tolist() == rules.scrub_text(
        s, mode="redact"
    ).tolist()
    p = rules.scrub_text(s, mode="pseudonymize").tolist()
    assert p[0] == f"mail {_tok('email', 'a@b.co')} now"
    assert p[2] == f"call {_tok('phone', '415-555-2671')}"
