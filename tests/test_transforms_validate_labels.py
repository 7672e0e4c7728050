"""§2.9 transformation modes, §2.2 schema validation, LabelView conflict
resolution."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from feast_spark.functions.transforms import (
    infer_output_schema,
    python_transform,
    spark_sql_transform,
)
from feast_spark.operators.labels import (
    resolve_labeler_priority,
    resolve_last_write_wins,
    resolve_majority_vote,
)
from feast_spark.operators.validate import validate_schema


def test_python_transform_dict_mode(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [1, 2, 3], "b": [1.0, 2.0, 3.0]}))
    def udf(cols):
        return {"a": cols["a"], "c": cols["a"] * 2 + cols["b"]}
    out = python_transform(df, udf, "a long, c double").toPandas().sort_values("a")
    assert out.c.tolist() == [3.0, 6.0, 9.0]


def test_spark_sql_transform(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [1, 2, 3, 4]}))
    def udf(view):
        return f"SELECT count(*) AS n, sum(x) AS s FROM {view} WHERE x > 1"
    out = spark_sql_transform(spark, udf, {"tv_x": df}).first()
    assert out.n == 3 and out.s == 9


def test_infer_output_schema():
    def udf(pdf):
        pdf["y"] = pdf["x"] * 1.5
        pdf["z"] = pdf["x"].astype(str)
        return pdf
    ddl = infer_output_schema(udf, pd.DataFrame({"x": [1, 2]}))
    assert ddl == "x long, y double, z string"


def test_validate_schema_happy_and_sad(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "v": [1.5], "props": ['{"k": 1}']})
    )
    ok = validate_schema(df, {"id": "bigint", "v": "double"}, {"props": "k long"})
    assert ok.ok

    missing = validate_schema(df, {"id": "bigint", "nope": "string"})
    assert not missing.ok and missing.missing_columns == ["nope"]

    wrong = validate_schema(df, {"v": "timestamp"})
    assert not wrong.ok and wrong.type_mismatches[0][0] == "v"

    bad = spark.createDataFrame(pd.DataFrame({"props": ["{not json", '{"k":2}']}))
    res = validate_schema(bad, {"props": "string"}, {"props": "k long"})
    assert not res.ok and res.invalid_json_count == 1
    with pytest.raises(ValueError):
        res.raise_on_error()


@pytest.fixture(scope="module")
def labels_df(spark):
    rows = [
        # key, label, labeler priority, ts
        (1, "keep", 1, "2024-01-01 00:00:00"),
        (1, "drop", 2, "2024-01-01 01:00:00"),
        (1, "keep", 1, "2024-01-02 00:00:00"),
        (2, "drop", 3, "2024-01-01 00:00:00"),
        (2, "keep", 1, "2024-01-05 00:00:00"),
        # key 3: 1x keep, 1x drop -> majority tie -> 'drop' (lexicographic)
        (3, "keep", 1, "2024-01-01 00:00:00"),
        (3, "drop", 1, "2024-01-01 01:00:00"),
    ]
    pdf = pd.DataFrame(rows, columns=["entity_id", "label", "priority", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    return spark.createDataFrame(pdf)


def test_last_write_wins(labels_df):
    out = resolve_last_write_wins(labels_df, ["entity_id"], "ts").toPandas()
    out = out.set_index("entity_id").label
    assert out[1] == "keep" and out[2] == "keep" and out[3] == "drop"


def test_labeler_priority(labels_df):
    out = resolve_labeler_priority(
        labels_df, ["entity_id"], "label", "priority", "ts"
    ).toPandas().set_index("entity_id").label
    assert out[1] == "drop" and out[2] == "drop"


def test_majority_vote_with_tiebreak(labels_df):
    out = resolve_majority_vote(labels_df, ["entity_id"], "label").toPandas()
    got = out.set_index("entity_id").label
    assert got[1] == "keep"      # 2 keep vs 1 drop
    assert got[3] == "drop"      # 1-1 tie -> lexicographically smallest
    assert out.set_index("entity_id").n_votes[1] == 3


def test_majority_vote_exact_lexicographic_tiebreak(spark):
    import pandas as pd
    from feast_spark.operators.labels import resolve_majority_vote

    # prefix pair tie ('a' vs 'ab') and digit labels — the round-1
    # reverse-translate tie-break got both wrong
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2, 2, 3, 3, 3],
                "label": ["ab", "a", "9", "1", "x", "x", "y"],
            }
        )
    )
    out = (
        resolve_majority_vote(df, ["k"], "label")
        .orderBy("k")
        .toPandas()
    )
    assert out.label.tolist() == ["a", "1", "x"]
    assert out.n_votes.tolist() == [2, 2, 3]


def test_label_view_store_level_resolution(spark, tmp_path):
    """LabelView (round-2 VERDICT Next #6): registrable view binding a
    conflict policy; store.get_labels() resolves offline reads."""
    import pandas as pd

    from feast_spark.core import Entity, FeatureStore, ParquetSource
    from feast_spark.operators.labels import LabelView

    raw = pd.DataFrame(
        {
            "item_id": [1, 1, 1, 2, 2],
            "label": ["safe", "unsafe", "safe", "unsafe", "safe"],
            "labeler": ["human", "model", "model", "model", "human"],
            "priority": [2, 1, 1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03",
                 "2024-01-01", "2024-01-02"]
            ).astype("datetime64[us]"),
        }
    )
    path = str(tmp_path / "labels.parquet")
    raw.to_parquet(path)
    store = FeatureStore(spark, str(tmp_path / "repo"))
    src = ParquetSource(path=path, timestamp_field="ts")
    ent = [Entity("item", "item_id")]

    lww = LabelView(name="lww", entities=ent, source=src, label_col="label")
    pri = LabelView(
        name="pri", entities=ent, source=src, label_col="label",
        conflict_policy="labeler_priority", priority_col="priority",
    )
    maj = LabelView(
        name="maj", entities=ent, source=src, label_col="label",
        conflict_policy="majority_vote",
    )
    store.apply([lww, pri, maj])
    assert store.registry.get_view("maj")["conflict_policy"] == "majority_vote"

    got_lww = store.get_labels("lww").toPandas().set_index("item_id").label
    assert got_lww[1] == "safe" and got_lww[2] == "safe"  # latest ts wins

    got_pri = store.get_labels("pri").toPandas().set_index("item_id").label
    assert got_pri[1] == "safe"  # human (priority 2) beats later model rows
    assert got_pri[2] == "safe"

    got_maj = store.get_labels("maj").toPandas().set_index("item_id")
    assert got_maj.label[1] == "safe" and got_maj.n_votes[1] == 3
    # tie at item 2 (1 safe, 1 unsafe) -> lexicographically smallest
    assert got_maj.label[2] == "safe" and got_maj.n_votes[2] == 2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown conflict_policy"):
        LabelView(name="x", entities=ent, source=src, label_col="label",
                  conflict_policy="nope")


# ---------------------------------------------------------------------------
# reference-fidelity majority vote (conflict_resolver.py:102-157):
# per-column independent resolution, recency tie-break, ts/labeler stamping
# ---------------------------------------------------------------------------


def test_majority_vote_reference_semantics(spark):
    from feast_spark.operators.labels import resolve_majority_vote_reference

    df = spark.createDataFrame(
        [
            # e1: 'a' majority (2 vs 1) on col1 even though 'b' is latest;
            #     col2 winners come from DIFFERENT rows than col1's
            (1, "a", 10.0, "lab1", "2024-01-01 00:00:00"),
            (1, "a", 20.0, "lab2", "2024-01-02 00:00:00"),
            (1, "b", 20.0, "lab3", "2024-01-03 00:00:00"),
            # e2: count tie a/b on col1 -> recency: b's latest row is newer
            (2, "a", 1.0, "lab1", "2024-01-01 00:00:00"),
            (2, "b", 2.0, "lab2", "2024-01-05 00:00:00"),
            # e3: col1 all null -> resolves to null; col2 single value
            (3, None, 7.0, "lab1", "2024-01-01 00:00:00"),
        ],
        "entity_id long, l1 string, l2 double, labeler string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = (
        resolve_majority_vote_reference(
            df, ["entity_id"], ["l1", "l2"], "ts", "labeler"
        )
        .toPandas()
        .set_index("entity_id")
    )
    # column order follows the source frame (conflict_resolver.py:155)
    assert list(out.reset_index().columns) == [
        "entity_id", "l1", "l2", "labeler", "ts"
    ]
    assert out.l1[1] == "a"          # majority beats recency
    assert out.l2[1] == 20.0         # col2 resolved independently (2 votes)
    assert out.l1[2] == "b"          # count tie -> latest ts row wins
    assert out.l1[3] is None or out.l1[3] != out.l1[3]  # all-null -> null
    assert out.l2[3] == 7.0
    # resolved row stamped with group max ts + labeler='majority_vote'
    assert str(out.ts[1]) == "2024-01-03 00:00:00"
    assert set(out.labeler) == {"majority_vote"}


def test_majority_vote_reference_double_tie_lexicographic(spark):
    # count tie AND identical max ts -> deterministic refinement: smallest
    # value wins (the reference is input-order-dependent here)
    from feast_spark.operators.labels import resolve_majority_vote_reference

    df = spark.createDataFrame(
        [
            (1, "z", "2024-01-02 00:00:00"),
            (1, "m", "2024-01-02 00:00:00"),
        ],
        "entity_id long, l1 string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resolve_majority_vote_reference(df, ["entity_id"], ["l1"], "ts")
    assert out.collect()[0]["l1"] == "m"


def test_label_view_recency_multi_column(spark, tmp_path):
    import pandas as pd

    from feast_spark.core import Entity, FeatureStore, ParquetSource
    from feast_spark.operators.labels import LabelView

    raw = pd.DataFrame(
        {
            "item_id": [1, 1, 1, 2, 2],
            "label": ["safe", "unsafe", "safe", "unsafe", "safe"],
            "score": [0.1, 0.9, 0.9, 0.5, 0.4],
            "labeler": ["m1", "m2", "m3", "m1", "m2"],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03",
                 "2024-01-01", "2024-01-02"]
            ).astype("datetime64[us]"),
        }
    )
    path = str(tmp_path / "labels_r.parquet")
    raw.to_parquet(path)
    store = FeatureStore(spark, str(tmp_path / "repo_r"))
    src = ParquetSource(path=path, timestamp_field="ts")
    lv = LabelView(
        name="ref_maj", entities=[Entity("item", "item_id")], source=src,
        label_col=["label", "score"], conflict_policy="majority_vote",
        tie_break="recency",
    )
    store.apply([lv])
    got = store.get_labels("ref_maj").toPandas().set_index("item_id")
    assert got.label[1] == "safe"      # 2 votes vs 1
    assert got.score[1] == 0.9         # independent column: 2 votes for 0.9
    assert got.label[2] == "safe"      # tie -> later ts wins
    assert set(got.labeler) == {"majority_vote"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="tie_break"):
        LabelView(name="x2", entities=[Entity("item", "item_id")],
                  source=src, label_col="label",
                  conflict_policy="majority_vote", tie_break="nope")
    with _pytest.raises(ValueError, match="recency"):
        LabelView(name="x3", entities=[Entity("item", "item_id")],
                  source=src, label_col=["a", "b"],
                  conflict_policy="majority_vote")


# ---------------------------------------------------------------------------
# ODFV singleton mode (reference on_demand_feature_view.py:316-319 +
# python_transformation.py:91-97)
# ---------------------------------------------------------------------------


def test_python_singleton_transform(spark):
    from feast_spark.functions.transforms import (
        python_transform,
        python_transform_singleton,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "k long, v double"
    )

    def one_row(row: dict) -> dict:
        # scalars in, scalars out — NULL arrives as None, not NaN
        assert not isinstance(row["k"], list)
        return {"doubled": None if row["v"] is None else row["v"] * 2}

    out = python_transform_singleton(
        df, one_row, "k long, v double, doubled double"
    ).toPandas().sort_values("k").reset_index(drop=True)
    assert out.doubled.tolist()[0] == 20.0
    assert pd.isna(out.doubled.tolist()[1])
    assert out.doubled.tolist()[2] == 60.0
    # input columns are merged through, reference transform() semantics
    assert out.k.tolist() == [1, 2, 3]

    # parity with the batch python mode on the same logic
    def batch(cols: dict) -> dict:
        return {"k": cols["k"], "v": cols["v"], "doubled": cols["v"] * 2}

    b = python_transform(
        df, batch, "k long, v double, doubled double"
    ).toPandas().sort_values("k").reset_index(drop=True)
    assert b.doubled.fillna(-1).tolist() == out.doubled.fillna(-1).tolist()


def test_odfv_singleton_validation_and_apply(spark):
    from feast_spark.core.model import Field, OnDemandFeatureView

    with pytest.raises(ValueError, match="singleton mode requires"):
        OnDemandFeatureView(
            name="bad", udf=lambda r: r, mode="pandas", singleton=True
        )

    odfv = OnDemandFeatureView(
        name="single",
        udf=lambda row: {"plus1": row["x"] + 1},
        schema=[Field("plus1", "long")],
        mode="python",
        singleton=True,
    )
    df = spark.createDataFrame([(1,), (2,)], "x long")
    got = odfv.apply(df).toPandas().sort_values("x")
    assert got.plus1.tolist() == [2, 3]


def test_label_drift_transitions_and_sentinels(spark):
    from feast_spark.operators.labels import label_drift

    a = spark.createDataFrame(
        [
            ("c1", 0, True, None, "hello"),
            ("c1", 1, False, "too_short", "x"),
            ("c1", 2, True, None, "same text"),
            ("c2", 0, True, None, "only in a"),
        ],
        "conv_id string, turn_idx int, keep boolean, drop_reason string, "
        "scrubbed_text string",
    )
    b = spark.createDataFrame(
        [
            ("c1", 0, False, "perplexity", "hello"),     # kept -> perplexity
            ("c1", 1, False, "too_short", "x"),          # stable
            ("c1", 2, True, None, "different text"),     # kept, text changed
            ("c3", 0, True, None, "only in b"),
        ],
        "conv_id string, turn_idx int, keep boolean, drop_reason string, "
        "scrubbed_text string",
    )
    out = {
        (r["state_a"], r["state_b"]): (r["n_turns"], r["n_text_changed"])
        for r in label_drift(a, b).collect()
    }
    assert out[("<kept>", "perplexity")] == (1, 0)
    assert out[("too_short", "too_short")] == (1, 0)
    assert out[("<kept>", "<kept>")] == (1, 1)  # the text change
    assert out[("<kept>", "<absent>")] == (1, 0)
    assert out[("<absent>", "<kept>")] == (1, 0)
    assert sum(n for n, _ in out.values()) == 5


def test_keep_drop_eval_hand_computed(spark):
    from feast_spark.operators.labels import keep_drop_eval

    schema = (
        "conv_id string, turn_idx int, keep boolean, drop_reason string, "
        "scrubbed_text string"
    )
    pred = spark.createDataFrame(
        [
            ("c1", 0, True, None, "same"),        # tp, text equal
            ("c1", 1, True, None, "pred text"),   # tp, text differs
            ("c1", 2, True, None, "x"),           # fp
            ("c1", 3, False, "too_short", "y"),   # fn
            ("c1", 4, False, "toxicity", "z"),    # tn
            ("c2", 0, True, None, "only pred"),   # n_only_pred
        ],
        schema,
    )
    ref = spark.createDataFrame(
        [
            ("c1", 0, True, None, "same"),
            ("c1", 1, True, None, "ref text"),
            ("c1", 2, False, "perplexity", "x"),
            ("c1", 3, True, None, "y"),
            ("c1", 4, False, "toxicity", "z"),
            ("c3", 0, False, "language", "only ref"),  # n_only_ref
        ],
        schema,
    )
    row = keep_drop_eval(pred, ref).collect()[0].asDict()
    assert row["n_turns"] == 5
    assert row["n_only_pred"] == 1 and row["n_only_ref"] == 1
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (2, 1, 1, 1)
    assert row["n_kept_text_equal"] == 1 and row["n_kept_text_diff"] == 1
    unit = 1 << 20
    assert row["precision_units"] == (2 * unit) // 3
    assert row["recall_units"] == (2 * unit) // 3
    assert row["f1_units"] == (4 * unit) // 6  # 2tp/(2tp+fp+fn)


def test_keep_drop_eval_null_keep_counts_as_drop(spark):
    # a NULL keep on a both-side key coalesces to False (drop) — the
    # confusion cells must still sum to n_turns, never silently skip
    from feast_spark.operators.labels import keep_drop_eval

    schema = (
        "conv_id string, turn_idx int, keep boolean, drop_reason string, "
        "scrubbed_text string"
    )
    pred = spark.createDataFrame(
        [("c1", 0, None, None, "t"), ("c1", 1, True, None, "u")], schema
    )
    ref = spark.createDataFrame(
        [("c1", 0, True, None, "t"), ("c1", 1, None, None, "u")], schema
    )
    row = keep_drop_eval(pred, ref).collect()[0].asDict()
    assert row["n_turns"] == 2
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (0, 1, 1, 0)
    assert row["tp"] + row["fp"] + row["fn"] + row["tn"] == row["n_turns"]


def test_keep_drop_eval_sentinels_and_null_text(spark):
    from feast_spark.operators.labels import keep_drop_eval

    schema = (
        "conv_id string, turn_idx int, keep boolean, drop_reason string, "
        "scrubbed_text string"
    )
    # no keeps anywhere -> every metric denominator empty -> -1 sentinels;
    # NULL scrubbed_text on both sides of a kept pair counts as EQUAL
    # (null-safe comparison) in the second frame pair
    pred = spark.createDataFrame(
        [("c1", 0, False, "too_short", None)], schema
    )
    ref = spark.createDataFrame(
        [("c1", 0, False, "too_short", None)], schema
    )
    row = keep_drop_eval(pred, ref).collect()[0].asDict()
    assert row["tn"] == 1 and row["tp"] == 0
    assert row["precision_units"] == -1
    assert row["recall_units"] == -1
    assert row["f1_units"] == -1

    pred2 = spark.createDataFrame([("c1", 0, True, None, None)], schema)
    ref2 = spark.createDataFrame([("c1", 0, True, None, None)], schema)
    row2 = keep_drop_eval(pred2, ref2).collect()[0].asDict()
    assert row2["n_kept_text_equal"] == 1 and row2["n_kept_text_diff"] == 0
    assert row2["f1_units"] == 1 << 20  # perfect agreement
