"""Complex-type matrix through materialize + PIT (the reference's
universal types tests, SURVEY §5 'types'), FeatureService bundles, and
BatchFeatureView UDF materialization."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest

from feast_spark.core import (
    BatchFeatureView,
    Entity,
    FeatureService,
    FeatureStore,
    FeatureView,
    Field,
    ParquetSource,
)
from feast_spark.core.types import feast_type_to_spark, spark_type_to_feast


def _mk(ts):
    return datetime.fromisoformat(ts)


@pytest.fixture(scope="module")
def typed_repo(tmp_path_factory, spark):
    root = tmp_path_factory.mktemp("typed_repo")
    rows = []
    for k in range(3):
        for h in (0, 6):
            rows.append(
                {
                    "k": k,
                    "event_timestamp": _mk("2024-01-01") + timedelta(hours=h),
                    "tags": [f"t{k}", f"h{h}"],
                    "attrs": {"k": str(k), "h": str(h)},
                    "nested": {"a": k * 10 + h, "b": f"s{k}"},
                    "score": float(k) + h / 10.0,
                }
            )
    pdf = pd.DataFrame(rows)
    pdf["event_timestamp"] = pdf["event_timestamp"].astype("datetime64[us]")
    fp = str(root / "typed.parquet")
    sdf = spark.createDataFrame(
        pdf,
        schema="k long, event_timestamp timestamp, tags array<string>, "
        "attrs map<string,string>, nested struct<a:long,b:string>, score double",
    )
    sdf.write.parquet(fp)

    store = FeatureStore(spark, str(root))
    fv = FeatureView(
        "typed",
        [Entity("k")],
        ParquetSource(fp, timestamp_field="event_timestamp"),
        schema=[
            Field("k", "int64"),
            Field("tags", "array<string>"),
            Field("attrs", "map"),
            Field("nested", "struct<a:long,b:string>"),
            Field("score", "float64"),
        ],
    )
    store.apply([fv, FeatureService("svc", ("typed:tags", "typed:score"))])
    return store


def test_complex_types_through_pit(spark, typed_repo):
    entity = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [0, 1, 2],
                "event_timestamp": pd.to_datetime(["2024-01-01 12:00"] * 3).astype(
                    "datetime64[us]"
                ),
            }
        )
    )
    got = typed_repo.get_historical_features(
        entity, ["typed:tags", "typed:attrs", "typed:nested", "typed:score"]
    ).toPandas().sort_values("k").reset_index(drop=True)
    # latest row (hour 6) wins for each key; complex values survive intact
    assert [list(t) for t in got.tags] == [["t0", "h6"], ["t1", "h6"], ["t2", "h6"]]
    # note: got.attrs would hit pandas' built-in DataFrame.attrs metadata
    assert got["attrs"][0]["h"] == "6"
    assert got["nested"][1]["a"] == 16 and got["nested"][1]["b"] == "s1"


def test_complex_types_through_materialize(spark, typed_repo):
    out = typed_repo.materialize("typed", _mk("2024-01-01"), _mk("2024-01-02"))
    pdf = out.toPandas().sort_values("k")
    assert len(pdf) == 3
    assert all(len(t) == 2 for t in pdf.tags)
    assert pdf.nested.iloc[0]["a"] == 6


def test_feature_service_bundle(spark, typed_repo):
    entity = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1], "event_timestamp": pd.to_datetime(["2024-06-01"]).astype("datetime64[us]")}
        )
    )
    got = typed_repo.get_historical_features(
        entity, typed_repo._services["svc"]
    ).toPandas()
    assert set(got.columns) == {"k", "event_timestamp", "tags", "score"}


def test_batch_feature_view_udf_modes(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "k": [1, 2],
            "event_timestamp": pd.to_datetime(["2024-01-01"] * 2).astype("datetime64[us]"),
            "v": [1.0, 2.0],
        }
    )
    fp = str(tmp_path / "b.parquet")
    pdf.to_parquet(fp)

    spark_bfv = BatchFeatureView(
        "b1", [Entity("k")], ParquetSource(fp, "event_timestamp"),
        schema=[Field("k", "int64"), Field("v2", "float64")],
        udf=lambda df: df.selectExpr("k", "event_timestamp", "v * 2 AS v2"),
        mode="spark",
    )
    got = spark_bfv.read(spark).toPandas().sort_values("k")
    assert got.v2.tolist() == [2.0, 4.0]

    def pandas_udf(b: pd.DataFrame) -> pd.DataFrame:
        b["v2"] = b["v"] * 3
        return b[["k", "event_timestamp", "v2"]]

    pandas_bfv = BatchFeatureView(
        "b2", [Entity("k")], ParquetSource(fp, "event_timestamp"),
        schema=[Field("k", "int64"), Field("v2", "float64")],
        udf=pandas_udf, mode="pandas",
        udf_output_schema="k long, event_timestamp timestamp, v2 double",
    )
    got = pandas_bfv.read(spark).toPandas().sort_values("k")
    assert got.v2.tolist() == [3.0, 6.0]


def test_type_mapping_roundtrip():
    import pyspark.sql.types as T

    assert feast_type_to_spark("int64") == T.LongType()
    assert feast_type_to_spark("array<float32>") == T.ArrayType(T.FloatType())
    assert feast_type_to_spark("unix_timestamp") == T.TimestampType()
    assert spark_type_to_feast(T.ArrayType(T.DoubleType())) == "array<float64>"
    assert spark_type_to_feast(T.MapType(T.StringType(), T.StringType())) == "map"
