"""Source-schema inference + entity-dtype validation (round-2 VERDICT
Next #5; reference inference.py + feature_view.py:289-307 semantics:
omitted schema inferred, wrong dtype raises, field_mapping interplay)."""

from __future__ import annotations

import pandas as pd
import pytest

from feast_spark.core import Entity, FeatureStore, FeatureView, Field, ParquetSource


@pytest.fixture(scope="module")
def src(tmp_path_factory):
    root = tmp_path_factory.mktemp("inf")
    pdf = pd.DataFrame(
        {
            "driver": [1, 2],
            "rate": [0.5, 0.75],
            "n_trips": [3, 4],
            "event_timestamp": pd.to_datetime(["2024-01-01", "2024-01-02"]).astype(
                "datetime64[us]"
            ),
            "created": pd.to_datetime(["2024-01-03", "2024-01-03"]).astype(
                "datetime64[us]"
            ),
        }
    )
    path = str(root / "src.parquet")
    pdf.to_parquet(path)
    return str(root), path


def _store(spark, root):
    return FeatureStore(spark, root)


def test_omitted_schema_is_inferred(spark, src):
    root, path = src
    fv = FeatureView(
        name="inferred",
        entities=[Entity("driver", "driver_id")],
        source=ParquetSource(
            path=path, timestamp_field="event_timestamp",
            created_timestamp_column="created",
            field_mapping={"driver": "driver_id"},  # inference runs POST-mapping
        ),
    )
    _store(spark, root).apply([fv])
    # ts/created excluded; join key present in schema but not in features
    assert {f.name for f in fv.schema} == {"driver_id", "rate", "n_trips"}
    assert sorted(fv.feature_names) == ["n_trips", "rate"]
    by_name = {f.name: f.dtype for f in fv.schema}
    assert by_name["rate"] == "double" and by_name["n_trips"] == "bigint"


def test_missing_join_key_raises(spark, src):
    root, path = src
    fv = FeatureView(
        name="bad_key",
        entities=[Entity("nope", "not_a_column")],
        source=ParquetSource(path=path, timestamp_field="event_timestamp"),
    )
    with pytest.raises(ValueError, match="join key 'not_a_column' not present"):
        _store(spark, root).apply([fv])


def test_entity_dtype_mismatch_raises(spark, src):
    root, path = src
    fv = FeatureView(
        name="bad_entity_dtype",
        entities=[Entity("driver", "driver", dtype="string")],  # source: bigint
        source=ParquetSource(path=path, timestamp_field="event_timestamp"),
    )
    with pytest.raises(ValueError, match="does not match the inferred type"):
        _store(spark, root).apply([fv])


def test_entity_dtype_synonyms_accepted(spark, src):
    root, path = src
    fv = FeatureView(
        name="ok_entity_dtype",
        entities=[Entity("driver", "driver", dtype="int64")],  # == bigint
        source=ParquetSource(path=path, timestamp_field="event_timestamp"),
    )
    _store(spark, root).apply([fv])  # no raise


def test_declared_field_drift_raises(spark, src):
    root, path = src
    fv = FeatureView(
        name="drift",
        entities=[Entity("driver", "driver")],
        source=ParquetSource(path=path, timestamp_field="event_timestamp"),
        schema=[Field("driver", "bigint"), Field("rate", "string")],  # src: double
    )
    with pytest.raises(ValueError, match="declared as string but source column"):
        _store(spark, root).apply([fv])

    fv2 = FeatureView(
        name="ghost",
        entities=[Entity("driver", "driver")],
        source=ParquetSource(path=path, timestamp_field="event_timestamp"),
        schema=[Field("ghost_col", "double")],
    )
    with pytest.raises(ValueError, match="declared field 'ghost_col' not present"):
        _store(spark, root).apply([fv2])
