"""Registry diff / plan surface (core/diff.py + FeatureStore.plan).

Reference semantics: diff/registry_diff.py (4-way keep/delete/update/add
tagging, field-level PropertyDiffs with ignored fields, UDF-body-ignoring
transformation diff), diff/property_diff.py (TransitionType),
feature_store.py:1370 (plan = dry run, desired state is total).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd
import pytest

from feast_spark.core import (
    Entity,
    FeatureService,
    FeatureStore,
    FeatureView,
    Field,
    OnDemandFeatureView,
    ParquetSource,
)
from feast_spark.core.diff import (
    TransitionType,
    diff_specs,
    object_spec,
    tag_keep_delete_update_add,
)


@pytest.fixture(scope="module")
def src_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("diff_src")
    pdf = pd.DataFrame(
        {
            "driver_id": [1, 2],
            "event_timestamp": pd.to_datetime(
                ["2024-01-01", "2024-01-02"]
            ).astype("datetime64[us]"),
            "conv_rate": [0.1, 0.2],
            "trips": [3, 4],
        }
    )
    p = str(root / "stats.parquet")
    pdf.to_parquet(p)
    return p


def _objs(src_path, ttl=3600):
    driver = Entity("driver", "driver_id")
    fv = FeatureView(
        name="driver_stats",
        entities=[driver],
        source=ParquetSource(path=src_path, timestamp_field="event_timestamp"),
        schema=[Field("conv_rate", "double"), Field("trips", "bigint")],
        ttl_seconds=ttl,
    )
    svc = FeatureService("serving", ("driver_stats:conv_rate",))
    return [driver, fv, svc]


def _store(spark, tmp_path):
    return FeatureStore(spark, str(tmp_path))


# ------------------------------------------------------------- unit level


def test_tagging_four_way():
    existing = {("feature_view", "a"): {}, ("feature_view", "b"): {}}
    desired = {("feature_view", "b"): {}, ("feature_view", "c"): {}}
    keep, delete, update, add = tag_keep_delete_update_add(existing, desired)
    assert keep == {("feature_view", "b")}
    assert delete == {("feature_view", "a")}
    assert update == {("feature_view", "b")}
    assert add == {("feature_view", "c")}


def test_property_diff_flattens_source_and_ignores_type_tag():
    cur = {
        "object_type": "feature_view",
        "ttl_seconds": 10,
        "source": {"kind": "parquet", "path": "/a", "timestamp_field": "ts"},
    }
    new = {
        "object_type": "something_else",  # ignored field
        "ttl_seconds": 20,
        "source": {"kind": "parquet", "path": "/b", "timestamp_field": "ts"},
    }
    diffs = {d.property_name: d for d in diff_specs(cur, new)}
    assert set(diffs) == {"ttl_seconds", "source.path"}
    assert diffs["source.path"].val_existing == "/a"
    assert diffs["source.path"].val_declared == "/b"


def test_odfv_spec_ignores_udf_body():
    # reference registry_diff.py:171-173 skips the udf "body" field: a
    # re-deploy of an identical repo (new function objects, same code)
    # must plan as no-op; a RENAMED transform still diffs
    def txn(df):
        return df.assign(x=1)

    a = OnDemandFeatureView("odfv", udf=txn, schema=[Field("x", "bigint")])

    def txn(df):  # noqa: F811 — same name, different body
        return df.assign(x=2)

    b = OnDemandFeatureView("odfv", udf=txn, schema=[Field("x", "bigint")])
    assert object_spec(a) == object_spec(b)

    def other(df):
        return df

    c = OnDemandFeatureView("odfv", udf=other, schema=[Field("x", "bigint")])
    assert object_spec(a) != object_spec(c)


# ------------------------------------------------------------ store level


def test_plan_on_empty_registry_is_all_creates(spark, tmp_path, src_path):
    store = _store(spark, tmp_path)
    diff = store.plan(_objs(src_path))
    assert {d.transition_type for d in diff.object_diffs} == {
        TransitionType.CREATE
    }
    assert {(d.object_type, d.name) for d in diff.changes} == {
        ("entity", "driver"),
        ("feature_view", "driver_stats"),
        ("feature_service", "serving"),
    }
    assert not diff.is_noop and diff.warnings == []
    # dry run: nothing written
    assert store.registry.list_views() == []


def test_plan_after_apply_is_noop(spark, tmp_path, src_path):
    store = _store(spark, tmp_path)
    store.apply(_objs(src_path))
    diff = store.plan(_objs(src_path))
    assert diff.is_noop
    assert diff.to_string() == "No changes to registry"
    # and every object planned UNCHANGED, not merely absent
    assert {d.transition_type for d in diff.object_diffs} == {
        TransitionType.UNCHANGED
    }


def test_plan_update_reports_property_diffs_and_ttl_warning(
    spark, tmp_path, src_path
):
    store = _store(spark, tmp_path)
    store.apply(_objs(src_path, ttl=3600))
    diff = store.plan(_objs(src_path, ttl=60))
    changed = diff.changes
    assert len(changed) == 1
    d = changed[0]
    assert (d.object_type, d.name) == ("feature_view", "driver_stats")
    assert d.transition_type == TransitionType.UPDATE
    props = {p.property_name: p for p in d.property_diffs}
    assert props["ttl_seconds"].val_existing == 3600
    assert props["ttl_seconds"].val_declared == 60
    assert any("ttl narrows" in w for w in d.warnings)
    out = diff.to_string()
    assert "Updated feature_view driver_stats" in out
    assert "ttl_seconds: 3600 -> 60" in out


def test_plan_delete_of_materialized_view_warns_destructive(
    spark, tmp_path, src_path
):
    store = _store(spark, tmp_path)
    store.apply(_objs(src_path))
    store.registry.apply_materialization(
        "driver_stats",
        datetime(2024, 1, 1, tzinfo=timezone.utc),
        datetime(2024, 1, 2, tzinfo=timezone.utc),
    )
    objs = [o for o in _objs(src_path) if getattr(o, "name", "") != "driver_stats"]
    diff = store.plan(objs)
    dels = [
        d for d in diff.changes if d.transition_type == TransitionType.DELETE
    ]
    assert [(d.object_type, d.name) for d in dels] == [
        ("feature_view", "driver_stats")
    ]
    assert any("DESTRUCTIVE" in w for w in dels[0].warnings)
    assert "! DESTRUCTIVE" in diff.to_string()


def test_plan_join_key_and_feature_drop_warnings(spark, tmp_path, src_path):
    store = _store(spark, tmp_path)
    store.apply(_objs(src_path))
    # change the entity join key AND drop a declared feature
    other = Entity("driver", "trips")  # trips doubles as a (bad) key here
    fv = FeatureView(
        name="driver_stats",
        entities=[other],
        source=ParquetSource(path=src_path, timestamp_field="event_timestamp"),
        schema=[Field("conv_rate", "double")],
        ttl_seconds=3600,
    )
    diff = store.plan([other, fv, FeatureService("serving", ("driver_stats:conv_rate",))])
    d = next(
        x
        for x in diff.changes
        if (x.object_type, x.name) == ("feature_view", "driver_stats")
    )
    assert any("join keys change" in w for w in d.warnings)
    assert any("features removed" in w and "trips" in w for w in d.warnings)


def test_apply_diff_roundtrip_and_delete(spark, tmp_path, src_path):
    store = _store(spark, tmp_path)
    diff = store.plan(_objs(src_path))
    store.apply_diff(diff)
    assert set(store.registry.list_views()) == {
        "driver",
        "driver_stats",
        "serving",
    }
    # re-plan: converged
    assert store.plan(_objs(src_path)).is_noop
    # now a plan dropping the service, applied, deletes it everywhere
    objs = [o for o in _objs(src_path) if getattr(o, "name", "") != "serving"]
    diff2 = store.plan(objs)
    assert [
        (d.transition_type, d.name) for d in diff2.changes
    ] == [(TransitionType.DELETE, "serving")]
    store.apply_diff(diff2)
    assert "serving" not in store.registry.list_views()
    assert store.plan(objs).is_noop


def test_cli_plan_and_apply(spark, tmp_path, src_path):
    from feast_spark.cli import plan_main

    repo_file = tmp_path / "defs.py"
    repo_file.write_text(
        "from feast_spark.core import Entity, FeatureView, Field, ParquetSource\n"
        "driver = Entity('driver', 'driver_id')\n"
        "fv = FeatureView(name='driver_stats', entities=[driver],\n"
        f"    source=ParquetSource(path={src_path!r},\n"
        "        timestamp_field='event_timestamp'),\n"
        "    schema=[Field('conv_rate', 'double')], ttl_seconds=60)\n"
    )
    store_dir = str(tmp_path / "store")
    args = ["--repo", str(repo_file), "--store", store_dir, "--cpus", "2"]
    # plan: dry-run, registry untouched
    assert plan_main(args, do_apply=False) == 0
    store = FeatureStore(spark, store_dir)
    assert store.registry.list_views() == []
    # apply: module-level objects are collected (no OBJECTS list) and land
    assert plan_main(args, do_apply=True) == 0
    assert set(store.registry.list_views()) == {"driver", "driver_stats"}
