"""FeatureStore facade: historical retrieval vs naive oracle,
materialize/incremental checkpoints, latest-feature reads, ODFV.

Fixture mirrors the reference's driver_test_data.py shapes (FIXTURES §4):
a feature table with deliberate duplicate+late rows so created_ts
tie-breaking is exercised (driver_test_data.py:88-178 plants those)."""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pytest

from feast_spark.core import Entity, FeatureStore, FeatureView, Field, OnDemandFeatureView, ParquetSource


def _mk(ts: str) -> datetime:
    return datetime.fromisoformat(ts)


@pytest.fixture(scope="module")
def repo(tmp_path_factory, spark):
    root = tmp_path_factory.mktemp("fs_repo")
    rng = np.random.default_rng(0)

    # feature rows: 5 drivers x hourly stats, plus duplicate keys with a
    # later created ts and a sentinel value (must win the dedup)
    rows = []
    for d in range(5):
        for h in range(24):
            rows.append(
                {
                    "driver_id": d,
                    "event_timestamp": _mk("2024-01-01") + timedelta(hours=h),
                    "created": _mk("2024-01-02"),
                    "conv_rate": float(rng.random()),
                    "trips": int(rng.integers(0, 100)),
                }
            )
    dup = dict(rows[10])
    dup["created"] = _mk("2024-01-03")
    dup["conv_rate"] = 999.0
    rows.append(dup)
    feats = pd.DataFrame(rows)
    for c in ("event_timestamp", "created"):
        feats[c] = feats[c].astype("datetime64[us]")  # Spark can't read NANOS
    fpath = str(root / "driver_stats.parquet")
    feats.to_parquet(fpath)

    store = FeatureStore(spark, str(root))
    driver = Entity("driver", "driver_id")
    fv = FeatureView(
        name="driver_stats",
        entities=[driver],
        source=ParquetSource(
            path=fpath, timestamp_field="event_timestamp",
            created_timestamp_column="created",
        ),
        schema=[Field("driver_id", "int64"), Field("conv_rate", "float64"), Field("trips", "int64")],
        ttl_seconds=6 * 3600,
    )

    def add_rate_per_trip(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["rate_per_trip"] = pdf["conv_rate"] / (pdf["trips"] + 1)
        return pdf

    odfv = OnDemandFeatureView(
        name="derived", udf=add_rate_per_trip,
        schema=[Field("rate_per_trip", "double")],
    )
    store.apply([fv, odfv])
    return store, feats


def _naive_pit(feats: pd.DataFrame, driver_id: int, ts: datetime, ttl_s: int):
    """feature_records.py:23-47 find_latest_record shape."""
    rows = feats[
        (feats.driver_id == driver_id)
        & (feats.event_timestamp <= ts)
        & (feats.event_timestamp >= ts - timedelta(seconds=ttl_s))
    ]
    if rows.empty:
        return None
    return rows.sort_values(["event_timestamp", "created"]).iloc[-1]


def test_historical_features_match_naive_oracle(spark, repo):
    store, feats = repo
    entity_rows = [
        (d, _mk("2024-01-01") + timedelta(hours=h, minutes=30))
        for d in range(5)
        for h in [0, 3, 11, 23]
    ] + [(0, _mk("2023-12-31"))]  # before any feature -> NULL
    entity_df = spark.createDataFrame(
        pd.DataFrame(entity_rows, columns=["driver_id", "event_timestamp"])
    )
    got = (
        store.get_historical_features(
            entity_df, ["driver_stats:conv_rate", "driver_stats:trips"]
        )
        .toPandas()
        .sort_values(["driver_id", "event_timestamp"])
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        exp = _naive_pit(feats, row.driver_id, row.event_timestamp, 6 * 3600)
        if exp is None:
            assert pd.isna(row.conv_rate)
        else:
            assert row.conv_rate == exp.conv_rate, (row.driver_id, row.event_timestamp)
            assert row.trips == exp.trips


def test_created_ts_tiebreak_wins(spark, repo):
    store, feats = repo
    # the planted duplicate (driver 0, hour 10) has created one day later
    # and conv_rate 999 — the PIT join must surface it
    entity_df = spark.createDataFrame(
        pd.DataFrame([(0, _mk("2024-01-01") + timedelta(hours=10, minutes=5))],
                     columns=["driver_id", "event_timestamp"])
    )
    got = store.get_historical_features(entity_df, ["driver_stats:conv_rate"]).toPandas()
    assert got.conv_rate.iloc[0] == 999.0


def test_odfv_appends_columns(spark, repo):
    store, _ = repo
    entity_df = spark.createDataFrame(
        pd.DataFrame([(1, _mk("2024-01-01") + timedelta(hours=5))],
                     columns=["driver_id", "event_timestamp"])
    )
    got = store.get_historical_features(
        entity_df,
        ["driver_stats:conv_rate", "driver_stats:trips", "derived:rate_per_trip"],
    ).toPandas()
    assert "rate_per_trip" in got.columns
    assert got.rate_per_trip.iloc[0] == pytest.approx(
        got.conv_rate.iloc[0] / (got.trips.iloc[0] + 1)
    )


def test_materialize_and_latest_read(spark, repo):
    store, feats = repo
    out = store.materialize("driver_stats", _mk("2024-01-01"), _mk("2024-01-02"))
    got = out.toPandas()
    assert len(got) == 5  # one latest row per driver
    # driver 0's latest within window is hour 23
    assert got[got.driver_id == 0].event_timestamp.iloc[0] == _mk("2024-01-01") + timedelta(hours=23)

    latest = store.get_latest_features("driver_stats").toPandas()
    assert len(latest) == 5

    # staleness nulling: as_of far in the future + ttl -> features nulled
    stale = store.get_latest_features(
        "driver_stats", as_of=_mk("2024-06-01")
    ).toPandas()
    assert stale.conv_rate.isna().all()


def test_materialize_incremental_resumes(spark, repo):
    store, _ = repo
    assert store.registry.most_recent_end_time("driver_stats") == _mk("2024-01-02")
    out = store.materialize_incremental("driver_stats", _mk("2024-01-03"))
    assert len(out.toPandas()) == 5
    assert store.registry.most_recent_end_time("driver_stats") == _mk("2024-01-03")


def test_store_introspection(spark, repo):
    from feast_spark.core import FeatureService

    store, _feats = repo
    store.apply([FeatureService("svc", ("driver_stats:conv_rate",))])
    names = [v.name for v in store.list_feature_views()]
    assert len(names) == 1
    assert store.get_feature_view(names[0]).name == names[0]
    assert len(store.list_on_demand_feature_views()) == 1
    assert store.get_feature_service("svc").features == ("driver_stats:conv_rate",)
    import pytest

    with pytest.raises(ValueError):
        store.get_feature_view("nope")


def test_concurrent_materialize_serializable(spark, tmp_path):
    """Two writers materialize DISJOINT intervals of the same view
    concurrently: the CAS snapshot commit + locked registry must yield
    serializable snapshots — no lost update (round-2 VERDICT Next #3).
    Repeated across barriers via threads racing on the same store."""
    import threading

    root = tmp_path / "conc_repo"
    rows = []
    for d in range(40):
        rows.append(
            {
                "driver_id": d,
                "event_timestamp": _mk("2024-01-01 12:00:00")
                if d < 20
                else _mk("2024-01-02 12:00:00"),
                "created": _mk("2024-01-03"),
                "conv_rate": float(d),
            }
        )
    feats = pd.DataFrame(rows)
    for c in ("event_timestamp", "created"):
        feats[c] = feats[c].astype("datetime64[us]")
    fpath = str(root / "src.parquet")
    root.mkdir()
    feats.to_parquet(fpath)

    store = FeatureStore(spark, str(root))
    fv = FeatureView(
        name="conc",
        entities=[Entity("driver", "driver_id")],
        source=ParquetSource(
            path=fpath, timestamp_field="event_timestamp",
            created_timestamp_column="created",
        ),
        schema=[Field("driver_id", "bigint"), Field("conv_rate", "double")],
    )
    store.apply([fv])

    errs: list[Exception] = []

    def run(start: str, end: str) -> None:
        try:
            store.materialize("conc", _mk(start), _mk(end))
        except Exception as e:  # surface in main thread
            errs.append(e)

    t1 = threading.Thread(target=run, args=("2024-01-01", "2024-01-02"))
    t2 = threading.Thread(target=run, args=("2024-01-02", "2024-01-03"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs

    # serializable: two distinct committed snapshots, and the latest one
    # contains BOTH writers' keys (the later committer re-merged)
    snaps = store.list_snapshots("conc")
    assert len(snaps) == 2 and snaps == sorted(snaps)
    final = store.read_snapshot("conc").toPandas()
    assert sorted(final.driver_id) == list(range(40))
    # registry recorded both intervals (locked read-modify-write)
    iv = store.registry.materialization_intervals("conc")
    assert len(iv) == 2
    assert {x["start"][:10] for x in iv} == {"2024-01-01", "2024-01-02"}

    # deterministic CAS check: committing against a stale base must lose
    stale = store._try_commit_snapshot(
        "conc", store.read_snapshot("conc"), base=None
    )
    assert stale is None  # snap-00000 already exists -> caller must retry
    assert len(store.list_snapshots("conc")) == 2  # nothing extra committed


def test_concurrent_materialize_overlapping_intervals(spark, tmp_path):
    """Round-3 verdict Next #8: the disjoint-interval pair proves no lost
    update; OVERLAPPING intervals additionally race the same KEYS through
    the re-merge, so the final snapshot must resolve every key to its
    latest (ts, created) row regardless of commit order."""
    import threading

    root = tmp_path / "conc_overlap"
    rows = []
    for d in range(30):
        # every key has one row on day 1 and one on day 2; both writers'
        # windows include day 2, so both observe the same latest rows
        for day, rate in (("2024-01-01 10:00:00", 1.0), ("2024-01-02 10:00:00", 2.0)):
            rows.append(
                {
                    "driver_id": d,
                    "event_timestamp": _mk(day),
                    "created": _mk("2024-01-03"),
                    "conv_rate": rate + d,
                }
            )
    feats = pd.DataFrame(rows)
    for c in ("event_timestamp", "created"):
        feats[c] = feats[c].astype("datetime64[us]")
    root.mkdir()
    fpath = str(root / "src.parquet")
    feats.to_parquet(fpath)

    store = FeatureStore(spark, str(root))
    fv = FeatureView(
        name="ovl",
        entities=[Entity("driver", "driver_id")],
        source=ParquetSource(
            path=fpath, timestamp_field="event_timestamp",
            created_timestamp_column="created",
        ),
        schema=[Field("driver_id", "bigint"), Field("conv_rate", "double")],
    )
    store.apply([fv])

    errs: list[Exception] = []

    def run(start: str, end: str) -> None:
        try:
            store.materialize("ovl", _mk(start), _mk(end))
        except Exception as e:
            errs.append(e)

    t1 = threading.Thread(target=run, args=("2024-01-01", "2024-01-03"))
    t2 = threading.Thread(target=run, args=("2024-01-01 12:00:00", "2024-01-03"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    snaps = store.list_snapshots("ovl")
    assert len(snaps) == 2 and snaps == sorted(snaps)
    final = store.read_snapshot("ovl").toPandas().set_index("driver_id")
    assert sorted(final.index) == list(range(30))
    # every key resolved to its day-2 (latest) row in the final snapshot
    assert all(final.conv_rate[d] == 2.0 + d for d in range(30))
    iv = store.registry.materialization_intervals("ovl")
    assert len(iv) == 2


def test_crashed_writer_tmp_dir_recovery(spark, tmp_path):
    """A writer that died after its parquet write but before the rename
    CAS leaves an orphaned .tmp-* staging dir: readers never see it, the
    next materialize commits cleanly past it, and vacuum_serving removes
    it once stale — while sparing RECENT staging dirs (a live writer)."""
    import os
    import time

    root = tmp_path / "crash_repo"
    feats = pd.DataFrame(
        {
            "driver_id": [1, 2],
            "event_timestamp": pd.to_datetime(
                ["2024-01-01 10:00:00"] * 2
            ).astype("datetime64[us]"),
            "created": pd.to_datetime(["2024-01-02"] * 2).astype("datetime64[us]"),
            "conv_rate": [0.5, 0.6],
        }
    )
    root.mkdir()
    fpath = str(root / "src.parquet")
    feats.to_parquet(fpath)
    store = FeatureStore(spark, str(root))
    fv = FeatureView(
        name="crash",
        entities=[Entity("driver", "driver_id")],
        source=ParquetSource(
            path=fpath, timestamp_field="event_timestamp",
            created_timestamp_column="created",
        ),
        schema=[Field("driver_id", "bigint"), Field("conv_rate", "double")],
    )
    store.apply([fv])

    # simulate the crash: stale staging dir with old mtime + a fresh one
    d = store._serving_dir("crash")
    os.makedirs(d, exist_ok=True)
    stale = os.path.join(d, ".tmp-deadwriter")
    fresh = os.path.join(d, ".tmp-livewriter")
    for p in (stale, fresh):
        os.makedirs(p)
        with open(os.path.join(p, "part-0.parquet"), "wb") as f:
            f.write(b"partial garbage")
    old = time.time() - 7200
    os.utime(stale, (old, old))

    # readers and committers ignore staging dirs entirely
    assert store.list_snapshots("crash") == []
    store.materialize("crash", _mk("2024-01-01"), _mk("2024-01-02"))
    assert store.list_snapshots("crash") == ["snap-00000"]
    got = store.read_snapshot("crash").toPandas()
    assert sorted(got.driver_id) == [1, 2]

    # vacuum removes only the stale dir
    assert store.vacuum_serving("crash", max_age_sec=3600) == 1
    left = {n for n in os.listdir(d) if n.startswith(".tmp-")}
    assert left == {".tmp-livewriter"}
    # a second vacuum with age 0 sweeps the rest
    assert store.vacuum_serving("crash", max_age_sec=0) == 1


def test_optimize_serving_compacts_and_clusters(spark, tmp_path):
    """Compaction rewrites the many-small-file snapshot into few
    key-clustered files via the same CAS chain; content identical, old
    snapshot still time-travel readable; expire_snapshots bounds
    retention but always keeps the latest."""
    root = tmp_path / "opt_repo"
    rows = [
        {
            "driver_id": d,
            "event_timestamp": _mk("2024-01-01 12:00:00"),
            "created": _mk("2024-01-02"),
            "conv_rate": float(d),
        }
        for d in range(200)
    ]
    feats = pd.DataFrame(rows)
    for c in ("event_timestamp", "created"):
        feats[c] = feats[c].astype("datetime64[us]")
    root.mkdir()
    fpath = str(root / "src.parquet")
    feats.to_parquet(fpath)

    store = FeatureStore(spark, str(root))
    fv = FeatureView(
        name="opt",
        entities=[Entity("driver", "driver_id")],
        source=ParquetSource(
            path=fpath, timestamp_field="event_timestamp",
            created_timestamp_column="created",
        ),
        schema=[Field("driver_id", "bigint"), Field("conv_rate", "double")],
    )
    store.apply([fv])
    store.materialize("opt", _mk("2024-01-01"), _mk("2024-01-03"))

    # fragment the snapshot: commit a 16-file rewrite to simulate a
    # writer-parallelism-sized materialization
    latest = store.read_snapshot("opt")
    store._commit_snapshot("opt", latest.repartition(16))
    before = store.read_snapshot("opt")
    import os as _os

    frag_dir = store._latest_snapshot("opt")
    n_frag = len([f for f in _os.listdir(frag_dir) if f.endswith(".parquet")])
    assert n_frag >= 16

    stats = store.optimize_serving("opt", target_file_mb=128)
    assert stats["files_before"] >= 16
    assert stats["files_after"] == 1  # 200 tiny rows fit one target file
    after = store.read_snapshot("opt")
    got = sorted((r.driver_id, r.conv_rate) for r in after.collect())
    exp = sorted((r.driver_id, r.conv_rate) for r in before.collect())
    assert got == exp

    # key clustering: the single output file is sorted by the join key
    ids = [r.driver_id for r in after.collect()]
    assert ids == sorted(ids)

    # time travel: the pre-compaction snapshot still reads
    snaps = store.list_snapshots("opt")
    assert len(snaps) == 3
    assert store.read_snapshot("opt", snaps[-2]).count() == 200

    # retention: expire all but latest; latest always survives
    assert store.expire_snapshots("opt", keep_last=1) == 2
    assert store.list_snapshots("opt") == [stats["snapshot"]]
    assert store.read_snapshot("opt").count() == 200
    assert store.expire_snapshots("opt", keep_last=0) == 0  # floors at 1


def test_optimize_serving_requires_materialization(spark, tmp_path):
    root = tmp_path / "opt_empty"
    root.mkdir()
    rows = pd.DataFrame(
        {
            "driver_id": [1],
            "event_timestamp": pd.Series([_mk("2024-01-01")]).astype("datetime64[us]"),
            "created": pd.Series([_mk("2024-01-01")]).astype("datetime64[us]"),
            "conv_rate": [1.0],
        }
    )
    fpath = str(root / "src.parquet")
    rows.to_parquet(fpath)
    store = FeatureStore(spark, str(root))
    fv = FeatureView(
        name="nomat",
        entities=[Entity("driver", "driver_id")],
        source=ParquetSource(
            path=fpath, timestamp_field="event_timestamp",
            created_timestamp_column="created",
        ),
        schema=[Field("driver_id", "bigint"), Field("conv_rate", "double")],
    )
    store.apply([fv])
    with pytest.raises(ValueError, match="not materialized"):
        store.optimize_serving("nomat")


def test_erase_keys_removes_subject_rows(spark, tmp_path):
    """GDPR erasure: the subject's rows vanish from serving, everyone
    else's survive byte-identical, and history is expired by default so
    time travel cannot resurrect the erased rows."""
    root = tmp_path / "erase_repo"
    rows = [
        {
            "driver_id": d,
            "event_timestamp": _mk("2024-01-01 12:00:00"),
            "created": _mk("2024-01-02"),
            "conv_rate": float(d),
        }
        for d in range(50)
    ]
    feats = pd.DataFrame(rows)
    for c in ("event_timestamp", "created"):
        feats[c] = feats[c].astype("datetime64[us]")
    root.mkdir()
    fpath = str(root / "src.parquet")
    feats.to_parquet(fpath)

    store = FeatureStore(spark, str(root))
    fv = FeatureView(
        name="er",
        entities=[Entity("driver", "driver_id")],
        source=ParquetSource(
            path=fpath, timestamp_field="event_timestamp",
            created_timestamp_column="created",
        ),
        schema=[Field("driver_id", "bigint"), Field("conv_rate", "double")],
    )
    store.apply([fv])
    store.materialize("er", _mk("2024-01-01"), _mk("2024-01-03"))
    # a second snapshot so expire_history has history to remove
    store._commit_snapshot("er", store.read_snapshot("er"))
    import os as _os

    serving = store._serving_dir("er")
    assert len([d for d in _os.listdir(serving) if d.startswith("snap-")]) == 2

    erase = spark.createDataFrame([(7,), (13,), (999,)], "driver_id bigint")
    stats = store.erase_keys("er", erase)
    assert stats["rows_before"] == 50
    assert stats["rows_erased"] == 2  # 999 never existed
    assert stats["rows_after"] == 48
    assert stats["snapshots_expired"] == 2
    got = {r.driver_id for r in store.read_snapshot("er").collect()}
    assert got == set(range(50)) - {7, 13}
    # only the erased snapshot remains on disk — nothing to time-travel to
    assert [d for d in _os.listdir(serving) if d.startswith("snap-")] == [
        stats["snapshot"]
    ]


def test_erase_keys_survives_concurrent_materialize(spark, tmp_path):
    """A writer landing a snapshot between the erasure's read and commit
    makes the CAS lose; the retry re-reads the NEW latest, so the final
    state has the subject erased from the concurrent write too."""
    root = tmp_path / "erase_race"
    rows = [
        {
            "driver_id": d,
            "event_timestamp": _mk("2024-01-01 12:00:00"),
            "created": _mk("2024-01-02"),
            "conv_rate": float(d),
        }
        for d in range(10)
    ]
    feats = pd.DataFrame(rows)
    for c in ("event_timestamp", "created"):
        feats[c] = feats[c].astype("datetime64[us]")
    root.mkdir()
    fpath = str(root / "src.parquet")
    feats.to_parquet(fpath)

    store = FeatureStore(spark, str(root))
    fv = FeatureView(
        name="race",
        entities=[Entity("driver", "driver_id")],
        source=ParquetSource(
            path=fpath, timestamp_field="event_timestamp",
            created_timestamp_column="created",
        ),
        schema=[Field("driver_id", "bigint"), Field("conv_rate", "double")],
    )
    store.apply([fv])
    store.materialize("race", _mk("2024-01-01"), _mk("2024-01-03"))

    # simulate the race: steal the CAS exactly once between read+commit
    orig = store._try_commit_snapshot
    stolen = {"done": False}

    def racing(view, df, base):
        if not stolen["done"]:
            stolen["done"] = True
            # concurrent writer re-adds driver 3 with a new value
            from pyspark.sql import functions as F

            cur = store.read_snapshot("race")
            add = cur.filter("driver_id = 3").withColumn("conv_rate", F.lit(99.0))
            assert orig(view, cur.unionByName(add), base) is not None
        return orig(view, df, base)

    store._try_commit_snapshot = racing
    stats = store.erase_keys("race", spark.createDataFrame([(3,)], "driver_id bigint"))
    store._try_commit_snapshot = orig
    assert stolen["done"]
    # the retry saw 11 rows (10 + the racing re-add) and erased both 3s
    assert stats["rows_before"] == 11 and stats["rows_erased"] == 2
    got = {r.driver_id for r in store.read_snapshot("race").collect()}
    assert 3 not in got and len(got) == 9


def test_erase_keys_validation(spark, tmp_path):
    root = tmp_path / "erase_val"
    root.mkdir()
    feats = pd.DataFrame(
        {
            "driver_id": [1],
            "event_timestamp": [_mk("2024-01-01")],
            "created": [_mk("2024-01-01")],
            "x": [1.0],
        }
    )
    for c in ("event_timestamp", "created"):
        feats[c] = feats[c].astype("datetime64[us]")
    fpath = str(root / "src.parquet")
    feats.to_parquet(fpath)
    store = FeatureStore(spark, str(root))
    fv = FeatureView(
        name="nv",
        entities=[Entity("driver", "driver_id")],
        source=ParquetSource(
            path=fpath, timestamp_field="event_timestamp",
            created_timestamp_column="created",
        ),
        schema=[Field("driver_id", "bigint"), Field("x", "double")],
    )
    store.apply([fv])
    with pytest.raises(ValueError, match="missing join keys"):
        store.erase_keys("nv", spark.createDataFrame([(1,)], "other bigint"))
    with pytest.raises(ValueError, match="not materialized"):
        store.erase_keys("nv", spark.createDataFrame([(1,)], "driver_id bigint"))
