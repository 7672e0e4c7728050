"""FeatureStore facade — the reference's three entry points on Spark.

- :meth:`get_historical_features` <- feature_store.py:1942-2106 ->
  offline store PIT query (spark.py:168-355): entity_df + N feature views
  joined left-to-right accumulating columns (dask.py:212-349 driver loop),
  ODFV transforms applied post-join (offline_store.py:219-272).
- :meth:`materialize` <- feature_store.py:2788-3001 + SparkComputeEngine
  (spark/compute.py:87-195): pull-latest in [start, end], apply view UDF,
  write the keyed serving table, record the interval in the registry.
- :meth:`get_latest_features` <- the batch analogue of
  get_online_features (feature_store.py:3855): read the serving table,
  latest row per key (+ TTL staleness nulling).

Serving tables are snapshot directories (``snap-<n>`` + ``LATEST``
pointer) — the sandbox stand-in for Iceberg's snapshot isolation: writers
never mutate a snapshot a reader may be scanning, and a failed write
leaves the pointer untouched (idempotent resume).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feast_spark.core.model import (
    FeatureService,
    FeatureView,
    OnDemandFeatureView,
)
from feast_spark.core.registry import Registry
from feast_spark.operators.latest import latest_per_key, pull_latest
from feast_spark.operators.pit_join import point_in_time_join


class FeatureStore:
    def __init__(self, spark: SparkSession, repo_path: str):
        self.spark = spark
        self.repo_path = repo_path
        self.registry = Registry(os.path.join(repo_path, "registry.json"))
        self._views: dict[str, FeatureView] = {}
        self._odfvs: dict[str, OnDemandFeatureView] = {}
        self._services: dict[str, FeatureService] = {}
        self._stream_views: dict = {}
        self._label_views: dict = {}

    # -- apply ---------------------------------------------------------------
    def _runtime_map(self, obj) -> dict | None:
        """The in-memory map an object type lives in (None for types that
        are registry-only, e.g. entities)."""
        from feast_spark.core.model import Entity
        from feast_spark.operators.labels import LabelView
        from feast_spark.streaming.views import StreamFeatureView

        if isinstance(obj, OnDemandFeatureView):
            return self._odfvs
        if isinstance(obj, LabelView):
            return self._label_views
        if isinstance(obj, StreamFeatureView):
            return self._stream_views
        if isinstance(obj, FeatureView):
            return self._views
        if isinstance(obj, FeatureService):
            return self._services
        if isinstance(obj, Entity):
            return None
        raise TypeError(f"cannot apply {type(obj).__name__}")

    def _inferred(self, obj):
        """Run schema inference/validation where the type needs it (the
        reference runs the same inferences in both apply and plan —
        feature_store.py plan's _make_inferences)."""
        if isinstance(obj, FeatureView):
            from feast_spark.core.inference import infer_and_validate

            infer_and_validate(obj, self.spark)
        return obj

    def apply(self, objs: list) -> None:
        from feast_spark.core.diff import object_spec

        for obj in objs:
            runtime = self._runtime_map(obj)
            _otype, name, spec = object_spec(self._inferred(obj))
            if runtime is not None:
                runtime[name] = obj
            self.registry.apply_view(name, spec)

    # -- plan / diff (reference diff/registry_diff.py via core/diff.py) ------
    def plan(self, desired_objs: list):
        """Dry-run of ``apply(desired_objs)`` against the persisted
        registry: returns a RegistryDiff of created/deleted/updated
        objects with property-level diffs and transition warnings.
        Nothing is written (reference ``feature_store.py:1370`` plan).

        Like the reference, the desired state is TOTAL: objects present
        in the registry but absent from ``desired_objs`` plan as
        deletions."""
        from feast_spark.core.diff import diff_between, object_spec

        desired_specs: dict = {}
        desired_objects: dict = {}
        for obj in desired_objs:
            otype, name, spec = object_spec(self._inferred(obj))
            desired_specs[(otype, name)] = spec
            desired_objects[(otype, name)] = obj
        self.registry._reload()
        existing = {}
        for name, spec in self.registry._state.get("views", {}).items():
            otype = spec.get("object_type", "feature_view")
            existing[(otype, name)] = spec
        intervals = self.registry._state.get("materialization_intervals", {})
        materialized = {v for v, iv in intervals.items() if iv}
        return diff_between(
            existing, desired_specs, desired_objects, materialized
        )

    def apply_diff(self, diff) -> None:
        """Apply a plan: deletes drop the registry record + runtime
        object; creates/updates re-apply the desired object (reference
        ``apply_diff_to_registry`` — an update needs no delete, applying
        the new object replaces the record)."""
        from feast_spark.core.diff import TransitionType

        for d in diff.object_diffs:
            if d.transition_type == TransitionType.DELETE:
                self.registry.delete_view(d.name)
                for m in (
                    self._views,
                    self._odfvs,
                    self._services,
                    self._stream_views,
                    self._label_views,
                ):
                    m.pop(d.name, None)
            elif d.transition_type in (
                TransitionType.CREATE,
                TransitionType.UPDATE,
            ):
                if d.new_object is None:  # pragma: no cover - defensive
                    raise ValueError(
                        f"diff for {d.name!r} carries no object to apply"
                    )
                self.apply([d.new_object])

    def get_label_view(self, name: str):
        if name not in self._label_views:
            raise ValueError(f"unknown label view: {name}")
        return self._label_views[name]

    def get_labels(self, view_name: str) -> DataFrame:
        """Conflict-resolved labels for offline reads — the reference
        enforces ``conflict_policy`` on every batch/offline read while the
        online store stays last-write-wins (label_view.py enforcement
        scope note)."""
        lv = self.get_label_view(view_name)
        return lv.resolve(lv.source.read(self.spark))

    def get_stream_feature_view(self, name: str):
        if name not in self._stream_views:
            raise ValueError(f"unknown stream feature view: {name}")
        return self._stream_views[name]

    def list_stream_feature_views(self) -> list:
        return list(self._stream_views.values())

    # -- introspection (feature_store.py list_*/get_* surface) -----------------
    def list_feature_views(self) -> list[FeatureView]:
        return list(self._views.values())

    def list_on_demand_feature_views(self) -> list[OnDemandFeatureView]:
        return list(self._odfvs.values())

    def get_feature_view(self, name: str) -> FeatureView:
        if name not in self._views:
            raise ValueError(f"unknown feature view: {name}")
        return self._views[name]

    def get_feature_service(self, name: str) -> FeatureService:
        if name not in self._services:
            raise ValueError(f"unknown feature service: {name}")
        return self._services[name]

    # -- historical retrieval (PIT) -------------------------------------------
    def get_historical_features(
        self,
        entity_df: DataFrame,
        features: list[str] | FeatureService,
        entity_ts_col: str = "event_timestamp",
        full_feature_names: bool = False,
        as_job: bool = False,
    ):
        """Training frame: as-of join each referenced view onto entity_df.

        ``features`` are "view:feature" refs (utils._get_features,
        utils.py:1171); views join left-to-right accumulating columns, then
        ODFV transforms append theirs. Lazy — returns the unexecuted plan
        (the reference's RetrievalJob contract, offline_store.py:92-442).
        """
        refs = features.features if isinstance(features, FeatureService) else features
        by_view: dict[str, list[str]] = {}
        odfv_refs: list[str] = []
        for ref in refs:
            view, feat = ref.split(":", 1)
            if view in self._odfvs:
                odfv_refs.append(view)
                continue
            by_view.setdefault(view, []).append(feat)

        # request-data validation BEFORE any work (feature_store.py:2057-2068):
        # every RequestSource column an ODFV needs must be in the entity frame
        entity_cols = set(entity_df.columns)
        for odfv_name in dict.fromkeys(odfv_refs):
            missing = [
                c
                for c in self._odfvs[odfv_name].request_fields
                if c not in entity_cols
            ]
            if missing:
                raise ValueError(
                    f"Missing request data values for on-demand view "
                    f"{odfv_name!r}: {missing} (supply them as entity_df "
                    "columns)"
                )

        out = entity_df
        for view_name, feats in by_view.items():
            fv = self._views[view_name]
            fdf = fv.read(self.spark)
            out = point_in_time_join(
                out,
                fdf,
                join_keys=fv.join_keys,
                feature_ts_col=fv.timestamp_field,
                entity_ts_col=entity_ts_col,
                created_ts_col=fv.created_timestamp_column,
                ttl_seconds=fv.ttl_seconds,
                features=feats,
                prefix=view_name if full_feature_names else None,
            )
        for odfv_name in dict.fromkeys(odfv_refs):
            out = self._odfvs[odfv_name].apply(out)
        if as_job:
            from feast_spark.core.retrieval import RetrievalJob

            return RetrievalJob(out)
        return out

    # -- materialization -------------------------------------------------------
    def _serving_dir(self, view: str) -> str:
        return os.path.join(self.repo_path, "serving", view)

    def _snapshot_names(self, view: str) -> list[str]:
        d = self._serving_dir(view)
        if not os.path.isdir(d):
            return []
        return sorted(s for s in os.listdir(d) if s.startswith("snap-"))

    def _latest_snapshot(self, view: str) -> str | None:
        """Latest COMMITTED snapshot — the max snap-N directory. The
        directory listing (not the LATEST file) is the source of truth:
        committed dirs appear atomically via rename, so two concurrent
        committers can never make a reader observe a half-written
        snapshot or a pointer to an older one (round-2 finding #5)."""
        snaps = self._snapshot_names(view)
        return os.path.join(self._serving_dir(view), snaps[-1]) if snaps else None

    def _try_commit_snapshot(
        self, view: str, df: DataFrame, base: str | None
    ) -> str | None:
        """Optimistic commit: write to a tmp dir, then CAS the next
        snapshot id with os.rename — POSIX rename onto an existing
        non-empty directory fails, so exactly one concurrent writer wins
        snap-(base+1). Returns the snapshot name, or None when another
        writer committed since ``base`` was read (caller re-reads the new
        latest, re-merges, retries — serializable read-merge-commit, the
        sandbox analogue of the reference's registry locking + engine
        MERGE INTO, spark.py:763-774)."""
        import uuid as _uuid

        d = self._serving_dir(view)
        os.makedirs(d, exist_ok=True)
        base_idx = -1 if base is None else int(os.path.basename(base)[5:])
        target = os.path.join(d, f"snap-{base_idx + 1:05d}")
        tmp = os.path.join(d, f".tmp-{_uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, target)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
            return None
        # LATEST file kept as a human-readable convenience pointer only
        # (best effort; _latest_snapshot never reads it)
        try:
            with open(os.path.join(d, "LATEST"), "w") as f:
                f.write(self._snapshot_names(view)[-1])
        except OSError:
            pass
        return os.path.basename(target)

    def vacuum_serving(self, view: str, max_age_sec: float = 3600.0) -> int:
        """Crashed-writer recovery: remove ``.tmp-*`` staging dirs older
        than ``max_age_sec``. A writer that died between its parquet
        write and the rename CAS leaves an orphan staging dir — invisible
        to readers (``_snapshot_names`` only lists ``snap-*``) but
        leaking disk. Age-gated so a LIVE concurrent writer's staging dir
        is never swept (its mtime is recent while it streams parquet).
        Returns the number of dirs removed."""
        import shutil
        import time as _time

        d = self._serving_dir(view)
        if not os.path.isdir(d):
            return 0
        removed = 0
        now = _time.time()
        for name in os.listdir(d):
            if not name.startswith(".tmp-"):
                continue
            p = os.path.join(d, name)
            try:
                if now - os.path.getmtime(p) > max_age_sec:
                    shutil.rmtree(p, ignore_errors=True)
                    removed += 1
            except OSError:
                continue  # racing writer renamed/removed it — fine
        return removed

    def optimize_serving(
        self, view_name: str, target_file_mb: int = 128
    ) -> dict:
        """Compact the serving table: rewrite the latest snapshot as
        few, key-clustered files — the Iceberg ``rewrite_data_files``
        (OPTIMIZE) analogue on the snapshot-dir stand-in.

        Why it exists at scale: every :meth:`materialize` interval
        appends a snapshot written at job parallelism, so a
        long-materialized view accumulates snapshots whose file count
        reflects WRITER parallelism, not table size — thousands of
        KB-sized files that tax every reader's task scheduling and
        footer-parsing. The rewrite range-partitions on the join keys,
        so each output file covers a contiguous key range (readers with
        key predicates prune whole files via parquet min/max stats) and
        sorts within partitions for stats tightness + compression.

        Concurrency: the rewrite commits through the SAME rename-CAS
        chain as materialize — if a writer lands a newer snapshot
        between read and commit, the CAS loses and the loop re-reads and
        re-compacts the NEW latest, so compaction can never silently
        drop a concurrent merge. Old snapshots stay readable (time
        travel) until :meth:`expire_snapshots`.

        Returns ``{snapshot, files_before, files_after, bytes_before,
        bytes_after}``."""
        import math

        fv = self._views[view_name]
        keys = fv.join_keys
        while True:
            prev = self._latest_snapshot(view_name)
            if prev is None:
                raise ValueError(f"view {view_name} not materialized")
            files = [
                os.path.join(prev, f)
                for f in os.listdir(prev)
                if f.endswith(".parquet")
            ]
            n_bytes = sum(os.path.getsize(f) for f in files)
            n_target = max(1, math.ceil(n_bytes / (target_file_mb << 20)))
            df = self.spark.read.parquet(prev)
            if keys:
                compacted = df.repartitionByRange(
                    n_target, *keys
                ).sortWithinPartitions(*keys)
            else:
                compacted = df.repartition(n_target)
            snap = self._try_commit_snapshot(view_name, compacted, prev)
            if snap is not None:
                break
        new_dir = os.path.join(self._serving_dir(view_name), snap)
        new_files = [
            os.path.join(new_dir, f)
            for f in os.listdir(new_dir)
            if f.endswith(".parquet")
        ]
        return {
            "snapshot": snap,
            "files_before": len(files),
            "files_after": len(new_files),
            "bytes_before": n_bytes,
            "bytes_after": sum(os.path.getsize(f) for f in new_files),
        }

    def expire_snapshots(self, view_name: str, keep_last: int = 2) -> int:
        """Drop all but the newest ``keep_last`` snapshots (the Iceberg
        ``expire_snapshots`` retention analogue): bounds time-travel
        storage after compaction. The latest snapshot is always kept
        (``keep_last`` floors at 1). In-flight readers of an expired
        snapshot see the same torn-read hazard Iceberg documents for
        expiration — retention windows should exceed the longest reader.
        Returns the number of snapshot dirs removed."""
        import shutil

        keep_last = max(1, keep_last)
        snaps = self._snapshot_names(view_name)
        removed = 0
        for name in snaps[:-keep_last]:
            shutil.rmtree(
                os.path.join(self._serving_dir(view_name), name),
                ignore_errors=True,
            )
            removed += 1
        return removed

    def erase_keys(
        self,
        view_name: str,
        entities: DataFrame,
        expire_history: bool = True,
    ) -> dict:
        """Right-to-be-forgotten erasure of serving rows by entity key —
        the privacy counterpart of :func:`feast_spark.operators.privacy.
        pseudonymize_entities`: pseudonymization removes identifiers from
        TEXT; erasure removes the subject's FEATURE ROWS entirely (GDPR
        Art. 17 at the feature-store layer; the reference's online-store
        delete surface, generalized to the snapshot table).

        ``entities`` carries the view's join-key columns (one row per
        subject to erase — request batches are small, so the anti-join
        broadcasts it). The new snapshot is the latest snapshot minus
        every row whose key appears in ``entities``, committed through
        the SAME rename-CAS chain as materialize: a concurrent
        materialize landing between read and commit makes the CAS lose
        and the loop re-reads the NEW latest — so the erasure is applied
        to every row present at commit time, including rows a racing
        writer just added for the erased subject.

        ``expire_history=True`` (default) drops every OLDER snapshot
        after the commit: an "erasure" that leaves the rows time-travel
        readable isn't one. Pass False only when retention rules demand
        a grace window (then run :meth:`expire_snapshots` at its end).
        Offline-source erasure is out of scope here — that's a
        filter-and-rewrite of the source partitions with the same
        anti-join, performed where the source lives.

        Returns ``{snapshot, rows_before, rows_after, rows_erased,
        snapshots_expired}``.
        """
        from pyspark.sql import functions as F

        fv = self._views[view_name]
        keys = fv.join_keys
        if not keys:
            raise ValueError(f"view {view_name} has no join keys to erase by")
        missing = [k for k in keys if k not in entities.columns]
        if missing:
            raise ValueError(f"entities frame missing join keys: {missing}")
        erase = entities.select(*keys).dropDuplicates()
        while True:
            prev = self._latest_snapshot(view_name)
            if prev is None:
                raise ValueError(f"view {view_name} not materialized")
            df = self.spark.read.parquet(prev)
            remaining = df.join(F.broadcast(erase), keys, "left_anti")
            rows_before = df.count()
            snap = self._try_commit_snapshot(view_name, remaining, prev)
            if snap is not None:
                break
        new_dir = os.path.join(self._serving_dir(view_name), snap)
        rows_after = self.spark.read.parquet(new_dir).count()
        expired = (
            self.expire_snapshots(view_name, keep_last=1)
            if expire_history
            else 0
        )
        return {
            "snapshot": snap,
            "rows_before": rows_before,
            "rows_after": rows_after,
            "rows_erased": rows_before - rows_after,
            "snapshots_expired": expired,
        }

    def _commit_snapshot(self, view: str, df: DataFrame) -> str:
        """Unconditional commit (no concurrent-merge semantics needed):
        retries the CAS until a fresh id wins."""
        while True:
            snap = self._try_commit_snapshot(view, df, self._latest_snapshot(view))
            if snap is not None:
                return snap

    def materialize(
        self,
        view_name: str,
        start: datetime,
        end: datetime,
        run_id: str | None = None,
    ) -> DataFrame:
        """Latest row per key in [start, end] -> merged into the serving
        snapshot; interval checkpointed (feature_store.py:2968-2973)."""
        fv = self._views[view_name]
        src = fv.read(self.spark)
        created = fv.created_timestamp_column
        fresh = pull_latest(
            src,
            fv.join_keys,
            fv.feature_names,
            fv.timestamp_field,
            created_ts_col=created,
            start=start,
            end=end,
        )
        while True:  # serializable read-merge-commit (see _try_commit_snapshot)
            prev = self._latest_snapshot(view_name)
            if prev:
                old = self.spark.read.parquet(prev)
                merged = latest_per_key(
                    fresh.unionByName(old),
                    fv.join_keys,
                    fv.timestamp_field,
                    created_ts_col=created,
                )
            else:
                merged = fresh
            snap = self._try_commit_snapshot(view_name, merged, prev)
            if snap is not None:
                break
        self.registry.apply_materialization(
            view_name, start, end, run_id=run_id or snap
        )
        return self.spark.read.parquet(
            os.path.join(self._serving_dir(view_name), snap)
        )

    def list_snapshots(self, view_name: str) -> list[str]:
        d = self._serving_dir(view_name)
        if not os.path.isdir(d):
            return []
        return sorted(s for s in os.listdir(d) if s.startswith("snap-"))

    def read_snapshot(self, view_name: str, snapshot: str | None = None) -> DataFrame:
        """Time travel over the serving table: read a specific immutable
        snapshot (default LATEST) — the Iceberg ``VERSION AS OF`` analogue
        on the snapshot-dir stand-in (writers never mutate a committed
        snapshot, so old reads stay consistent)."""
        if snapshot is None:
            path = self._latest_snapshot(view_name)
            if path is None:
                raise ValueError(f"view {view_name} not materialized")
        else:
            path = os.path.join(self._serving_dir(view_name), snapshot)
            if not os.path.isdir(path):
                raise ValueError(f"unknown snapshot {snapshot!r} for {view_name}")
        return self.spark.read.parquet(path)

    def materialize_stream(self, view_name: str, checkpoint: str):
        """Drive a StreamFeatureView's materialization FROM ITS SPEC
        (round-2 VERDICT Missing #1): readStream -> udf -> stateful
        windowed aggregation (update mode; Spark's state store accumulates
        each (key, window) across micro-batches) -> per-batch snapshot
        upsert keyed on (join_keys, window_start), latest micro-batch
        wins. Without aggregations: per-batch latest-row dedup + snapshot
        merge (spark_kafka_processor.py:136-175 ingest shape).

        Returns the StreamingQuery — drive with ``processAllAvailable()``
        in tests, ``awaitTermination()`` in production.
        """
        from feast_spark.operators.aggregate import apply_aggregations
        from feast_spark.streaming.processor import stream_source

        sv = self._stream_views[view_name]
        stream = stream_source(
            self.spark, sv.source.path, sv.source.schema,
            sv.source.max_files_per_trigger,
        )
        if sv.udf is not None:
            stream = sv.udf(stream)
        ts = sv.timestamp_field

        if sv.aggregations:
            agg = apply_aggregations(
                stream.withWatermark(ts, sv.watermark),
                sv.join_keys,
                sv.aggregations,
                ts_col=ts,
            )
            merge_keys = [*sv.join_keys, "window_start"]

            def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
                if batch_df.isEmpty():
                    return
                fresh = batch_df.withColumn("__batch_id", F.lit(int(epoch_id)))
                while True:  # serializable read-merge-commit
                    prev = self._latest_snapshot(view_name)
                    merged = fresh
                    if prev:
                        old = self.spark.read.parquet(prev)
                        merged = latest_per_key(
                            fresh.unionByName(old), merge_keys, "__batch_id"
                        )
                    if self._try_commit_snapshot(view_name, merged, prev) is not None:
                        return

            out = agg.writeStream.outputMode("update")
        else:
            created = sv.source.created_timestamp_column

            def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
                if batch_df.isEmpty():
                    return
                fresh = latest_per_key(batch_df, sv.join_keys, ts, created)
                while True:
                    prev = self._latest_snapshot(view_name)
                    merged = fresh
                    if prev:
                        old = self.spark.read.parquet(prev)
                        merged = latest_per_key(
                            fresh.unionByName(old), sv.join_keys, ts, created
                        )
                    if self._try_commit_snapshot(view_name, merged, prev) is not None:
                        return

            out = stream.writeStream.outputMode("update")
        return (
            out.option("checkpointLocation", checkpoint)
            .foreachBatch(handle_batch)
            .start()
        )

    def materialize_incremental(self, view_name: str, end: datetime) -> DataFrame:
        """Resume from the last checkpointed end (feature_store.py:2546)."""
        last = self.registry.most_recent_end_time(view_name)
        start = last or datetime(1970, 1, 1, tzinfo=timezone.utc)
        return self.materialize(view_name, start, end)

    # -- serving-side batch read ------------------------------------------------
    def get_latest_features(
        self,
        view_name: str,
        keys_df: DataFrame | None = None,
        as_of: datetime | None = None,
    ) -> DataFrame:
        """Batch read of the serving table; TTL staleness nulling mirrors
        the online read path (utils._populate_response_from_feature_data,
        utils.py:1654)."""
        if view_name not in self._views:
            raise ValueError(f"unknown feature view: {view_name}")
        fv = self._views[view_name]
        snap = self._latest_snapshot(view_name)
        if snap is None:
            raise ValueError(f"view {view_name} not materialized")
        df = self.spark.read.parquet(snap)
        if keys_df is not None:
            df = df.join(F.broadcast(keys_df), fv.join_keys, "inner")
        if as_of is not None and fv.ttl_seconds:
            ts = fv.timestamp_field
            stale = F.col(ts) < F.lit(as_of) - F.expr(
                f"INTERVAL {fv.ttl_seconds} SECONDS"
            )
            for c in fv.feature_names:
                df = df.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
        return df

    # -- vector retrieval (feature_store.py:4044,4149) ----------------------------
    def retrieve_online_documents(
        self,
        view_name: str,
        query: list[float],
        top_k: int,
        embedding_col: str | None = None,
        method: str = "exact",
        num_bits: int = 8,
    ) -> DataFrame:
        """Top-k document retrieval over a view's embedding column —
        ``retrieve_online_documents[_v2]`` re-expressed as a batch read of
        the latest serving snapshot (reference delegates to ANN-capable
        online stores; here the operators are first-class,
        operators/similarity.py).

        ``method``: 'exact' (brute-force cosine, the baseline) or 'lsh'
        (hyperplane-bucketed approximate path). Returns the view's rows
        for the k nearest neighbors plus ``cosine`` and ``rank``.
        """
        from feast_spark.operators.similarity import cosine_topk, lsh_topk

        fv = self._views[view_name]
        snap = self._latest_snapshot(view_name)
        corpus = (
            self.spark.read.parquet(snap) if snap is not None else fv.read(self.spark)
        )
        if embedding_col is None:
            arrays = [f.name for f in fv.schema if f.dtype.startswith("array")]
            if not arrays:
                raise ValueError(f"view {view_name!r} has no array-typed field")
            embedding_col = arrays[0]
        id_col = fv.join_keys[0]
        qdf = self.spark.createDataFrame(
            [(0, [float(x) for x in query])],
            f"__qid long, {embedding_col} array<float>",
        )
        kwargs = dict(
            corpus_id=id_col, query_id="__qid", vec_col=embedding_col,
            exclude_self=False,
        )
        if method == "exact":
            topk = cosine_topk(corpus, qdf, top_k, **kwargs)
        elif method == "lsh":
            dim = len(query)
            topk = lsh_topk(corpus, qdf, top_k, dim=dim, num_bits=num_bits, **kwargs)
        else:
            raise ValueError(f"unknown retrieval method: {method}")
        hits = topk.select(
            F.col("neighbor_id").alias(id_col), "cosine", "rank"
        )
        return corpus.join(F.broadcast(hits), id_col, "inner")

    # -- push source (feature_store.py:3338-3374) --------------------------------
    def push(self, view_name: str, df: DataFrame) -> None:
        """Synchronous push: merge rows straight into the serving table."""
        fv = self._views[view_name]
        while True:  # serializable read-merge-commit
            prev = self._latest_snapshot(view_name)
            merged = df
            if prev:
                old = self.spark.read.parquet(prev)
                merged = latest_per_key(
                    df.unionByName(old),
                    fv.join_keys,
                    fv.timestamp_field,
                    created_ts_col=fv.created_timestamp_column,
                )
            if self._try_commit_snapshot(view_name, merged, prev) is not None:
                break
