"""Registry diff / plan surface: what would ``apply()`` change?

Re-expresses the reference's object-diff engine
(``sdk/python/feast/diff/registry_diff.py:37-311`` — FeastObjectDiff /
RegistryDiff, ``tag_objects_for_keep_delete_update_add``,
field-level PropertyDiffs with ignored fields;
``diff/property_diff.py`` — PropertyDiff + TransitionType;
``feature_store.py:1370`` — ``plan()`` dry-run) over this engine's
dict-spec registry instead of protos:

- every registrable object canonicalizes to a plain JSON spec via
  :func:`object_spec` — the SAME spec ``FeatureStore.apply`` persists, so
  a plan compares exactly what apply would write;
- objects are tagged keep/delete/update/add per (object_type, name), and
  updates get property-level diffs from a recursive dict walk (dotted
  names for nested fields — the reference flattens its one nested case,
  ``feature_transformation.<udf field>``, the same way);
- each diff carries TRANSITION WARNINGS for changes that are destructive
  or semantics-changing at serving/PIT time (the reference surfaces these
  through ``apply_progress.py`` messaging): deleting a view with
  materialized intervals, changing join keys, narrowing TTL, changing the
  event-timestamp column, and dropping declared features.

Spark-first note: none of this touches the cluster — a plan is pure
driver-side metadata work; only ``apply`` (which may run schema inference
against sources) reads data, exactly like the reference's dry-run.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# stable presentation order (reference FEAST_OBJECT_TYPES ordering:
# entities -> feature views -> odfv/stream/label -> feature services)
OBJECT_TYPE_ORDER = [
    "entity",
    "feature_view",
    "on_demand_feature_view",
    "stream_feature_view",
    "label_view",
    "feature_service",
]

# spec fields that never participate in the property diff (reference
# FIELDS_TO_IGNORE = {"project"}; our specs carry the type tag instead)
FIELDS_TO_IGNORE = {"object_type"}


class TransitionType:
    CREATE = "create"
    DELETE = "delete"
    UPDATE = "update"
    UNCHANGED = "unchanged"


@dataclass(frozen=True)
class PropertyDiff:
    property_name: str
    val_existing: object
    val_declared: object


@dataclass
class ObjectDiff:
    name: str
    object_type: str
    current_spec: dict | None
    new_spec: dict | None
    property_diffs: list[PropertyDiff]
    transition_type: str
    # the desired in-memory object (None for deletes) — what apply_diff
    # re-applies; specs alone can't rebuild udf closures
    new_object: object = None
    warnings: list[str] = field(default_factory=list)


@dataclass
class RegistryDiff:
    object_diffs: list[ObjectDiff] = field(default_factory=list)

    @property
    def changes(self) -> list[ObjectDiff]:
        return [
            d
            for d in self.object_diffs
            if d.transition_type != TransitionType.UNCHANGED
        ]

    @property
    def warnings(self) -> list[str]:
        return [w for d in self.object_diffs for w in d.warnings]

    @property
    def is_noop(self) -> bool:
        return not self.changes

    def to_string(self) -> str:
        """Human-readable plan (reference RegistryDiff.to_string, minus
        colorama): one line per changed object, indented property lines
        for updates, warning lines prefixed ``!``."""
        action = {
            TransitionType.CREATE: "Created",
            TransitionType.DELETE: "Deleted",
            TransitionType.UPDATE: "Updated",
        }
        lines: list[str] = []
        for d in self.changes:
            lines.append(f"{action[d.transition_type]} {d.object_type} {d.name}")
            for p in d.property_diffs:
                lines.append(
                    f"\t{p.property_name}: {p.val_existing!r} -> "
                    f"{p.val_declared!r}"
                )
            for w in d.warnings:
                lines.append(f"\t! {w}")
        return "\n".join(lines) if lines else "No changes to registry"


# ---------------------------------------------------------------------------
# canonical specs
# ---------------------------------------------------------------------------


def _source_spec(src) -> dict | None:
    from feast_spark.core.model import (
        ParquetSource,
        RequestSource,
        SparkSqlSource,
    )

    if src is None:
        return None
    if isinstance(src, ParquetSource):
        return {
            "kind": "parquet",
            "path": src.path,
            "timestamp_field": src.timestamp_field,
            "created_timestamp_column": src.created_timestamp_column,
            "field_mapping": dict(src.field_mapping),
            "date_partition_column": src.date_partition_column,
        }
    if isinstance(src, SparkSqlSource):
        return {
            "kind": "spark_sql",
            "query": src.query,
            "timestamp_field": src.timestamp_field,
            "created_timestamp_column": src.created_timestamp_column,
        }
    if isinstance(src, RequestSource):
        return {
            "kind": "request",
            "name": src.name,
            "schema": [[f.name, f.dtype] for f in src.schema],
        }
    # stream sources and exotic stand-ins: identify by class + the
    # temporal contract (enough to detect a swap)
    return {
        "kind": type(src).__name__,
        "timestamp_field": getattr(src, "timestamp_field", None),
    }


def object_spec(obj) -> tuple[str, str, dict]:
    """``(object_type, name, spec)`` — the canonical registry record for
    any registrable object. ``FeatureStore.apply`` persists exactly this
    spec, so plan-vs-apply can never disagree about what a field means."""
    from feast_spark.core.model import (
        Entity,
        FeatureService,
        FeatureView,
        OnDemandFeatureView,
    )
    from feast_spark.operators.labels import LabelView
    from feast_spark.streaming.views import StreamFeatureView

    if isinstance(obj, Entity):
        return (
            "entity",
            obj.name,
            {
                "object_type": "entity",
                "join_key": obj.key,
                "dtype": obj.dtype,
                "description": obj.description,
            },
        )
    if isinstance(obj, OnDemandFeatureView):
        return (
            "on_demand_feature_view",
            obj.name,
            {
                "object_type": "on_demand_feature_view",
                "mode": obj.mode,
                "singleton": obj.singleton,
                "schema": [[f.name, f.dtype] for f in obj.schema],
                # reference parity: the transformation diff ignores the
                # UDF BODY (registry_diff.py:171-173 skips "body") — a
                # re-deployed identical repo must plan as no-op even
                # though the function object is new; the NAME still
                # catches a swapped transform
                "udf_name": getattr(obj.udf, "__name__", str(obj.udf)),
                "sources": [
                    s.name if hasattr(s, "name") else _source_spec(s)
                    for s in obj.sources
                ],
            },
        )
    if isinstance(obj, LabelView):
        return (
            "label_view",
            obj.name,
            {
                "object_type": "label_view",
                "entities": [e.key for e in obj.entities],
                "label": obj.label_col,
                "conflict_policy": obj.conflict_policy,
                "ttl_seconds": obj.ttl_seconds,
                "source": _source_spec(obj.source),
            },
        )
    if isinstance(obj, StreamFeatureView):
        return (
            "stream_feature_view",
            obj.name,
            {
                "object_type": "stream_feature_view",
                "entities": [e.key for e in obj.entities],
                "features": obj.feature_names
                if hasattr(obj, "feature_names")
                else [f.name for f in obj.schema],
                "ttl_seconds": obj.ttl_seconds,
                "timestamp_field": obj.timestamp_field,
                "watermark": obj.watermark,
                "udf_name": getattr(obj.udf, "__name__", None)
                if obj.udf
                else None,
                "aggregations": [
                    {
                        "column": a.column,
                        "function": a.function,
                        "time_window_seconds": a.time_window_seconds,
                        "slide_interval_seconds": a.slide_interval_seconds,
                    }
                    for a in obj.aggregations
                ],
            },
        )
    if isinstance(obj, FeatureView):  # covers BatchFeatureView too
        return (
            "feature_view",
            obj.name,
            {
                "object_type": "feature_view",
                "entities": obj.join_keys,
                "features": obj.feature_names,
                "schema": [[f.name, f.dtype] for f in obj.schema],
                "ttl_seconds": obj.ttl_seconds,
                "description": obj.description,
                "source": _source_spec(obj.source),
                "source_views": [v.name for v in obj.source_views],
                "join_key_map": dict(obj.join_key_map),
            },
        )
    if isinstance(obj, FeatureService):
        return (
            "feature_service",
            obj.name,
            {
                "object_type": "feature_service",
                "features": list(obj.features),
            },
        )
    raise TypeError(f"not a registrable object: {type(obj).__name__}")


# ---------------------------------------------------------------------------
# diffing
# ---------------------------------------------------------------------------


def _flatten(spec: dict, prefix: str = "") -> dict:
    """Dotted-name flattening of nested dict fields (the reference's
    ``feature_transformation.<field>`` shape, generalized). Lists compare
    wholesale — element-level diffs of reordered lists read worse than
    old -> new."""
    out = {}
    for k, v in spec.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict) and prefix == "" and k == "source":
            out.update(_flatten(v, name + "."))
        else:
            out[name] = v
    return out


def diff_specs(current: dict, new: dict) -> list[PropertyDiff]:
    cur_f, new_f = _flatten(current), _flatten(new)
    diffs = []
    for key in sorted(set(cur_f) | set(new_f)):
        if key.split(".", 1)[0] in FIELDS_TO_IGNORE:
            continue
        a, b = cur_f.get(key), new_f.get(key)
        if a != b:
            diffs.append(PropertyDiff(key, a, b))
    return diffs


def _transition_warnings(
    d: ObjectDiff, materialized_views: set[str]
) -> list[str]:
    """Destructive / semantics-changing transitions a user must see
    before applying (the plan-time counterpart of the reference's apply
    progress messaging)."""
    w = []
    if d.transition_type == TransitionType.DELETE:
        if d.name in materialized_views:
            w.append(
                "DESTRUCTIVE: view has materialized serving intervals; "
                "deleting orphans its online/offline serving data"
            )
    if d.transition_type == TransitionType.UPDATE:
        changed = {p.property_name: p for p in d.property_diffs}
        if "entities" in changed:
            w.append(
                "join keys change "
                f"{changed['entities'].val_existing!r} -> "
                f"{changed['entities'].val_declared!r}: existing serving "
                "rows are keyed by the old entity key and become "
                "unreachable until re-materialized"
            )
        p = changed.get("ttl_seconds")
        if p is not None and p.val_declared is not None and (
            p.val_existing is None or p.val_declared < p.val_existing
        ):
            w.append(
                "ttl narrows: rows previously inside the point-in-time "
                "window will silently stop matching"
            )
        for key in ("source.timestamp_field", "timestamp_field"):
            if key in changed:
                w.append(
                    "event-timestamp column changes: point-in-time joins "
                    "and dedup ordering are redefined; re-materialize"
                )
                break
        feats = changed.get("features")
        if feats is not None:
            dropped = [
                f
                for f in (feats.val_existing or [])
                if f not in (feats.val_declared or [])
            ]
            if dropped:
                w.append(
                    f"features removed {dropped}: downstream services "
                    "referencing them will fail at retrieval"
                )
    return w


def tag_keep_delete_update_add(
    existing: dict[tuple[str, str], dict],
    desired: dict[tuple[str, str], dict],
) -> tuple[set, set, set, set]:
    """(keep, delete, update, add) key sets — the reference's 4-way
    tagging (registry_diff.py:91-105) keyed by (object_type, name)."""
    keep = {k for k in existing if k in desired}
    delete = {k for k in existing if k not in desired}
    add = {k for k in desired if k not in existing}
    update = {k for k in desired if k in existing}
    return keep, delete, update, add


def diff_between(
    existing: dict[tuple[str, str], dict],
    desired: dict[tuple[str, str], dict],
    desired_objects: dict[tuple[str, str], object] | None = None,
    materialized_views: set[str] | None = None,
) -> RegistryDiff:
    """Structured diff of two registry states (reference diff_between,
    registry_diff.py:253-311). ``existing``/``desired`` map
    (object_type, name) -> spec; ``desired_objects`` carries the live
    objects for apply_diff; ``materialized_views`` feeds the destructive-
    delete warning."""
    desired_objects = desired_objects or {}
    materialized = materialized_views or set()
    _, to_delete, to_update, to_add = tag_keep_delete_update_add(
        existing, desired
    )
    out = RegistryDiff()
    order = {t: i for i, t in enumerate(OBJECT_TYPE_ORDER)}
    all_keys = sorted(
        set(existing) | set(desired),
        key=lambda k: (order.get(k[0], len(order)), k[1]),
    )
    for key in all_keys:
        otype, name = key
        if key in to_add:
            d = ObjectDiff(
                name, otype, None, desired[key], [],
                TransitionType.CREATE, desired_objects.get(key),
            )
        elif key in to_delete:
            d = ObjectDiff(
                name, otype, existing[key], None, [],
                TransitionType.DELETE, None,
            )
        else:  # update candidate
            props = diff_specs(existing[key], desired[key])
            d = ObjectDiff(
                name,
                otype,
                existing[key],
                desired[key],
                props,
                TransitionType.UPDATE if props else TransitionType.UNCHANGED,
                desired_objects.get(key),
            )
        d.warnings = _transition_warnings(d, materialized)
        out.object_diffs.append(d)
    return out
