"""Source-schema inference + entity-dtype validation (round-2 VERDICT
Missing #2).

Reference: ``sdk/python/feast/inference.py:103-260``
(``update_feature_views_with_inferred_features_and_entities``) and
``feature_view.py:289-307``: a FeatureView with an omitted ``schema`` gets
it inferred from the batch source's columns (minus the timestamp columns),
and a declared entity dtype must match the source column's type — an
EARLY error at ``apply()`` time instead of silent schema drift at query
time.

Runs on the parquet footer / plan analysis only (``df.schema`` is lazy) —
no data is read at apply time.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from feast_spark.core.model import FeatureView, Field, ParquetSource, SparkSqlSource

# dtype synonyms -> Spark DDL canonical form (types.py:75-99 ->
# spark/nodes.py:76-88 mapping, collapsed to the Spark side)
_CANON = {
    "int64": "bigint", "long": "bigint", "bigint": "bigint",
    "int32": "int", "int": "int", "integer": "int",
    "float64": "double", "double": "double",
    "float32": "float", "float": "float",
    "str": "string", "string": "string", "varchar": "string",
    "bool": "boolean", "boolean": "boolean",
    "bytes": "binary", "binary": "binary",
    "timestamp": "timestamp", "datetime": "timestamp",
}
_WORD = re.compile(r"[a-z0-9_]+")


def canonical_dtype(dtype: str) -> str:
    """Normalize a dtype string (numpy-ish or DDL, possibly nested like
    ``array<float64>``) to Spark DDL canonical form."""
    return _WORD.sub(lambda m: _CANON.get(m.group(0), m.group(0)), dtype.lower())


def _dtype_ok(declared: str, source: str) -> bool:
    d, s = canonical_dtype(declared), canonical_dtype(source)
    if d == s:
        return True
    # coarse complex-family declarations are the project's own canonical
    # names (types.spark_type_to_feast: MapType -> "map", StructType ->
    # "struct"); accept them against any source type of that family
    return d in {"map", "struct", "array"} and s.startswith(d)


def infer_and_validate(fv: FeatureView, spark: SparkSession) -> None:
    """Infer ``fv.schema`` from its source when omitted; validate join-key
    presence, entity dtypes, and declared field dtypes against the source.

    - omitted schema -> all source columns except the timestamp/created
      columns become Fields (join keys included; ``feature_names`` already
      excludes them) — inference.py:227-260;
    - a join key missing from the source raises (feature_view.py:307);
    - ``Entity.dtype``, when declared, must match the source column —
      feature_view.py:296-305 ("does not match the inferred type");
    - declared Fields must exist in the source with a matching dtype
      (early error instead of silent drift).

    Derived views (``source_views``) resolve through their inputs and are
    validated when their leaves are applied; request-only/stream objects
    have their own validation.
    """
    if fv.source is None or not isinstance(fv.source, (ParquetSource, SparkSqlSource)):
        return
    if getattr(fv, "udf", None) is not None:
        return  # BatchFeatureView: the udf defines the output schema
    src_df = fv.source.read(spark)  # lazy: schema-only analysis
    # view columns as the query sees them: join_key_map renames apply at
    # read time (feature_view.py:447-480), so validate post-rename names
    src_types = {f.name: f.dataType.simpleString() for f in src_df.schema.fields}
    # a with_join_key_map copy keeps its original schema but reads with
    # the keys renamed — accept both names for the mapped columns
    for orig, renamed in fv.join_key_map.items():
        if orig in src_types:
            src_types[renamed] = src_types[orig]
    ts_cols = {fv.timestamp_field, fv.created_timestamp_column} - {None}

    for e in fv.entities:
        key = fv.join_key_map.get(e.key, e.key)
        if key not in src_types:
            raise ValueError(
                f"FeatureView {fv.name!r}: join key {key!r} not present in "
                f"source columns {sorted(src_types)}"
            )
        if e.dtype is not None and not _dtype_ok(e.dtype, src_types[key]):
            raise ValueError(
                f"Entity {e.name} has type {e.dtype}, which does not match "
                f"the inferred type {src_types[key]} (feature_view.py:300)"
            )

    if not fv.schema:
        fv.schema = [
            Field(name, dtype)
            for name, dtype in src_types.items()
            if name not in ts_cols
        ]
        return

    for f in fv.schema:
        if f.name not in src_types:
            raise ValueError(
                f"FeatureView {fv.name!r}: declared field {f.name!r} not "
                f"present in source columns {sorted(src_types)}"
            )
        if not _dtype_ok(f.dtype, src_types[f.name]):
            raise ValueError(
                f"FeatureView {fv.name!r}: field {f.name!r} declared as "
                f"{f.dtype} but source column is {src_types[f.name]}"
            )
