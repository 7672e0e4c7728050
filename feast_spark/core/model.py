"""Declarative objects: Entity / Field / FeatureView / sources / services.

Shape-parity with the reference (all dataclass-light, no protos):

- Entity            <- sdk/python/feast/entity.py:28-102
- Field             <- sdk/python/feast/field.py:30-75
- ParquetSource     <- sdk/python/feast/data_source.py:179-266 +
                       infra/offline_stores/file_source.py (timestamp_field,
                       created_timestamp_column, field_mapping,
                       date_partition_column)
- FeatureView       <- sdk/python/feast/feature_view.py:111-341 (entities,
                       ttl, schema split into entity columns vs features)
- BatchFeatureView  <- sdk/python/feast/batch_feature_view.py (udf applied
                       at materialization, mode pandas/spark)
- OnDemandFeatureView <- on_demand_feature_view.py:116-382 (row-level
                       transform at retrieval time)
- FeatureService    <- sdk/python/feast/feature_service.py (named bundle of
                       "view:feature" refs)
- Aggregation       re-export of operators.aggregate.Aggregation
                       (aggregation/__init__.py:15-120)

Type mapping (types.py:75-99 -> spark/nodes.py:76-88) is in
:mod:`feast_spark.core.types`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feast_spark.operators.aggregate import Aggregation  # noqa: F401 (re-export)


@dataclass(frozen=True)
class Entity:
    """``dtype`` (optional, Spark DDL or numpy-ish string) is validated
    against the source column at ``apply()`` time (entity.py value_type +
    feature_view.py:296-305 inferred-type check)."""

    name: str
    join_key: str | None = None
    description: str = ""
    dtype: str | None = None

    @property
    def key(self) -> str:
        return self.join_key or self.name


@dataclass(frozen=True)
class Field:
    name: str
    dtype: str  # Spark DDL type string ("double", "string", "array<float>", ...)


@dataclass(frozen=True)
class ParquetSource:
    """Batch source: path + temporal columns + rename map.

    ``field_mapping`` renames source columns to view schema names at read
    time (data_source.py:254-266); ``date_partition_column`` enables
    partition pruning (the predicate lands on the partition column so
    Catalyst prunes, SURVEY §2.2)."""

    path: str
    timestamp_field: str
    created_timestamp_column: str | None = None
    field_mapping: dict[str, str] = field(default_factory=dict)
    date_partition_column: str | None = None

    def read(self, spark: SparkSession) -> DataFrame:
        df = spark.read.parquet(self.path)
        if self.field_mapping:
            df = df.withColumnsRenamed(self.field_mapping)
        return df


@dataclass(frozen=True)
class SparkSqlSource:
    """table-or-query source (spark_source.py:31-110)."""

    query: str
    timestamp_field: str
    created_timestamp_column: str | None = None

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.sql(self.query)


@dataclass(frozen=True)
class RequestSource:
    """Request-time-only input columns for on-demand transforms
    (data_source.py:591-660): no storage behind it — the schema declares
    columns the caller must supply in the entity frame at retrieval time
    (validated in FeatureStore.get_historical_features, mirroring
    feature_store.py:2057-2068)."""

    name: str
    schema: tuple[Field, ...] = ()

    @property
    def field_names(self) -> list[str]:
        return [f.name for f in self.schema]


@dataclass
class FeatureView:
    """Batch view. Exactly one of ``source`` (physical) or
    ``source_views`` (derived view-on-view, feature_view.py:148,232-239)
    must be set; derived views resolve their inputs recursively with
    cycle detection (infra/compute_engines/feature_resolver.py:28-95).
    ``join_key_map`` remaps feature-side join keys to entity-side column
    names at query time only (feature_view.py:447-480)."""

    name: str
    entities: list[Entity]
    source: ParquetSource | SparkSqlSource | None = None
    schema: list[Field] = field(default_factory=list)
    ttl_seconds: int | None = None
    description: str = ""
    source_views: list["FeatureView"] = field(default_factory=list)
    join_key_map: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.source is None and not self.source_views:
            raise ValueError(
                f"FeatureView {self.name!r} needs a source or source_views"
            )

    @property
    def join_keys(self) -> list[str]:
        # query-time remap: feature-data key -> entity-df column name
        return [self.join_key_map.get(e.key, e.key) for e in self.entities]

    @property
    def feature_names(self) -> list[str]:
        keys = {e.key for e in self.entities} | set(self.join_keys)
        return [f.name for f in self.schema if f.name not in keys]

    @property
    def timestamp_field(self) -> str:
        if self.source is not None:
            return self.source.timestamp_field
        return self.source_views[0].timestamp_field

    @property
    def created_timestamp_column(self) -> str | None:
        if self.source is not None:
            return self.source.created_timestamp_column
        return self.source_views[0].created_timestamp_column

    # -- query-time copies (feature_view.py:404-480) -------------------------
    def with_name(self, name: str) -> "FeatureView":
        import copy as _copy

        cp = _copy.copy(self)
        cp.name = name
        return cp

    def with_join_key_map(self, join_key_map: dict[str, str]) -> "FeatureView":
        import copy as _copy

        cp = _copy.copy(self)
        cp.join_key_map = dict(join_key_map)
        return cp

    # -- DAG resolution --------------------------------------------------------
    def _inputs(self, spark: SparkSession, _path: tuple = ()) -> list[DataFrame]:
        """Resolve this view's input frame(s), walking source_views
        recursively with cycle detection (feature_resolver.py:62-65)."""
        if self.name in _path:
            cycle = " -> ".join([*_path, self.name])
            raise ValueError(f"Cycle detected in FeatureView DAG: {cycle}")
        if self.source is not None:
            return [self.source.read(spark)]
        return [
            v._read_resolved(spark, (*_path, self.name))
            for v in self.source_views
        ]

    def _read_resolved(self, spark: SparkSession, _path: tuple = ()) -> DataFrame:
        dfs = self._inputs(spark, _path)
        if len(dfs) > 1:
            raise ValueError(
                f"FeatureView {self.name!r}: multiple source_views need a "
                "transform (use BatchFeatureView with a spark-mode udf)"
            )
        df = dfs[0]
        if self.join_key_map:
            df = df.withColumnsRenamed(self.join_key_map)
        return df

    def read(self, spark: SparkSession) -> DataFrame:
        return self._read_resolved(spark)


@dataclass
class BatchFeatureView(FeatureView):
    """FeatureView + user transformation applied at materialization
    (batch_feature_view.py; UDF execution spark.py:1409-1495).

    ``udf`` modes: 'spark' (DataFrame -> DataFrame) or 'pandas'
    (pd.DataFrame -> pd.DataFrame run through mapInPandas with
    ``udf_output_schema``)."""

    udf: Callable | None = None
    mode: str = "spark"
    udf_output_schema: str | None = None
    aggregations: list[Aggregation] = field(default_factory=list)

    def _read_resolved(self, spark: SparkSession, _path: tuple = ()) -> DataFrame:
        dfs = self._inputs(spark, _path)
        if self.udf is None:
            if len(dfs) > 1:
                raise ValueError(
                    f"BatchFeatureView {self.name!r}: multiple source_views "
                    "need a udf to combine them"
                )
            df = dfs[0]
        elif self.mode == "spark":
            # spark-mode udf receives every resolved input frame — this is
            # how a derived view combines multiple upstream views
            # (feature_builder.py:81-142 join/transform step)
            df = self.udf(*dfs)
        elif self.mode == "pandas":
            if len(dfs) > 1:
                raise ValueError("pandas mode supports one source view")
            if not self.udf_output_schema:
                raise ValueError("pandas mode requires udf_output_schema")
            fn = self.udf

            def run(batches):
                for pdf in batches:
                    yield fn(pdf)

            df = dfs[0].mapInPandas(run, self.udf_output_schema)
        else:
            raise ValueError(f"unsupported mode: {self.mode}")
        if self.join_key_map:
            df = df.withColumnsRenamed(self.join_key_map)
        return df


@dataclass
class OnDemandFeatureView:
    """Row-level transform over retrieved features, applied AFTER the PIT
    join (on_demand_feature_view.py:1023-1043 transform_arrow). Modes:
    'pandas' (mapInPandas), 'python' (dict-of-arrays per Arrow batch —
    on_demand_feature_view.py:56-60,1101-1134 transform_dict, run through
    functions.transforms.python_transform) or 'spark' (DataFrame fn). The
    transform receives the joined frame and must append its output
    columns.

    ``sources`` may include :class:`RequestSource` entries — their schema
    columns must be supplied by the caller's entity frame at retrieval
    time (validated in FeatureStore.get_historical_features, mirroring
    feature_store.py:2057-2068)."""

    name: str
    udf: Callable
    schema: list[Field] = field(default_factory=list)
    mode: str = "pandas"
    sources: list = field(default_factory=list)
    # reference parity (on_demand_feature_view.py:316-319): the UDF sees
    # one row as a dict of scalars; requires mode='python'. Batched
    # transport, per-row user-fn calls — a compatibility surface, never
    # the hot path (use the batch python/pandas modes for that).
    singleton: bool = False

    def __post_init__(self) -> None:
        if self.singleton and self.mode != "python":
            raise ValueError(
                "singleton mode requires the 'python' transformation mode "
                f"but mode={self.mode!r} was specified (either disable "
                "singleton or change mode to 'python')"
            )

    @property
    def request_fields(self) -> list[str]:
        return [
            f.name
            for s in self.sources
            if isinstance(s, RequestSource)
            for f in s.schema
        ]

    def _out_schema(self, df: DataFrame) -> str | None:
        appended = ", ".join(f"{f.name} {f.dtype}" for f in self.schema)
        return (
            ", ".join([f"{c[0]} {c[1]}" for c in df.dtypes] + [appended])
            if appended
            else None
        )

    def apply(self, df: DataFrame) -> DataFrame:
        if self.mode == "spark":
            return self.udf(df)
        if self.mode == "python":
            from feast_spark.functions.transforms import (
                python_transform,
                python_transform_singleton,
            )

            if self.singleton:
                return python_transform_singleton(
                    df, self.udf, self._out_schema(df)
                )
            return python_transform(df, self.udf, self._out_schema(df))
        if self.mode != "pandas":
            raise ValueError(f"unsupported ODFV mode: {self.mode}")
        fn = self.udf

        def run(batches):
            for pdf in batches:
                yield fn(pdf)

        return df.mapInPandas(run, self._out_schema(df))


@dataclass(frozen=True)
class FeatureService:
    """Named bundle of feature refs 'view:feature' (feature_service.py)."""

    name: str
    features: tuple[str, ...]
