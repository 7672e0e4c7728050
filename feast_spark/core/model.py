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
    name: str
    join_key: str | None = None
    description: str = ""

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


@dataclass
class FeatureView:
    name: str
    entities: list[Entity]
    source: ParquetSource | SparkSqlSource
    schema: list[Field] = field(default_factory=list)
    ttl_seconds: int | None = None
    description: str = ""

    @property
    def join_keys(self) -> list[str]:
        return [e.key for e in self.entities]

    @property
    def feature_names(self) -> list[str]:
        keys = set(self.join_keys)
        return [f.name for f in self.schema if f.name not in keys]

    def read(self, spark: SparkSession) -> DataFrame:
        return self.source.read(spark)


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

    def read(self, spark: SparkSession) -> DataFrame:
        df = super().read(spark)
        if self.udf is None:
            return df
        if self.mode == "spark":
            return self.udf(df)
        if self.mode == "pandas":
            if not self.udf_output_schema:
                raise ValueError("pandas mode requires udf_output_schema")
            fn = self.udf

            def run(batches):
                for pdf in batches:
                    yield fn(pdf)

            return df.mapInPandas(run, self.udf_output_schema)
        raise ValueError(f"unsupported mode: {self.mode}")


@dataclass
class OnDemandFeatureView:
    """Row-level transform over retrieved features, applied AFTER the PIT
    join (on_demand_feature_view.py:1023-1043 transform_arrow). Modes:
    'pandas' (mapInPandas) or 'spark' (DataFrame fn). The transform
    receives the joined frame and must append its output columns."""

    name: str
    udf: Callable
    schema: list[Field] = field(default_factory=list)
    mode: str = "pandas"

    def apply(self, df: DataFrame) -> DataFrame:
        if self.mode == "spark":
            return self.udf(df)
        appended = ", ".join(f"{f.name} {f.dtype}" for f in self.schema)
        out_schema = ", ".join(
            [f"{c[0]} {c[1]}" for c in df.dtypes] + [appended]
        ) if appended else None
        fn = self.udf

        def run(batches):
            for pdf in batches:
                yield fn(pdf)

        return df.mapInPandas(run, out_schema)


@dataclass(frozen=True)
class FeatureService:
    """Named bundle of feature refs 'view:feature' (feature_service.py)."""

    name: str
    features: tuple[str, ...]
