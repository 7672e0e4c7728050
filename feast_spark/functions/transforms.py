"""User-transformation modes — feast's §2.9 surface on Spark.

| mode       | reference                                            | here |
|------------|------------------------------------------------------|------|
| python     | dict->dict per batch, transformation/python_transformation.py; ODFV transform_dict on_demand_feature_view.py:1101-1134 | mapInArrow, dict-of-numpy-arrays |
| pandas     | pd.DataFrame->pd.DataFrame, transformation/pandas_transformation.py:19-80 | mapInPandas (see core.model.BatchFeatureView / OnDemandFeatureView) |
| spark      | DataFrame->DataFrame, transformation/spark_transformation.py:11-120     | call directly |
| spark_sql  | udf returns SQL over temp views, spark_transformation.py:96-120         | :func:`spark_sql_transform` |
| sql        | templated SQL, transformation/sql_transformation.py                     | same function (the template renders before it reaches us) |
| substrait  | transformation/substrait_transformation.py                              | out of scope (SURVEY §2.9) — replaced by SQL |

Plus :func:`infer_output_schema` — run the UDF on a synthesized sample and
read the dtypes (on_demand_feature_view.py:1162-1194).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession


def python_transform(
    df: DataFrame, udf: Callable[[dict], dict], output_schema: str
) -> DataFrame:
    """dict-of-arrays -> dict-of-arrays per Arrow batch (the reference's
    'python' ODFV mode, executed via mapInArrow like its transform_arrow
    path at on_demand_feature_view.py:1023-1043)."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols = {
                name: batch.column(i).to_numpy(zero_copy_only=False)
                for i, name in enumerate(batch.schema.names)
            }
            out = udf(cols)
            # from_pandas=True: NaN in float arrays round-trips back to
            # null (to_numpy surfaced nulls as NaN on the way in), so a
            # NULL feature stays NULL through the dict mode
            yield pa.RecordBatch.from_pydict(
                {k: pa.array(v, from_pandas=True) for k, v in out.items()}
            )

    return df.mapInArrow(run, output_schema)


def python_transform_singleton(
    df: DataFrame, udf: Callable[[dict], dict], output_schema: str
) -> DataFrame:
    """The reference's ``singleton=True`` python mode
    (on_demand_feature_view.py:316-319 validation,
    python_transformation.py:91-97 execution): the UDF receives ONE ROW
    as a dict of scalars and returns a dict of scalars, which is merged
    over the input row (``{**input, **output}``).

    This is inherently a per-row Python call — the reference loops rows
    the same way — so it can never be a hot-path operator here (the
    north rule forbids per-row Python in the pipeline; the batch
    :func:`python_transform` is the performant twin). What IS kept
    batched is the transport: rows move through Arrow record batches,
    and the per-row loop runs inside the executor over materialized
    numpy scalars, not through Spark's row serializer.
    """

    # parse the DDL properly — a naive comma-split breaks on
    # struct<a:int,b:int> / map<...> / decimal(10,2) field types
    from pyspark.sql.types import _parse_datatype_string

    out_names = _parse_datatype_string(output_schema).fieldNames()

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols = {
                name: batch.column(i).to_pylist()
                for i, name in enumerate(batch.schema.names)
            }
            names = list(cols)
            merged: list[dict] = []
            for j in range(batch.num_rows):
                row = {k: cols[k][j] for k in names}
                out = udf(row)
                merged.append({**row, **out})
            yield pa.RecordBatch.from_pydict(
                {
                    k: pa.array([m.get(k) for m in merged], from_pandas=True)
                    for k in out_names
                }
            )

    return df.mapInArrow(run, output_schema)


def spark_sql_transform(
    spark: SparkSession,
    udf: Callable[..., str],
    views: dict[str, DataFrame],
) -> DataFrame:
    """UDF returns a SQL string over the given DataFrames, which are
    registered as temp views first (spark_transformation.py:96-120)."""
    for name, vdf in views.items():
        vdf.createOrReplaceTempView(name)
    sql = udf(*views.keys())
    return spark.sql(sql)


def infer_output_schema(
    udf: Callable[[pd.DataFrame], pd.DataFrame], sample: pd.DataFrame
) -> str:
    """Run the UDF on a sample frame, read dtypes -> Spark DDL string
    (on_demand_feature_view.py:1162-1194 feature-inference shape)."""
    out = udf(sample.copy())
    mapping = {
        "int64": "long", "int32": "int", "float64": "double",
        "float32": "float", "bool": "boolean", "object": "string",
        "datetime64[us]": "timestamp", "datetime64[ns]": "timestamp",
    }
    parts = [
        f"{c} {mapping.get(str(t), 'string')}" for c, t in out.dtypes.items()
    ]
    return ", ".join(parts)
