"""FeastType <-> Spark type mapping.

Exactly the table the reference uses at
``infra/compute_engines/spark/nodes.py:52-105`` (FeastType -> SparkType),
with the primitive set from ``sdk/python/feast/types.py:75-99`` and
complex types Array/Map/Struct (``types.py:182-318``). We use Spark DDL
strings as the canonical form (parseable by ``T._parse_datatype_string``).
"""

from __future__ import annotations

from pyspark.sql import types as T

FEAST_TO_SPARK: dict[str, T.DataType] = {
    "bytes": T.BinaryType(),
    "string": T.StringType(),
    "json": T.StringType(),
    "uuid": T.StringType(),
    "decimal": T.StringType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "bool": T.BooleanType(),
    "unix_timestamp": T.TimestampType(),
    "zoned_timestamp": T.TimestampType(),
    "map": T.MapType(T.StringType(), T.StringType()),
    "scalar_map": T.MapType(T.StringType(), T.StringType()),
    "image_bytes": T.BinaryType(),
    "pdf_bytes": T.BinaryType(),
}


def feast_type_to_spark(name: str) -> T.DataType:
    """'int64' -> LongType; 'array<float32>' -> ArrayType(FloatType)."""
    name = name.strip().lower()
    if name.startswith("array<") and name.endswith(">"):
        return T.ArrayType(feast_type_to_spark(name[6:-1]))
    if name in FEAST_TO_SPARK:
        return FEAST_TO_SPARK[name]
    # fall back to Spark DDL parsing for struct<...> etc.
    return T._parse_datatype_string(name)


def spark_type_to_feast(dt: T.DataType) -> str:
    inv = {
        T.BinaryType(): "bytes",
        T.StringType(): "string",
        T.IntegerType(): "int32",
        T.LongType(): "int64",
        T.FloatType(): "float32",
        T.DoubleType(): "float64",
        T.BooleanType(): "bool",
        T.TimestampType(): "unix_timestamp",
    }
    if isinstance(dt, T.ArrayType):
        return f"array<{spark_type_to_feast(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return "map"
    if isinstance(dt, T.StructType):
        return dt.simpleString()
    return inv.get(dt, dt.simpleString())
