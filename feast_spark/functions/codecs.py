"""Stream payload decoders — JSON and Avro (reference
``spark_kafka_processor.py:95-130``).

``decode_json`` is the reference's JSON arm verbatim: CAST the payload to
STRING, ``from_json`` against the declared schema, flatten ``table.*`` —
pure Catalyst, works identically on batch and streaming DataFrames.

``decode_avro`` prefers Spark's ``from_avro`` (JVM, zero Python). The
sandbox image ships core Avro jars but NOT the ``spark-avro`` connector,
so when ``from_avro`` is unusable it falls back to
:func:`avro_decode_python`: a from-scratch decoder of the Avro BINARY
spec (zigzag varints, length-prefixed strings/bytes, IEEE little-endian
floats — spec §"Binary Encoding") for FLAT record schemas, run as an
Arrow-batched pandas UDF. Per-row parsing is inherent to a varint format
in Python — this is the documented fallback path, not the hot path; in
production add the spark-avro jar and the JVM arm takes over with no code
change.
"""

from __future__ import annotations

import json
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AVRO_TO_DDL = {
    "long": "long",
    "int": "int",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "bytes": "binary",
}


def decode_json(df: DataFrame, schema_ddl: str, value_col: str = "value") -> DataFrame:
    """Kafka-shape JSON decode (spark_kafka_processor.py:101-112)."""
    return (
        df.selectExpr(f"CAST({value_col} AS STRING) AS {value_col}")
        .select(F.from_json(F.col(value_col), schema_ddl).alias("table"))
        .select("table.*")
    )


def _zigzag_read(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _decode_record(buf: bytes, fields: list[tuple[str, object]]) -> dict:
    out: dict = {}
    pos = 0
    for name, ftype in fields:
        t = ftype
        if isinstance(t, list):  # union, e.g. ["null", "long"]
            idx, pos = _zigzag_read(buf, pos)
            t = t[idx]
        if t == "null":
            out[name] = None
        elif t in ("long", "int"):
            out[name], pos = _zigzag_read(buf, pos)
        elif t == "boolean":
            out[name] = buf[pos] != 0
            pos += 1
        elif t == "double":
            out[name] = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif t == "float":
            out[name] = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
        elif t in ("string", "bytes"):
            n, pos = _zigzag_read(buf, pos)
            raw = buf[pos : pos + n]
            pos += n
            out[name] = raw.decode("utf-8") if t == "string" else bytes(raw)
        else:
            raise ValueError(f"unsupported avro type: {t!r}")
    return out


def _parse_avro_schema(schema_json: str) -> tuple[list[tuple[str, object]], str]:
    sch = json.loads(schema_json)
    if sch.get("type") != "record":
        raise ValueError("only record schemas are supported")
    fields = [(f["name"], f["type"]) for f in sch["fields"]]
    ddl_parts = []
    for name, t in fields:
        base = t[1] if isinstance(t, list) else t  # [null, T] unions
        if base == "null" and isinstance(t, list):
            base = t[0]
        ddl_parts.append(f"{name} {_AVRO_TO_DDL[base]}")
    return fields, ", ".join(ddl_parts)


def avro_decode_python(
    df: DataFrame, schema_json: str, value_col: str = "value"
) -> DataFrame:
    """Pure-Python Avro binary decode of flat records (fallback arm)."""
    fields, ddl = _parse_avro_schema(schema_json)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_decode_record(bytes(b), fields) for b in pdf[value_col]]
            yield pd.DataFrame(rows, columns=[n for n, _ in fields])

    return df.mapInPandas(run, ddl)


def from_avro_available(spark) -> bool:
    try:
        spark.sql("SELECT from_avro(CAST(NULL AS BINARY), '\"long\"')")
        return True
    except Exception:
        return False


def decode_avro(
    df: DataFrame, schema_json: str, value_col: str = "value"
) -> DataFrame:
    """Avro decode (spark_kafka_processor.py:114-130): JVM ``from_avro``
    when the spark-avro connector is on the classpath, else the
    pure-Python spec decoder."""
    if from_avro_available(df.sparkSession):
        from pyspark.sql.avro.functions import from_avro

        return (
            df.select(from_avro(F.col(value_col), schema_json).alias("table"))
            .select("table.*")
        )
    return avro_decode_python(df, schema_json, value_col)
