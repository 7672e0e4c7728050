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
Arrow-batched pandas UDF. The batch kernel is VECTORIZED
(:func:`_decode_batch_vectorized`): the whole Arrow binary column is
viewed as one flat uint8 buffer and every field is decoded for all rows
at once — varints via a dense masked scan bounded by 10 passes (the max
varint width), fixed-width floats via a 2-D gather, strings/bytes
rebuilt zero-copy as one Arrow array from computed offsets. Python cost
is O(fields × varint-width) calls per BATCH, not per row. The scalar
:func:`_decode_record` remains as the independent reference the tests
compare against, and exotic schemas (nested records, unions beyond
``["null", T]``) fall back to it. In production add the spark-avro jar
and the JVM arm takes over with no code change.
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


def _vectorizable(fields: list[tuple[str, object]]) -> bool:
    prims = {"null", "long", "int", "boolean", "double", "float", "string",
             "bytes"}
    for _name, t in fields:
        if isinstance(t, list):
            if len(t) != 2 or t[0] != "null" or t[1] not in prims:
                return False
        elif t not in prims:
            return False
    return True


def _read_varints(data, pos):
    """Zigzag varints at ``pos`` (int64 positions into ``data``) for all
    rows at once: a masked dense scan, at most 10 passes (max varint
    width). Returns (values int64, positions after)."""
    import numpy as np

    n = len(pos)
    acc = np.zeros(n, np.uint64)
    shift = np.zeros(n, np.uint64)
    cur = pos.copy()
    active = np.arange(n)
    for _ in range(10):  # a 64-bit zigzag varint is at most 10 bytes
        if not len(active):
            break
        if cur[active].max() >= len(data):
            raise ValueError(
                "malformed avro payload: varint runs past the buffer"
            )
        b = data[cur[active]].astype(np.uint64)
        acc[active] |= (b & np.uint64(0x7F)) << shift[active]
        cur[active] += 1
        shift[active] += np.uint64(7)
        active = active[(b & np.uint64(0x80)) != 0]
    else:
        if len(active):
            raise ValueError(
                "malformed avro payload: varint exceeds 10 bytes"
            )
    val = (acc >> np.uint64(1)).astype(np.int64) ^ -(
        (acc & np.uint64(1)).astype(np.int64)
    )
    return val, cur


def _gather_var(data, starts, lens):
    """Flat gather of variable-length slices + exclusive offsets."""
    import numpy as np

    total = int(lens.sum())
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    if total == 0:
        return np.zeros(0, np.uint8), offs
    src = np.repeat(starts, lens) + (np.arange(total) - np.repeat(offs[:-1], lens))
    return data[src], offs


def _decode_batch_vectorized(bufs: pd.Series, fields) -> pd.DataFrame:
    """All rows of an Arrow binary column decoded field-by-field in numpy
    (see module docstring). Bit-equivalent to mapping
    :func:`_decode_record` over the rows — pinned by tests."""
    import numpy as np
    import pyarrow as pa

    arr = pa.array(bufs, type=pa.large_binary())
    n = len(arr)
    if n == 0:
        return pd.DataFrame({name: [] for name, _ in fields})
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data = (
        np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        if arr.buffers()[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    pos = offsets[:-1].copy()
    out: dict[str, object] = {}
    for name, ftype in fields:
        t = ftype
        null_mask = np.zeros(n, dtype=bool)
        if isinstance(t, list):  # ["null", T]
            idx, pos = _read_varints(data, pos)
            null_mask = idx == 0
            t = t[1]
        live = np.nonzero(~null_mask)[0]
        if t == "null":
            out[name] = pd.Series([None] * n, dtype=object)
            continue
        if t in ("long", "int"):
            vals = np.zeros(n, np.int64)
            v, newpos = _read_varints(data, pos[live])
            vals[live] = v
            pos[live] = newpos
            if null_mask.any():
                col = pd.Series(vals, dtype=object)
                col[null_mask] = None
            else:
                col = pd.Series(vals)
            out[name] = col
        elif t == "boolean":
            vals = np.zeros(n, dtype=bool)
            vals[live] = data[pos[live]] != 0
            pos[live] += 1
            col = pd.Series(vals, dtype=object) if null_mask.any() else pd.Series(vals)
            if null_mask.any():
                col[null_mask] = None
            out[name] = col
        elif t in ("double", "float"):
            w = 8 if t == "double" else 4
            dt = np.float64 if t == "double" else np.float32
            vals = np.full(n, np.nan, dt)
            if len(live):
                raw = data[pos[live, None] + np.arange(w)].copy()
                vals[live] = raw.view(dt).ravel()
                pos[live] += w
            if null_mask.any():
                # null must stay NULL, not NaN (a decoded NaN is a value)
                col = pd.Series(vals, dtype=object)
                col[null_mask] = None
                out[name] = col
            else:
                out[name] = pd.Series(vals)
        elif t in ("string", "bytes"):
            lens = np.zeros(n, np.int64)
            ln, newpos = _read_varints(data, pos[live])
            lens[live] = ln
            pos[live] = newpos
            flat, voffs = _gather_var(data, pos, lens)
            pos += lens
            validity = None
            if null_mask.any():
                validity = pa.py_buffer(
                    np.packbits(~null_mask, bitorder="little").tobytes()
                )
            if voffs[-1] >= 2**31:
                # int32 Arrow offsets would silently wrap (same guard as
                # kv_codec._assemble) — lower maxRecordsPerBatch instead
                raise ValueError(
                    f"decoded {t} payload of {int(voffs[-1])} bytes "
                    "overflows int32 Arrow offsets in one batch"
                )
            col_arr = pa.Array.from_buffers(
                pa.utf8() if t == "string" else pa.binary(),
                n,
                [validity, pa.py_buffer(voffs.astype(np.int32).tobytes()),
                 pa.py_buffer(flat.tobytes())],
            )
            out[name] = col_arr.to_pandas()
        else:  # pragma: no cover — gated by _vectorizable
            raise ValueError(f"unsupported avro type: {t!r}")
    return pd.DataFrame(out)


def avro_decode_python(
    df: DataFrame, schema_json: str, value_col: str = "value"
) -> DataFrame:
    """From-scratch Avro binary decode of flat records (fallback arm when
    the spark-avro jar is absent). Vectorized per Arrow batch for flat
    primitive schemas; exotic schemas take the scalar reference path."""
    fields, ddl = _parse_avro_schema(schema_json)
    vectorized = _vectorizable(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if vectorized:
                yield _decode_batch_vectorized(pdf[value_col], fields)
            else:
                rows = [
                    _decode_record(bytes(b), fields) for b in pdf[value_col]
                ]
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
