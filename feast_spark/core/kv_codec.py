"""Columnar (Arrow-batch) KV serialization for the online export path.

Round-2 finding #1: ``online_kv_export`` ran ``serialize_entity_key`` and
``json.dumps`` in per-row list comprehensions — the one remaining
row-at-a-time Python pass on a production-shaped path. This module encodes
WHOLE Arrow batches with numpy scatter arithmetic:

- :func:`encode_keys_batch` — the reference v3 entity-key layout
  (``key_encoding_utils.py:131-190``), byte-for-byte equal to
  :func:`feast_spark.core.keys.serialize_entity_key` per row (pinned by
  test), but built as one flat uint8 buffer + offsets and returned as a
  zero-copy ``pyarrow.BinaryArray``. Per-row Python: none — all loops are
  per-COLUMN (constant count per batch).
- :func:`encode_values_batch` — a columnar feature blob per row:
  ``tag(<I) len(<I) payload`` per feature in declared order, using feast's
  ValueType tag numbers (``protos/feast/types/Value_pb2``: BYTES=1,
  STRING=2, INT32=3, INT64=4, DOUBLE=5, FLOAT=6, BOOL=7,
  UNIX_TIMESTAMP=8 — micros here, documented; lists 11-17 with packed LE
  elements). NULL features carry tag 0, len 0. The reference ships protos
  through a per-row conversion (``utils._convert_arrow_to_proto``); the
  tag/len/payload layout carries the same information without a proto
  dependency and decodes with :func:`decode_value`.

The scatter kernel (:func:`_assemble`) is the standard var-width gather:
``dst = repeat(row_starts, lens) + arange(total) - repeat(src_offsets,
lens)`` — O(total bytes), no Python per row.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from feast_spark.core.keys import (
    VT_BYTES,
    VT_INT32,
    VT_INT64,
    VT_STRING,
    VT_UNIX_TIMESTAMP,
)

VT_NULL = 0
VT_DOUBLE = 5
VT_FLOAT = 6
VT_BOOL = 7
_LIST_TAG = {  # feast ValueType list arms
    VT_BYTES: 11, VT_STRING: 12, VT_INT32: 13, VT_INT64: 14,
    VT_DOUBLE: 15, VT_FLOAT: 16, VT_BOOL: 17,
}


def _le(n: int) -> bytes:
    return struct.pack("<I", n)


# ---------------------------------------------------------------------------
# per-column piece extraction: every column becomes (hdr (n,8) uint8,
# payload_flat uint8, payload_offsets int64) — tag+len header per row,
# variable-width payloads flattened
# ---------------------------------------------------------------------------


def _fixed_piece(tag: int, payload: np.ndarray, valid: np.ndarray | None):
    """Fixed-width payload matrix (n, w) -> piece arrays; rows with
    ``valid == False`` encode as (VT_NULL, len 0)."""
    n, w = payload.shape
    if valid is None:
        valid = np.ones(n, dtype=bool)
    lens = np.where(valid, w, 0).astype(np.int64)
    hdr = np.empty((n, 8), dtype=np.uint8)
    tags = np.where(valid, tag, VT_NULL).astype("<u4")
    hdr[:, :4] = tags.view(np.uint8).reshape(n, 4)
    hdr[:, 4:] = lens.astype("<u4").view(np.uint8).reshape(n, 4)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = np.empty(offsets[-1], dtype=np.uint8)
    if offsets[-1]:
        starts = offsets[:-1][valid]
        idx = starts[:, None] + np.arange(w)
        flat[idx.ravel()] = payload[valid].ravel()
    return hdr, flat, offsets


def _var_piece(tag: int, flat: np.ndarray, offsets: np.ndarray,
               valid: np.ndarray | None):
    """Variable-width payloads already flattened (offsets normalized to 0);
    null rows re-encoded as (VT_NULL, len 0)."""
    n = len(offsets) - 1
    lens = np.diff(offsets)
    if valid is None:
        valid = np.ones(n, dtype=bool)
    else:
        if (~valid & (lens > 0)).any():
            # drop payload bytes of null rows
            keep = np.repeat(valid, lens)
            flat = flat[keep]
            lens = np.where(valid, lens, 0)
            offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
    hdr = np.empty((n, 8), dtype=np.uint8)
    tags = np.where(valid, tag, VT_NULL).astype("<u4")
    hdr[:, :4] = tags.view(np.uint8).reshape(n, 4)
    hdr[:, 4:] = lens.astype("<u4").view(np.uint8).reshape(n, 4)
    return hdr, flat, offsets.astype(np.int64)


def _arrow_flat(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 data, 0-based int64 offsets) of a binary/string array."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    buffers = arr.buffers()
    off = np.frombuffer(buffers[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    flat = data[off[0] : off[-1]].copy() if len(off) else np.empty(0, np.uint8)
    return flat, off - (off[0] if len(off) else 0)


def _valid_mask(arr: pa.Array) -> np.ndarray | None:
    if arr.null_count == 0:
        return None
    return np.asarray(arr.is_valid())


def _ints_matrix(arr: pa.Array, np_dtype: str) -> np.ndarray:
    n = len(arr)
    vals = np.asarray(arr.fill_null(0)) if arr.null_count else np.asarray(arr)
    b = np.ascontiguousarray(vals.astype(np_dtype)).view(np.uint8)
    return b.reshape(n, -1)


def _column_piece(arr: pa.Array, name: str, for_key: bool):
    """Map one Arrow column to a (hdr, flat, offsets) piece."""
    t = arr.type
    valid = _valid_mask(arr)
    if for_key and valid is not None:
        raise ValueError(f"entity key column {name!r} contains NULLs")
    if pa.types.is_int64(t):
        return _fixed_piece(VT_INT64, _ints_matrix(arr, "<i8"), valid)
    if pa.types.is_int32(t):
        return _fixed_piece(VT_INT32, _ints_matrix(arr, "<i4"), valid)
    if pa.types.is_timestamp(t):
        ints_arr = arr.cast(pa.timestamp("us")).cast(pa.int64())
        ints = np.asarray(ints_arr.fill_null(0) if arr.null_count else ints_arr)
        if for_key:
            ints = ints // 1_000_000  # v3 keys carry SECONDS (<q)
        b = np.ascontiguousarray(ints.astype("<i8")).view(np.uint8).reshape(len(arr), 8)
        return _fixed_piece(VT_UNIX_TIMESTAMP, b, valid)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        flat, off = _arrow_flat(arr)
        return _var_piece(VT_STRING, flat, off, valid)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        flat, off = _arrow_flat(arr)
        return _var_piece(VT_BYTES, flat, off, valid)
    if for_key:
        raise TypeError(
            f"unsupported entity key dtype for column {name!r}: {t} "
            "(reference v3 keys support string/int32/int64/bytes/timestamp)"
        )
    if pa.types.is_float64(t):
        vals = np.asarray(arr.fill_null(0.0)) if arr.null_count else np.asarray(arr)
        b = np.ascontiguousarray(vals.astype("<f8")).view(np.uint8).reshape(len(arr), 8)
        return _fixed_piece(VT_DOUBLE, b, valid)
    if pa.types.is_float32(t):
        vals = np.asarray(arr.fill_null(0.0)) if arr.null_count else np.asarray(arr)
        b = np.ascontiguousarray(vals.astype("<f4")).view(np.uint8).reshape(len(arr), 4)
        return _fixed_piece(VT_FLOAT, b, valid)
    if pa.types.is_boolean(t):
        vals = np.asarray(arr.fill_null(False)) if arr.null_count else np.asarray(arr)
        b = vals.astype(np.uint8).reshape(len(arr), 1)
        return _fixed_piece(VT_BOOL, b, valid)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        elem = t.value_type
        if pa.types.is_float32(elem):
            etag, w, dt = _LIST_TAG[VT_FLOAT], 4, "<f4"
        elif pa.types.is_float64(elem):
            etag, w, dt = _LIST_TAG[VT_DOUBLE], 8, "<f8"
        elif pa.types.is_int64(elem):
            etag, w, dt = _LIST_TAG[VT_INT64], 8, "<i8"
        elif pa.types.is_int32(elem):
            etag, w, dt = _LIST_TAG[VT_INT32], 4, "<i4"
        else:
            raise TypeError(
                f"unsupported list element dtype for feature {name!r}: {elem}"
            )
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if a.flatten().null_count:
            raise ValueError(f"feature {name!r} has NULL elements inside lists")
        off_np = np.asarray(a.offsets).astype(np.int64)
        base = off_np[0] if len(off_np) else 0
        child = a.values.fill_null(0) if a.values.null_count else a.values
        vals = np.asarray(child)[base : off_np[-1] if len(off_np) else 0]
        off_np = off_np - base
        flat = np.ascontiguousarray(vals.astype(dt)).view(np.uint8)
        return _var_piece(etag, flat, off_np * w, valid)
    raise TypeError(f"unsupported feature dtype for column {name!r}: {t}")


# ---------------------------------------------------------------------------
# assembly: constant prefix + [hdr, payload] per piece -> one flat buffer
# ---------------------------------------------------------------------------


def _assemble(n: int, prefix: bytes, pieces) -> pa.BinaryArray:
    """Scatter [prefix][hdr_i payload_i ...] per row into one flat uint8
    buffer + row offsets; wrap zero-copy as a pyarrow BinaryArray."""
    p = len(prefix)
    row_lens = np.full(n, p, dtype=np.int64)
    for hdr, _flat, off in pieces:
        row_lens += 8 + np.diff(off)
    row_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(row_lens, out=row_off[1:])
    out = np.empty(row_off[-1], dtype=np.uint8)
    cur = row_off[:-1].copy()
    if p:
        idx = cur[:, None] + np.arange(p)
        out[idx.ravel()] = np.tile(np.frombuffer(prefix, np.uint8), n)
        cur += p
    for hdr, flat, off in pieces:
        idx = cur[:, None] + np.arange(8)
        out[idx.ravel()] = hdr.ravel()
        cur += 8
        lens = np.diff(off)
        if off[-1]:
            dst = np.repeat(cur, lens) + np.arange(off[-1]) - np.repeat(off[:-1], lens)
            out[dst] = flat
        cur += lens
    if row_off[-1] >= 2**31:
        # pa.binary() offsets are int32; a batch whose encoded payload
        # crosses 2 GiB would silently wrap them. Arrow batches from Spark
        # are bounded by maxRecordsPerBatch, so this only trips on
        # pathological rows — fail loudly instead of corrupting blobs.
        raise ValueError(
            f"encoded batch payload {int(row_off[-1])} bytes overflows int32 "
            "binary offsets; lower spark.sql.execution.arrow.maxRecordsPerBatch"
        )
    return pa.BinaryArray.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(row_off.astype(np.int32).tobytes()), pa.py_buffer(out.tobytes())],
    )


def encode_keys_batch(batch: pa.RecordBatch, join_keys: list[str]) -> pa.BinaryArray:
    """v3 entity-key bytes per row — byte-for-byte
    :func:`feast_spark.core.keys.serialize_entity_key` on each row's key
    dict, computed columnar. Keys are laid out sorted by name: count
    prefix + all (STRING tag, len, name) headers, then per-row values."""
    names = sorted(join_keys)
    prefix_parts = [_le(len(names))]
    for name in names:
        nb = name.encode("utf-8")
        prefix_parts += [_le(VT_STRING), _le(len(nb)), nb]
    prefix = b"".join(prefix_parts)
    pieces = [
        _column_piece(batch.column(batch.schema.get_field_index(name)), name, True)
        for name in names
    ]
    return _assemble(batch.num_rows, prefix, pieces)


def encode_values_batch(
    batch: pa.RecordBatch, feature_cols: list[str]
) -> pa.BinaryArray:
    """Feature blob per row: ``tag len payload`` per feature in declared
    order (tags documented in the module docstring; NULL -> tag 0 len 0)."""
    pieces = [
        _column_piece(batch.column(batch.schema.get_field_index(c)), c, False)
        for c in feature_cols
    ]
    return _assemble(batch.num_rows, b"", pieces)


def decode_value(buf: bytes, feature_cols: list[str]) -> dict:
    """Inverse of :func:`encode_values_batch` for one row (test/debug
    path; the export itself never decodes)."""
    out: dict = {}
    pos = 0
    for name in feature_cols:
        tag, ln = struct.unpack_from("<II", buf, pos)
        pos += 8
        raw = buf[pos : pos + ln]
        pos += ln
        if tag == VT_NULL:
            out[name] = None
        elif tag == VT_STRING:
            out[name] = raw.decode("utf-8")
        elif tag == VT_BYTES:
            out[name] = raw
        elif tag == VT_INT64:
            out[name] = struct.unpack("<q", raw)[0]
        elif tag == VT_INT32:
            out[name] = struct.unpack("<i", raw)[0]
        elif tag == VT_DOUBLE:
            out[name] = struct.unpack("<d", raw)[0]
        elif tag == VT_FLOAT:
            out[name] = struct.unpack("<f", raw)[0]
        elif tag == VT_BOOL:
            out[name] = bool(raw[0])
        elif tag == VT_UNIX_TIMESTAMP:
            out[name] = struct.unpack("<q", raw)[0]  # micros
        elif tag == _LIST_TAG[VT_FLOAT]:
            out[name] = np.frombuffer(raw, "<f4").tolist()
        elif tag == _LIST_TAG[VT_DOUBLE]:
            out[name] = np.frombuffer(raw, "<f8").tolist()
        elif tag == _LIST_TAG[VT_INT64]:
            out[name] = np.frombuffer(raw, "<i8").tolist()
        elif tag == _LIST_TAG[VT_INT32]:
            out[name] = np.frombuffer(raw, "<i4").tolist()
        else:
            raise ValueError(f"unknown value tag {tag} for {name!r}")
    if pos != len(buf):
        raise ValueError("trailing bytes in value blob")
    return out
