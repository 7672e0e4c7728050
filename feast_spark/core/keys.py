"""Entity-key serialization — canonical binary key for KV-style sinks.

Parity with ``sdk/python/feast/infra/key_encoding_utils.py:12-123``
(serialize_entity_key v3): join keys sorted by name, each key and value
length-prefixed, little-endian, int64 packed as ``<q``. In the Spark
engine serving tables are keyed by plain columns, so this exists for (a)
interop with KV online stores and (b) the deterministic composite-key
column (:func:`composite_key_column` — the sha2 analogue used by the PIT
row id, ``functions/text.py row_id``).
"""

from __future__ import annotations

import struct

_TYPE_STRING = 1
_TYPE_INT64 = 2
_TYPE_FLOAT64 = 3
_TYPE_BYTES = 4


def serialize_entity_key(entity_key: dict[str, object]) -> bytes:
    """Canonical little-endian length-prefixed encoding of sorted keys."""
    out = bytearray()
    for name in sorted(entity_key):
        nb = name.encode("utf-8")
        out += struct.pack("<I", len(nb)) + nb
        v = entity_key[name]
        if isinstance(v, bool):
            raise TypeError("bool entity keys are not supported")
        if isinstance(v, int):
            out += struct.pack("<BI", _TYPE_INT64, 8) + struct.pack("<q", v)
        elif isinstance(v, float):
            out += struct.pack("<BI", _TYPE_FLOAT64, 8) + struct.pack("<d", v)
        elif isinstance(v, str):
            vb = v.encode("utf-8")
            out += struct.pack("<BI", _TYPE_STRING, len(vb)) + vb
        elif isinstance(v, (bytes, bytearray)):
            out += struct.pack("<BI", _TYPE_BYTES, len(v)) + bytes(v)
        else:
            raise TypeError(f"unsupported entity key type: {type(v)}")
    return bytes(out)


def deserialize_entity_key(buf: bytes) -> dict[str, object]:
    out: dict[str, object] = {}
    i = 0
    while i < len(buf):
        (nlen,) = struct.unpack_from("<I", buf, i)
        i += 4
        name = buf[i : i + nlen].decode("utf-8")
        i += nlen
        t, vlen = struct.unpack_from("<BI", buf, i)
        i += 5
        raw = buf[i : i + vlen]
        i += vlen
        if t == _TYPE_INT64:
            out[name] = struct.unpack("<q", raw)[0]
        elif t == _TYPE_FLOAT64:
            out[name] = struct.unpack("<d", raw)[0]
        elif t == _TYPE_STRING:
            out[name] = raw.decode("utf-8")
        else:
            out[name] = raw
    return out
