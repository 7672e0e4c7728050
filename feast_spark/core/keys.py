"""Entity-key serialization — canonical binary key for KV-style sinks.

Byte-for-byte parity with the reference's v3 layout
(``sdk/python/feast/infra/key_encoding_utils.py:131-190``,
``serialize_entity_key`` with ``entity_key_serialization_version=3``):

- ``<I`` key count;
- per join key, sorted by key name: ``<I`` ValueType.STRING tag,
  ``<I`` byte length, utf-8 name bytes;
- then per value (same sorted order): ``<I`` ValueType tag, ``<I`` byte
  length, payload — STRING utf-8, BYTES raw, INT32 ``<i``, INT64 ``<q``,
  UNIX_TIMESTAMP ``<q``.

ValueType tags are feast's proto enum values
(``protos/feast/types/Value_pb2``): BYTES=1, STRING=2, INT32=3, INT64=4,
UNIX_TIMESTAMP=8. Float/double and bool keys are rejected exactly like
the reference (``_serialize_val`` raises, ``key_encoding_utils.py:12-28``).

In the Spark engine serving tables are keyed by plain columns, so this
exists for interop with KV online stores that store feast v3 keys.
"""

from __future__ import annotations

import struct

VT_BYTES = 1
VT_STRING = 2
VT_INT32 = 3
VT_INT64 = 4
VT_UNIX_TIMESTAMP = 8

_INT32_MIN, _INT32_MAX = -(1 << 31), (1 << 31) - 1


class Int32(int):
    """Explicitly int32-typed key value (feast's int32_val oneof arm)."""


class UnixTimestamp(int):
    """Explicitly unix_timestamp-typed key value (<q seconds)."""


def _serialize_val(v: object) -> tuple[int, bytes]:
    if isinstance(v, bool):
        raise TypeError("bool entity keys are not supported (reference parity)")
    if isinstance(v, UnixTimestamp):
        return VT_UNIX_TIMESTAMP, struct.pack("<q", int(v))
    if isinstance(v, Int32):
        if not (_INT32_MIN <= int(v) <= _INT32_MAX):
            raise OverflowError("Int32 key out of range")
        return VT_INT32, struct.pack("<i", int(v))
    if isinstance(v, int):
        return VT_INT64, struct.pack("<q", v)
    if isinstance(v, str):
        return VT_STRING, v.encode("utf-8")
    if isinstance(v, (bytes, bytearray)):
        return VT_BYTES, bytes(v)
    if isinstance(v, float):
        raise TypeError(
            "float entity keys are not supported (reference _serialize_val "
            "has no double arm, key_encoding_utils.py:12-28)"
        )
    raise TypeError(f"unsupported entity key type: {type(v)}")


def serialize_entity_key(entity_key: dict[str, object]) -> bytes:
    """v3 layout: count prefix, all keys (sorted), then all values."""
    names = sorted(entity_key)
    out = [struct.pack("<I", len(names))]
    for name in names:
        nb = name.encode("utf-8")
        out.append(struct.pack("<I", VT_STRING))
        out.append(struct.pack("<I", len(nb)))
        out.append(nb)
    for name in names:
        vt, vb = _serialize_val(entity_key[name])
        out.append(struct.pack("<I", vt))
        out.append(struct.pack("<I", len(vb)))
        out.append(vb)
    return b"".join(out)


def deserialize_entity_key(buf: bytes) -> dict[str, object]:
    """Inverse of :func:`serialize_entity_key` (v3 only, matching
    ``key_encoding_utils.py:193-`` ``deserialize_entity_key``)."""
    pos = 0
    (num_keys,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    names: list[str] = []
    for _ in range(num_keys):
        vt, nlen = struct.unpack_from("<II", buf, pos)
        pos += 8
        if vt != VT_STRING:
            raise ValueError(f"key name must be STRING-tagged, got {vt}")
        names.append(buf[pos : pos + nlen].decode("utf-8"))
        pos += nlen
    out: dict[str, object] = {}
    for name in names:
        vt, vlen = struct.unpack_from("<II", buf, pos)
        pos += 8
        raw = buf[pos : pos + vlen]
        pos += vlen
        if vt == VT_INT64:
            out[name] = struct.unpack("<q", raw)[0]
        elif vt == VT_INT32:
            out[name] = Int32(struct.unpack("<i", raw)[0])
        elif vt == VT_UNIX_TIMESTAMP:
            out[name] = UnixTimestamp(struct.unpack("<q", raw)[0])
        elif vt == VT_STRING:
            out[name] = raw.decode("utf-8")
        elif vt == VT_BYTES:
            out[name] = raw
        else:
            raise ValueError(f"unsupported value type tag: {vt}")
    if pos != len(buf):
        raise ValueError("trailing bytes in serialized entity key")
    return out
