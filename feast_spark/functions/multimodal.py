"""Multimodal column handling: image/audio/video as opaque binary columns.

The reference types the payloads (``ImageBytes``/``PdfBytes``,
``sdk/python/feast/types.py:75-99``) but ships no decoders; at
training-data scale the engine must carry binary columns through the same
partition-parallel transform shape as text. This module makes the Spark
plumbing real — schema, Arrow batch flow through ``mapInPandas``,
metadata extraction, frame sampling — while the actual codec calls are
STUBBED (image/audio libraries are not in this container):

- :func:`decode_image` raises ``NotImplementedError`` at the exact point
  PIL/libjpeg would be invoked, unless ``fake=True`` (deterministic fake
  decode used by tests: parses our own 16-byte header).
- Everything around the stub — binary schema, batch iteration, per-batch
  numpy work, output StructType — is real and tested.

Binary layout for the deterministic fake codec (and the fixture
generator): ``b"FSIM" | uint32 width | uint32 height | uint32 seed`` +
payload bytes. Real deployments swap ``_decode_one`` for the codec call;
nothing else changes.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MAGIC = b"FSIM"
HEADER_FMT = "<4sIII"
HEADER_SIZE = struct.calcsize(HEADER_FMT)

IMAGE_META_SCHEMA = (
    "width int, height int, n_bytes long, format string, valid boolean"
)


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image payload (fixture side)."""
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, min(width * height, 4096), dtype=np.uint8)
    return struct.pack(HEADER_FMT, MAGIC, width, height, seed) + payload.tobytes()


def _decode_one(buf: bytes, fake: bool) -> tuple[int, int, np.ndarray]:
    """The codec boundary. Real impl: PIL.Image.open(io.BytesIO(buf))."""
    if not fake:
        raise NotImplementedError(
            "image codec not available in this container — "
            "swap _decode_one for PIL/torchvision in deployment"
        )
    magic, w, h, seed = struct.unpack_from(HEADER_FMT, buf)
    if magic != MAGIC:
        raise ValueError("bad magic")
    rng = np.random.default_rng(seed)
    return w, h, rng.integers(0, 256, (min(h, 8), min(w, 8)), dtype=np.uint8)


def _headers_vectorized(bufs: pd.Series) -> tuple[np.ndarray, ...]:
    """(width, height, n_bytes, valid) for a Series of binary payloads —
    O(1) Python calls per batch: the Series converts to ONE Arrow
    BinaryArray whose offsets/data buffers are viewed as numpy arrays;
    header fields come from a fancy-indexed (n, 16) gather
    (round-1 finding #4: this replaced a per-row unpack loop)."""
    import pyarrow as pa

    arr = pa.array(bufs, type=pa.large_binary())
    n = len(arr)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z.astype(np.int32), z.astype(np.int32), z, np.zeros(0, dtype=bool)
    null_mask = np.asarray(arr.is_null())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data = (
        np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        if arr.buffers()[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    lens = offsets[1:] - offsets[:-1]
    n_bytes = np.where(null_mask, 0, lens)
    long_enough = (~null_mask) & (lens >= HEADER_SIZE)
    # gather the first 16 bytes per row (data zero-padded by one header so
    # short rows never index out of bounds; their values are masked anyway)
    padded = np.concatenate([data, np.zeros(HEADER_SIZE, dtype=np.uint8)])
    hdr = padded[offsets[:-1, None] + np.arange(HEADER_SIZE)]
    magic = np.frombuffer(MAGIC, dtype=np.uint8)
    valid = long_enough & (hdr[:, :4] == magic).all(axis=1)
    w = hdr[:, 4:8].copy().view(np.uint32).ravel().astype(np.int64)
    h = hdr[:, 8:12].copy().view(np.uint32).ravel().astype(np.int64)
    w = np.where(valid, w, 0).astype(np.int32)
    h = np.where(valid, h, 0).astype(np.int32)
    return w, h, n_bytes.astype(np.int64), valid


def image_metadata(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Header-only metadata pass — no decode, pure numpy over the Arrow
    batch (the cheap scan you run before deciding what to decode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, n_bytes, valid = _headers_vectorized(pdf[binary_col])
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "width": w,
                    "height": h,
                    "n_bytes": n_bytes,
                    "format": np.where(valid, "fsim", "unknown"),
                    "valid": valid,
                }
            )

    return df.mapInPandas(run, f"id long, {IMAGE_META_SCHEMA}")


def image_features(
    df: DataFrame, binary_col: str, id_col: str, fake: bool = False
) -> DataFrame:
    """Decode + feature-extract (mean/std over pixels) per batch.

    The decode is the stubbed codec boundary; the batch shape (Arrow in,
    numpy feature vector out) is the real production plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                w, h, px = _decode_one(bytes(b), fake)
                rows.append((int(i), w, h, float(px.mean()), float(px.std())))
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "px_mean", "px_std"]
            )

    return df.mapInPandas(
        run, "id long, width int, height int, px_mean double, px_std double"
    )


def frame_sample(
    df: DataFrame, binary_col: str, id_col: str, every_n: int = 10, fake: bool = False
) -> DataFrame:
    """Video frame-sampling shape: one input row -> N output rows
    (explode-style mapInPandas; the decode stub stands in for pyav)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_frame = [], []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                # the codec boundary: raises NotImplementedError unless fake
                _, _, _ = _decode_one(bytes(b), fake)
                _, _, seed = struct.unpack_from(HEADER_FMT, bytes(b))[1:]
                n_frames = (seed % 50) + every_n  # stub: header-declared length
                for f in range(0, n_frames, every_n):
                    out_id.append(int(i))
                    out_frame.append(f)
            yield pd.DataFrame({"id": out_id, "frame_idx": out_frame})

    return df.mapInPandas(run, "id long, frame_idx int")


def image_resize(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    target_w: int,
    target_h: int,
    fake: bool = False,
) -> DataFrame:
    """Decode -> resize -> re-encode, binary in / binary out — the
    transform-in-place shape for image normalization pipelines. The
    decode/encode pair is the stubbed codec boundary (real impl:
    PIL ``Image.resize``); with the fake codec the resize is a REAL
    deterministic nearest-neighbor downsample of the fake payload, so the
    plumbing (binary -> array -> binary, per-batch) is exercised
    end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_data, out_valid = [], [], []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                # codec boundary (raises NotImplementedError unless fake)
                w, h, px = _decode_one(bytes(b), fake)
                ys = np.linspace(0, px.shape[0] - 1, min(target_h, px.shape[0])).astype(int)
                xs = np.linspace(0, px.shape[1] - 1, min(target_w, px.shape[1])).astype(int)
                resized = px[ys][:, xs]
                _, _, seed = struct.unpack_from(HEADER_FMT, bytes(b))[1:]
                payload = resized.astype(np.uint8).tobytes()
                out_id.append(int(i))
                out_data.append(
                    struct.pack(HEADER_FMT, MAGIC, target_w, target_h, seed) + payload
                )
                out_valid.append(True)
            yield pd.DataFrame(
                {"id": out_id, "data": out_data, "valid": out_valid}
            )

    return df.mapInPandas(run, "id long, data binary, valid boolean")
