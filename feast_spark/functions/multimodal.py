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


def image_metadata(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Header-only metadata pass — no decode, pure numpy over the Arrow
    batch (the cheap scan you run before deciding what to decode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = pdf[binary_col]
            n = len(bufs)
            w = np.zeros(n, dtype=np.int32)
            h = np.zeros(n, dtype=np.int32)
            valid = np.zeros(n, dtype=bool)
            for i, b in enumerate(bufs):  # header peek: 16 bytes, O(1)/row
                if b is not None and len(b) >= HEADER_SIZE and b[:4] == MAGIC:
                    _, w[i], h[i], _ = struct.unpack_from(HEADER_FMT, b)
                    valid[i] = True
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "width": w,
                    "height": h,
                    "n_bytes": bufs.map(lambda b: 0 if b is None else len(b)),
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
