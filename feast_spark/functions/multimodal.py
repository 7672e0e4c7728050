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


def _gather_headers(
    bufs: pd.Series, magic: bytes, header_size: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(header_matrix (n, header_size) uint8, n_bytes, valid) for a
    Series of binary payloads — O(1) Python calls per batch: the Series
    converts to ONE Arrow BinaryArray whose offsets/data buffers are
    viewed as numpy arrays; header fields come from a fancy-indexed
    gather (round-1 finding #4: this replaced a per-row unpack loop)."""
    import pyarrow as pa

    arr = pa.array(bufs, type=pa.large_binary())
    n = len(arr)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return np.zeros((0, header_size), np.uint8), z, np.zeros(0, dtype=bool)
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
    long_enough = (~null_mask) & (lens >= header_size)
    # gather the first header_size bytes per row (data zero-padded by one
    # header so short rows never index out of bounds; masked anyway)
    padded = np.concatenate([data, np.zeros(header_size, dtype=np.uint8)])
    hdr = padded[offsets[:-1, None] + np.arange(header_size)]
    mg = np.frombuffer(magic, dtype=np.uint8)
    valid = long_enough & (hdr[:, : len(mg)] == mg).all(axis=1)
    return hdr, n_bytes.astype(np.int64), valid


def _u32(hdr: np.ndarray, off: int, valid: np.ndarray) -> np.ndarray:
    v = hdr[:, off : off + 4].copy().view(np.uint32).ravel().astype(np.int64)
    return np.where(valid, v, 0)


def _headers_vectorized(bufs: pd.Series) -> tuple[np.ndarray, ...]:
    """(width, height, n_bytes, valid) for image payloads."""
    hdr, n_bytes, valid = _gather_headers(bufs, MAGIC, HEADER_SIZE)
    w = _u32(hdr, 4, valid).astype(np.int32)
    h = _u32(hdr, 8, valid).astype(np.int32)
    return w, h, n_bytes, valid


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


# ---------------------------------------------------------------------------
# audio: opaque binary waveform column (reference types.py:75-99 ships
# typed bytes with no decoders; the ASR/audio-LM curation shape is the
# same partition-parallel one as images)
# ---------------------------------------------------------------------------

AUDIO_MAGIC = b"FSAU"
AUDIO_HEADER_FMT = "<4sIIII"  # magic, sample_rate, channels, n_samples, seed
AUDIO_HEADER_SIZE = struct.calcsize(AUDIO_HEADER_FMT)

AUDIO_META_SCHEMA = (
    "sample_rate int, channels int, n_samples long, duration_sec double, "
    "n_bytes long, format string, valid boolean"
)


def encode_fake_audio(
    sample_rate: int, channels: int, n_samples: int, seed: int
) -> bytes:
    """Deterministic fake waveform payload (fixture side): int16 PCM,
    payload truncated at 8192 samples — headers stay truthful, which is
    all the header-only operators read."""
    rng = np.random.default_rng(seed)
    pcm = rng.integers(
        -(2**15), 2**15, min(n_samples * channels, 8192), dtype=np.int16
    )
    return (
        struct.pack(
            AUDIO_HEADER_FMT, AUDIO_MAGIC, sample_rate, channels, n_samples, seed
        )
        + pcm.tobytes()
    )


def _decode_audio_one(buf: bytes, fake: bool) -> tuple[int, int, np.ndarray]:
    """The audio codec boundary. Real impl: soundfile/librosa/ffmpeg."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires an audio codec library (soundfile/ffmpeg) "
            "not present in this environment; pass fake=True for the "
            "deterministic test codec"
        )
    magic, sr, ch, n, _seed = struct.unpack_from(AUDIO_HEADER_FMT, buf)
    if magic != AUDIO_MAGIC:
        raise ValueError("not a fake-audio payload")
    pcm = np.frombuffer(buf, dtype=np.int16, offset=AUDIO_HEADER_SIZE)
    return sr, ch, pcm


def audio_metadata(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Header-only metadata pass over audio payloads — the same
    vectorized Arrow-buffer gather as images, no decode, no per-row
    Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hdr, n_bytes, valid = _gather_headers(
                pdf[binary_col], AUDIO_MAGIC, AUDIO_HEADER_SIZE
            )
            sr = _u32(hdr, 4, valid)
            ch = _u32(hdr, 8, valid)
            ns = _u32(hdr, 12, valid)
            dur = np.divide(
                ns, sr, out=np.zeros(len(ns), np.float64), where=sr > 0
            )
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "sample_rate": sr.astype(np.int32),
                    "channels": ch.astype(np.int32),
                    "n_samples": ns,
                    "duration_sec": dur,
                    "n_bytes": n_bytes,
                    "format": np.where(valid, "fsau", "unknown"),
                    "valid": valid,
                }
            )

    return df.mapInPandas(run, f"id long, {AUDIO_META_SCHEMA}")


def audio_chunks(
    df: DataFrame, binary_col: str, id_col: str, chunk_seconds: float = 30.0
) -> DataFrame:
    """ASR/audio-LM training prep: fixed-duration chunk windows per clip,
    computed from the HEADER alone (duration = n_samples / rate) — one
    input row explodes to ceil(duration / chunk) rows carrying
    (start_sec, dur_sec) offsets for a downstream decoder. Vectorized:
    per batch, chunk counts come from the header gather and the explode
    is one np.repeat/np.arange construction — no per-row Python, no
    decode, and the binary payload itself is NOT duplicated per chunk
    (offsets only — the decode stage re-reads payload bytes by range,
    the way a real object-store video pipeline slices by byte range)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hdr, _n_bytes, valid = _gather_headers(
                pdf[binary_col], AUDIO_MAGIC, AUDIO_HEADER_SIZE
            )
            sr = _u32(hdr, 4, valid)
            ns = _u32(hdr, 12, valid)
            dur = np.divide(
                ns, sr, out=np.zeros(len(ns), np.float64), where=sr > 0
            )
            n_chunks = np.where(
                valid & (dur > 0), np.ceil(dur / chunk_seconds), 0
            ).astype(np.int64)
            ids = np.repeat(pdf[id_col].to_numpy(), n_chunks)
            total = int(n_chunks.sum())
            if total == 0:
                yield pd.DataFrame(
                    {"id": np.zeros(0, np.int64), "chunk_idx": [],
                     "start_sec": [], "dur_sec": []}
                )
                continue
            # per-clip chunk ordinals via global-arange minus repeated starts
            starts = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
            idx = np.arange(total) - np.repeat(starts, n_chunks)
            start_sec = idx * chunk_seconds
            dur_rep = np.repeat(dur, n_chunks)
            dur_sec = np.minimum(chunk_seconds, dur_rep - start_sec)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "chunk_idx": idx.astype(np.int32),
                    "start_sec": start_sec,
                    "dur_sec": dur_sec,
                }
            )

    return df.mapInPandas(
        run, "id long, chunk_idx int, start_sec double, dur_sec double"
    )


# ---------------------------------------------------------------------------
# video: opaque binary column; the header-only operators mirror the audio
# kernel (vectorized Arrow-buffer gather, explode by np.repeat — the
# payload itself is never duplicated per frame; a real pipeline's decode
# stage range-reads the container by frame offset)
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"FSVI"
VIDEO_HEADER_FMT = "<4sIIIII"  # magic, width, height, fps, n_frames, seed
VIDEO_HEADER_SIZE = struct.calcsize(VIDEO_HEADER_FMT)

VIDEO_META_SCHEMA = (
    "width int, height int, fps int, n_frames long, duration_sec double, "
    "n_bytes long, format string, valid boolean"
)


def encode_fake_video(
    width: int, height: int, fps: int, n_frames: int, seed: int
) -> bytes:
    """Deterministic fake video payload (fixture side): header + a
    truncated byte payload — headers stay truthful, which is all the
    header-only operators read."""
    rng = np.random.default_rng(seed)
    payload = rng.integers(
        0, 256, min(width * height * n_frames, 8192), dtype=np.uint8
    )
    return (
        struct.pack(
            VIDEO_HEADER_FMT, VIDEO_MAGIC, width, height, fps, n_frames, seed
        )
        + payload.tobytes()
    )


def _decode_video_one(buf: bytes, fake: bool) -> tuple[int, int, int, np.ndarray]:
    """The video codec boundary. Real impl: pyav/ffmpeg frame iterator."""
    if not fake:
        raise NotImplementedError(
            "video decode requires a container/codec library (pyav/ffmpeg) "
            "not present in this environment; pass fake=True for the "
            "deterministic test codec"
        )
    magic, w, h, fps, n, seed = struct.unpack_from(VIDEO_HEADER_FMT, buf)
    if magic != VIDEO_MAGIC:
        raise ValueError("not a fake-video payload")
    rng = np.random.default_rng(seed)
    frame = rng.integers(0, 256, (min(h, 8), min(w, 8)), dtype=np.uint8)
    return w, h, fps, frame


def video_metadata(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Header-only metadata pass over video payloads — vectorized Arrow
    gather, no decode, no per-row Python (mirrors audio_metadata)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hdr, n_bytes, valid = _gather_headers(
                pdf[binary_col], VIDEO_MAGIC, VIDEO_HEADER_SIZE
            )
            w = _u32(hdr, 4, valid)
            h = _u32(hdr, 8, valid)
            fps = _u32(hdr, 12, valid)
            nf = _u32(hdr, 16, valid)
            dur = np.divide(
                nf, fps, out=np.zeros(len(nf), np.float64), where=fps > 0
            )
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "width": w.astype(np.int32),
                    "height": h.astype(np.int32),
                    "fps": fps.astype(np.int32),
                    "n_frames": nf,
                    "duration_sec": dur,
                    "n_bytes": n_bytes,
                    "format": np.where(valid, "fsvi", "unknown"),
                    "valid": valid,
                }
            )

    return df.mapInPandas(run, f"id long, {VIDEO_META_SCHEMA}")


def video_frame_sample(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    every_sec: float = 1.0,
) -> DataFrame:
    """Vision-LM training prep: sample one frame every ``every_sec``
    seconds per clip, computed from the HEADER alone — one input row
    explodes to its sampled-frame rows carrying ``(frame_idx,
    timestamp_sec)`` for a downstream decoder. Vectorized like
    audio_chunks: counts from the header gather, the explode is one
    np.repeat/np.arange construction, the payload is NOT duplicated
    per frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hdr, _n_bytes, valid = _gather_headers(
                pdf[binary_col], VIDEO_MAGIC, VIDEO_HEADER_SIZE
            )
            fps = _u32(hdr, 12, valid)
            nf = _u32(hdr, 16, valid)
            step = np.maximum((fps * every_sec).astype(np.int64), 1)
            n_samp = np.where(
                valid & (nf > 0), (nf + step - 1) // step, 0
            ).astype(np.int64)
            total = int(n_samp.sum())
            if total == 0:
                yield pd.DataFrame(
                    {"id": np.zeros(0, np.int64),
                     "frame_idx": np.zeros(0, np.int64),
                     "timestamp_sec": np.zeros(0, np.float64)}
                )
                continue
            ids = np.repeat(pdf[id_col].to_numpy(), n_samp)
            starts = np.concatenate([[0], np.cumsum(n_samp)[:-1]])
            ordinal = np.arange(total) - np.repeat(starts, n_samp)
            frame_idx = ordinal * np.repeat(step, n_samp)
            fps_rep = np.repeat(fps, n_samp)
            ts = np.divide(
                frame_idx, fps_rep,
                out=np.zeros(total, np.float64), where=fps_rep > 0,
            )
            yield pd.DataFrame(
                {"id": ids, "frame_idx": frame_idx, "timestamp_sec": ts}
            )

    return df.mapInPandas(
        run, "id long, frame_idx long, timestamp_sec double"
    )


def video_features(
    df: DataFrame, binary_col: str, id_col: str, fake: bool = False
) -> DataFrame:
    """Decode + per-clip frame features (mean/std of the first decoded
    frame) — the decode is the stubbed codec boundary, the batch shape is
    the production plumbing (mirrors image/audio_features)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                w, h, fps, frame = _decode_video_one(bytes(b), fake)
                x = frame.astype(np.float64)
                rows.append(
                    (int(i), w, h, fps, float(x.mean()), float(x.std()))
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "width", "height", "fps", "px_mean", "px_std"],
            )

    return df.mapInPandas(
        run,
        "id long, width int, height int, fps int, px_mean double, "
        "px_std double",
    )


def audio_features(
    df: DataFrame, binary_col: str, id_col: str, fake: bool = False
) -> DataFrame:
    """Decode + waveform features (RMS / peak) per batch — the decode is
    the stubbed codec boundary, the batch shape is the production
    plumbing (mirrors image_features)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                sr, ch, pcm = _decode_audio_one(bytes(b), fake)
                x = pcm.astype(np.float64)
                rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
                peak = float(np.abs(x).max()) if len(x) else 0.0
                rows.append((int(i), sr, ch, rms, peak))
            yield pd.DataFrame(
                rows,
                columns=["id", "sample_rate", "channels", "rms", "peak"],
            )

    return df.mapInPandas(
        run, "id long, sample_rate int, channels int, rms double, peak double"
    )
