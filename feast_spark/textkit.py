"""Shared flat-codepoint kernel for vectorized text hashing.

One implementation of the concat → utf-32 codepoint array → per-row
boundary masking → rolling polynomial k-gram hash pattern, used by:

- operators.dedup._shingle_hash_batch (MinHash shingles, k=5)
- operators.dedup._simhash_batch (SimHash grams, k=4)

rules.perplexity keeps its own specialization (it needs UNMASKED
position-aligned hashes for the per-char probability mix) but shares the
same constants; its byte-level behavior is pinned by the oracle tests.

Keeping it in one place means surrogate handling, boundary masking and
the hash constants cannot drift apart between the oracle-shared rules
code and the dedup operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

HASH_BASE = np.uint64(1000003)
HASH_MIX = np.uint64(0x9E3779B97F4A7C15)


def flat_codes(
    texts: pd.Series, lowercase: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Flatten a Series of strings to (uint32 codepoints, per-row lengths).

    surrogatepass keeps lone surrogates (possible in arbitrary Python
    strings) from raising — they land in the BMP surrogate block and hash
    like any other codepoint.
    """
    filled = texts.fillna("").astype(str)
    if lowercase:
        filled = filled.str.lower()
    joined = "".join(filled.tolist())
    codes = np.frombuffer(
        joined.encode("utf-32-le", "surrogatepass"), dtype=np.uint32
    )
    lens = filled.str.len().to_numpy(dtype=np.int64)
    return codes, lens


def rolling_kgram_hashes(
    codes: np.ndarray, lens: np.ndarray, k: int, mix: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, doc_ids) for every within-row k-gram.

    Polynomial hash base HASH_BASE over uint64 (mod-2^64 wraparound),
    optionally finalized with the Fibonacci multiplier. Grams that span
    row boundaries are masked out.
    """
    n = len(lens)
    doc = np.repeat(np.arange(n), lens)
    if len(codes) < k:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    h = codes[: len(codes) - k + 1].astype(np.uint64).copy()
    for j in range(1, k):
        h = h * HASH_BASE + codes[j : len(codes) - k + 1 + j]
    if mix:
        h = h * HASH_MIX
    gdoc = doc[k - 1 :]
    valid = doc[: len(codes) - k + 1] == gdoc
    return h[valid], gdoc[valid]


# ---------------------------------------------------------------------------
# content-defined chunking (Gear hash / FastCDC family)
# ---------------------------------------------------------------------------
#
# The gear rolling hash (Xia et al., FastCDC '16 — public algorithm):
# ``h_i = (h_{i-1} << 1) + G[b_i] mod 2^64`` over UTF-8 BYTES, a chunk cut
# after every byte where ``h & cdc_mask(avg_bits) == 0`` (spread mask —
# see :func:`cdc_mask`). Because terms
# shifted >= 64 positions vanish mod 2^64, each cut decision depends on at
# most the trailing 64 bytes — boundaries are CONTENT-DEFINED and
# self-synchronizing: inserting or deleting bytes only perturbs chunking
# inside a 64-byte radius, unlike fixed-size blocks where one inserted
# byte shifts every later block. This file holds the constants and the
# naive scalar reference; the vectorized batch kernel lives in
# ``operators.dedup`` and is parity-pinned against this one.

_GEAR_TABLE: np.ndarray | None = None

# multiplicative inverse of HASH_BASE mod 2^64 (HASH_BASE is odd);
# used by the vectorized prefix-difference chunk hasher
HASH_BASE_INV = np.uint64(pow(int(HASH_BASE), -1, 1 << 64))


def gear_table() -> np.ndarray:
    """256-entry uint64 gear table, derived deterministically from md5 so
    the Spark kernel and the pure-python oracle share it byte-for-byte."""
    global _GEAR_TABLE
    if _GEAR_TABLE is None:
        import hashlib

        vals = [
            int.from_bytes(
                hashlib.md5(bytes([b])).digest()[:8], "big"
            )
            for b in range(256)
        ]
        _GEAR_TABLE = np.array(vals, dtype=np.uint64)
    return _GEAR_TABLE


def cdc_mask(avg_bits: int) -> int:
    """Cut mask with ``avg_bits`` bits SPREAD across positions 16..58
    (FastCDC's zero-padded-gear trick): bit j of the gear register is a
    function of the trailing ``64 - j`` bytes only, so a mask packed into
    the LOW bits makes the cut decision depend on just ``avg_bits``
    trailing bytes — on low-entropy text (small vocabularies, templated
    logs) those few-byte windows can simply never hit zero and the
    chunker degenerates to whole-document chunks. Spreading the mask
    bits high keeps a ~48-byte decision window at any avg_bits."""
    lo, hi = 16, 58
    if avg_bits == 1:
        return 1 << hi
    pos = {lo + round(i * (hi - lo) / (avg_bits - 1)) for i in range(avg_bits)}
    assert len(pos) == avg_bits, "avg_bits too large for the spread range"
    return sum(1 << p for p in pos)


def cdc_chunks_py(
    data: bytes, avg_bits: int = 6
) -> list[tuple[int, int]]:
    """Naive scalar reference chunker: ``[(chunk_hash, chunk_len), ...]``
    in stream order (NOT deduplicated). Chunk hash is the HASH_BASE
    polynomial over the chunk's bytes (int64 two's-complement view, the
    same value the vectorized kernel emits)."""
    g = gear_table()
    mask = cdc_mask(avg_bits)
    m64 = (1 << 64) - 1
    h = 0
    start = 0
    out: list[tuple[int, int]] = []

    def _poly(seg: bytes) -> int:
        p = 0
        for b in seg:
            p = (p * int(HASH_BASE) + b) & m64
        # int64 two's-complement view to match the numpy .view(int64)
        return p - (1 << 64) if p >= (1 << 63) else p

    for i, b in enumerate(data):
        h = ((h << 1) + int(g[b])) & m64
        if (h & mask) == 0:
            out.append((_poly(data[start : i + 1]), i + 1 - start))
            start = i + 1
    if start < len(data):
        out.append((_poly(data[start:]), len(data) - start))
    return out
