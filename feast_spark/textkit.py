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
