"""Lexical-diversity statistics per document — the vocabulary-grain
quality signals (type/token ratio, hapax fraction, unigram entropy) that
complement the repetition family (``operators/repetition.py``): low
diversity catches template/boilerplate text that n-gram repetition rules
miss when the repeats are non-contiguous.

Per document over lowercased whitespace tokens:

- ``n_tokens``, ``n_types`` — token and distinct-token counts
- ``type_token_ratio`` — ``n_types / n_tokens``
- ``hapax_frac`` — fraction of types occurring exactly once
- ``mean_word_len`` — total token chars / ``n_tokens``
- ``unigram_entropy`` — Shannon entropy (bits) of the token frequency
  distribution.

Bit-exactness strategy (shared with the naive oracle in
``feast_spark.oracles.lexical_stats_pdf``): the ratio columns are single
IEEE divisions of exact integers. Entropy is a multi-term float sum,
whose value would depend on summation order — so each term
``-(c/n)*log2(c/n)`` (identical numpy elementwise ops on both sides) is
quantized to integer units of 2^-40 bits via ``floor(term * 2**40)``;
those integer-valued doubles sum EXACTLY in any order (total < 2^53), and
the final ``/ 2**40`` is one division. The kernel and the oracle
therefore agree bit-for-bit without agreeing on iteration order.

Implementation: one vectorized map-only kernel per Arrow batch —
factorize + lexsort run-length grouping (no per-doc python loop), zero
shuffles at any corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from feast_spark.operators.repetition import _group_runs

__all__ = ["lexical_stats_pdf_batch", "lexical_stats"]

_QUANT = float(2**40)  # entropy quantization: integer units of 2^-40 bits


def lexical_stats_pdf_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized kernel: all lexical stats for a batch of texts,
    index-aligned 0..n-1 with ``texts``."""
    s = texts.fillna("").astype(str).reset_index(drop=True)
    n = len(s)
    zeros = lambda: np.zeros(n)  # noqa: E731
    out = {
        "n_tokens": np.zeros(n, dtype=np.int64),
        "n_types": np.zeros(n, dtype=np.int64),
        "type_token_ratio": zeros(),
        "hapax_frac": zeros(),
        "mean_word_len": zeros(),
        "unigram_entropy": zeros(),
    }
    toks = s.str.lower().str.findall(r"\S+")
    flat = toks.explode().dropna()
    if not len(flat):
        return pd.DataFrame(out)
    rows = flat.index.to_numpy(dtype=np.int64)
    codes, _ = pd.factorize(flat)
    tlen = flat.str.len().to_numpy(dtype=np.int64)

    n_tok = np.bincount(rows, minlength=n).astype(np.int64)
    tok_chars = np.bincount(rows, weights=tlen, minlength=n)
    order, starts = _group_runs([rows, codes.astype(np.int64)])
    cnt = np.diff(np.append(starts, len(order))).astype(np.int64)
    grp_rows = rows[order][starts]
    n_typ = np.bincount(grp_rows, minlength=n).astype(np.int64)
    n_hapax = np.bincount(grp_rows, weights=(cnt == 1), minlength=n)

    # entropy terms, quantized (see module docstring)
    p = cnt / n_tok[grp_rows]
    q = np.floor(-(p * np.log2(p)) * _QUANT)
    ent_q = np.bincount(grp_rows, weights=q, minlength=n)

    nz = n_tok > 0
    out["n_tokens"] = n_tok
    out["n_types"] = n_typ
    out["type_token_ratio"][nz] = n_typ[nz] / n_tok[nz]
    out["mean_word_len"][nz] = tok_chars[nz] / n_tok[nz]
    tz = n_typ > 0
    out["hapax_frac"][tz] = n_hapax[tz] / n_typ[tz]
    out["unigram_entropy"][nz] = ent_q[nz] / _QUANT
    return pd.DataFrame(out)


_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("n_types", LongType()),
        StructField("type_token_ratio", DoubleType()),
        StructField("hapax_frac", DoubleType()),
        StructField("mean_word_len", DoubleType()),
        StructField("unigram_entropy", DoubleType()),
    ]
)


def lexical_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Lexical-diversity stats per document — map-only ``mapInPandas``
    (zero shuffles at any scale)."""
    sel = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )

    def _run(batches):
        for pdf in batches:
            stats = lexical_stats_pdf_batch(pdf["text"])
            stats.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield stats

    return sel.mapInPandas(_run, schema=_SCHEMA)
