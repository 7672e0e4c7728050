"""Text-analysis column functions — JVM-side (Catalyst expressions).

The reference has no scalar library of its own (SURVEY §2.8); the only
scalar ops it emits are row-id CONCAT synthesis (``spark.py:1718-1724``),
casts, and interval arithmetic. This module adds the text-analysis columns
a training-data pipeline needs, as pure ``pyspark.sql.functions``
compositions so they stay inside whole-stage codegen and are expressible
1:1 in the DuckDB oracle SQL.

Python/pandas paths (language-ID, perplexity) live in
:mod:`feast_spark.rules`; these are the cheap SQL-native counterparts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_count(col: str | Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def symbol_count(col: str | Column) -> Column:
    """Count of non-alphanumeric, non-space chars (ASCII classes so the
    DuckDB oracle regex behaves identically)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"[A-Za-z0-9 ]", ""))


def digit_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))


def doc_fingerprint(col: str | Column, method: str = "xxhash64") -> Column:
    """Deterministic fingerprint of whitespace-normalized lowercase text
    (exact-dedup key).

    ``xxhash64`` (default): 64-bit long — the scale path (8-byte shuffle
    key, stable across Spark versions). ``md5``: 128-bit hex string —
    the portable form every engine can recompute (DuckDB ``md5()``
    verifies it 1:1), at 4x the shuffle width."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    if method == "xxhash64":
        return F.xxhash64(norm)
    if method == "md5":
        return F.md5(norm)
    raise ValueError(f"unknown fingerprint method: {method}")


def row_id(key_cols: list[str], ts_col: str | None = None) -> Column:
    """Entity-row-id synthesis: sha2 over the canonical sorted-key concat —
    the reference's CONCAT row id (``spark.py:1718-1724``) hardened the way
    its key serializer canonicalizes (sorted keys,
    ``infra/key_encoding_utils.py:12-123``)."""
    parts = [
        F.coalesce(F.col(k).cast("string"), F.lit("__null__"))
        for k in sorted(key_cols)
    ]
    if ts_col:
        parts.append(F.col(ts_col).cast("string"))
    return F.sha2(F.concat_ws("\x1f", *parts), 256)


def bpe_token_count(col: str | Column) -> Column:
    """Approximate BPE pre-tokenizer token count — the GPT-2-style split
    (contraction suffixes, letter runs, digit runs, punctuation runs, each
    with an optional leading space), simplified to be lookahead-free so
    Java regex (Spark) and RE2 (DuckDB oracle) count identically. A cheap
    JVM-side stand-in for tokenizer-based length budgeting when the real
    tokenizer is too expensive for a first-pass filter."""
    c = F.col(col) if isinstance(col, str) else col
    pat = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"
    return F.regexp_count(c, F.lit(pat))


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "text_norm"
) -> DataFrame:
    """Unicode NFC + ASCII-whitespace collapse + trim — the text
    canonicalization pass run before hashing/dedup so visually-identical
    strings (decomposed accents, stray tab runs) hash identically.

    NFC has no JVM built-in, so this is the one text function on the
    Arrow path: a vectorized pandas UDF (``Series.str.normalize`` is a
    C-level loop over the batch, never per-row Python). The whitespace
    class is spelled explicitly (``[ \\t\\r\\n\\f]``) because Python
    ``\\s`` matches unicode spaces while RE2/DuckDB's does not — the
    explicit class keeps the DuckDB oracle (``nfc_normalize`` +
    ``regexp_replace(..., 'g')``) bit-identical. Map-only: zero shuffles
    at any scale."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):  # (pd.Series) -> pd.Series; annotations stringified by
        # `from __future__ import annotations` break pandas_udf inference
        return (
            s.fillna("")
            .str.normalize("NFC")
            .str.replace(r"[ \t\r\n\f]+", " ", regex=True)
            .str.strip(" ")
        )

    return df.withColumn(out_col, _norm(F.col(text_col)))
