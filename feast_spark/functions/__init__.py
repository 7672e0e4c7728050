"""Scalar/text column functions (JVM-side) and transformation modes."""

from feast_spark.functions.text import (  # noqa: F401
    digit_count,
    doc_fingerprint,
    row_id,
    symbol_count,
    bpe_token_count,
    token_count,
)
