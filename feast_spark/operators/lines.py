"""C4-style line-level cleaning (Raffel et al. 2020 §2.2) — the
line-grain counterpart of the document-grain rules in ``rules.py``:
instead of dropping whole documents, rewrite each document keeping only
its "good" lines, then flag documents left with too few.

Per line (after trim): keep iff

- non-blank,
- ends in terminal punctuation (``. ! ?`` — C4's sentence heuristic),
  unless ``require_terminal=False``,
- has at least ``min_words`` whitespace tokens,
- contains no blocklist phrase (case-insensitive substring — C4 uses
  "lorem ipsum" / "javascript" / policy phrases).

Per document: ``n_lines`` (non-blank lines), ``n_kept``, ``kept_frac``,
``text_clean`` (kept lines re-joined), ``n_chars_clean``, and ``doc_ok``
(at least ``min_kept_lines`` survivors — C4 drops pages with fewer than
a handful of sentences).

Everything is JVM-side higher-order array functions (``filter`` /
``transform`` lambdas inside whole-stage codegen) — no UDF, zero
shuffles, so the operator is a pure map pass at any corpus size. The
same predicates are expressible verbatim in DuckDB ``list_filter``
lambdas, which is what the driver oracle runs.

Reference: feast has no text-cleaning operators; the rule family is from
the public C4 paper (also in Dolma / RedPajama-Data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["clean_lines"]


def _keep_predicate(
    min_words: int, blocklist: tuple[str, ...], require_terminal: bool
) -> str:
    """SQL lambda body (over trimmed non-blank line ``x``) shared by the
    Spark plan; the DuckDB oracle spells the identical predicate."""
    parts = [f"size(split(x, '\\\\s+')) >= {int(min_words)}"]
    if require_terminal:
        parts.append("right(x, 1) IN ('.', '!', '?')")
    for phrase in blocklist:
        # escape for Spark's string-literal parser: backslashes first
        # (Spark interprets \t etc. inside literals; DuckDB does not),
        # then single quotes
        esc = phrase.replace("\\", "\\\\").replace("'", "''").lower()
        parts.append(f"NOT contains(lower(x), '{esc}')")
    return " AND ".join(parts)


def clean_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    blocklist: tuple[str, ...] = ("lorem ipsum", "javascript"),
    require_terminal: bool = True,
    min_kept_lines: int = 2,
    join_sep: str = "\n",
) -> DataFrame:
    """Line-filter each document; see module docstring. Map-only."""
    # coalesce NULL text to '' first: size(split(NULL)) is NULL in Spark
    # 3+, which would yield NULL n_lines/doc_ok rows that filter() drops
    # SILENTLY downstream (run_curation's audit would then misattribute
    # the drop to the span stage instead of line_clean)
    lines: Column = F.expr(
        f"filter(transform(split(coalesce({text_col}, ''), '\\n'),"
        " x -> trim(x)), x -> length(x) > 0)"
    )
    pred = _keep_predicate(min_words, tuple(blocklist), require_terminal)
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        lines.alias("_all"),
    ).select(
        "doc_id",
        F.size("_all").cast("long").alias("n_lines"),
        F.expr(f"filter(_all, x -> {pred})").alias("_kept"),
    )
    out = out.select(
        "doc_id",
        "n_lines",
        F.size("_kept").cast("long").alias("n_kept"),
        "_kept",
    ).select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.when(
            F.col("n_lines") > 0,
            F.col("n_kept").cast("double") / F.col("n_lines").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("kept_frac"),
        F.array_join("_kept", join_sep).alias("text_clean"),
    )
    return out.select(
        "*",
        F.length("text_clean").cast("long").alias("n_chars_clean"),
        (F.col("n_kept") >= int(min_kept_lines)).alias("doc_ok"),
    )
