"""Gopher-style repetition statistics (Rae et al. 2021, table A1) — the
full duplicate-line / duplicate-n-gram rule family the quality pipeline's
``top2gram_frac`` (rules.py) is the one-column preview of.

Per document:

- ``dup_line_frac`` — fraction of lines that are repeat occurrences of an
  earlier identical line (occurrences beyond the first / total lines).
- ``dup_line_char_frac`` — chars inside those repeat-occurrence lines /
  total line chars.
- ``top{2,3,4}gram_char_frac`` — the most frequent word n-gram's char
  contribution (count x gram token-chars) / total token chars. Count
  ties resolve to the max contribution, so the VALUE is deterministic
  without naming a winner; overlapping occurrences each contribute
  (as in the public implementations), so degenerate docs can exceed 1.
- ``dup{5,8,10}gram_char_frac`` — fraction of token chars covered by ANY
  word n-gram that occurs more than once in the document (overlapping
  occurrences counted once — interval-union semantics).

"Chars" of a token span = sum of token lengths (whitespace between tokens
is not attributed) — documented engine variant; the naive oracle
(:func:`feast_spark.oracles.gopher_repetition_pdf`) uses the same
definition.

Implementation: ONE vectorized pandas kernel over all docs in an Arrow
batch — tokens are factorized corpus-batch-wide, n-grams become integer
code tuples compared via lexsort + run-length grouping (no string
concatenation anywhere, the round-3 n-gram lesson), and the dup-gram
char coverage uses a per-batch diff-array over token positions (mark
``[p, p+n)`` for every occurrence of a >1-count gram, prefix-sum, count
covered positions weighted by token length). Cost is O(total tokens x
n_orders) with sort factors — map-only over the corpus, no shuffle at
any scale.

Reference: feast has no corpus-statistics operators; the rule family is
from the public Gopher paper (also in Dolma / RedPajama-Data).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

__all__ = ["repetition_stats_pdf", "gopher_repetition"]

_TOP_ORDERS = (2, 3, 4)
_DUP_ORDERS = (5, 8, 10)

# Gopher's line-format rules (drop if >90% of lines start with a bullet
# or >30% end with an ellipsis) — the bullet set follows the public
# Dolma/RedPajama implementations
BULLET_PREFIXES = ("-", "*", "•", "‣", "▪", "·")
ELLIPSIS_SUFFIXES = ("...", "…")

# deterministic suffix the driver query appends so the bullet/ellipsis
# stats are non-trivial on the single-line testdata corpus (with
# line_sep='. ' it contributes two bullet lines and one ellipsis line)
DEMO_LINE_SUFFIX = (
    ". - alpha bullet one. - beta bullet two. gamma trails off…"
)


def _group_runs(keys: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """lexsort the key columns; return (order, run_starts) where runs are
    maximal equal-key groups in sorted order."""
    order = np.lexsort(tuple(reversed(keys)))
    n = len(order)
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for k in keys:
        ks = k[order]
        new[1:] |= ks[1:] != ks[:-1]
    return order, np.nonzero(new)[0]


def repetition_stats_pdf(texts: pd.Series) -> pd.DataFrame:
    """Vectorized kernel: all repetition stats for a batch of texts.
    Index-aligned 0..n-1 with ``texts``."""
    s = texts.fillna("").astype(str).reset_index(drop=True)
    n = len(s)
    out = {
        "dup_line_frac": np.zeros(n),
        "dup_line_char_frac": np.zeros(n),
        "bullet_line_frac": np.zeros(n),
        "ellipsis_line_frac": np.zeros(n),
    }
    for o in _TOP_ORDERS:
        out[f"top{o}gram_char_frac"] = np.zeros(n)
    for o in _DUP_ORDERS:
        out[f"dup{o}gram_char_frac"] = np.zeros(n)

    # ---- line stats -----------------------------------------------------
    lines = s.str.split("\n")
    flat_l = lines.explode()
    keep = flat_l.str.len().fillna(0).to_numpy() > 0
    flat_l = flat_l[keep]
    if len(flat_l):
        lrows = flat_l.index.to_numpy(dtype=np.int64)
        lcodes, _ = pd.factorize(flat_l)
        llen = flat_l.str.len().to_numpy(dtype=np.int64)
        order, starts = _group_runs([lrows, lcodes.astype(np.int64)])
        cnt = np.diff(np.append(starts, len(order)))
        # repeat occurrences beyond the first, per (row, line) group
        rep = cnt - 1
        grp_rows = lrows[order][starts]
        grp_len = llen[order][starts]
        n_lines = np.bincount(lrows, minlength=n).astype(np.float64)
        tot_chars = np.bincount(lrows, weights=llen, minlength=n)
        rep_lines = np.bincount(grp_rows, weights=rep, minlength=n)
        rep_chars = np.bincount(grp_rows, weights=rep * grp_len, minlength=n)
        nz = n_lines > 0
        out["dup_line_frac"][nz] = rep_lines[nz] / n_lines[nz]
        cz = tot_chars > 0
        out["dup_line_char_frac"][cz] = rep_chars[cz] / tot_chars[cz]
        # Gopher line-format stats: bullet-start / ellipsis-end fractions
        bullet = (
            flat_l.str.lstrip()
            .str.startswith(BULLET_PREFIXES)
            .to_numpy(dtype=np.float64)
        )
        ell = (
            flat_l.str.rstrip()
            .str.endswith(ELLIPSIS_SUFFIXES)
            .to_numpy(dtype=np.float64)
        )
        b_lines = np.bincount(lrows, weights=bullet, minlength=n)
        e_lines = np.bincount(lrows, weights=ell, minlength=n)
        out["bullet_line_frac"][nz] = b_lines[nz] / n_lines[nz]
        out["ellipsis_line_frac"][nz] = e_lines[nz] / n_lines[nz]

    # ---- token machinery shared by all gram orders ----------------------
    toks = s.str.lower().str.findall(r"\S+")
    flat = toks.explode().dropna()
    if not len(flat):
        return pd.DataFrame(out)
    rows = flat.index.to_numpy(dtype=np.int64)
    codes, uniq = pd.factorize(flat)
    codes = codes.astype(np.int64)
    tlen = flat.str.len().to_numpy(dtype=np.int64)
    tok_chars = np.bincount(rows, weights=tlen, minlength=n)
    denom = np.maximum(tok_chars, 1.0)
    # position of each token within its doc
    doc_start = np.zeros(len(rows), dtype=bool)
    doc_start[0] = True
    doc_start[1:] = rows[1:] != rows[:-1]
    first_pos = np.nonzero(doc_start)[0]
    pos_in_doc = np.arange(len(rows)) - np.repeat(
        first_pos, np.diff(np.append(first_pos, len(rows)))
    )
    # prefix char sums for O(1) gram char length: gramlen(p, o) =
    # cumlen[p+o] - cumlen[p] within a doc
    cumlen = np.concatenate(([0], np.cumsum(tlen)))

    k = np.int64(len(uniq) + 1)
    max_order = max((*_TOP_ORDERS, *_DUP_ORDERS))
    # rolling polynomial gram codes per order, built incrementally:
    # gram_o[i] = gram_{o-1}[i] * k + codes[i + o - 1] for grams fully
    # inside one doc. ANSI-safe: k^10 can overflow int64 for huge vocab —
    # rehash through a splitmix-style mix to stay in-range, collision
    # probability negligible for corpus batches (documented).
    def _mix(x: np.ndarray) -> np.ndarray:
        x = (x ^ (x >> 30)) * np.int64(-4658895280553007687)
        x = (x ^ (x >> 27)) * np.int64(-7723592293110705685)
        return x ^ (x >> 31)

    gram = codes.copy()
    for o in range(2, max_order + 1):
        m = len(gram) - 1
        if m <= 0:
            break
        valid = rows[o - 1:] == rows[: len(rows) - o + 1]
        gram = _mix(gram[:m]) * np.int64(1000003) + codes[o - 1:]
        gpos = np.arange(len(gram))
        sel = valid
        if not sel.any():
            continue
        g_rows = rows[:m][sel]
        g_codes = gram[sel]
        g_start = gpos[sel]  # flat token index of gram start
        g_len = cumlen[g_start + o] - cumlen[g_start]
        order_idx, starts = _group_runs([g_rows, g_codes])
        cnt = np.diff(np.append(starts, len(order_idx)))
        grp_rows = g_rows[order_idx][starts]
        if o in _TOP_ORDERS:
            # Gopher: the MOST COMMON n-gram's char contribution
            # (count x gram token-chars). Ties on count resolve to the
            # max contribution — value-deterministic without naming a
            # winner. Overlapping occurrences each contribute (public
            # implementations do the same), so degenerate docs can
            # exceed 1.0.
            glen_sorted = g_len[order_idx][starts]
            row_new = np.ones(len(grp_rows), dtype=bool)
            row_new[1:] = grp_rows[1:] != grp_rows[:-1]
            row_starts = np.nonzero(row_new)[0]
            maxc = np.maximum.reduceat(cnt, row_starts)
            grp_of = np.repeat(
                np.arange(len(row_starts)),
                np.diff(np.append(row_starts, len(grp_rows))),
            )
            score = np.where(cnt == maxc[grp_of], cnt * glen_sorted, 0)
            best = np.maximum.reduceat(score, row_starts)
            rows_u = grp_rows[row_starts]
            out[f"top{o}gram_char_frac"][rows_u] = best / denom[rows_u]
        if o in _DUP_ORDERS:
            # mark [start, start+o) for every occurrence of a >1-count gram
            dup_grp = cnt > 1
            if dup_grp.any():
                occ_dup = np.repeat(dup_grp, cnt)
                occ_starts = g_start[order_idx][occ_dup]
                diff = np.zeros(len(rows) + 1, dtype=np.int64)
                np.add.at(diff, occ_starts, 1)
                np.add.at(diff, occ_starts + o, -1)
                covered = np.cumsum(diff[:-1]) > 0
                cov_chars = np.bincount(
                    rows[covered], weights=tlen[covered], minlength=n
                )
                rows_d = np.unique(rows[covered])
                out[f"dup{o}gram_char_frac"][rows_d] = (
                    cov_chars[rows_d] / denom[rows_d]
                )
    return pd.DataFrame(out)


_SCHEMA = StructType(
    [StructField("doc_id", LongType())]
    + [
        StructField(c, DoubleType())
        for c in (
            [
                "dup_line_frac",
                "dup_line_char_frac",
                "bullet_line_frac",
                "ellipsis_line_frac",
            ]
            + [f"top{o}gram_char_frac" for o in _TOP_ORDERS]
            + [f"dup{o}gram_char_frac" for o in _DUP_ORDERS]
        )
    ]
)


def gopher_repetition(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    line_sep: str | None = None,
) -> DataFrame:
    """Gopher repetition stats per document — map-only ``mapInPandas``
    over the corpus (Arrow batches through the vectorized kernel), zero
    shuffles at any scale. ``line_sep`` pre-splits text into lines on a
    custom separator (e.g. ``'. '`` for single-line corpora) by rewriting
    it to ``\\n`` before the kernel; default uses newlines as-is."""
    sel = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    if line_sep is not None:
        import re as _re

        sel = sel.withColumn(
            "text", F.regexp_replace("text", _re.escape(line_sep), "\n")
        )

    def _run(batches):
        for pdf in batches:
            stats = repetition_stats_pdf(pdf["text"])
            stats.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield stats

    return sel.mapInPandas(_run, schema=_SCHEMA)
