"""Privacy transforms beyond drop-in scrubbing: consistent
pseudonymization of PII entities.

:func:`feast_spark.rules.scrub_text` (the pipeline's scrub stage,
reference surface: feast's transformation nodes,
``infra/compute_engines/spark/nodes.py`` map-transform shape) replaces
every entity with one fixed tag (``<EMAIL>``), which destroys linkage:
after scrubbing, "the same address appeared in 40 conversations" is
unrecoverable, and a model trained on the scrub can't learn that two
turns reference the same participant. Consistent pseudonymization — the
standard alternative in de-identification practice (HIPAA Safe-Harbor
tooling, Presidio's "replace with hash" operator) — maps each DISTINCT
entity to a stable opaque token, preserving co-reference while removing
the identifier itself.

Design: the token is a pure function of the entity text
(``<KIND:md5(entity)[:k]>``), so the operator is MAP-ONLY — no distinct
pass, no id-assignment shuffle, no broadcast state. Two corpus runs (or
two clusters, or incremental batches) emit identical tokens for the same
entity by construction, which is exactly the "consistent across the
10^12-turn corpus" requirement; a seeded variant (``salt``) re-keys the
pseudonym space per release so tokens can't be joined across published
datasets. Cross-entity linkage analysis stays available downstream via
:func:`feast_spark.operators.conversation.pii_entity_exposure`.

Execution: one Arrow-batched pandas pass (``mapInPandas``-style scalar
UDF); a vectorized char-class prescan gates the regex work to rows that
can possibly hold PII (every pattern requires a digit or ``@``), the
replacement itself runs in the C regex engine with a per-MATCH Python
callback — Python cost scales with matches found, not rows scanned.
Patterns and their fixed application order are shared with
:data:`feast_spark.rules.SCRUB_PATTERNS` so counts here agree with the
pipeline's scrub counters.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feast_spark.rules import SCRUB_PATTERNS

__all__ = ["pseudonymize_entities"]


def pseudonymize_entities(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "phone", "ipv4"),
    token_chars: int = 10,
    salt: str = "",
    out_col: str = "text_pseudo",
) -> DataFrame:
    """Replace each PII entity in ``text_col`` with a stable pseudonym
    ``<KIND:md5(salt || entity)[:token_chars]>``; append ``out_col``
    plus ``n_pseudo`` (total replacements) and one ``n_pseudo_<kind>``
    column per requested kind.

    Kinds apply in :data:`SCRUB_PATTERNS` order regardless of the order
    given (same discipline as ``rules.pii_match_counts``: pattern ``p``
    runs on the text AFTER earlier patterns were replaced, so an email's
    digits can never double-count as a phone). Unknown kind names raise.

    Scale shape: map-only — the plan has no Exchange; the pseudonym
    needs no global entity table because it is a content hash. With the
    default empty ``salt`` the mapping is reproducible across runs and
    batches (incremental ingestion emits consistent tokens); set a
    per-release ``salt`` to make published datasets unlinkable to each
    other while staying internally consistent.
    """
    order = [name for name, _, _ in SCRUB_PATTERNS]
    unknown = set(kinds) - set(order)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    active = [
        (name, pat)
        for name, pat, _ in SCRUB_PATTERNS
        if name in set(kinds)
    ]

    count_cols = [f"n_pseudo_{name}" for name, _ in active]
    schema = (
        f"{out_col} string, n_pseudo int, "
        + ", ".join(f"{c} int" for c in count_cols)
    )

    def _batch(texts: pd.Series) -> pd.DataFrame:
        import re

        out = texts.fillna("")
        n = len(out)
        counts = {c: pd.Series(0, index=out.index) for c in count_cols}
        gate = out.str.contains(r"[@0-9]", regex=True)
        if gate.any():
            sub = out[gate]
            for name, pat in active:
                rx = re.compile(pat)

                def _tok(m, _name=name):
                    h = hashlib.md5(
                        (salt + m.group()).encode("utf-8")
                    ).hexdigest()[:token_chars]
                    return f"<{_name.upper()}:{h}>"

                counts[f"n_pseudo_{name}"].loc[sub.index] = sub.str.count(
                    pat
                ).astype("int64")
                sub = sub.str.replace(rx, _tok, regex=True)
            out = out.copy()
            out[gate] = sub
        res = pd.DataFrame({out_col: out})
        total = pd.Series(0, index=out.index)
        for c in count_cols:
            res[c] = counts[c].astype("int32")
            total = total + counts[c]
        res.insert(1, "n_pseudo", total.astype("int32"))
        assert len(res) == n
        return res[[out_col, "n_pseudo", *count_cols]]

    pseudo = F.pandas_udf(_batch, schema)(F.col(text_col))
    with_struct = df.withColumn("__pseudo", pseudo)
    return with_struct.select(
        *df.columns,
        F.col(f"__pseudo.{out_col}").alias(out_col),
        F.col("__pseudo.n_pseudo").alias("n_pseudo"),
        *[F.col(f"__pseudo.{c}").alias(c) for c in count_cols],
    )
