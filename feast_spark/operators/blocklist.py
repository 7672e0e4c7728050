"""Large-phrase blocklist matching — trie-compiled single-pass scan.

Toxicity/compliance blocklists at corpus scale are thousands of literal
phrases. The naive plan — one regex alternation or one ``contains`` per
phrase — is O(phrases) passes over every document; the classic answer is
a multi-pattern automaton (Aho–Corasick). This module gets the same
single-pass behavior from Python's C regex engine by compiling the
phrase set into a TRIE-shaped pattern (shared prefixes collapse, so the
engine never backtracks across phrases) wrapped in a zero-width
lookahead, and counts every text position where ANY phrase starts.

Semantics (exact, order-free, what the naive oracle replays): a HIT is a
position ``i`` in ``lower(text)`` such that some phrase ``p`` satisfies
``text[i:i+len(p)] == p`` — substring-grain (catches phrases embedded in
longer words; real blocklists want this), overlapping hits all counted,
a position with several matching phrases counted ONCE.

At 100 TB: the phrase set is a broadcast variable; the compiled automaton
is built once per executor process (memoized); matching is one C pass
per document inside an Arrow batch — map-only, no shuffle, no per-phrase
rescan. Reference: feast has no text scanning; the engine's PII/toxicity
family (rules.py) covers pattern classes — this covers enumerated
literal phrases, the other half of a real scrubbing config.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_PATTERN_CACHE: dict[tuple[str, ...], re.Pattern] = {}

# demo blocklist for the driver query / oracle: drawn from the fixture
# vocabulary so hits are organic, with prefix-sharing ("spark"/"sparkle"),
# nesting ("table" inside "fast table"/"table table") and multi-word
# phrases to exercise the trie collapse and the position-grain semantics
DEMO_PHRASES = [
    "fast table",
    "table",
    "table table",
    "scan slow",
    "value part",
    "spark",
    "sparkle",
    "merge batch",
]


def trie_pattern(phrases: list[str]) -> str:
    """Serialize a phrase set into a trie-shaped regex matching exactly
    the union of the phrases (shared prefixes collapse into one branch).
    Phrases must be non-empty; matching is case-blind by convention —
    callers lower both the phrases and the text."""
    if not phrases or any(not p for p in phrases):
        raise ValueError("phrases must be a non-empty list of non-empty strings")
    trie: dict = {}
    for p in phrases:
        d = trie
        for ch in p:
            d = d.setdefault(ch, {})
        d[""] = {}

    def ser(d: dict) -> str:
        children = {ch: sub for ch, sub in d.items() if ch != ""}
        if not children:
            return ""
        alts = [re.escape(ch) + ser(sub) for ch, sub in sorted(children.items())]
        body = alts[0] if len(alts) == 1 else "(?:" + "|".join(alts) + ")"
        if "" in d:  # a phrase ends here AND longer phrases continue
            body = "(?:" + body + ")?"
        return body

    return ser(trie)


def _compiled(phrases: tuple[str, ...]) -> re.Pattern:
    pat = _PATTERN_CACHE.get(phrases)
    if pat is None:
        # zero-width lookahead: one match per STARTING POSITION regardless
        # of phrase overlap, and the scan never consumes matched text
        pat = re.compile(f"(?=(?:{trie_pattern(list(phrases))}))")
        _PATTERN_CACHE[phrases] = pat
    return pat


def blocklist_hits(
    df: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_hits, first_hit, flagged) per document.

    ``n_hits`` counts positions where any phrase starts, ``first_hit``
    is the earliest such position (-1 when clean), ``flagged`` is the
    keep/drop signal a curation stage consumes."""
    key = tuple(sorted({p.lower() for p in phrases}))
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(key)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pat = _compiled(bc.value)
        for pdf in batches:
            lowered = pdf[text_col].fillna("").astype(str).str.lower()
            counts, firsts = [], []
            for s in lowered:
                # ONE pass: finditer over the zero-width pattern yields a
                # match per hit position — count and first offset together
                # (findall would allocate a list of empty strings and a
                # second search() would rescan the prefix)
                n_s, first = 0, -1
                for m in pat.finditer(s):
                    if n_s == 0:
                        first = m.start()
                    n_s += 1
                counts.append(n_s)
                firsts.append(first)
            n = pd.Series(counts, dtype="int64")
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_hits": n,
                    "first_hit": pd.Series(firsts, dtype="int64"),
                    "flagged": (n > 0),
                }
            )

    return df.mapInPandas(
        run, "id long, n_hits long, first_hit long, flagged boolean"
    )
