"""HTML boilerplate removal — the entry step of every web-corpus
pipeline (C4/CCNet/RefinedWeb/FineWeb all begin at raw HTML), missing
from tag-blind text rules: drop script/style payloads, split the page
into block-level segments, and keep only content blocks (enough words,
low link-text density — the jusText/trafilatura heuristic family,
public algorithms).

Everything is JVM-side (``regexp_replace`` / ``split`` / higher-order
``transform``/``filter``/``aggregate`` lambdas inside whole-stage
codegen) — no UDF, zero shuffles, a pure map pass at any corpus size.
The driver oracle replays the identical regex program in Python ``re``
(the patterns are chosen to behave identically under Java and Python
regex: explicit ASCII case classes instead of ``(?i)`` — whose
casefolding scope differs between the engines — plus non-greedy dotall
and backreferences, which agree).

Rules per block (after tag-strip + entity unescape + ASCII-whitespace
collapse):

- keep iff ``n_words >= min_words`` AND
  ``link_chars * 100 <= max_link_pct * len(text)`` where ``link_chars``
  counts the inner text of ``<a>`` elements in the RAW block — a nav bar
  whose visible text is all anchors fails the density test even though
  tag-stripping preserves its words.

Reference: feast has no HTML handling; the block/link-density heuristics
follow the public jusText (Pomikálek 2011) and C4 preprocessing
descriptions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_html_text", "BLOCK_SPLIT", "SCRIPT_STYLE", "ENTITIES"]

def _ci(word: str) -> str:
    """ASCII case-class form of a tag name ('div' -> '[dD][iI][vV]').

    Deliberately NOT ``(?i)``: Python ``re`` IGNORECASE casefolds
    Unicode (U+017F long-s matches 's'!) while Java CASE_INSENSITIVE is
    ASCII-only — explicit classes make the shared patterns behave
    identically in both engines."""
    return "".join(f"[{c}{c.upper()}]" if c.isalpha() else c for c in word)


_BLOCK_TAGS = (
    "p", "div", "li", "ul", "ol", "br", "hr", "table", "tr", "td", "th",
    "thead", "tbody", "section", "article", "header", "footer", "nav",
    "aside", "blockquote", "pre", "title",
)

# block-level boundaries: opening OR closing forms of the common block
# tags; inline tags (a/b/i/em/strong/span/code) stay inside their block
BLOCK_SPLIT = (
    "</?(?:[hH][1-6]|"
    + "|".join(_ci(t) for t in _BLOCK_TAGS)
    + ")[^>]*>"
)
# backreference \1 is case-SENSITIVE without (?i): '<script>...</SCRIPT>'
# stays unmatched — same on both engines, and mixed-case close tags are
# vanishingly rare against the casefold divergence the (?i) form carried
SCRIPT_STYLE = (
    rf"(?s)<({_ci('script')}|{_ci('style')})[^>]*>.*?</\1>"
)
ANCHOR = rf"(?s)<{_ci('a')}[^>]*>(.*?)</{_ci('a')}>"
TAG = r"<[^>]+>"
# fixed substitution ORDER (amp last) — the oracle replays the same order
ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)
_WS = "[ \t\n\x0b\f\r]+"  # ASCII whitespace — identical in Java and Python


def _block_text(x: Column) -> Column:
    """Visible text of one raw block: strip tags, unescape the basic
    entities in the fixed order, collapse ASCII whitespace, trim."""
    t = F.regexp_replace(x, TAG, " ")
    for ent, rep in ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, _WS, " "))


def _link_chars(x: Column) -> Column:
    """Character count of anchor inner text in one raw block."""
    return F.aggregate(
        F.regexp_extract_all(x, F.lit(ANCHOR), 1),
        F.lit(0).cast("long"),
        lambda acc, a: acc + F.length(F.regexp_replace(a, TAG, "")),
    )


def extract_html_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    min_words: int = 3,
    max_link_pct: int = 30,
    join_sep: str = "\n",
) -> DataFrame:
    """(doc_id, text, n_blocks, n_kept) — content text per page.

    ``n_blocks`` counts non-empty visible blocks; ``n_kept`` those that
    pass the word-count + link-density gates; ``text`` joins the kept
    blocks with ``join_sep``. Integer link-density compare (``chars*100
    <= pct * len``) keeps both engines float-free."""
    cleaned = F.regexp_replace(
        F.coalesce(F.col(html_col), F.lit("")), SCRIPT_STYLE, " "
    )
    blocks = F.split(cleaned, BLOCK_SPLIT)
    stats = F.transform(
        blocks,
        lambda x: F.struct(
            _block_text(x).alias("txt"),
            _link_chars(x).alias("lc"),
        ),
    )
    nonempty = F.filter(stats, lambda b: b["txt"] != "")
    kept = F.filter(
        nonempty,
        lambda b: (
            F.size(F.split(b["txt"], " ")) >= F.lit(int(min_words))
        )
        & (
            b["lc"] * F.lit(100)
            <= F.lit(int(max_link_pct)) * F.length(b["txt"]).cast("long")
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_join(
            F.transform(kept, lambda b: b["txt"]), join_sep
        ).alias("text"),
        F.size(nonempty).cast("long").alias("n_blocks"),
        F.size(kept).cast("long").alias("n_kept"),
    )
