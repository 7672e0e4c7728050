"""Generation-artifact QA: detectors for the two classic failure modes
of model-written text that per-turn quality rules do not see.

``generation_artifacts`` flags TRUNCATED generations — turns cut off by
a token budget mid-sentence or mid-code-fence. A truncated assistant
turn scores healthy on length/stop-words/perplexity (the prefix of good
text is good text) yet teaches the model to stop mid-thought; every
SFT-curation stack drops or repairs them.

``suffix_loop_stats`` flags DECODE LOOPS — the trailing periodic
repetition signature of greedy/low-temperature sampling failures
("I'm sorry. I'm sorry. I'm sorry."). It is deliberately distinct from
the two repetition lenses already here: ``gopher_repetition`` measures
corpus-style duplicate n-gram FRACTIONS over a whole document, and
``conversation_repetition`` measures runs of identical consecutive
TURNS; neither sees a loop that lives INSIDE one turn's tail, because
the looped text is unique corpus-wide and the turn as a whole is not a
duplicate of its neighbours.

Both operators are MAP-ONLY over the (deduped) turn relation — no
exchange of their own, so they ride whatever partitioning the scan
gives at any corpus size. All verdict arithmetic is integer/boolean
(engine-portable; the DuckDB oracles re-derive it in genuine SQL).

Reference: feast has no transcript-QA surface (``sdk/python/feast``
profiles numeric/categorical feature columns only, ``dqm/profilers``);
these are public-pipeline operators (truncation repair and loop
filtering per the open SFT-data-cleaning playbooks; repetition-loop
analyses in the decoding literature, e.g. Holtzman et al. 2020).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "generation_artifacts",
    "suffix_loop_stats",
    "role_ngram_diversity",
    "code_block_stats",
    "special_token_stats",
    "unicode_anomaly_stats",
    "script_mix_stats",
    "DEFAULT_SPECIAL_MARKERS",
    "UNICODE_ANOMALY_CLASSES",
    "SCRIPT_CLASSES",
]

# the ONE cross-engine whitespace class (see conversation.py for the
# Java-vs-RE2 rationale) — imported, not re-declared, so the contract
# lives in one place
from feast_spark.operators.conversation import _ASCII_WS

# characters a COMPLETE prose/code turn plausibly ends on: sentence
# enders, closing quotes/brackets/fence backtick, markdown emphasis,
# plus their CJK/typographic forms (。！？ etc. — the pipeline is
# multilingual and zh turns end on fullwidth punctuation; an ASCII-only
# set would flag every long zh turn truncated). A long turn ending on
# anything else (letter, digit, comma, colon, operator...) is the
# mid-sentence-cut signature.
_CLEAN_ENDINGS = ".!?\"'`)]}*_。！？；）」』】》”’…"


def _count_occurrences(col, needle: str):
    """Occurrences of a literal ``needle`` via the length-difference
    trick — stays in whole-stage codegen, no regex engine involved.
    The double division is exact (differences are needle-multiples far
    below 2^52) and the cast floors to the exact integer."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def generation_artifacts(
    turns: DataFrame,
    role: str = "assistant",
    min_chars: int = 80,
    pre_deduped: bool = False,
) -> DataFrame:
    """Truncation / malformed-output QA per ``role`` turn.

    One row per ``role`` turn: ``(conv_id, turn_idx, n_chars, n_fences,
    fence_balanced, paren_delta, bracket_delta, brace_delta,
    ends_clean, trailing_ellipsis, truncated)``.

    - ``n_fences`` — occurrences of the markdown code-fence ```` ``` ````;
      an ODD count means the generation stopped inside a code block.
    - ``*_delta`` — opening minus closing count for ``()``, ``[]``,
      ``{}``. Exposed as signals only (prose legitimately unbalances
      parens — "1)" lists, emoticons), NOT folded into the verdict.
    - ``ends_clean`` — after stripping trailing ASCII whitespace, the
      final character is a sentence ender / closing quote / bracket /
      fence backtick (or the text is empty). A long turn that ends on a
      letter, digit, comma or operator was almost certainly cut by a
      token budget.
    - ``trailing_ellipsis`` — stripped text ends with ``...`` or
      ``…`` (a softer cut marker; surfaced separately because some
      styles end complete thoughts with it).
    - ``truncated`` — the verdict: unbalanced fence, OR a turn of at
      least ``min_chars`` characters that does not end clean. Short
      turns are exempt ("ok", "42" — fragments are normal replies).

    Scale shape: pure map over the deduped turn relation — length /
    replace / right are all whole-stage-codegen expressions, the only
    regex is the single trailing-whitespace strip, no exchange, no
    Python. At 10^12 turns this is scan-bound.
    """
    from feast_spark.operators.conversation import _deduped

    d = turns if pre_deduped else _deduped(turns)
    t = F.coalesce(F.col("text"), F.lit(""))
    stripped = F.regexp_replace(t, _ASCII_WS + "$", "")
    last = F.right(stripped, F.lit(1))
    n_fences = _count_occurrences(t, "```")
    ends_clean = (F.length(stripped) == 0) | F.contains(
        F.lit(_CLEAN_ENDINGS), last
    )
    fence_balanced = F.pmod(n_fences, F.lit(2)) == 0
    return d.filter(F.col("role") == role).select(
        "conv_id",
        "turn_idx",
        F.length(t).cast("long").alias("n_chars"),
        n_fences.alias("n_fences"),
        fence_balanced.alias("fence_balanced"),
        (_count_occurrences(t, "(") - _count_occurrences(t, ")")).alias(
            "paren_delta"
        ),
        (_count_occurrences(t, "[") - _count_occurrences(t, "]")).alias(
            "bracket_delta"
        ),
        (_count_occurrences(t, "{") - _count_occurrences(t, "}")).alias(
            "brace_delta"
        ),
        ends_clean.alias("ends_clean"),
        ((F.right(stripped, F.lit(3)) == "...") | (last == "…")).alias(
            "trailing_ellipsis"
        ),
        (
            ~fence_balanced
            | ((F.length(t) >= int(min_chars)) & ~ends_clean)
        ).alias("truncated"),
    )


def suffix_loop_stats(
    df: DataFrame,
    id_cols: tuple = ("conv_id", "turn_idx"),
    text_col: str = "text",
    max_period: int = 8,
    min_repeats: int = 2,
    units: int = 1 << 20,
) -> DataFrame:
    """Trailing-periodicity decode-loop detector, text grain (works on
    any relation with id columns + a text column — turns or documents).

    For each row, over the non-empty ASCII-whitespace word splits
    ``w[1..n]``: for every period ``p in 1..max_period`` count how many
    consecutive copies of the final ``p``-word block terminate the text
    (``reps(p)`` — maximal ``r`` such that the last ``r*p`` words are
    ``r`` verbatim copies of the last ``p`` words). The reported loop
    is the one covering the most words, tie broken toward the SMALLEST
    period (so "no no no no" reports p=1 r=4, not p=2 r=2).

    One row per input row: ``(*id_cols, n_words, period, n_repeats,
    loop_words, loop_units)`` where ``loop_words = period * n_repeats``
    when ``n_repeats >= min_repeats`` else 0 (with ``period`` 0 and
    ``n_repeats`` 1 in the no-loop case), and ``loop_units =
    loop_words * units div n_words`` — the integer fraction of the turn
    consumed by its trailing loop. ``loop_units`` near ``units`` is the
    hard-loop signature; a gate at e.g. ``units div 2`` catches turns
    whose second half is pure repetition.

    Scale shape: MAP-ONLY — the per-p repeat counts are JVM
    higher-order-function expressions over the word array (slice
    comparisons against the final block), evaluated per row with no
    exchange, no Python, no join. Cost note: Catalyst's ``filter`` HOF
    has no early exit, so every candidate repeat index is compared —
    O(n) word comparisons per period, O(n * max_period) total per row
    (8n at the default), still linear in turn length for fixed
    ``max_period``. At 10^12 turns this is scan-bound exactly like the
    heuristic rule pass.
    """
    ids = list(id_cols)
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), _ASCII_WS),
        lambda x: x != "",
    )
    d = df.select(*ids, toks.alias("__w"), F.size(toks).alias("__n"))

    # per-p candidate structs: (p, reps). reps is bounded by the first
    # repeat index whose block mismatches the final block.
    def _cand(p: int) -> str:
        m = f"(__n div {p})"
        reps = f"""
          CASE WHEN {m} < 2 THEN 1 ELSE
            coalesce(
              try_element_at(
                filter(sequence(2, {m}),
                       i -> NOT (slice(__w, __n - i*{p} + 1, {p})
                                 = slice(__w, __n - {p} + 1, {p}))),
                1) - 1,
              {m})
          END"""
        return (
            f"named_struct('p', {p}, 'reps', "
            f"CASE WHEN __n >= {2 * p} THEN ({reps}) ELSE 1 END)"
        )

    cands = ",".join(_cand(p) for p in range(1, int(max_period) + 1))
    # best = max over (loop_words, -p): most words covered, then the
    # smallest period — struct comparison is lexicographic by field
    best = F.expr(
        f"""array_max(transform(array({cands}),
              c -> named_struct(
                'lw', CASE WHEN c.reps >= {int(min_repeats)}
                           THEN c.reps * c.p ELSE 0 END,
                'negp', -c.p, 'p', c.p, 'reps', c.reps)))"""
    )
    b = d.select(*ids, "__n", best.alias("__b"))
    return b.select(
        *ids,
        F.col("__n").cast("long").alias("n_words"),
        F.expr("CASE WHEN __b.lw > 0 THEN __b.p ELSE 0 END")
        .cast("int")
        .alias("period"),
        F.expr("CASE WHEN __b.lw > 0 THEN __b.reps ELSE 1 END")
        .cast("int")
        .alias("n_repeats"),
        F.col("__b.lw").cast("long").alias("loop_words"),
        F.expr(
            f"CASE WHEN __n > 0 THEN (cast(__b.lw as bigint) * {int(units)}) div __n "
            "ELSE cast(0 as bigint) END"
        ).alias("loop_units"),
    )


def role_ngram_diversity(
    turns: DataFrame,
    n: int = 2,
    role_col: str = "role",
    pre_deduped: bool = False,
    hash_grams: bool = False,
) -> DataFrame:
    """Per-role distinct word-n-gram diversity — the distinct-n
    mode-collapse lens (Li et al. 2016's "distinct" metric, the standard
    diversity measure in the generation literature) at corpus grain.

    A fleet whose assistant collapses onto a few templates keeps per-turn
    rules happy (each turn is fluent) and largely evades exact turn dedup
    (digits/names vary), but its DISTINCT-n-gram mass craters relative to
    the user side. One row per role:

    - ``total_ngrams`` / ``distinct_ngrams`` — n-gram stream size and its
      distinct count (word n-grams over ASCII-ws tokens, RS-joined)
    - ``max_gram_count`` — the single most repeated n-gram's count
    - ``diversity_units`` — ``distinct * 2^20 // total`` (integer
      distinct-n ratio; low = collapse)
    - ``top_units`` — ``max_count * 2^20 // total`` (mass of the worst
      single template)

    Plan: map-side split + slice-transform builds the gram array with NO
    join or window; explode feeds ONE (role, gram) hash-agg (map-side
    combine collapses repeats before the exchange) and the role rollup
    reuses nothing but role-sized rows. At 10^12 turns the exchange
    carries the distinct-per-partition gram stream; pass
    ``hash_grams=True`` to shuffle 8-byte ``xxhash64`` surrogates instead
    of gram strings (counts identical modulo documented 2^-64-scale
    collisions) — the portable string arm exists for the DuckDB oracle.

    Reference: feast profiles numeric/categorical columns only
    (``dqm/profilers``); this is a public-metric operator.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from feast_spark.operators.conversation import _deduped, _norm_text

    d = turns if pre_deduped else _deduped(turns)
    nt = d.select(
        F.col(role_col).alias("role"), _norm_text("text").alias("__nt")
    ).filter(F.length("__nt") > 0)
    words = nt.select(
        "role", F.split("__nt", " ").alias("__w")
    ).filter(F.size("__w") >= n)
    grams = words.select(
        "role",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(__w) - {n}),"
                f" i -> concat_ws(chr(30), slice(__w, i + 1, {n})))"
            )
        ).alias("gram"),
    )
    if hash_grams:
        grams = grams.select("role", F.xxhash64("gram").alias("gram"))
    counts = grams.groupBy("role", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    out = counts.groupBy("role").agg(
        F.sum("__cnt").cast("long").alias("total_ngrams"),
        F.count(F.lit(1)).cast("long").alias("distinct_ngrams"),
        F.max("__cnt").cast("long").alias("max_gram_count"),
    )
    return out.select(
        "role",
        "total_ngrams",
        "distinct_ngrams",
        "max_gram_count",
        # exact integer division, never a double round-trip; the
        # numerator runs in DECIMAL(38,0) because distinct_ngrams can
        # pass 2^43 at 10^12-turn scale, where an int64 multiply by 2^20
        # wraps (round-5 review; IntegralDivide returns BIGINT and the
        # quotient is a share <= 2^20, so the result always fits)
        F.expr(
            "(CAST(distinct_ngrams AS DECIMAL(38,0)) * 1048576)"
            " div total_ngrams"
        ).cast("long").alias("diversity_units"),
        F.expr(
            "(CAST(max_gram_count AS DECIMAL(38,0)) * 1048576)"
            " div total_ngrams"
        ).cast("long").alias("top_units"),
    )


# fence tag then body, lazily up to the closing fence; (?s:) scopes
# DOTALL to the body so the tag class still stops at the newline. The
# same pattern bytes run under Java regex (Spark) and RE2 (DuckDB) —
# both support non-greedy + scoped flags; an unterminated trailing
# fence matches nothing on both engines (truncation QA for that lives
# in generation_artifacts' odd-fence-count signal).
_FENCE_PATTERN = "```([A-Za-z0-9_+#.-]*)\n((?s:.*?))```"


def code_block_stats(
    turns: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "text",
    pre_deduped: bool = False,
) -> DataFrame:
    """Fenced code-block mining over markdown-ish turns — the code-mass
    census a code-heavy transcript corpus is curated by (language mix,
    per-language code volume, how many documents carry each language).

    One row per fence language tag (``<none>`` for bare fences):

    - ``n_blocks`` — closed fenced blocks with that tag
    - ``n_code_chars`` — total characters inside those fences
    - ``n_docs`` — distinct ``id_col`` values carrying at least one

    Plan: ONE map-side regex pass per row extracts tag and body arrays
    (`arrays_zip` + explode — no join, the text column never leaves its
    partition un-reduced); a (lang, id) pre-aggregation bounds the
    distinct-doc count before the language rollup, so a mega-document
    with thousands of blocks collapses map-side and the second exchange
    carries dimension-sized rows. Nothing here is corpus-scale state.

    Reference: feast has no text mining surface; fence grammar is the
    CommonMark fenced-code-block shape restricted to backtick fences.
    """
    from feast_spark.operators.conversation import _deduped

    if not pre_deduped:
        if {"conv_id", "turn_idx", "ts"} <= set(turns.columns):
            turns = _deduped(turns)
        else:
            # never guess: a renamed-key frame would silently skip the
            # requested dedup and double-count duplicate deliveries
            # (round-5 review) — non-transcript inputs must acknowledge
            # their own dedup responsibility explicitly
            raise ValueError(
                "pre_deduped=False needs the canonical transcript keys "
                "(conv_id, turn_idx, ts) for latest-per-key dedup; pass "
                "pre_deduped=True for doc-grain or renamed-key inputs"
            )
    t = F.coalesce(F.col(text_col), F.lit(""))
    ex = turns.select(
        F.col(id_col).alias("__id"),
        F.arrays_zip(
            F.regexp_extract_all(t, F.lit(_FENCE_PATTERN), F.lit(1)).alias("tag"),
            F.regexp_extract_all(t, F.lit(_FENCE_PATTERN), F.lit(2)).alias("body"),
        ).alias("__z"),
    )
    blocks = ex.select(
        "__id", F.explode("__z").alias("__b")
    ).select(
        "__id",
        F.when(F.col("__b.tag") == "", F.lit("<none>"))
        .otherwise(F.col("__b.tag"))
        .alias("lang"),
        F.length("__b.body").cast("long").alias("__chars"),
    )
    per_doc = blocks.groupBy("lang", "__id").agg(
        F.count(F.lit(1)).cast("long").alias("__blocks"),
        F.sum("__chars").cast("long").alias("__doc_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.sum("__blocks").cast("long").alias("n_blocks"),
        F.sum("__doc_chars").cast("long").alias("n_code_chars"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


# chat-template control tokens that leak into model-written corpora —
# training on text that CONTAINS them teaches stop-token abuse and
# template confusion (every distillation/synthetic-data cleaning stack
# strips or drops them). Literal, case-sensitive: these are exact
# serialization artifacts, not prose.
DEFAULT_SPECIAL_MARKERS = [
    "<|im_start|>",
    "<|im_end|>",
    "<|endoftext|>",
    "</s>",
    "<s>",
    "[INST]",
    "[/INST]",
    "<<SYS>>",
    "<|user|>",
    "<|assistant|>",
    "<|system|>",
    "<|eot_id|>",
]


def special_token_stats(
    turns: DataFrame,
    markers: list[str] | None = None,
    pre_deduped: bool = False,
) -> DataFrame:
    """Census of chat-template / special-token leakage per (marker, role)
    — the serialization-artifact sibling of :func:`generation_artifacts`
    (which flags truncation; this flags template text that should never
    appear INSIDE a turn at all). Model-generated transcripts leak their
    producer's control tokens (``<|im_start|>``, ``</s>``, ``[INST]``…)
    whenever a scraper or a tool echoes raw template strings; the census
    says which marker family, which role, and how much.

    One row per (marker, role) with at least one hit:

    - ``n_hits`` — total occurrences (each marker counted independently,
      overlaps between DIFFERENT markers both count — census semantics)
    - ``n_turns`` — deduped turns containing the marker
    - ``n_convs`` — distinct conversations containing it

    Plan (10^12 turns): per-turn counts use the length-difference trick
    (whole-stage codegen, no regex engine); the per-turn struct array is
    FILTERED to hits before the explode, so the exploded relation carries
    only hit rows (markers are rare by construction — the relation is
    defect-sized, not corpus-sized). ``(marker, role, conv)`` pre-agg
    then ``(marker, role)`` agg keeps distinct-conv exact with no
    count-distinct expand and no skew (a mega-conversation pre-reduces to
    one row per marker).
    """
    from feast_spark.operators.conversation import _deduped

    ms = list(DEFAULT_SPECIAL_MARKERS if markers is None else markers)
    if not ms or any(not m for m in ms):
        raise ValueError("markers must be non-empty strings")
    d = turns if pre_deduped else _deduped(turns)
    t = F.coalesce(F.col("text"), F.lit(""))
    counts = F.array(
        *[
            F.struct(
                F.lit(m).alias("marker"),
                _count_occurrences(t, m).alias("cnt"),
            )
            for m in ms
        ]
    )
    hits = (
        d.select(
            "conv_id",
            "role",
            F.filter(counts, lambda s: s["cnt"] > 0).alias("__h"),
        )
        .filter(F.size("__h") > 0)
        .select("conv_id", "role", F.explode("__h").alias("__s"))
        .select(
            "conv_id",
            "role",
            F.col("__s.marker").alias("marker"),
            F.col("__s.cnt").alias("cnt"),
        )
    )
    pre = hits.groupBy("marker", "role", "conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("__n_turns"),
        F.sum("cnt").cast("long").alias("__n_hits"),
    )
    return pre.groupBy("marker", "role").agg(
        F.sum("__n_turns").cast("long").alias("n_turns"),
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.sum("__n_hits").cast("long").alias("n_hits"),
    )


# Unicode anomaly classes — each is a character class whose ``\x{...}``
# escape syntax parses identically under Java regex (Spark) and RE2
# (DuckDB), and every member is a single BMP codepoint so the
# length-difference count is per-OCCURRENCE on both engines (both
# ``length()`` implementations count codepoints). Deliberate exclusions,
# so the census never disagrees with the repo's other contracts:
# U+0000 (engines disagree on NUL-in-varchar handling), and \x0B/\x0C
# (members of the canonical ASCII whitespace class ``_ASCII_WS`` — the
# tokenizers here treat them as separators, not anomalies).
UNICODE_ANOMALY_CLASSES: list[tuple[str, str]] = [
    # trojan-source vector (CVE-2021-42574): explicit bidi embedding /
    # override / isolate controls re-order rendered text vs stored text
    ("bidi_control", "[\\x{202A}-\\x{202E}\\x{2066}-\\x{2069}]"),
    # invisible joiners/separators: steganographic payloads, copy-paste
    # artifacts, and tokenizer-splitting tricks
    ("zero_width", "[\\x{200B}-\\x{200D}\\x{2060}\\x{FEFF}]"),
    # U+FFFD is the decoder's "byte sequence was not UTF-8" tombstone —
    # any presence means an upstream mojibake/transcoding defect
    ("replacement_char", "[\\x{FFFD}]"),
    # C0 controls that clean text never contains (tab/LF/CR excluded —
    # legitimate; \x0B/\x0C excluded per _ASCII_WS above) plus DEL
    ("c0_control", "[\\x{0001}-\\x{0008}\\x{000E}-\\x{001F}\\x{007F}]"),
    # C1 controls: the classic latin-1-read-as-cp1252 mojibake band —
    # real text encodes curly quotes etc. ABOVE U+00A0, never here
    ("c1_control", "[\\x{0080}-\\x{009F}]"),
]


def unicode_anomaly_stats(
    turns: DataFrame,
    classes: list[tuple[str, str]] | None = None,
    pre_deduped: bool = False,
) -> DataFrame:
    """Census of invisible / malformed codepoints per (kind, role) — the
    byte-hygiene sibling of :func:`special_token_stats` (template text
    you can SEE) for the defects you cannot: bidi override controls
    (trojan-source reordering — rendered code differs from stored code),
    zero-width characters (steganography, copy-paste artifacts),
    U+FFFD replacement characters (upstream mojibake), and C0/C1
    control bands (transcoding damage). All of these survive every
    quality rule here — they are invisible to length/stop-word/
    perplexity stats and unique-enough text keeps dedup silent — yet
    they poison tokenizers and, for bidi controls in code blocks, are a
    documented supply-chain attack vector.

    One row per (kind, role) with at least one hit: ``n_chars`` (total
    anomalous codepoints), ``n_turns`` (deduped turns containing the
    class), ``n_convs`` (distinct conversations).

    Plan (10^12 turns): per-turn counts are ``length(t) -
    length(regexp_replace(t, class, ''))`` — one regex pass per class
    inside whole-stage codegen, map-only; the per-turn struct array is
    FILTERED to hits before the explode (anomalies are rare by
    construction, so the exploded relation is defect-sized); then the
    (kind, role, conv) pre-agg -> (kind, role) agg pair keeps
    distinct-conv exact with no count-distinct expand and no skew.
    """
    from feast_spark.operators.conversation import _deduped

    cs = list(UNICODE_ANOMALY_CLASSES if classes is None else classes)
    if not cs or any(not k or not p for k, p in cs):
        raise ValueError("classes must be non-empty (kind, pattern) pairs")
    d = turns if pre_deduped else _deduped(turns)
    t = F.coalesce(F.col("text"), F.lit(""))
    counts = F.array(
        *[
            F.struct(
                F.lit(k).alias("kind"),
                (F.length(t) - F.length(F.regexp_replace(t, p, ""))).alias(
                    "cnt"
                ),
            )
            for k, p in cs
        ]
    )
    hits = (
        d.select(
            "conv_id",
            "role",
            F.filter(counts, lambda s: s["cnt"] > 0).alias("__h"),
        )
        .filter(F.size("__h") > 0)
        .select("conv_id", "role", F.explode("__h").alias("__s"))
        .select(
            "conv_id",
            "role",
            F.col("__s.kind").alias("kind"),
            F.col("__s.cnt").alias("cnt"),
        )
    )
    pre = hits.groupBy("kind", "role", "conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("__n_turns"),
        F.sum("cnt").cast("long").alias("__n_chars"),
    )
    return pre.groupBy("kind", "role").agg(
        F.sum("__n_chars").cast("long").alias("n_chars"),
        F.sum("__n_turns").cast("long").alias("n_turns"),
        F.count(F.lit(1)).cast("long").alias("n_convs"),
    )


# Unicode script ranges as EXPLICIT codepoint classes — both Java and
# RE2 support \x{...} classes byte-identically, while named script
# properties diverge (Java spells them \p{IsHan}/\p{script=Han}, RE2
# \p{Han}; neither agrees on property coverage across versions), so the
# ranges are spelled out. BMP core blocks only — deliberate: the census
# is a drift lens, not a Unicode-complete classifier, and the classes
# must stay disjoint so per-script counts sum to <= total.
SCRIPT_CLASSES: list[tuple[str, str]] = [
    # basic Latin letters + Latin-1/Extended-A/B (é, ß, ø, č ...)
    ("latin", "[A-Za-z\\x{00C0}-\\x{024F}]"),
    ("digit", "[0-9]"),
    ("cyrillic", "[\\x{0400}-\\x{04FF}]"),
    ("greek", "[\\x{0370}-\\x{03FF}]"),
    ("arabic", "[\\x{0600}-\\x{06FF}]"),
    ("hebrew", "[\\x{0590}-\\x{05FF}]"),
    ("devanagari", "[\\x{0900}-\\x{097F}]"),
    # CJK unified ideographs + extension A
    ("han", "[\\x{4E00}-\\x{9FFF}\\x{3400}-\\x{4DBF}]"),
    ("kana", "[\\x{3040}-\\x{30FF}]"),
    # Hangul syllables + jamo
    ("hangul", "[\\x{AC00}-\\x{D7AF}\\x{1100}-\\x{11FF}]"),
]


def script_mix_stats(
    turns: DataFrame,
    classes: list[tuple[str, str]] | None = None,
    pre_deduped: bool = False,
    units: int = 1 << 20,
) -> DataFrame:
    """Census of writing-script codepoints per (script, role) — the
    model-free complement of ``conversation_language``: langid claims a
    LABEL per turn from a trained model; this counts raw codepoint
    EVIDENCE per script band, so it sees what a classifier smooths
    over — mixed-script turns (code-switching inside one turn),
    mojibake that lands in the wrong band (cp1252 double-decoding
    scatters Cyrillic into Latin-1 punctuation), and a fleet's language
    mix drifting between ingest batches (the per-batch (script, role)
    share vector is the cheapest language-drift alarm).

    One row per (script, role) with at least one hit: ``n_chars``
    (codepoints in the band), ``n_turns`` (deduped turns containing
    it), ``n_convs`` (distinct conversations), ``share_units`` =
    ``n_chars * units div`` (role's TOTAL text codepoints, whitespace
    included). Share numerators run in DECIMAL(38,0) — at 10^12 turns
    role char mass passes 2^43 and ``n_chars * 2^20`` would wrap int64
    (the temperature_sample_rates lesson).

    Plan (10^12 turns): identical chassis to
    :func:`unicode_anomaly_stats` — one regexp length-difference pass
    per class in whole-stage codegen, map-only; hit-filtered before the
    explode; (script, role, conv) pre-agg -> (script, role) agg keeps
    distinct-conv exact with no expand. Role totals are ONE extra
    role-grain hash agg broadcast back — roles are schema-bounded
    (user/assistant/system/tool), so the broadcast is a handful of rows
    at any corpus size.
    """
    from feast_spark.operators.conversation import _deduped

    cs = list(SCRIPT_CLASSES if classes is None else classes)
    if not cs or any(not k or not p for k, p in cs):
        raise ValueError("classes must be non-empty (kind, pattern) pairs")
    d = turns if pre_deduped else _deduped(turns)
    d = d.select("conv_id", "role", F.coalesce("text", F.lit("")).alias("__t"))
    counts = F.array(
        *[
            F.struct(
                F.lit(k).alias("script"),
                (
                    F.length("__t")
                    - F.length(F.regexp_replace("__t", p, ""))
                ).alias("cnt"),
            )
            for k, p in cs
        ]
    )
    hits = (
        d.select(
            "conv_id",
            "role",
            F.filter(counts, lambda s: s["cnt"] > 0).alias("__h"),
        )
        .filter(F.size("__h") > 0)
        .select("conv_id", "role", F.explode("__h").alias("__s"))
        .select(
            "conv_id",
            "role",
            F.col("__s.script").alias("script"),
            F.col("__s.cnt").alias("cnt"),
        )
    )
    pre = hits.groupBy("script", "role", "conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("__n_turns"),
        F.sum("cnt").cast("long").alias("__n_chars"),
    )
    agg = pre.groupBy("script", "role").agg(
        F.sum("__n_chars").cast("long").alias("n_chars"),
        F.sum("__n_turns").cast("long").alias("n_turns"),
        F.count(F.lit(1)).cast("long").alias("n_convs"),
    )
    totals = d.groupBy("role").agg(
        F.sum(F.length("__t")).cast("long").alias("__total_chars")
    )
    return agg.join(F.broadcast(totals), "role").select(
        "script",
        "role",
        "n_chars",
        "n_turns",
        "n_convs",
        F.expr(
            f"CAST((CAST(n_chars AS DECIMAL(38,0)) * {units})"
            " DIV __total_chars AS BIGINT)"
        ).alias("share_units"),
    )
