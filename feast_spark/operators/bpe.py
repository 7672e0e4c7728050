"""Corpus-trained BPE tokenizer — the merge-table learner a training-data
pipeline ships next to its corpus statistics (the fourth trained model in
the family: n-gram LM, language identifier, quality classifier, and now
the tokenizer).

No reference analogue (feast has no tokenizer; its transformation surface
is ``transformation/pandas_transformation.py``); the algorithm is the
published byte-pair-encoding recipe (Sennrich et al. 2016) made
Spark-native:

- **One corpus pass, ever.** The corpus text is touched by exactly one
  hash aggregation (word → count). Everything after runs on the DISTINCT
  WORD table — at 100 TB that is ~10^8 rows against ~10^13 corpus words,
  and each merge iteration costs O(distinct words), independent of the
  corpus size.
- **Each merge = one weighted pair count + one map.** Adjacent symbol
  pairs explode JVM-side (``transform`` over ``slice`` zips); the count is
  a map-side-combined hash agg; the argmax lands on the driver (a single
  row); applying the winning merge rewrites the (small) symbol arrays in
  one Arrow ``mapInPandas`` pass. ``localCheckpoint`` every few merges
  caps the plan lineage.
- **Integer-exact determinism.** Counts are int64 sums (order
  independent); the winning pair breaks count ties lexicographically, so
  training is bit-reproducible at any parallelism — pinned against a
  pure-Python replay oracle.
- **Encoding joins, never loops.** Token counts come from joining corpus
  words against the trained word → n_tokens table (broadcast when it
  fits); unseen words encode map-side through the merge ranks inside the
  same vectorized kernel the trainer used.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


# ---------------------------------------------------------------------------
# shared pure-Python kernels (trainer, oracle, and encoder use the same code
# — the same discipline as rules.py / spherical_kmeans)
# ---------------------------------------------------------------------------


def apply_merge(symbols: list[str], a: str, b: str) -> list[str]:
    """Replace every non-overlapping adjacent (a, b) with a+b, scanning
    left to right — the canonical BPE application order."""
    out: list[str] = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a trained merge-rank table: repeatedly apply
    the lowest-rank applicable merge (the standard BPE encode)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = pair
        if best_pair is None:
            break
        syms = apply_merge(syms, *best_pair)
    return syms


def train_bpe_naive(
    word_counts: dict[str, int], num_merges: int, min_count: int = 1
) -> list[tuple[str, str]]:
    """Pure-Python BPE trainer — the bit-exact oracle twin of
    :func:`train_bpe` (same tie-break: max count, then lexicographically
    smallest pair)."""
    state = {w: list(w) + [END_OF_WORD] for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in state.items():
            c = word_counts[w]
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        # max count; ties -> lexicographically SMALLEST pair
        best_pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best_pair] < min_count:
            break
        merges.append(best_pair)
        a, b = best_pair
        for w in state:
            state[w] = apply_merge(state[w], a, b)
    return merges


@dataclass(frozen=True)
class BpeModel:
    merges: tuple[tuple[str, str], ...]

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        return {p: i for i, p in enumerate(self.merges)}


# ---------------------------------------------------------------------------
# distributed trainer
# ---------------------------------------------------------------------------


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """THE corpus pass: word → count hash agg (map-side combined)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    min_count: int = 1,
    checkpoint_every: int = 8,
) -> BpeModel:
    """Learn ``num_merges`` BPE merges from the corpus, distributed.

    State lives in a ``(word, cnt, syms array<string>)`` DataFrame — the
    distinct-word table, NOT the corpus. Per iteration: adjacent pairs
    explode JVM-side weighted by ``cnt``; one hash agg ranks pairs; the
    single winning row comes to the driver (deterministic tie-break:
    count desc, pair asc); one Arrow map pass rewrites the symbol arrays.
    Stops early when no pair reaches ``min_count``.
    """
    state = _word_counts(docs, text_col).select(
        "word",
        "cnt",
        # split(word, '') can emit a trailing '' (Java split semantics) —
        # filter keeps the char list exact
        F.concat(
            F.filter(F.split(F.col("word"), ""), lambda c: c != F.lit("")),
            F.array(F.lit(END_OF_WORD)),
        ).alias("syms"),
    ).localCheckpoint()

    merges: list[tuple[str, str]] = []
    for it in range(num_merges):
        ln = F.greatest(F.size("syms") - 1, F.lit(0))
        pairs = state.select(
            F.col("cnt"),
            F.explode(
                F.arrays_zip(F.slice("syms", 1, ln), F.slice("syms", 2, ln))
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.0").alias("a"), F.col("p.1").alias("b"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))

        def apply_batch(batches: Iterator[pd.DataFrame], a=a, b=b) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["syms"] = [
                    apply_merge(list(s), a, b) for s in pdf["syms"]
                ]
                yield pdf

        state = state.mapInPandas(
            apply_batch, "word string, cnt long, syms array<string>"
        )
        if (it + 1) % checkpoint_every == 0:
            state = state.localCheckpoint()
    return BpeModel(merges=tuple(merges))


# ---------------------------------------------------------------------------
# encoding (token counts per document)
# ---------------------------------------------------------------------------


def bpe_token_counts(
    docs: DataFrame,
    model: BpeModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE token counts under a trained model.

    The encode cost is paid once per DISTINCT word (one Arrow pass over
    the word table — word-level memoization is structural, not a cache);
    the corpus-sized side only explodes words and joins the broadcast
    ``word → n_tokens`` table, then one hash agg per doc. Returns
    ``(id_col, n_words, n_bpe_tokens)``.

    The distinct-word encode pipeline is :func:`_distinct_word_tokens`
    — shared with :func:`bpe_encode`, so token COUNTS and token-id
    ENCODINGS can never disagree on tokenization.
    """
    word_tokens = _distinct_word_tokens(docs, model, text_col).select(
        "word", F.size("toks").cast("long").alias("n_tokens")
    )
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    return (
        words.join(F.broadcast(word_tokens), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tokens").alias("n_bpe_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# encoding to token ids
# ---------------------------------------------------------------------------


def _distinct_word_tokens(docs: DataFrame, model: BpeModel, text_col: str) -> DataFrame:
    """(word, tokens array<string>) over the DISTINCT word table — the
    encode cost is paid once per distinct word, never per corpus word."""
    ranks = model.ranks
    spark = docs.sparkSession
    bc_ranks = spark.sparkContext.broadcast(ranks)
    distinct_words = (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r = bc_ranks.value
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "toks": [encode_word(w, r) for w in pdf["word"]],
                }
            )

    return distinct_words.mapInPandas(encode_batch, "word string, toks array<string>")


def bpe_vocab(word_tokens: DataFrame) -> DataFrame:
    """(token, token_id) — ids assigned by lexicographic token order, so
    the vocab is a pure function of (corpus, model), independent of
    partitioning. The table is vocab-sized (≤ base alphabet +
    num_merges rows), so the unpartitioned ordering window is a
    single-task pass over a tiny relation, not a corpus funnel."""
    from pyspark.sql import Window

    toks = word_tokens.select(F.explode("toks").alias("token")).distinct()
    return toks.withColumn(
        "token_id",
        (F.row_number().over(Window.orderBy("token")) - 1).cast("int"),
    )


def bpe_encode(
    docs: DataFrame,
    model: BpeModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document to BPE token ids:
    ``(id_col, token_ids array<int>, n_tokens)``.

    Pipeline shape: ONE Arrow pass over the distinct-word table encodes
    to token strings; the vocab (tiny) joins back broadcast to turn each
    word into an int-id array; the corpus side explodes words with
    position, joins the broadcast ``word → ids`` table, and one hash agg
    per doc re-assembles the stream via ``array_sort`` over
    ``(pos, ids)`` structs + ``flatten`` — deterministic without a
    global sort, and the corpus text itself never enters a shuffle
    (only word keys and int arrays do).
    """
    wt = _distinct_word_tokens(docs, model, text_col)
    vocab = bpe_vocab(wt)
    word_ids = (
        wt.select("word", F.posexplode("toks").alias("tpos", "token"))
        .join(F.broadcast(vocab), "token")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "token_id"))),
                lambda s: s["token_id"],
            ).alias("ids")
        )
    )
    words = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    return (
        words.join(F.broadcast(word_ids), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "ids"))),
                    lambda s: s["ids"],
                )
            ).alias("token_ids")
        )
        .withColumn("n_tokens", F.size("token_ids").cast("bigint"))
    )


def token_fertility(
    docs: DataFrame,
    model: BpeModel,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer fertility statistics — the standard lens for
    judging how well a tokenizer serves each language/source slice of a
    mixed corpus (high fertility = more tokens per word = that slice pays
    more compute per byte of signal; UniMax-style mixture design and
    tokenizer evaluation both start here).

    Returns ``(group, n_docs, n_words, n_bpe_tokens, n_bytes,
    fertility_units, bytes_per_token_units)`` where the last two are
    2^-20 floor-quantized integer ratios (tokens/word and UTF-8
    bytes/token) — exact int64 arithmetic, so a naive replay matches
    bit-for-bit without float-order concerns.

    Shape: the encode cost is one Arrow pass over the DISTINCT word
    table (shared :func:`_distinct_word_tokens` pipeline); the corpus
    side explodes words, joins the broadcast ``word -> (n_tokens,
    n_bytes)`` table, and ONE hash agg per group produces the stats —
    corpus text never enters a shuffle."""
    word_stats = _distinct_word_tokens(docs, model, text_col).select(
        "word",
        F.size("toks").cast("long").alias("n_tokens"),
        F.octet_length("word").cast("long").alias("n_bytes"),
    )
    # NULL group keys would vanish in the equi-join below (NULL != NULL
    # in SQL join semantics) — map them to a sentinel group so the
    # null-lang corpus slice is reported, not silently dropped
    group = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    words = docs.select(
        group.alias("group"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    docs_per_group = docs.groupBy(group.alias("group")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    agg = (
        words.join(F.broadcast(word_stats), "word")
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tokens").alias("n_bpe_tokens"),
            F.sum("n_bytes").alias("n_bytes"),
        )
    )
    unit = 1 << 20
    return (
        agg.join(F.broadcast(docs_per_group), "group")
        .select(
            "group",
            "n_docs",
            "n_words",
            "n_bpe_tokens",
            "n_bytes",
            F.expr(f"CAST(n_bpe_tokens * {unit} DIV n_words AS BIGINT)").alias(
                "fertility_units"
            ),
            F.expr(f"CAST(n_bytes * {unit} DIV n_bpe_tokens AS BIGINT)").alias(
                "bytes_per_token_units"
            ),
        )
    )
