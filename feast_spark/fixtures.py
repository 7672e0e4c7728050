"""Deterministic synthetic transcript generator.

Mirrors the reference's seeded fixture style
(``sdk/python/feast/driver_test_data.py:37-235``, seeded via
``np.random.seed(0)`` in
``tests/integration/offline_store/test_universal_historical_retrieval.py:41``)
for the BASELINE.json input shape:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``.

Planted defects per turn (driving every rule in ``rules.py``): non-English
spans, symbol soup, digit spam, repeated n-grams, low-stopword keyword
lists, PII strings, toxicity hits, empty/short turns. Skew knobs: every
``mega_every``-th conversation has ``mega_turns`` turns (mega-conversation
skew); ~2% of (conv_id, turn_idx) keys get a duplicated, later-``ts``
"edited" row to exercise latest-per-key dedup tie-breaking.

Determinism contract: each conversation is generated from
``SeedSequence([seed, conv_idx])``, so the Spark-distributed generator
(``transcripts_spark``, mapInPandas over ``spark.range``) produces
bit-identical rows to the local pandas generator regardless of
partitioning or parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from feast_spark.rules import LANG_WORDS, TOXICITY_LEXICON

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_TOOLS = ["search", "browser", "python", "calculator", "sql", "editor"]
_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")

# defect mix (probabilities sum to 1)
_CATS = [
    ("en", 0.47), ("de", 0.08), ("es", 0.08), ("fr", 0.08), ("zh", 0.06),
    ("symbols", 0.04), ("repeat", 0.04), ("lowstop", 0.04), ("digits", 0.03),
    ("pii", 0.03), ("toxic", 0.03), ("short", 0.02),
]
_CAT_NAMES = [c for c, _ in _CATS]
_CAT_P = np.array([p for _, p in _CATS])
_CAT_P = _CAT_P / _CAT_P.sum()

_KEYWORDS = (
    "spark shuffle partition executor broadcast catalyst parquet iceberg "
    "lineage checkpoint snapshot window rowgroup codegen arrow batch"
).split()


def _make_text(cat: str, rng: np.random.Generator) -> str:
    if cat in LANG_WORDS:
        words = LANG_WORDS[cat]
        n = int(rng.integers(8, 40))
        picks = rng.integers(0, len(words), n)
        sep = "" if cat == "zh" else " "
        return sep.join(words[i] for i in picks)
    if cat == "symbols":
        chars = np.array(list("!@#$%^&*(){}[]<>|~`+=\\/"))
        n = int(rng.integers(20, 80))
        return "".join(rng.choice(chars, n))
    if cat == "repeat":
        words = LANG_WORDS["en"]
        a, b = rng.integers(0, len(words), 2)
        reps = int(rng.integers(8, 20))
        return " ".join([words[a], words[b]] * reps)
    if cat == "lowstop":
        n = int(rng.integers(12, 30))
        picks = rng.integers(0, len(_KEYWORDS), n)
        return " ".join(_KEYWORDS[i] for i in picks)
    if cat == "digits":
        n = int(rng.integers(10, 30))
        nums = rng.integers(0, 99999, n)
        return " ".join(str(x) for x in nums)
    if cat == "pii":
        words = LANG_WORDS["en"]
        picks = rng.integers(0, len(words), 10)
        base = " ".join(words[i] for i in picks)
        uid = int(rng.integers(0, 10000))
        return (
            f"{base} contact me at user{uid}@example.com or "
            f"call 555-123-{uid % 10000:04d}"
        )
    if cat == "toxic":
        words = LANG_WORDS["en"]
        picks = rng.integers(0, len(words), 6)
        tox = rng.choice(np.array(TOXICITY_LEXICON, dtype=object), 3)
        mixed = [words[i] for i in picks] + list(tox)
        order = rng.permutation(len(mixed))
        return " ".join(mixed[i] for i in order)
    if cat == "short":
        return str(rng.choice(np.array(["ok", "yes", "no", "k", "...", "?"], dtype=object)))
    raise AssertionError(cat)


def gen_conversation(
    conv_idx: int,
    seed: int = 42,
    mega_every: int = 500,
    mega_turns: int = 1200,
    dup_prob: float = 0.02,
    loop_prob: float = 0.0,
) -> pd.DataFrame:
    """Generate one conversation deterministically from (seed, conv_idx).

    ``loop_prob`` > 0 plants an agent loop in that fraction of
    conversations: 3-5 verbatim copies of one existing turn appended as
    NEW turn_idx values (the agent re-emitting itself — the failure mode
    the opt-in ``agent_loop`` rule targets). All loop RNG draws happen
    only when loop_prob > 0, so the default output is byte-identical to
    before the parameter existed."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, conv_idx]))
    mega = mega_every > 0 and conv_idx % mega_every == 0 and conv_idx > 0
    n_turns = mega_turns if mega else int(2 + rng.geometric(0.18))
    conv_id = f"c{conv_idx:09d}"

    cats = rng.choice(len(_CAT_NAMES), n_turns, p=_CAT_P)
    texts = [_make_text(_CAT_NAMES[c], rng) for c in cats]

    roles = np.where(np.arange(n_turns) % 2 == 0, "user", "assistant").astype(object)
    if rng.random() < 0.2:
        roles[0] = "system"
    tool_mask = (roles == "assistant") & (rng.random(n_turns) < 0.18)
    roles[tool_mask] = "tool"
    tools = np.full(n_turns, None, dtype=object)
    tools[tool_mask] = rng.choice(np.array(_TOOLS, dtype=object), int(tool_mask.sum()))

    base_off = int(rng.integers(0, 365 * 24 * 3600))
    gaps = rng.integers(1, 120, n_turns).cumsum()
    ts = _EPOCH + ((base_off + gaps) * 1_000_000).astype("timedelta64[us]")

    pdf = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": np.arange(n_turns, dtype=np.int32),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )

    # planted duplicate keys: an "edited" later row per sampled turn_idx —
    # pipelines must keep the later-ts row (latest-per-key semantics)
    dup_mask = rng.random(n_turns) < dup_prob
    if dup_mask.any():
        dups = pdf[dup_mask].copy()
        dups["text"] = dups["text"] + " (edited)"
        dups["ts"] = dups["ts"] + np.timedelta64(1, "s")
        pdf = pd.concat([pdf, dups], ignore_index=True)
    if loop_prob > 0 and rng.random() < loop_prob:
        n_copies = int(3 + rng.integers(0, 3))
        src = int(rng.integers(0, n_turns))
        last_ts = pdf["ts"].max()
        loops = pd.DataFrame(
            {
                "conv_id": conv_id,
                "turn_idx": np.arange(
                    n_turns, n_turns + n_copies, dtype=np.int32
                ),
                "role": "assistant",
                "text": texts[src],
                "tool": None,
                "ts": last_ts
                + ((np.arange(n_copies) + 1) * 30 * 1_000_000).astype(
                    "timedelta64[us]"
                ),
            }
        )
        pdf = pd.concat([pdf, loops], ignore_index=True)
    return pdf


def generate_transcripts(
    n_convs: int,
    seed: int = 42,
    mega_every: int = 500,
    mega_turns: int = 1200,
    dup_prob: float = 0.02,
    loop_prob: float = 0.0,
) -> pd.DataFrame:
    """Local pandas generation (tests / oracle input)."""
    frames = [
        gen_conversation(i, seed, mega_every, mega_turns, dup_prob, loop_prob)
        for i in range(n_convs)
    ]
    out = pd.concat(frames, ignore_index=True)
    out["turn_idx"] = out["turn_idx"].astype(np.int32)
    return out


def transcripts_spark(
    spark,
    n_convs: int,
    seed: int = 42,
    mega_every: int = 500,
    mega_turns: int = 1200,
    dup_prob: float = 0.02,
    partitions: int | None = None,
    loop_prob: float = 0.0,
):
    """Distributed generation: mapInPandas over spark.range(n_convs).

    Bit-identical to :func:`generate_transcripts` at any parallelism —
    the per-conversation SeedSequence makes output independent of which
    executor generates which conversation.
    """
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_convs, numPartitions=parts)

    def gen(batches):
        for pdf in batches:
            frames = [
                gen_conversation(
                    int(i), seed, mega_every, mega_turns, dup_prob, loop_prob
                )
                for i in pdf["id"]
            ]
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return base.mapInPandas(gen, TRANSCRIPT_SCHEMA)


# ---------------------------------------------------------------------------
# large documents corpus (scale evidence for the pair/near-dup queries)
# ---------------------------------------------------------------------------

DOCUMENT_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

# 10k-token synthetic vocab of random letter strings: keeps accidental
# n-gram/fingerprint collisions between unrelated docs negligible (bigram
# space 10^8) while cross-token character k-grams stay PAIR-specific (a
# shared-prefix vocab like "tokNNNN" would make every 5-gram a function of
# one token, collapsing winnowing fingerprints to token-level df)
_vocab_rng = np.random.default_rng(20240701)
_DOC_VOCAB = np.array(
    [
        "".join(chr(97 + c) for c in _vocab_rng.integers(0, 26, int(n)))
        for n in _vocab_rng.integers(4, 9, 10_000)
    ],
    dtype=object,
)
_DOC_SOURCES = np.array(["web", "wiki", "forum", "code"], dtype=object)


def _gen_document_group(group_id: int, group_size: int, seed: int) -> pd.DataFrame:
    """One group of ``group_size`` docs: members 0..size-3 are independent;
    the last TWO are near-duplicate mutations of member 0 (a few words
    swapped), planting a transitive 3-cluster {0, size-2, size-1} per group
    so minhash/CC at scale exercise real candidate volume. Deterministic
    from (seed, group_id) regardless of partitioning."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, group_id]))
    base_ids = group_id * group_size + np.arange(group_size)
    texts: list[str] = []
    base_words = None
    for m in range(group_size):
        if m < group_size - 2 or group_size < 3:
            n = int(rng.integers(80, 300))
            words = _DOC_VOCAB[rng.integers(0, len(_DOC_VOCAB), n)]
            if m == 0:
                base_words = words.copy()
            texts.append(" ".join(words))
        else:
            # near-dup of member 0: mutate ~3% of words
            words = base_words.copy()
            k = max(1, int(len(words) * 0.03))
            pos = rng.integers(0, len(words), k)
            words[pos] = _DOC_VOCAB[rng.integers(0, len(_DOC_VOCAB), k)]
            texts.append(" ".join(words))
    return pd.DataFrame(
        {
            "doc_id": base_ids,
            "text": texts,
            "lang": "en",
            "source": _DOC_SOURCES[rng.integers(0, len(_DOC_SOURCES), group_size)],
            "n_chars": [len(t) for t in texts],
        }
    )


def documents_spark(spark, n_docs: int, seed: int = 42, group_size: int = 10,
                    partitions: int | None = None):
    """Distributed deterministic documents corpus with planted near-dup
    clusters (2 near-dups of member 0 per ``group_size`` block)."""
    assert n_docs % group_size == 0
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs // group_size, numPartitions=parts)

    def gen(batches):
        for pdf in batches:
            frames = [_gen_document_group(int(g), group_size, seed) for g in pdf["id"]]
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return base.mapInPandas(gen, DOCUMENT_SCHEMA)


EMBEDDING_FIXTURE_SCHEMA = "vec_id long, embedding array<float>, is_dup boolean"


def embeddings_spark(spark, n_vecs: int, dim: int = 64, seed: int = 42,
                     group_size: int = 10, partitions: int | None = None):
    """Distributed deterministic embedding corpus with planted semantic
    near-dups: per ``group_size`` block, members 0..size-2 are independent
    gaussians and the LAST member is member 0 plus 2% noise (cosine
    ~0.999), so SemDeDup at scale has ground truth (``is_dup`` marks the
    planted copies). Deterministic from (seed, group_id) regardless of
    partitioning, like ``documents_spark``."""
    assert n_vecs % group_size == 0
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_vecs // group_size, numPartitions=parts)

    def gen(batches):
        for pdf in batches:
            frames = []
            for g in pdf["id"]:
                rng = np.random.default_rng(np.random.SeedSequence([seed, int(g)]))
                vecs = rng.normal(size=(group_size, dim)).astype(np.float32)
                vecs[-1] = vecs[0] + 0.02 * rng.normal(size=dim).astype(np.float32)
                ids = int(g) * group_size + np.arange(group_size)
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids,
                            "embedding": [v for v in vecs],
                            "is_dup": [False] * (group_size - 1) + [True],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return base.mapInPandas(gen, EMBEDDING_FIXTURE_SCHEMA)
