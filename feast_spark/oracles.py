"""Driver-side oracle relations for hash/model/codec-based operators.

The driver's correctness gate runs each ``queries()`` entry on Spark and
its ``oracle_sql()`` twin on DuckDB. Operators built on our own hash
kernels (MinHash shingles, SimHash, random-hyperplane LSH) and on the
scoring model have no faithful ANSI-SQL re-expression — round 1 left them
``no_oracle``. This module closes that gap the way the round-1 review
prescribed: an INDEPENDENT driver-side recomputation (pure numpy/pandas —
naive data structures, no Spark, no DataFrame algebra) is materialized to
parquet, and the oracle SQL simply reads it. The Spark plan and the naive
recomputation share only the leaf hash kernels (:mod:`feast_spark.textkit`
/ :mod:`feast_spark.rules` — the same shared-kernel discipline the
pipeline oracle uses, ``pipeline/oracle.py``); every relational step
(bucketing, joins, dedup, ranking, fixpoints) is re-derived naively here.

Bit-exactness notes (values are compared by hash, so floats must match
exactly, not approximately):

- Jaccard = ``len(intersect)/len(union)`` — one IEEE double division of
  exact ints on both sides.
- Cosine / hyperplane projections replicate Spark's ``aggregate`` fold
  order: elementwise product (float32 widened to double) then a
  LEFT-TO-RIGHT running sum (``np.add.accumulate`` is sequential), never
  pairwise/`np.dot` summation.
- LSH plane literals are parsed from the same ``%.9f`` strings the SQL
  expression embeds, so both engines see identical doubles.

Relations are rebuilt on every :func:`ensure_oracles` call within a new
process (memoized per-process) — no staleness across code changes.
"""

from __future__ import annotations

import os
import re
from collections import defaultdict
from datetime import datetime, timezone

import numpy as np
import pandas as pd

ORACLE_ROOT = "/tmp/feast_spark_oracles"

_BUILT: set[tuple[str, str]] = set()


def oracle_path(sf_dir: str, name: str) -> str:
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(ORACLE_ROOT, sf_name, f"{name}.parquet")


def _seq_sum(prods: np.ndarray, axis: int = -1) -> np.ndarray:
    """Left-to-right sequential sum — matches Spark's aggregate() fold."""
    return np.add.accumulate(prods, axis=axis)[..., -1]


# ---------------------------------------------------------------------------
# minhash / simhash over documents
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 31) - 1


def _doc_shingles(sf_dir: str, k: int) -> tuple[np.ndarray, list[np.ndarray]]:
    from feast_spark.operators.dedup import _shingle_hash_batch

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs["doc_id"].to_numpy(), _shingle_hash_batch(docs["text"], k)


def minhash_cand_est_pdf(
    sf_dir: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    seed: int = 42,
) -> pd.DataFrame:
    """Naive replay of the BANDED CANDIDATE pair table with the
    per-pair signature-match count — the per-pair half of
    ``minhash_est_histogram`` (the histogram itself is re-derived in
    GENUINE SQL by the driver oracle). Same bucketing/signature math as
    :func:`_minhash_pairs_core`, no gate, no verify."""
    from feast_spark.operators.dedup import _perm_params

    ids, shingles = _doc_shingles(sf_dir, shingle_k)
    a, b = _perm_params(num_hashes, seed)
    rows_per_band = num_hashes // bands
    buckets: dict[tuple, list[int]] = defaultdict(list)
    sigs: dict[int, np.ndarray] = {}
    for i in range(len(ids)):
        arr = shingles[i]
        if len(arr) == 0:
            continue
        xm = np.mod(arr, _MERSENNE)
        sig = np.mod(a[:, None] * xm[None, :] + b[:, None], _MERSENNE).min(axis=1)
        sigs[i] = sig
        for bi in range(bands):
            key = (bi, *sig[bi * rows_per_band : (bi + 1) * rows_per_band].tolist())
            buckets[key].append(i)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                ia, ib = (i, j) if ids[i] < ids[j] else (j, i)
                cand.add((ia, ib))
    # candidate ids are positional indexes; map back through ids — but the
    # (ia, ib) ordering above already compared doc ids, so emit doc ids
    rows = [
        (int(ids[i]), int(ids[j]), int((sigs[i] == sigs[j]).sum()))
        for i, j in sorted(cand)
    ]
    return pd.DataFrame(rows, columns=["id_a", "id_b", "est"]).astype(
        {"id_a": "int64", "id_b": "int64", "est": "int64"}
    )


def minhash_pairs_pdf(
    sf_dir: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
) -> pd.DataFrame:
    """Naive LSH over the documents table (int64 ids)."""
    ids, shingles = _doc_shingles(sf_dir, shingle_k)
    rows = _minhash_pairs_core(
        ids, shingles, num_hashes, bands, jaccard_threshold, seed
    )
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"]).astype(
        {"id_a": "int64", "id_b": "int64", "jaccard": "float64"}
    )


def _minhash_pairs_core(
    ids, shingles, num_hashes, bands, jaccard_threshold, seed
) -> list[tuple]:
    """Naive LSH: dict-of-buckets on the band-value TUPLE (bucket equality
    == band-hash equality modulo xxhash64 collisions), exact set Jaccard.
    Generic over the id dtype (int doc ids, string conv ids)."""
    from feast_spark.operators.dedup import _perm_params

    a, b = _perm_params(num_hashes, seed)
    rows_per_band = num_hashes // bands
    buckets: dict[tuple, list[int]] = defaultdict(list)
    sets: dict[int, set] = {}
    sigs: dict[int, np.ndarray] = {}
    for i in range(len(ids)):
        arr = shingles[i]
        if len(arr) == 0:  # NULL-sig docs drop out of banding in Spark
            continue
        sets[i] = set(arr.tolist())
        xm = np.mod(arr, _MERSENNE)  # pmod: positive, matches Spark
        sig = np.mod(a[:, None] * xm[None, :] + b[:, None], _MERSENNE).min(axis=1)
        sigs[i] = sig
        for bi in range(bands):
            key = (bi, *sig[bi * rows_per_band : (bi + 1) * rows_per_band].tolist())
            buckets[key].append(i)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                ia, ib = (i, j) if ids[i] < ids[j] else (j, i)
                cand.add((ia, ib))
    # replicate the operator's signature-estimate gate bit-for-bit
    min_matches = -(-num_hashes * jaccard_threshold // 2)  # ceil
    rows = []
    for i, j in sorted(cand):
        if int((sigs[i] == sigs[j]).sum()) < min_matches:
            continue
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        jac = inter / union  # one IEEE double division, same as Spark
        if jac >= jaccard_threshold:
            rows.append((ids[i], ids[j], jac))
    return rows


def bpe_tokens_pdf(sf_dir: str, num_merges: int = 16) -> pd.DataFrame:
    """Naive replay of q_bpe_tokens: train BPE (pure-python twin) on the
    doc_id%5==0 subset, count tokens per doc over the whole table."""
    from feast_spark.operators.bpe import (
        encode_word,
        train_bpe_naive,
    )

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    train = docs[docs["doc_id"] % 5 == 0]
    wc: dict[str, int] = {}
    for text in train["text"]:
        for w in text.split():
            if w:
                wc[w] = wc.get(w, 0) + 1
    merges = train_bpe_naive(wc, num_merges)
    ranks = {pq: i for i, pq in enumerate(merges)}
    tok_cache: dict[str, int] = {}

    def n_tokens(w: str) -> int:
        if w not in tok_cache:
            tok_cache[w] = len(encode_word(w, ranks))
        return tok_cache[w]

    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        words = [w for w in text.split() if w]
        rows.append((int(doc_id), len(words), sum(n_tokens(w) for w in words)))
    return pd.DataFrame(rows, columns=["doc_id", "n_words", "n_bpe_tokens"]).astype(
        {"doc_id": "int64", "n_words": "int64", "n_bpe_tokens": "int64"}
    )


def tokenize_pack_pdf(
    sf_dir: str, num_merges: int = 16, seq_len: int = 64
) -> pd.DataFrame:
    """Naive replay of q_tokenize_pack: train BPE (pure-python twin) on
    the doc_id%5==0 subset, encode every doc via the shared encode_word
    kernel with a lexicographic token->id vocab, concatenate the corpus
    stream in doc_id order, chunk into seq_len sequences. token ids are
    emitted space-joined (ids_str) so the driver hash compares strings,
    not engine-specific array renderings."""
    from feast_spark.operators.bpe import encode_word, train_bpe_naive

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = docs.sort_values("doc_id")
    train = docs[docs["doc_id"] % 5 == 0]
    wc: dict[str, int] = {}
    for text in train["text"]:
        for w in text.split():
            if w:
                wc[w] = wc.get(w, 0) + 1
    merges = train_bpe_naive(wc, num_merges)
    ranks = {pq: i for i, pq in enumerate(merges)}
    enc_cache: dict[str, list[str]] = {}

    def toks(w: str) -> list[str]:
        if w not in enc_cache:
            enc_cache[w] = encode_word(w, ranks)
        return enc_cache[w]

    all_tokens: set[str] = set()
    doc_tok_strs: list[list[str]] = []
    for text in docs["text"]:
        ts = [t for w in text.split() if w for t in toks(w)]
        doc_tok_strs.append(ts)
        all_tokens.update(ts)
    vid = {t: i for i, t in enumerate(sorted(all_tokens))}
    stream: list[int] = []
    bounds: list[tuple[int, int]] = []
    for ts in doc_tok_strs:
        ids = [vid[t] for t in ts]
        bounds.append((len(stream), len(stream) + len(ids)))
        stream.extend(ids)
    rows = []
    n_seqs = (len(stream) + seq_len - 1) // seq_len
    for s in range(n_seqs):
        seg = stream[s * seq_len : (s + 1) * seq_len]
        n_docs = sum(
            1 for a, b in bounds if a < (s + 1) * seq_len and b > s * seq_len and b > a
        )
        rows.append((s, " ".join(map(str, seg)), len(seg), n_docs))
    return pd.DataFrame(
        rows, columns=["seq_id", "ids_str", "n_tokens", "n_docs"]
    ).astype({"seq_id": "int64", "ids_str": "string", "n_tokens": "int64",
              "n_docs": "int64"})


def _conv_token_streams(
    num_merges: int = 8,
) -> dict[str, tuple[list[int], list[int]]]:
    """Shared front half of the pack_conversations replays: fixture
    transcripts -> latest-per-(conv_id, turn_idx) dedup -> ``role: text``
    rendering -> pure-python BPE twin -> per-conversation (token_ids,
    loss_mask) streams in turn order. Both packing modes (corpus-stream
    and conversation-isolated) consume this."""
    from feast_spark.operators.bpe import encode_word, train_bpe_naive
    from feast_spark.pipeline.oracle import oracle_dedup_latest

    turns = transcripts_raw_pdf(None)
    # whole-row latest pick (sort + tail(1)) — groupby(...).last() would
    # splice columns across rows when the newest row holds a NaN
    d = oracle_dedup_latest(turns).sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    )
    d["line"] = d["role"].astype(str) + ": " + d["text"].fillna("").astype(str)
    # tokenize with Java's \s (ASCII whitespace only) — python str.split()
    # also splits on Unicode whitespace (\xa0,  , ...), which would
    # silently diverge from the Spark arm's split(col, '\\s+')
    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")
    wc: dict[str, int] = {}
    for line in d["line"]:
        for w in java_ws.split(line):
            if w:
                wc[w] = wc.get(w, 0) + 1
    merges = train_bpe_naive(wc, num_merges)
    ranks = {pq: i for i, pq in enumerate(merges)}
    enc_cache: dict[str, list[str]] = {}

    def toks(w: str) -> list[str]:
        if w not in enc_cache:
            enc_cache[w] = encode_word(w, ranks)
        return enc_cache[w]

    all_tokens: set[str] = set()
    per_turn: list[tuple[str, int, list[str], int]] = []
    for conv, idx, role, line in zip(
        d["conv_id"], d["turn_idx"], d["role"], d["line"]
    ):
        ts = [t for w in java_ws.split(line) if w for t in toks(w)]
        all_tokens.update(ts)
        per_turn.append((conv, int(idx), ts, 1 if role == "assistant" else 0))
    vid = {t: i for i, t in enumerate(sorted(all_tokens))}
    by_conv: dict[str, list[tuple[int, list[str], int]]] = {}
    for conv, idx, ts, m in per_turn:
        by_conv.setdefault(conv, []).append((idx, ts, m))
    streams: dict[str, tuple[list[int], list[int]]] = {}
    for conv, items in by_conv.items():
        cids: list[int] = []
        cmask: list[int] = []
        for _idx, ts, m in sorted(items, key=lambda x: x[0]):
            cids.extend(vid[t] for t in ts)
            cmask.extend(m for _ in ts)
        streams[conv] = (cids, cmask)
    return streams


def conv_pack_pdf(num_merges: int = 8, seq_len: int = 48) -> pd.DataFrame:
    """Naive replay of pack_conversations on the fixture transcripts:
    latest-per-(conv_id, turn_idx) dedup, ``role: text`` rendering, BPE
    (pure-python twin trained on the same rendered lines), per-turn mask
    (1 iff role == assistant), conversations concatenated in
    ``(int(md5(conv_id)[:12], 16), conv_id)`` order — the packer's
    portable hash_order — then chunked into seq_len sequences."""
    import hashlib

    streams = _conv_token_streams(num_merges)
    conv_order = sorted(
        streams,
        key=lambda c: (int(hashlib.md5(c.encode()).hexdigest()[:12], 16), c),
    )
    ids: list[int] = []
    mask: list[int] = []
    bounds: list[tuple[int, int]] = []
    for conv in conv_order:
        a = len(ids)
        cids, cmask = streams[conv]
        ids.extend(cids)
        mask.extend(cmask)
        bounds.append((a, len(ids)))
    rows = []
    n_seqs = (len(ids) + seq_len - 1) // seq_len
    for s in range(n_seqs):
        a, b = s * seq_len, (s + 1) * seq_len
        n_convs = sum(1 for x, y in bounds if x < b and y > a and y > x)
        rows.append(
            (
                s,
                " ".join(map(str, ids[a:b])),
                " ".join(map(str, mask[a:b])),
                len(ids[a:b]),
                n_convs,
            )
        )
    return pd.DataFrame(
        rows, columns=["seq_id", "ids_str", "mask_str", "n_tokens", "n_convs"]
    ).astype(
        {
            "seq_id": "int64",
            "ids_str": "string",
            "mask_str": "string",
            "n_tokens": "int64",
            "n_convs": "int64",
        }
    )


def conv_pack_isolated_pdf(
    num_merges: int = 8, seq_len: int = 48
) -> pd.DataFrame:
    """Naive replay of pack_conversations(cross_boundaries=False):
    per-conversation chunking — each conversation's token stream cut
    independently into ceil(n/seq_len) sequences keyed (conv_id,
    chunk_idx); no global order exists to replay."""
    streams = _conv_token_streams(num_merges)
    rows = []
    for conv in sorted(streams):
        ids, mask = streams[conv]
        if not ids:
            continue
        n_chunks = (len(ids) + seq_len - 1) // seq_len
        for c in range(n_chunks):
            a, b = c * seq_len, (c + 1) * seq_len
            rows.append(
                (
                    conv,
                    c + 1,
                    " ".join(map(str, ids[a:b])),
                    " ".join(map(str, mask[a:b])),
                    len(ids[a:b]),
                )
            )
    return pd.DataFrame(
        rows,
        columns=["conv_id", "chunk_idx", "ids_str", "mask_str", "n_tokens"],
    ).astype(
        {
            "conv_id": "string",
            "chunk_idx": "int64",
            "ids_str": "string",
            "mask_str": "string",
            "n_tokens": "int64",
        }
    )


def paragraph_neardup_pdf(
    sf_dir: str,
    sep: str = "\n\n",
    min_chars: int = 1,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
    idx_bits: int = 16,
) -> pd.DataFrame:
    """Naive replay of paragraph_neardup_pairs over the documents table
    with the driver query's synthesized paragraph structure: ' merge '
    becomes a paragraph break and every doc gains a COHORT footer
    paragraph ('shared footer ' + md5(doc_id % 97)) — identical inside a
    cohort (the planted pairs), hex-distinct across cohorts. Paragraphs
    pack into the same int64 surrogate doc_id * 2^idx_bits + para_idx and
    run through the shared naive-LSH core."""
    import hashlib

    from feast_spark.operators.dedup import _shingle_hash_batch

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    texts = [
        str(t).replace(" merge ", sep)
        + sep
        + "shared footer "
        + hashlib.md5(str(int(i) % 97).encode()).hexdigest()
        for i, t in zip(docs["doc_id"], docs["text"])
    ]
    ids: list[int] = []
    paras: list[str] = []
    shift = 1 << idx_bits
    for doc_id, text in zip(docs["doc_id"].astype(int), texts):
        idx = 0
        for p in text.split(sep):
            p = p.strip()
            if len(p) >= min_chars:
                ids.append(doc_id * shift + idx)
                paras.append(p)
                idx += 1
    shingles = _shingle_hash_batch(pd.Series(paras), shingle_k)
    rows = _minhash_pairs_core(
        np.array(ids, dtype=np.int64), shingles, num_hashes, bands,
        jaccard_threshold, seed,
    )
    out = pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])
    return pd.DataFrame(
        {
            "doc_a": out["id_a"] // shift,
            "para_a": out["id_a"] % shift,
            "doc_b": out["id_b"] // shift,
            "para_b": out["id_b"] % shift,
            "jaccard": out["jaccard"],
        }
    ).astype(
        {
            "doc_a": "int64",
            "para_a": "int64",
            "doc_b": "int64",
            "para_b": "int64",
            "jaccard": "float64",
        }
    )


def conv_pii_pdf() -> pd.DataFrame:
    """Naive replay of conversation_pii on the fixture transcripts:
    latest-per-(conv_id, turn_idx) dedup, per-turn re.subn counts under
    the scrub order (same contract as pii_stats_pdf), conversation-grain
    integer sums + one exact int/int division."""
    import re

    from feast_spark.pipeline.oracle import oracle_dedup_latest
    from feast_spark.rules import SCRUB_PATTERNS, _TOX_PATTERN

    turns = transcripts_raw_pdf(None)
    d = oracle_dedup_latest(turns)
    cols = [f"n_{name}" for name, _, _ in SCRUB_PATTERNS] + ["n_toxicity"]
    agg: dict[str, list] = {}
    for conv, text in zip(d["conv_id"], d["text"]):
        t = "" if text is None else str(text)
        rec = agg.setdefault(conv, [0] * (len(cols) + 2))  # counts+turns+flag
        counts = []
        for _name, pat, repl in SCRUB_PATTERNS:
            t, n = re.subn(pat, repl, t)
            counts.append(n)
        counts.append(len(re.findall(_TOX_PATTERN, t)))
        for i, n in enumerate(counts):
            rec[i] += n
        rec[-2] += 1
        rec[-1] += 1 if sum(counts) > 0 else 0
    rows = []
    for conv, rec in agg.items():
        row = {"conv_id": conv, "n_turns": rec[-2]}
        for c, n in zip(cols, rec):
            row[c] = n
        row["n_flagged_turns"] = rec[-1]
        row["flagged_turn_frac"] = rec[-1] / rec[-2]
        rows.append(row)
    pdf = pd.DataFrame(rows)
    for c in ["n_turns", *cols, "n_flagged_turns"]:
        pdf[c] = pdf[c].astype("int64")
    return pdf


def conv_curation_pdf(
    min_keep_frac: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    sample_rate: float = 0.5,
) -> pd.DataFrame:
    """Naive replay of curate_conversations on the planted-clone corpus
    (same construction as conv_neardup_pdf): pandas structure flags,
    shared score_turns kernel for the keep fraction, the naive LSH core
    for near-dups among survivors, union-find components, and the md5
    sampler — first-failing stage per conversation."""
    import hashlib

    from feast_spark import rules
    from feast_spark.fixtures import generate_transcripts
    from feast_spark.operators.dedup import _shingle_hash_batch
    from feast_spark.pipeline.oracle import oracle_dedup_latest

    t = generate_transcripts(80, seed=42, mega_every=40, mega_turns=150)
    idx = t["conv_id"].str[1:].astype(int)
    clones = t[(idx % 5 == 0) & (t["turn_idx"] % 11 != 3)].copy()
    clones["conv_id"] = clones["conv_id"] + "d"
    full = pd.concat([t, clones], ignore_index=True)
    d = oracle_dedup_latest(full).sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    )

    # stage 1: structure flags (conversation_structure definitions)
    structure_ok: dict[str, bool] = {}
    for conv, g in d.groupby("conv_id", sort=False):
        roles = g["role"].tolist()
        tools = g["tool"].tolist()
        texts = g["text"].tolist()
        bad = roles[0] not in ("user", "system")
        repeats = sum(1 for a, b in zip(roles, roles[1:]) if a == b)
        orphan = sum(
            1
            for i, r in enumerate(roles)
            if r == "tool" and (roles[i - 1] if i else "") != "user"
        )
        missing = sum(
            1 for r, tl in zip(roles, tools) if r == "tool" and pd.isna(tl)
        )
        stray = sum(
            1 for r, tl in zip(roles, tools) if r != "tool" and not pd.isna(tl)
        )
        empty = sum(
            1
            for x in texts
            if len(("" if x is None or (isinstance(x, float) and pd.isna(x))
                    else str(x)).strip()) == 0
        )
        structure_ok[conv] = not bad and not (
            repeats or orphan or missing or stray or empty
        )

    # stage 2: shared-kernel turn scoring -> conv keep fraction
    keep = rules.score_turns(d["text"].reset_index(drop=True))["keep"]
    d2 = d.reset_index(drop=True).copy()
    d2["__keep"] = keep.to_numpy()
    keep_frac = {
        conv: int(g["__keep"].sum()) / len(g)
        for conv, g in d2.groupby("conv_id", sort=False)
    }

    survivors = sorted(
        c
        for c in structure_ok
        if structure_ok[c] and keep_frac[c] >= min_keep_frac
    )

    # stage 3: near-dup among survivors (naive LSH core + union-find)
    conv_text = (
        d[d["conv_id"].isin(survivors)]
        .groupby("conv_id", sort=True)["text"]
        .agg(" ".join)
        .reset_index()
    )
    ids = conv_text["conv_id"].to_numpy()
    shingles = _shingle_hash_batch(conv_text["text"], shingle_k)
    pair_rows = _minhash_pairs_core(
        ids, shingles, num_hashes, bands, jaccard_threshold, 42
    )
    parent = {c: c for c in survivors}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _j in pair_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    dup_of = {c: find(c) for c in survivors if find(c) != c}

    # stage 4: md5 sampler (deterministic_sample replica)
    thr = (
        "g"
        if sample_rate >= 1
        else format(min(int(sample_rate * 65536), 65535), "04x")
    )
    rows = []
    for conv in sorted(structure_ok):
        ok = structure_ok[conv]
        kf = keep_frac[conv]
        dof = dup_of.get(conv, "")
        if not ok:
            stage = "structure"
        elif kf < min_keep_frac:
            stage = "quality"
        elif dof:
            stage = "near_dup"
        elif hashlib.md5(conv.encode()).hexdigest()[:4] < thr:
            stage = "kept"
        else:
            stage = "sampled_out"
        rows.append(
            {
                "conv_id": conv,
                "structure_ok": ok,
                "keep_frac": kf,
                "dup_of": dof,
                "kept": stage == "kept",
                "drop_stage": stage,
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["dup_of"] = pdf["dup_of"].astype("string")
    pdf["drop_stage"] = pdf["drop_stage"].astype("string")
    return pdf


def conv_neardup_pdf(
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
) -> pd.DataFrame:
    """Naive replay of conversation_neardup_pairs on the planted-clone
    transcript corpus the q_conv_neardup query builds: fixture transcripts
    + every 5th conversation cloned under conv_id||'d' with turn_idx%11==3
    turns dropped (a high-but-<1 Jaccard copy). Turn dedup and the
    turn-ordered concat replay the pipeline oracle; the LSH core is shared
    with the documents oracle."""
    from feast_spark.fixtures import generate_transcripts
    from feast_spark.operators.dedup import _shingle_hash_batch
    from feast_spark.pipeline.oracle import oracle_dedup_latest

    t = generate_transcripts(80, seed=42, mega_every=40, mega_turns=150)
    idx = t["conv_id"].str[1:].astype(int)
    clones = t[(idx % 5 == 0) & (t["turn_idx"] % 11 != 3)].copy()
    clones["conv_id"] = clones["conv_id"] + "d"
    full = pd.concat([t, clones], ignore_index=True)
    deduped = oracle_dedup_latest(full)
    conv_text = (
        deduped.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .groupby("conv_id")["text"]
        .agg(" ".join)
        .reset_index()
    )
    ids = conv_text["conv_id"].to_numpy()
    shingles = _shingle_hash_batch(conv_text["text"], shingle_k)
    rows = _minhash_pairs_core(
        ids, shingles, num_hashes, bands, jaccard_threshold, seed
    )
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"]).astype(
        {"id_a": "string", "id_b": "string", "jaccard": "float64"}
    )


def simhash_pairs_pdf(sf_dir: str, hamming_threshold: int = 8) -> pd.DataFrame:
    """All-pairs hamming filter — the exact relation the (threshold+1)-block
    pigeonhole join computes."""
    from feast_spark.operators.dedup import _simhash_batch

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    ids = docs["doc_id"].to_numpy()
    h = _simhash_batch(docs["text"]).view(np.uint64)
    rows = []
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            d = int(h[i] ^ h[j]).bit_count()
            if d <= hamming_threshold:
                ia, ib = sorted((int(ids[i]), int(ids[j])))
                rows.append((ia, ib, d))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"]).astype(
        {"id_a": "int64", "id_b": "int64", "hamming": "int32"}
    )


def winnow_pairs_pdf(
    sf_dir: str,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_fingerprint_df: int = 50,
) -> pd.DataFrame:
    """Naive winnowing-overlap pairs: shared winnowed-fingerprint counts
    via dict-of-postings (same fingerprint kernel, naive relational part)."""
    from feast_spark.operators.dedup import _winnow_batch

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    ids = docs["doc_id"].to_numpy()
    fps = _winnow_batch(docs["text"], k, window)
    postings: dict[int, list[int]] = defaultdict(list)
    for i, arr in enumerate(fps):
        for f in arr.tolist():
            postings[f].append(i)
    shared: dict[tuple[int, int], int] = defaultdict(int)
    for f, members in postings.items():
        if max_fingerprint_df and len(members) > max_fingerprint_df:
            continue
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                ia, ib = (int(ids[i]), int(ids[j]))
                if ia > ib:
                    ia, ib = ib, ia
                shared[(ia, ib)] += 1
    rows = [
        (a, b, c) for (a, b), c in sorted(shared.items()) if c >= min_shared
    ]
    return pd.DataFrame(rows, columns=["id_a", "id_b", "shared"]).astype(
        {"id_a": "int64", "id_b": "int64", "shared": "int64"}
    )


def dup_clusters_pdf(sf_dir: str, **minhash_kwargs) -> pd.DataFrame:
    """Union-find over the minhash pair table — the naive form of
    operators.dedup.connected_components."""
    pairs = minhash_pairs_pdf(sf_dir, **minhash_kwargs)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(set(pairs["id_a"]) | set(pairs["id_b"]))
    return pd.DataFrame(
        {"doc_id": nodes, "cluster_id": [find(int(n)) for n in nodes]}
    ).astype("int64")


# ---------------------------------------------------------------------------
# quality scoring / transcript pipeline
# ---------------------------------------------------------------------------


def quality_scores_pdf(sf_dir: str) -> pd.DataFrame:
    from feast_spark import rules

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    scored = rules.score_turns(docs["text"], rules.RuleConfig())
    return pd.DataFrame(
        {
            "doc_id": docs["doc_id"].astype("int64"),
            "lang": scored["lang"].astype(object),
            "ppl": scored["perplexity"].astype("float64"),
            "keep": scored["keep"].astype(bool),
            "drop_reason": scored["drop_reason"].astype(object),
        }
    )


def transcript_labels_pdf(
    loop: bool = False, strict: bool = False, variant: str | None = None
) -> pd.DataFrame:
    from feast_spark import rules
    from feast_spark.fixtures import generate_transcripts
    from feast_spark.pipeline.oracle import oracle_labels
    from feast_spark.pipeline.quality import QualityConfig

    transcripts = generate_transcripts(
        100, seed=42, mega_every=50, mega_turns=200,
        loop_prob=0.3 if loop else 0.0,
    )
    if variant == "eval_pred":
        cfg = QualityConfig(rules=rules.eval_pred_config())
    elif variant == "eval_ref":
        cfg = QualityConfig(rules=rules.eval_ref_config())
    elif strict:
        cfg = QualityConfig(rules=rules.strict_config())
    elif loop:
        cfg = QualityConfig(loop_min_repeats=3)
    else:
        cfg = QualityConfig()
    labels = oracle_labels(
        transcripts,
        cfg,
        decision_ts=datetime(2026, 1, 1, tzinfo=timezone.utc),
        created_ts=datetime(2025, 6, 1, tzinfo=timezone.utc),
    )
    out = labels[["conv_id", "turn_idx", "keep", "drop_reason", "scrubbed_text", "ts"]].copy()
    out["turn_idx"] = out["turn_idx"].astype("int32")
    out["keep"] = out["keep"].astype(bool)
    out["ts"] = out["ts"].astype("datetime64[us]")
    return out.reset_index(drop=True)


def sweep_cells_pdf() -> pd.DataFrame:
    """(others_pass, gated, bucket) sweep cells for the deduped
    transcript fixture under the driver's fixed stopword-ratio grid —
    the python-kernel half of the rule_sweep oracle (rules.sweep_cells
    is the SHARED kernel; the histogram, curve join and unit math are
    re-derived in GENUINE SQL)."""
    from feast_spark import rules
    from feast_spark.pipeline.oracle import oracle_dedup_latest

    turns = transcripts_raw_pdf(None)
    d = oracle_dedup_latest(turns).reset_index(drop=True)
    cells = rules.sweep_cells(
        d["text"], "stopword_ratio", rules.RULE_SWEEP_GRID
    )
    return pd.DataFrame(
        {
            "others_pass": cells["others_pass"].astype(bool),
            "gated": cells["gated"].astype(bool),
            "bucket": cells["bucket"].astype("int64"),
        }
    )


def rule_bits_pdf() -> pd.DataFrame:
    """(conv_id, turn_idx, bits) for the deduped + RULE_MATRIX-planted
    transcript fixture — the python-kernel half of the rule_matrix
    oracle (rule_fail_bits is the SHARED kernel, same sharing note as
    turn_langs; the pair explode / co-fire matrix is re-derived in
    GENUINE SQL)."""
    from feast_spark import rules
    from feast_spark.pipeline.oracle import oracle_dedup_latest

    turns = transcripts_raw_pdf(None).copy()
    cidx = turns["conv_id"].str.slice(1).astype(int).to_numpy()
    var = turns["turn_idx"].to_numpy() % 4
    plantable = (cidx % 6) == 1
    text = turns["text"].astype(object).to_numpy()
    for v, plant in enumerate(rules.RULE_MATRIX_PLANTS):
        text[plantable & (var == v)] = plant
    turns["text"] = text
    d = oracle_dedup_latest(turns).reset_index(drop=True)
    return pd.DataFrame(
        {
            "conv_id": d["conv_id"].astype(object),
            "turn_idx": d["turn_idx"].astype("int32"),
            "bits": rules.rule_fail_bits(d["text"]).astype("int64"),
        }
    )


def turn_langs_pdf() -> pd.DataFrame:
    """(conv_id, turn_idx, lang) for the deduped transcript fixture —
    the python-kernel half of the conv_language oracle (language_id is
    the SHARED kernel, same sharing note as lexical_stats; the
    relational rollup is re-derived in SQL)."""
    from feast_spark import rules
    from feast_spark.pipeline.oracle import oracle_dedup_latest

    turns = transcripts_raw_pdf(None)
    d = oracle_dedup_latest(turns).reset_index(drop=True)
    out = pd.DataFrame(
        {
            "conv_id": d["conv_id"].astype(object),
            "turn_idx": d["turn_idx"].astype("int32"),
            "lang": rules.language_id(d["text"]).astype(object),
        }
    )
    return out


# ---------------------------------------------------------------------------
# embedding LSH (top-k and near-dup pairs)
# ---------------------------------------------------------------------------


def _load_vectors(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ids = emb["vec_id"].to_numpy()
    vecs = np.stack(
        [np.asarray(v, dtype=np.float32).astype(np.float64) for v in emb["embedding"]]
    )
    return ids, vecs


def _planes_as_sql_doubles(num_bits: int, dim: int, seed: int) -> np.ndarray:
    """The planes exactly as the SQL literal embeds them: %.9f strings
    parsed back to doubles (similarity._hyperplane_bucket_expr)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_bits, dim))
    return np.array(
        [[float(f"{x:.9f}") for x in row] for row in planes], dtype=np.float64
    )


def _buckets(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit buckets with Spark's sequential fold order per plane."""
    n, nbits = len(vecs), len(planes)
    buckets = np.zeros(n, dtype=np.int64)
    for i in range(nbits):
        prods = vecs * planes[i][None, :]
        dots = _seq_sum(prods)
        buckets |= (dots >= 0).astype(np.int64) << i
    return buckets


def _cosine(q: np.ndarray, c: np.ndarray) -> float:
    dot = _seq_sum(q * c)
    nq = np.sqrt(_seq_sum(q * q))
    nc = np.sqrt(_seq_sum(c * c))
    return float(dot / (nq * nc))


def lsh_topk_pdf(
    sf_dir: str,
    k: int = 5,
    dim: int = 64,
    num_bits: int = 8,
    seed: int = 42,
    query_max_id: int = 10,
) -> pd.DataFrame:
    ids, vecs = _load_vectors(sf_dir)
    planes = _planes_as_sql_doubles(num_bits, dim, seed)
    buckets = _buckets(vecs, planes)
    by_bucket: dict[int, list[int]] = defaultdict(list)
    for i, b in enumerate(buckets):
        by_bucket[int(b)].append(i)
    rows = []
    for qi in np.nonzero(ids < query_max_id)[0]:
        probes = [int(buckets[qi])] + [
            int(buckets[qi]) ^ (1 << b) for b in range(num_bits)
        ]
        cand = {j for p in probes for j in by_bucket.get(p, [])}
        cand.discard(int(qi))
        scored = sorted(
            ((-_cosine(vecs[qi], vecs[j]), int(ids[j])) for j in cand
             if ids[j] != ids[qi]),
        )[:k]
        for rank, (negcos, nid) in enumerate(scored, start=1):
            rows.append((int(ids[qi]), nid, -negcos, rank))
    return pd.DataFrame(
        rows, columns=["query_id", "neighbor_id", "cosine", "rank"]
    ).astype({"query_id": "int64", "neighbor_id": "int64", "cosine": "float64",
              "rank": "int32"})


def ivf_topk_pdf(
    sf_dir: str,
    k: int = 5,
    n_clusters: int = 32,
    n_probe: int = 4,
    sample_size: int = 4096,
    kmeans_iters: int = 10,
    query_max_id: int = 10,
) -> pd.DataFrame:
    """Naive IVF: retrain the shared quantizer kernel on the same sorted
    sample, replicate the matmul assignment (identical numpy ops -> bit-
    identical), probe lists, exact cosine with Spark's fold order."""
    from feast_spark.operators.similarity import spherical_kmeans

    ids, vecs = _load_vectors(sf_dir)
    order = np.argsort(ids, kind="stable")
    sample = vecs[order[:sample_size]]
    n_clusters = min(n_clusters, len(sample))
    cent = spherical_kmeans(sample, n_clusters, kmeans_iters)

    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sims_to_cent = (vecs / norms) @ cent.T
    corpus_list = np.argsort(-sims_to_cent, axis=1, kind="stable")[:, 0]
    probes = np.argsort(-sims_to_cent, axis=1, kind="stable")[:, :n_probe]

    members: dict[int, list[int]] = defaultdict(list)
    for i, c in enumerate(corpus_list):
        members[int(c)].append(i)
    rows = []
    for qi in np.nonzero(ids < query_max_id)[0]:
        cand = {j for p in probes[qi] for j in members.get(int(p), [])}
        cand.discard(int(qi))
        scored = sorted(
            ((-_cosine(vecs[qi], vecs[j]), int(ids[j])) for j in cand
             if ids[j] != ids[qi]),
        )[:k]
        for rank, (negcos, nid) in enumerate(scored, start=1):
            rows.append((int(ids[qi]), nid, -negcos, rank))
    return pd.DataFrame(
        rows, columns=["query_id", "neighbor_id", "cosine", "rank"]
    ).astype({"query_id": "int64", "neighbor_id": "int64", "cosine": "float64",
              "rank": "int32"})


def embedding_neardup_pdf(
    sf_dir: str,
    threshold: float = 0.2,
    dim: int = 64,
    num_bits: int = 6,
    seed: int = 7,
) -> pd.DataFrame:
    ids, vecs = _load_vectors(sf_dir)
    planes = _planes_as_sql_doubles(num_bits, dim, seed)
    buckets = np.asarray(_buckets(vecs, planes))
    by_bucket: dict[int, list[int]] = defaultdict(list)
    for i, b in enumerate(buckets):
        by_bucket[int(b)].append(i)
    rows = []
    for members in by_bucket.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                ia, ib = (i, j) if ids[i] < ids[j] else (j, i)
                cos = _cosine(vecs[ia], vecs[ib])
                if cos >= threshold:
                    rows.append((int(ids[ia]), int(ids[ib]), cos))
    return (
        pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
        .astype({"id_a": "int64", "id_b": "int64", "cosine": "float64"})
    )


def semantic_dedup_pdf(
    sf_dir: str,
    n_clusters: int = 16,
    threshold: float = 0.4,
    sample_size: int = 4096,
    kmeans_iters: int = 10,
) -> pd.DataFrame:
    """Naive SemDeDup: retrain the shared quantizer kernel on the same
    sorted sample, replicate the assignment matmul (identical numpy ops),
    then run the shared greedy kernel per cluster via a plain dict loop —
    the relational scaffolding (cluster partitioning) re-derived naively,
    only the two leaf kernels shared."""
    from feast_spark.operators.similarity import (
        greedy_semantic_keep,
        spherical_kmeans,
    )

    ids, vecs = _load_vectors(sf_dir)
    order = np.argsort(ids, kind="stable")
    sample = vecs[order[:sample_size]]
    n_clusters = min(n_clusters, len(sample))
    cent = spherical_kmeans(sample, n_clusters, kmeans_iters)

    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cluster = np.argsort(-((vecs / norms) @ cent.T), axis=1, kind="stable")[:, 0]

    members: dict[int, list[int]] = defaultdict(list)
    for i, c in enumerate(cluster):
        members[int(c)].append(i)
    frames = []
    for c, idx in members.items():
        is_kept, dup_of = greedy_semantic_keep(
            ids[idx], vecs[idx], threshold
        )
        frames.append(
            pd.DataFrame(
                {
                    "vec_id": ids[idx],
                    "cluster": c,
                    "is_kept": is_kept,
                    "dup_of": dup_of,
                }
            )
        )
    return (
        pd.concat(frames)
        .sort_values("vec_id")
        .reset_index(drop=True)
        .astype({"vec_id": "int64", "cluster": "int32", "is_kept": "bool",
                 "dup_of": "float64"})
    )


def diverse_sample_pdf(
    sf_dir: str,
    rate: float = 0.1,
    n_clusters: int = 16,
    sample_size: int = 4096,
    kmeans_iters: int = 10,
) -> pd.DataFrame:
    """Naive diversity sampling: identical quantizer + assignment replay
    as :func:`semantic_dedup_pdf`, then the shared ``greedy_kcenter``
    kernel per cluster via a plain dict loop — only the leaf kernels
    shared, the relational scaffolding re-derived naively."""
    from feast_spark.operators.similarity import (
        greedy_kcenter,
        spherical_kmeans,
    )

    ids, vecs = _load_vectors(sf_dir)
    order = np.argsort(ids, kind="stable")
    sample = vecs[order[:sample_size]]
    n_clusters = min(n_clusters, len(sample))
    cent = spherical_kmeans(sample, n_clusters, kmeans_iters)

    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cluster = np.argsort(-((vecs / norms) @ cent.T), axis=1, kind="stable")[:, 0]

    members: dict[int, list[int]] = defaultdict(list)
    for i, c in enumerate(cluster):
        members[int(c)].append(i)
    frames = []
    for c, idx in members.items():
        k = int(np.ceil(rate * len(idx)))
        sel_rank, coverage = greedy_kcenter(ids[idx], vecs[idx], k)
        frames.append(
            pd.DataFrame(
                {
                    "vec_id": ids[idx],
                    "cluster": c,
                    "selected": sel_rank >= 0,
                    "sel_rank": sel_rank,
                    "coverage": coverage,
                }
            )
        )
    return (
        pd.concat(frames)
        .sort_values("vec_id")
        .reset_index(drop=True)
        .astype({"vec_id": "int64", "cluster": "int32", "selected": "bool",
                 "sel_rank": "int64", "coverage": "float64"})
    )


def _curation_core(
    sf_dir: str,
    lm_quantile: float | None = None,
    lm_buckets: int | None = None,
    block_phrases: tuple | None = None,
    block_max_hits: int = 0,
    skip_ids: set | None = None,
) -> dict:
    """Stages 1-4 of the naive curation replay (pipeline/curation.py
    defaults): span dedup via one global seen-set walk in doc order,
    quality via the shared rules kernel, decontamination / DSIR via dict
    buckets + hashlib md5 — every relational step re-derived naively;
    only the scoring kernel is shared. Returns the per-stage state the
    default and classifier-arm oracles both consume. ``lm_quantile``
    inserts the CCNet perplexity stage 2b (naive_lm_pdf on the quality
    survivors, trained on the target-source slice; threshold = the exact
    interpolated corpus quantile, the Spark ``percentile`` /
    ``quantile_cont`` formula)."""
    import hashlib
    import math

    from feast_spark import rules

    docs = (
        pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # stage 0b (blocklist arm only): naive per-position per-phrase
    # startswith over the RAW text; blocked docs never enter the span
    # walk, so their spans claim no first-occurrence slots
    block_hits: dict[int, int] = {}
    blocked: set[int] = set()
    if block_phrases:
        phrases = sorted({p.lower() for p in block_phrases})
        for _, row in docs.iterrows():
            low = str(row["text"]).lower()
            n = sum(
                1
                for i in range(len(low))
                if any(low.startswith(p, i) for p in phrases)
            )
            did = int(row["doc_id"])
            block_hits[did] = n
            if n > block_max_hits:
                blocked.add(did)

    # stage 1: global span dedup, first occurrence by (doc_id, span_idx)
    # (docs dropped by an earlier stage — blocklist or near-dup skip_ids
    # — claim no first-occurrence slots)
    walk_skip = blocked | set(skip_ids or ())
    seen: set[str] = set()
    dedup_text: dict[int, str] = {}
    n_kept: dict[int, int] = {}
    for _, row in docs.iterrows():
        if int(row["doc_id"]) in walk_skip:
            continue
        w = row["text"].split(" ")
        kept_spans = []
        for i in range(0, (len(w) + 9) // 10):
            span = " ".join(w[i * 10 : i * 10 + 10])
            if span not in seen:
                seen.add(span)
                kept_spans.append(span)
        if kept_spans:
            dedup_text[int(row["doc_id"])] = " ".join(kept_spans)
            n_kept[int(row["doc_id"])] = len(kept_spans)

    # stage 2: shared scoring kernel on the deduped text
    ids1 = sorted(dedup_text)
    scored = rules.score_turns(
        pd.Series([dedup_text[i] for i in ids1]), rules.RuleConfig()
    )
    q_keep = {i: bool(k) for i, k in zip(ids1, scored["keep"])}

    # stage 3: benchmark 8-gram overlap (benchmark from RAW text)
    bench_grams: set[str] = set()
    for _, row in docs[docs["doc_id"] % 41 == 0].iterrows():
        bw = row["text"].split(" ")[:12]
        for i in range(len(bw) - 7):
            bench_grams.add(" ".join(bw[i : i + 8]))

    def grams(text: str, n: int) -> list[str]:
        w = text.split(" ")
        return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]

    src = dict(zip(docs["doc_id"].astype(int), docs["source"]))

    # stage 2b (LM arm only): stupid-backoff LM trained on the
    # target-source quality survivors, scored over all survivors; keep
    # at or below the interpolated corpus quantile of ppl
    ids_q = [i for i in ids1 if q_keep[i]]
    lm_ppl: dict[int, float] = {}
    lm_thr = None
    if lm_quantile is not None:
        from feast_spark.operators.lm import naive_lm_pdf

        texts_q = pd.Series([dedup_text[i] for i in ids_q])
        train_q = pd.Series(
            [
                dedup_text[i]
                for i in ids_q
                if src[i] in ("src1", "src2", "src3")
            ]
        )
        lm = naive_lm_pdf(
            texts_q, pd.Series(ids_q), order=5, train_texts=train_q,
            n_buckets=lm_buckets,
        )
        lm_ppl = dict(zip(lm["doc_id"].astype(int), lm["ppl"]))
        v = np.sort(np.array([lm_ppl[i] for i in ids_q], np.float64))
        pos = np.float64(lm_quantile) * (len(v) - 1)
        lo = int(np.floor(pos))
        g = pos - np.float64(lo)
        lm_thr = (
            v[lo]
            if lo + 1 >= len(v) or g == 0
            else v[lo] + (v[lo + 1] - v[lo]) * g
        )
        ids_q = [i for i in ids_q if lm_ppl[i] <= lm_thr]

    contaminated = {
        i: any(g in bench_grams for g in grams(dedup_text[i], 8))
        for i in ids_q
    }

    # stage 4: DSIR over survivors of 1-3
    ids3 = [i for i in ids_q if not contaminated[i]]
    raw_cnt: dict[str, int] = defaultdict(int)
    tgt_cnt: dict[str, int] = defaultdict(int)
    doc_bigrams: dict[int, list[str]] = {}
    for i in ids3:
        bs = [
            hashlib.md5(g.encode()).hexdigest()[:3]
            for g in grams(dedup_text[i], 2)
        ]
        doc_bigrams[i] = bs
        is_t = src[i] in ("src1", "src2", "src3")
        for b in bs:
            raw_cnt[b] += 1
            if is_t:
                tgt_cnt[b] += 1
    R = sum(raw_cnt.values())
    T = sum(tgt_cnt.values())
    bscore = {
        b: math.floor(
            1000000.0
            * math.log(
                ((tgt_cnt[b] + 0.5) / (T + 2048.0))
                / ((raw_cnt[b] + 0.5) / (R + 2048.0))
            )
        )
        for b in raw_cnt
    }
    # centered (curation runs dsir_weights(center=True)): subtract the
    # corpus-weighted mean bucket score so the 0 cutoff is scale-free
    center = math.floor(
        sum(raw_cnt[b] * bscore[b] for b in raw_cnt) / R
    )
    dsir_score = {
        i: sum(bscore[b] for b in doc_bigrams[i]) - len(doc_bigrams[i]) * center
        for i in ids3
    }

    # stage 5 predicate: deterministic sampling by source parity
    def sampled(i: int) -> bool:
        thr = "b333" if int(src[i][3:]) % 2 == 0 else "4ccc"
        return hashlib.md5(f"{i}:{src[i]}".encode()).hexdigest()[:4] < thr

    return {
        "docs": docs, "dedup_text": dedup_text, "n_kept": n_kept,
        "q_keep": q_keep, "contaminated": contaminated,
        "dsir_score": dsir_score, "src": src, "sampled": sampled,
        "lm_ppl": lm_ppl, "lm_thr": lm_thr,
        "block_hits": block_hits, "blocked": blocked,
    }


def curation_neardup_pdf(sf_dir: str) -> pd.DataFrame:
    """Near-dup-arm audit table (CurationConfig(use_neardup=True)): the
    naive LSH pair core + union-find picks each duplicate component's
    min-id representative BEFORE the span walk; non-representatives drop
    at 'near_dup' and claim no span slots."""
    pairs = minhash_pairs_pdf(sf_dir)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nd_drop = {
        int(n)
        for n in set(pairs["id_a"]) | set(pairs["id_b"])
        if find(int(n)) != int(n)
    }
    c = _curation_core(sf_dir, skip_ids=nd_drop)
    dedup_text, q_keep = c["dedup_text"], c["q_keep"]
    contaminated, dsir_score = c["contaminated"], c["dsir_score"]
    rows = []
    for i in c["docs"]["doc_id"].astype(int):
        if i in nd_drop:
            stage, score = "near_dup", 0
        elif i not in dedup_text:
            stage, score = "span_dup", 0
        elif not q_keep[i]:
            stage, score = "quality", 0
        elif contaminated[i]:
            stage, score = "contaminated", 0
        elif dsir_score[i] < 0:
            stage, score = "dsir", dsir_score[i]
        elif not c["sampled"](i):
            stage, score = "sampled_out", dsir_score[i]
        else:
            stage, score = None, dsir_score[i]
        rows.append((i, c["n_kept"].get(i, 0), score, stage is None, stage))
    return pd.DataFrame(
        rows,
        columns=["doc_id", "n_spans_kept", "dsir_score", "kept", "drop_stage"],
    ).astype(
        {
            "doc_id": "int64", "n_spans_kept": "int64",
            "dsir_score": "int64", "kept": "bool", "drop_stage": object,
        }
    )


def curation_blocklist_pdf(sf_dir: str) -> pd.DataFrame:
    """Blocklist-arm audit table (CurationConfig(use_blocklist=True)):
    the naive per-position phrase gate runs BEFORE the span walk (blocked
    docs claim no spans), then the default four stages + sampling."""
    phrases = ("scan slow", "value part", "sparkle")
    c = _curation_core(sf_dir, block_phrases=phrases, block_max_hits=2)
    dedup_text, q_keep = c["dedup_text"], c["q_keep"]
    contaminated, dsir_score = c["contaminated"], c["dsir_score"]
    rows = []
    for i in c["docs"]["doc_id"].astype(int):
        hits = c["block_hits"].get(i, 0)
        if i in c["blocked"]:
            stage, score = "blocklist", 0
        elif i not in dedup_text:
            stage, score = "span_dup", 0
        elif not q_keep[i]:
            stage, score = "quality", 0
        elif contaminated[i]:
            stage, score = "contaminated", 0
        elif dsir_score[i] < 0:
            stage, score = "dsir", dsir_score[i]
        elif not c["sampled"](i):
            stage, score = "sampled_out", dsir_score[i]
        else:
            stage, score = None, dsir_score[i]
        rows.append(
            (i, c["n_kept"].get(i, 0), score, stage is None, hits, stage)
        )
    return pd.DataFrame(
        rows,
        columns=[
            "doc_id", "n_spans_kept", "dsir_score", "kept",
            "blocklist_hits", "drop_stage",
        ],
    ).astype(
        {
            "doc_id": "int64", "n_spans_kept": "int64",
            "dsir_score": "int64", "kept": "bool",
            "blocklist_hits": "int64", "drop_stage": object,
        }
    )


def curation_pdf(sf_dir: str) -> pd.DataFrame:
    """Default five-stage audit table from the naive stage replay."""
    c = _curation_core(sf_dir)
    dedup_text, q_keep = c["dedup_text"], c["q_keep"]
    contaminated, dsir_score = c["contaminated"], c["dsir_score"]
    rows = []
    for i in c["docs"]["doc_id"].astype(int):
        if i not in dedup_text:
            stage, score = "span_dup", 0
        elif not q_keep[i]:
            stage, score = "quality", 0
        elif contaminated[i]:
            stage, score = "contaminated", 0
        elif dsir_score[i] < 0:
            stage, score = "dsir", dsir_score[i]
        elif not c["sampled"](i):
            stage, score = "sampled_out", dsir_score[i]
        else:
            stage, score = None, dsir_score[i]
        rows.append((i, c["n_kept"].get(i, 0), score, stage is None, stage))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_spans_kept", "dsir_score", "kept", "drop_stage"]
    ).astype({"doc_id": "int64", "n_spans_kept": "int64", "dsir_score": "int64",
              "kept": "bool", "drop_stage": object})


def curation_clf_pdf(sf_dir: str) -> pd.DataFrame:
    """Classifier-arm audit table (CurationConfig(use_classifier=True,
    clf_method='md5')): stages 1-4 from the shared naive replay, then the
    hashed-bigram classifier trained naively (classifier.py's bit-exact
    int64 kernel) on the DSIR survivors' DEDUPED text with target-source
    membership labels, margin-gated before the sampling stage."""
    from feast_spark.operators.classifier import naive_classifier_pdf

    c = _curation_core(sf_dir)
    dedup_text, q_keep = c["dedup_text"], c["q_keep"]
    contaminated, dsir_score, src = c["contaminated"], c["dsir_score"], c["src"]
    d_pass = sorted(
        i for i in dsir_score if dsir_score[i] >= 0
    )
    clf = naive_classifier_pdf(
        pd.Series([dedup_text[i] for i in d_pass]),
        pd.Series(d_pass),
        pd.Series([int(src[i] in ("src1", "src2", "src3")) for i in d_pass]),
        n_buckets=1024, n_iter=6, lr=1.0,
    )
    margin = dict(zip(clf["doc_id"].astype(int), clf["margin_units"].astype(int)))
    rows = []
    for i in c["docs"]["doc_id"].astype(int):
        m = margin.get(i, 0)
        if i not in dedup_text:
            stage, score = "span_dup", 0
        elif not q_keep[i]:
            stage, score = "quality", 0
        elif contaminated[i]:
            stage, score = "contaminated", 0
        elif dsir_score[i] < 0:
            stage, score = "dsir", dsir_score[i]
        elif m <= 0:
            stage, score = "classifier", dsir_score[i]
        elif not c["sampled"](i):
            stage, score = "sampled_out", dsir_score[i]
        else:
            stage, score = None, dsir_score[i]
        rows.append((i, c["n_kept"].get(i, 0), score, stage is None, m, stage))
    return pd.DataFrame(
        rows,
        columns=["doc_id", "n_spans_kept", "dsir_score", "kept",
                 "margin_units", "drop_stage"],
    ).astype({"doc_id": "int64", "n_spans_kept": "int64",
              "dsir_score": "int64", "kept": "bool",
              "margin_units": "int64", "drop_stage": object})


def curation_lm_pdf(sf_dir: str) -> pd.DataFrame:
    """LM-arm audit table (CurationConfig(use_lm=True,
    lm_method='portable')): the CCNet perplexity stage 2b between
    quality and decontamination — LM trained naively on the
    target-source quality survivors, every survivor scored, the
    high-perplexity tail above the 0.7 corpus quantile dropped."""
    # lm_buckets mirrors CurationConfig.lm_buckets — the pipeline now
    # ALWAYS trains the LM bucketed (unbounded would collect the corpus
    # gram vocabulary to the driver at scale), and md5 bucketing is
    # replayable so the naive arm applies the same mod
    c = _curation_core(sf_dir, lm_quantile=0.7, lm_buckets=1 << 22)
    dedup_text, q_keep = c["dedup_text"], c["q_keep"]
    contaminated, dsir_score = c["contaminated"], c["dsir_score"]
    lm_ppl, lm_thr = c["lm_ppl"], c["lm_thr"]
    rows = []
    for i in c["docs"]["doc_id"].astype(int):
        p = float(lm_ppl.get(i, 0.0))
        if i not in dedup_text:
            stage, score = "span_dup", 0
        elif not q_keep[i]:
            stage, score = "quality", 0
        elif p > lm_thr:
            stage, score = "lm_ppl", 0
        elif contaminated[i]:
            stage, score = "contaminated", 0
        elif dsir_score[i] < 0:
            stage, score = "dsir", dsir_score[i]
        elif not c["sampled"](i):
            stage, score = "sampled_out", dsir_score[i]
        else:
            stage, score = None, dsir_score[i]
        rows.append((i, c["n_kept"].get(i, 0), score, stage is None, p, stage))
    return pd.DataFrame(
        rows,
        columns=["doc_id", "n_spans_kept", "dsir_score", "kept",
                 "lm_ppl", "drop_stage"],
    ).astype({"doc_id": "int64", "n_spans_kept": "int64",
              "dsir_score": "int64", "kept": "bool",
              "lm_ppl": "float64", "drop_stage": object})


# ---------------------------------------------------------------------------
# registry + ensure
# ---------------------------------------------------------------------------

def classifier_pdf(sf_dir: str) -> pd.DataFrame:
    """Naive replay of the hashed-bigram quality classifier's portable
    arm: Python/Counter feature extraction + the shared integer-quantized
    training kernel (classifier.py arithmetic contract) — bit-exact
    because every cross-document reduction is an int64 sum."""
    from feast_spark.operators.classifier import naive_classifier_pdf

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    y = docs["source"].isin(["src1", "src2", "src3"]).astype(int)
    return naive_classifier_pdf(
        docs["text"], docs["doc_id"], y, n_buckets=1024, n_iter=6, lr=1.0
    )


def export_manifest_pdf(sf_dir: str, n_shards: int = 8, salt: str = "e0") -> pd.DataFrame:
    """Naive replay of export_training_shards' md5 arm: per-shard doc and
    whitespace-token counts plus the order-independent xor fingerprint
    (pipeline/export.py shard_manifest) — int64 throughout, bit-exact."""
    import hashlib

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    h = docs["doc_id"].map(
        lambda d: int(hashlib.md5(f"{salt}{d}".encode()).hexdigest()[:8], 16)
    ).to_numpy(dtype=np.int64)
    shard = h % n_shards
    n_tok = docs["text"].map(lambda t: len(t.split(" "))).to_numpy(dtype=np.int64)
    rows = []
    for s in range(n_shards):
        m = shard == s
        if not m.any():
            continue
        rows.append((s, int(m.sum()), int(n_tok[m].sum()),
                     int(np.bitwise_xor.reduce(h[m]))))
    return pd.DataFrame(
        rows, columns=["shard_id", "n_docs", "n_tokens", "fingerprint"]
    ).astype({"shard_id": "int64", "n_docs": "int64",
              "n_tokens": "int64", "fingerprint": "int64"})


def lm_perplexity_pdf(sf_dir: str) -> pd.DataFrame:
    """Naive replay of the stupid-backoff n-gram LM (portable arm):
    Counter tables over gram tuples + a per-doc python scoring loop,
    trained on the src1-3 in-domain slice and scoring the whole corpus
    (operators/lm.py arithmetic contract — int64 log-quanta sums,
    numpy-libm log/exp on both sides)."""
    from feast_spark.operators.lm import naive_lm_pdf

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    train = docs.loc[docs["source"].isin(["src1", "src2", "src3"]), "text"]
    return naive_lm_pdf(
        docs["text"], docs["doc_id"], order=5, train_texts=train,
        n_buckets=1 << 20,
    )


def moore_lewis_pdf(sf_dir: str) -> pd.DataFrame:
    """Naive replay of moore_lewis_scores (portable arm, order 3,
    2^20 buckets): two independent Counter-table LM replays — in-domain
    trained on the src1-3 slice, general trained on the whole corpus —
    joined on doc_id; ce_diff_units is the exact int64 difference of the
    micro-log-prob sums, ce_diff one float64 division."""
    from feast_spark.operators.lm import naive_lm_pdf

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    train_in = docs.loc[
        docs["source"].isin(["src1", "src2", "src3"]), "text"
    ]
    a = naive_lm_pdf(
        docs["text"], docs["doc_id"], order=3, n_buckets=1 << 20,
        train_texts=train_in,
    ).rename(columns={"lp_sum": "lp_in_sum", "ppl": "ppl_in"})
    b = naive_lm_pdf(
        docs["text"], docs["doc_id"], order=3, n_buckets=1 << 20,
        train_texts=docs["text"],
    ).rename(columns={"lp_sum": "lp_gen_sum", "ppl": "ppl_gen"})
    m = a.merge(b[["doc_id", "lp_gen_sum", "ppl_gen"]], on="doc_id")
    m["ce_diff_units"] = (
        m["lp_gen_sum"].astype("int64") - m["lp_in_sum"].astype("int64")
    )
    m["ce_diff"] = m["ce_diff_units"].to_numpy(np.float64) / (
        np.float64(1e6) * m["n_tokens"].to_numpy(np.float64)
    )
    return m[
        [
            "doc_id", "n_tokens", "lp_in_sum", "lp_gen_sum",
            "ppl_in", "ppl_gen", "ce_diff_units", "ce_diff",
        ]
    ].astype({"ce_diff_units": "int64"})


def langid_pdf(sf_dir: str) -> pd.DataFrame:
    """Naive replay of the multiclass hashed char-trigram language
    classifier: per-doc Counter features over the shared trigram leaf
    kernel + a dense per-doc python training loop (operators/langid.py
    arithmetic contract — int64 margins/gradients, quantized softmax
    errors). The fixture's lang labels are NOT text-derived (all
    languages share one vocabulary), so this verifies the TRAINING
    KERNEL bit-for-bit; semantic accuracy evidence lives in
    tests/test_langid.py on a planted multilingual corpus."""
    from feast_spark.operators.langid import naive_langid_pdf

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    classes = sorted(docs["lang"].unique())
    labels = docs["lang"].where(docs["doc_id"] % 2 == 0)
    return naive_langid_pdf(
        docs["text"], docs["doc_id"], labels, classes, n_iter=6
    )


def gopher_repetition_pdf(sf_dir: str, line_sep: str = ". ") -> pd.DataFrame:
    """Naive per-doc python replay of the Gopher repetition stats
    (operators/repetition.py definitions): dict/Counter loops over real
    token tuples — no factorize, no lexsort, no hashing. Fractions are
    single IEEE divisions of exact ints on both sides."""
    from collections import Counter

    from feast_spark.operators.repetition import (
        BULLET_PREFIXES,
        DEMO_LINE_SUFFIX,
        ELLIPSIS_SUFFIXES,
    )

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        text = ("" if text is None else str(text)) + DEMO_LINE_SUFFIX
        text = text.replace(line_sep, "\n")
        rec: dict = {"doc_id": int(doc_id)}
        lines = [ln for ln in text.split("\n") if len(ln) > 0]
        if lines:
            c = Counter(lines)
            rep = sum(v - 1 for v in c.values())
            rep_chars = sum((v - 1) * len(k) for k, v in c.items())
            tot_chars = sum(len(ln) for ln in lines)
            rec["dup_line_frac"] = rep / len(lines)
            rec["dup_line_char_frac"] = (
                rep_chars / tot_chars if tot_chars else 0.0
            )
            rec["bullet_line_frac"] = (
                sum(
                    1
                    for ln in lines
                    if ln.lstrip().startswith(BULLET_PREFIXES)
                )
                / len(lines)
            )
            rec["ellipsis_line_frac"] = (
                sum(
                    1
                    for ln in lines
                    if ln.rstrip().endswith(ELLIPSIS_SUFFIXES)
                )
                / len(lines)
            )
        else:
            rec["dup_line_frac"] = 0.0
            rec["dup_line_char_frac"] = 0.0
            rec["bullet_line_frac"] = 0.0
            rec["ellipsis_line_frac"] = 0.0
        toks = text.lower().split()
        tlen = [len(t) for t in toks]
        tot = sum(tlen)
        denom = max(tot, 1)
        for o in (2, 3, 4):
            grams = Counter(
                tuple(toks[i : i + o]) for i in range(len(toks) - o + 1)
            )
            if grams:
                maxc = max(grams.values())
                best = max(
                    c * sum(len(w) for w in g)
                    for g, c in grams.items()
                    if c == maxc
                )
                rec[f"top{o}gram_char_frac"] = best / denom
            else:
                rec[f"top{o}gram_char_frac"] = 0.0
        for o in (5, 8, 10):
            grams = Counter(
                tuple(toks[i : i + o]) for i in range(len(toks) - o + 1)
            )
            covered = [False] * len(toks)
            for i in range(len(toks) - o + 1):
                if grams[tuple(toks[i : i + o])] > 1:
                    for j in range(i, i + o):
                        covered[j] = True
            rec[f"dup{o}gram_char_frac"] = (
                sum(l for l, cv in zip(tlen, covered) if cv) / denom
            )
        rows.append(rec)
    return pd.DataFrame(rows)


def transcripts_raw_pdf(sf_dir: str) -> pd.DataFrame:
    """The RAW transcript fixture (same params as q_transcript_pipeline),
    written as-is so the conversation operators' oracles can be GENUINE
    DuckDB SQL over the input turns — no replica arithmetic involved."""
    from feast_spark.fixtures import generate_transcripts

    pdf = generate_transcripts(100, seed=42, mega_every=50, mega_turns=200)
    pdf = pdf.copy()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf.reset_index(drop=True)


def lexical_stats_pdf(sf_dir: str) -> pd.DataFrame:
    """Naive per-doc python replay of the lexical-diversity stats
    (operators/lexical.py definitions): Counter loops over real token
    strings. Ratios are single IEEE divisions of exact ints; entropy uses
    the SAME elementwise numpy quantization (floor(term * 2^40)) the
    kernel does, so the order-free integer sum matches bit-for-bit."""
    from collections import Counter

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = ("" if text is None else str(text)).lower().split()
        n_tok = len(toks)
        c = Counter(toks)
        n_typ = len(c)
        rec = {
            "doc_id": int(doc_id),
            "n_tokens": n_tok,
            "n_types": n_typ,
            "type_token_ratio": n_typ / n_tok if n_tok else 0.0,
            "hapax_frac": (
                sum(1 for v in c.values() if v == 1) / n_typ if n_typ else 0.0
            ),
            "mean_word_len": (
                sum(len(t) for t in toks) / n_tok if n_tok else 0.0
            ),
        }
        if n_tok:
            cnt = np.array(list(c.values()), dtype=np.int64)
            p = cnt / np.int64(n_tok)
            q = np.floor(-(p * np.log2(p)) * float(2**40))
            rec["unigram_entropy"] = float(q.sum()) / float(2**40)
        else:
            rec["unigram_entropy"] = 0.0
        rows.append(rec)
    pdf = pd.DataFrame(rows)
    pdf["n_tokens"] = pdf["n_tokens"].astype("int64")
    pdf["n_types"] = pdf["n_types"].astype("int64")
    return pdf


def bm25_topk_pdf(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Naive per-doc python replay of BM25 top-k (operators/bm25.py
    DEFAULT_QUERIES): Counter loops over real token strings. idf uses the
    same CPython math.log; the per-term contribution mirrors the Spark
    expression's association order exactly, is floor-quantized to 2^-20
    integer units, and the int sum is order-free — bit-identical by
    construction."""
    import math
    from collections import Counter

    from feast_spark.operators.bm25 import DEFAULT_QUERIES

    import re

    k1, b = 1.2, 0.75
    one_minus_b, k1p1, quant = 1.0 - b, k1 + 1.0, 1048576.0
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    # Java \s is ASCII-only — mirror it exactly (str.split() would also
    # split on unicode whitespace and diverge from the Spark arm)
    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")
    toks = [
        [w for w in java_ws.split(("" if t is None else str(t)).lower()) if w]
        for t in docs["text"]
    ]
    ids = [int(i) for i in docs["doc_id"]]
    dls = [len(t) for t in toks]
    n_docs = len(ids)
    avgdl = float(sum(dls)) / float(n_docs)
    qterms = {
        qid: sorted({t for t in qtext.lower().split() if t})
        for qid, qtext in DEFAULT_QUERIES
    }
    all_terms = sorted({t for ts in qterms.values() for t in ts})
    counters = [Counter(t) for t in toks]
    df = {
        t: sum(1 for c in counters if t in c) for t in all_terms
    }
    idf = {
        t: math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
        for t in all_terms
    }
    rows = []
    for qid, ts in qterms.items():
        scored = []
        for doc_id, c, dl in zip(ids, counters, dls):
            units = 0
            hit = False
            for t in ts:
                tf = c.get(t, 0)
                if not tf or not df[t]:
                    continue
                hit = True
                denom = tf + k1 * (one_minus_b + b * dl / avgdl)
                units += int(math.floor(idf[t] * (tf * k1p1) / denom * quant))
            if hit:
                scored.append((-units, doc_id))
        scored.sort()
        for rank, (neg_u, doc_id) in enumerate(scored[:k], start=1):
            rows.append(
                {
                    "query_id": qid,
                    "doc_id": doc_id,
                    "rank": rank,
                    "score_units": -neg_u,
                    "score": float(-neg_u) / quant,
                }
            )
    pdf = pd.DataFrame(rows)
    for c in ("doc_id", "rank", "score_units"):
        pdf[c] = pdf[c].astype("int64")
    return pdf


def pii_stats_pdf(sf_dir: str) -> pd.DataFrame:
    """Naive per-doc re.subn replay of the PII hit counters
    (rules.pii_match_counts contract: pattern p counted on the text after
    earlier patterns replaced). Same injection rule as the driver query:
    even doc_ids get PII_DEMO_SUFFIX appended. Counts are exact ints —
    identical by construction (same re engine, same order)."""
    import re

    from feast_spark.rules import (
        PII_DEMO_SUFFIX,
        SCRUB_PATTERNS,
        _TOX_PATTERN,
    )

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        t = "" if text is None else str(text)
        if int(doc_id) % 2 == 0:
            t = t + PII_DEMO_SUFFIX
        rec = {"doc_id": int(doc_id)}
        for name, pat, repl in SCRUB_PATTERNS:
            t, n = re.subn(pat, repl, t)
            rec[f"n_{name}"] = n
        rec["n_toxicity"] = len(re.findall(_TOX_PATTERN, t))
        rows.append(rec)
    pdf = pd.DataFrame(rows)
    for c in pdf.columns:
        pdf[c] = pdf[c].astype("int64")
    return pdf


def turn_neardup_pdf(
    min_words: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
) -> pd.DataFrame:
    """Naive replay of turn_neardup_pairs under the driver query's
    planting (every 5th conversation cloned under conv_id || 'd' with
    ' edited copy note' appended to every assistant turn — near- but not
    exact-duplicates): latest-per-key dedup, ASCII-ws normalize,
    composite conv:idx string ids through the shared naive-LSH core."""
    import re

    from feast_spark.operators.dedup import _shingle_hash_batch
    from feast_spark.pipeline.oracle import oracle_dedup_latest

    turns = transcripts_raw_pdf(None)
    cl = turns[turns["conv_id"].str.slice(1, 10).astype(int) % 5 == 0].copy()
    cl["text"] = np.where(
        cl["role"] == "assistant",
        cl["text"].fillna("") + " edited copy note",
        cl["text"],
    )
    cl["conv_id"] = cl["conv_id"] + "d"
    d = oracle_dedup_latest(pd.concat([turns, cl], ignore_index=True))
    d = d[d["role"] == "assistant"]
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    ids: list[str] = []
    norms: list[str] = []
    for conv, idx, text in zip(d["conv_id"], d["turn_idx"], d["text"]):
        t = "" if text is None else str(text)
        n = ws.sub(" ", t).strip()
        if n and len(n.split(" ")) >= min_words:
            ids.append(f"{conv}:{int(idx)}")
            norms.append(n)
    shingles = _shingle_hash_batch(pd.Series(norms), shingle_k)
    rows = _minhash_pairs_core(
        ids, shingles, num_hashes, bands, jaccard_threshold, seed
    )
    recs = []
    for ia, ib, jac in rows:
        ca, xa = ia.rsplit(":", 1)
        cb, xb = ib.rsplit(":", 1)
        recs.append((ca, int(xa), cb, int(xb), jac))
    return pd.DataFrame(
        recs, columns=["conv_a", "idx_a", "conv_b", "idx_b", "jaccard"]
    ).astype(
        {"idx_a": "int64", "idx_b": "int64", "jaccard": "float64"}
    )


def pseudonymize_pdf(sf_dir: str) -> pd.DataFrame:
    """Naive per-row replay of operators/privacy.pseudonymize_entities
    under the driver query's planting (even doc_ids gain an email keyed
    by doc_id%7 and a phone keyed by doc_id%50): plain re.subn per kind
    in SCRUB_PATTERNS order on the progressively-replaced text, token =
    <KIND:md5(entity)[:10]> via hashlib — no pandas str machinery, no
    shared code path beyond the pattern constants."""
    import hashlib
    import re

    from feast_spark.rules import SCRUB_PATTERNS

    kinds = {"email", "phone"}
    pats = [(n, p) for n, p, _ in SCRUB_PATTERNS if n in kinds]
    docs = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        t = "" if text is None else str(text)
        if int(doc_id) % 2 == 0:
            t = (
                t
                + f" contact user{int(doc_id) % 7}@example.com"
                + f" or call 415-555-{1000 + int(doc_id) % 50:04d}"
            )
        rec = {"doc_id": int(doc_id)}
        total = 0
        for name, pat in pats:

            def _tok(m, _name=name):
                h = hashlib.md5(m.group().encode("utf-8")).hexdigest()[:10]
                return f"<{_name.upper()}:{h}>"

            t, n = re.subn(pat, _tok, t)
            rec[f"n_pseudo_{name}"] = n
            total += n
        rec["text_pseudo"] = t
        rec["n_pseudo"] = total
        rows.append(rec)
    pdf = pd.DataFrame(rows)
    for c in ("doc_id", "n_pseudo", "n_pseudo_email", "n_pseudo_phone"):
        pdf[c] = pdf[c].astype("int64")
    return pdf[
        ["doc_id", "text_pseudo", "n_pseudo", "n_pseudo_email", "n_pseudo_phone"]
    ]


def cdc_neardup_pdf(
    sf_dir: str,
    avg_bits: int = 6,
    min_shared: int = 2,
    min_chunk_len: int = 8,
) -> pd.DataFrame:
    """Naive replay of cdc_neardup_pairs over the documents table with
    the driver query's planted byte-grain duplication: every doc gains a
    COHORT footer of 12 md5 hex blocks keyed (doc_id % 97, i) — ~396
    identical bytes per cohort landing at a DIFFERENT byte offset in
    every doc (texts differ in length), so only content-defined cuts can
    align the shared chunks. Chunking is the sequential scalar gear
    (:func:`textkit.cdc_chunks_py`); bucketing/pairing is naive dicts."""
    import hashlib
    from itertools import combinations

    from feast_spark import textkit

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    by_hash: dict[int, list[int]] = {}
    hash_len: dict[int, int] = {}
    for doc_id, text in zip(docs["doc_id"].astype(int), docs["text"]):
        c = doc_id % 97
        footer = " ".join(
            hashlib.md5(f"{c}:{i}".encode()).hexdigest() for i in range(12)
        )
        data = (str(text) + " " + footer).encode("utf-8", "surrogatepass")
        first: dict[int, int] = {}
        for h, ln in textkit.cdc_chunks_py(data, avg_bits):
            first.setdefault(h, ln)
        for h, ln in first.items():
            if ln < min_chunk_len:
                continue
            by_hash.setdefault(h, []).append(doc_id)
            hash_len[h] = min(hash_len.get(h, ln), ln)
    shared: dict[tuple[int, int], int] = defaultdict(int)
    shared_bytes: dict[tuple[int, int], int] = defaultdict(int)
    for h, ids in by_hash.items():
        if len(ids) < 2:
            continue
        for a, b in combinations(sorted(ids), 2):
            shared[(a, b)] += 1
            shared_bytes[(a, b)] += hash_len[h]
    rows = [
        (a, b, n, shared_bytes[(a, b)])
        for (a, b), n in shared.items()
        if n >= min_shared
    ]
    return pd.DataFrame(
        rows, columns=["id_a", "id_b", "shared", "shared_bytes"]
    ).astype("int64")


def _extract_html_py(
    html: str, min_words: int = 3, max_link_pct: int = 30
) -> tuple[str, int, int]:
    """Python replay of extract_html_text's regex program (same patterns,
    same fixed entity order, same integer link-density compare)."""
    from feast_spark.operators.html import (
        ANCHOR,
        BLOCK_SPLIT,
        ENTITIES,
        SCRIPT_STYLE,
        TAG,
    )

    cleaned = re.sub(SCRIPT_STYLE, " ", html or "")
    out_blocks = []
    n_blocks = n_kept = 0
    for b in re.split(BLOCK_SPLIT, cleaned):
        t = re.sub(TAG, " ", b)
        for ent, rep in ENTITIES:
            t = t.replace(ent, rep)
        t = re.sub("[ \t\n\x0b\f\r]+", " ", t).strip()
        if t == "":
            continue
        n_blocks += 1
        lc = sum(
            len(re.sub(TAG, "", a)) for a in re.findall(ANCHOR, b)
        )
        if len(t.split(" ")) >= min_words and lc * 100 <= max_link_pct * len(t):
            n_kept += 1
            out_blocks.append(t)
    return "\n".join(out_blocks), n_blocks, n_kept


def html_extract_pdf(sf_dir: str) -> pd.DataFrame:
    """Naive replay of q_html_extract: the same deterministic HTML
    synthesis (nav bar of anchors, style payload, ' merge ' -> paragraph
    breaks, trailing script) then the python regex replay."""
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = []
    for doc_id, text in zip(docs["doc_id"].astype(int), docs["text"]):
        body = str(text).replace(" merge ", "</p><p>")
        html = (
            '<html><head><title>page</title><style>p{color:red}</style>'
            '</head><body><div class="nav"><a href="/">home page</a> '
            '<a href="/a">about us</a> <a href="/c">contact now</a></div>'
            f"<h1>heading {doc_id}</h1><p>{body}</p>"
            "<script>var x = 1;</script></body></html>"
        )
        t, nb, nk = _extract_html_py(html)
        rows.append((doc_id, t, nb, nk))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "n_blocks", "n_kept"])
    for c in ("doc_id", "n_blocks", "n_kept"):
        pdf[c] = pdf[c].astype("int64")
    return pdf


def token_fertility_pdf(sf_dir: str, num_merges: int = 16) -> pd.DataFrame:
    """Naive replay of token_fertility: python-twin BPE (doc_id%5==0
    training subset), per-lang sums with pure-int 2^-20 quantized
    ratios."""
    from feast_spark.operators.bpe import encode_word, train_bpe_naive

    # Java \s is ASCII-only; python str.split() also splits on Unicode
    # whitespace (\xa0, U+3000, ...) — use the ASCII class so the oracle
    # cannot silently diverge from the Spark arm's F.split(text, '\\s+')
    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    train = docs[docs["doc_id"] % 5 == 0]
    wc: dict[str, int] = {}
    for text in train["text"]:
        for w in java_ws.split(text):
            if w:
                wc[w] = wc.get(w, 0) + 1
    ranks = {
        pq: i for i, pq in enumerate(train_bpe_naive(wc, num_merges))
    }
    cache: dict[str, tuple[int, int]] = {}

    def stats(w: str) -> tuple[int, int]:
        if w not in cache:
            cache[w] = (len(encode_word(w, ranks)), len(w.encode("utf-8")))
        return cache[w]

    per: dict[str, list[int]] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        g = "__null__" if pd.isna(lang) else str(lang)
        acc = per.setdefault(g, [0, 0, 0, 0])
        acc[0] += 1
        for w in java_ws.split(str(text)):
            if w:
                nt, nb = stats(w)
                acc[1] += 1
                acc[2] += nt
                acc[3] += nb
    unit = 1 << 20
    rows = [
        (
            g,
            a[0],
            a[1],
            a[2],
            a[3],
            a[2] * unit // a[1],
            a[3] * unit // a[2],
        )
        for g, a in per.items()
        if a[1] > 0
    ]
    pdf = pd.DataFrame(
        rows,
        columns=[
            "group",
            "n_docs",
            "n_words",
            "n_bpe_tokens",
            "n_bytes",
            "fertility_units",
            "bytes_per_token_units",
        ],
    )
    for c in pdf.columns[1:]:
        pdf[c] = pdf[c].astype("int64")
    return pdf


def blocklist_pdf(sf_dir: str) -> pd.DataFrame:
    """Naive replay of blocklist_hits over the documents table: per
    position, per phrase ``startswith`` — O(len * phrases), no trie, no
    regex. The Spark arm's trie-lookahead scan must agree exactly."""
    from feast_spark.operators.blocklist import DEMO_PHRASES

    phrases = sorted({p.lower() for p in DEMO_PHRASES})
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = []
    for doc_id, text in zip(docs["doc_id"].astype(int), docs["text"]):
        low = str(text).lower()
        hits = [
            i
            for i in range(len(low))
            if any(low.startswith(p, i) for p in phrases)
        ]
        rows.append(
            (doc_id, len(hits), hits[0] if hits else -1, bool(hits))
        )
    pdf = pd.DataFrame(rows, columns=["id", "n_hits", "first_hit", "flagged"])
    for c in ("id", "n_hits", "first_hit"):
        pdf[c] = pdf[c].astype("int64")
    return pdf




def transcripts_loop_raw_pdf(sf_dir: str) -> pd.DataFrame:
    """The loop-planted transcript fixture (loop_prob=0.3 — same params
    as q_transcript_pipeline_loop), written RAW so the repetition
    operator's oracle is genuine DuckDB SQL over the input turns."""
    from feast_spark.fixtures import generate_transcripts

    pdf = generate_transcripts(
        100, seed=42, mega_every=50, mega_turns=200, loop_prob=0.3
    )
    pdf = pdf.copy()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf.reset_index(drop=True)


def unimax_pdf(sf_dir: str) -> pd.DataFrame:
    """Naive replay of :func:`feast_spark.operators.selection.
    unimax_sample` on the documents table: pandas word counts (identical
    non-empty-token rule), the SHARED integer allocation fold
    (``unimax_allocation`` — kernel imported verbatim, the
    greedy_kcenter pattern), md5-order selection with an exclusive
    cumulative sum, keep while ``cum_before < alloc``."""
    import hashlib
    import re

    from feast_spark.operators.selection import unimax_allocation

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    n_tokens = docs["text"].map(
        lambda t: len([x for x in ws.split(t or "")
                       if x]) if t is not None else 0
    )
    pdf = pd.DataFrame(
        {
            "doc_id": docs["doc_id"].astype("int64"),
            "lang": docs["lang"],
            "n_tokens": n_tokens.astype("int64"),
        }
    )
    total = int(pdf["n_tokens"].sum())
    sizes = pdf.groupby("lang")["n_tokens"].sum().to_dict()
    alloc = unimax_allocation(
        {k: int(v) for k, v in sizes.items()}, total * 7 // 10, max_epochs=1
    )
    pdf["__h"] = pdf["doc_id"].map(
        lambda i: int(
            hashlib.md5(f"um1{i}".encode()).hexdigest()[:12], 16
        )
    )
    pdf = pdf.sort_values(["lang", "__h", "doc_id"], kind="mergesort")
    pdf["cum_before"] = (
        pdf.groupby("lang")["n_tokens"].cumsum() - pdf["n_tokens"]
    )
    pdf["lang_alloc"] = pdf["lang"].map(alloc).astype("int64")
    kept = pdf[pdf["cum_before"] < pdf["lang_alloc"]]
    return (
        kept[["doc_id", "lang", "n_tokens", "cum_before", "lang_alloc"]]
        .reset_index(drop=True)
    )



def compressibility_pdf(sf_dir: str) -> pd.DataFrame:
    """Naive per-doc python replay of compression_stats: a plain loop
    over (doc_id, text) calling zlib directly — no shared kernel, no
    numpy. zlib itself is the one common dependency (single C library in
    this environment), so both arms see identical compressed lengths."""
    import zlib

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        b = ("" if text is None else str(text)).encode("utf-8")
        comp = len(zlib.compress(b, 6))
        rows.append(
            {
                "doc_id": int(doc_id),
                "raw_len": len(b),
                "comp_len": comp,
                "ratio_units": (comp * (1 << 20)) // len(b) if b else -1,
            }
        )
    return pd.DataFrame(rows)


def pack_ffd_pdf() -> pd.DataFrame:
    """Naive replay of the q_pack_ffd driver query: deduped fixture
    turns -> per-turn ASCII-ws word counts -> 0 < n <= 96 -> md5-48
    buckets (n_buckets = ceil(n_items / 512)) -> the SHARED
    :func:`feast_spark.operators.selection.ffd_pack_kernel` per bucket
    (first-fit-decreasing is sequential — no SQL form exists; the
    kernel is the contract and both arms run it verbatim)."""
    import hashlib
    import re

    from feast_spark.fixtures import generate_transcripts
    from feast_spark.operators.selection import ffd_pack_kernel
    from feast_spark.pipeline.oracle import oracle_dedup_latest

    pdf = generate_transcripts(100, seed=42, mega_every=50, mega_turns=200)
    d = oracle_dedup_latest(pdf)
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    items = []
    for conv, idx, text in zip(d["conv_id"], d["turn_idx"], d["text"]):
        t = "" if text is None else str(text)
        n = len([x for x in ws.split(t) if x])
        if 0 < n <= 96:
            items.append((f"{conv}:{idx}", n))
    n_buckets = max(1, -(-len(items) // 512))
    buckets: dict[int, list] = {}
    for i, n in items:
        b = (
            int(hashlib.md5(("ffd1" + i).encode()).hexdigest()[:12], 16)
            % n_buckets
        )
        buckets.setdefault(b, []).append((i, n))
    rows = []
    for b, its in buckets.items():
        nm = dict(its)
        for item_id, bin_idx, off in ffd_pack_kernel(its, 96, "ffd1"):
            rows.append((item_id, nm[item_id], b, bin_idx, off))
    return pd.DataFrame(
        rows, columns=["id", "n_tokens", "pack_bucket", "pack_bin",
                       "pack_offset"]
    ).astype(
        {"id": "string", "n_tokens": "int64", "pack_bucket": "int64",
         "pack_bin": "int64", "pack_offset": "int64"}
    )


_RELATIONS = {
    "html_extract": lambda sf: html_extract_pdf(sf),
    "doc_curation_blocklist": lambda sf: curation_blocklist_pdf(sf),
    "doc_curation_neardup": lambda sf: curation_neardup_pdf(sf),
    "token_fertility": lambda sf: token_fertility_pdf(sf),
    "blocklist_hits": lambda sf: blocklist_pdf(sf),
    "cdc_neardup": lambda sf: cdc_neardup_pdf(sf),
    "transcripts_raw": lambda sf: transcripts_raw_pdf(sf),
    "transcripts_loop_raw": lambda sf: transcripts_loop_raw_pdf(sf),
    "unimax_sample": lambda sf: unimax_pdf(sf),
    "pii_stats": lambda sf: pii_stats_pdf(sf),
    "pseudonymize": lambda sf: pseudonymize_pdf(sf),
    "turn_neardup": lambda sf: turn_neardup_pdf(),
    "conv_pack": lambda sf: conv_pack_pdf(),
    "conv_pii": lambda sf: conv_pii_pdf(),
    "conv_curation": lambda sf: conv_curation_pdf(),
    "gopher_repetition": lambda sf: gopher_repetition_pdf(sf),
    "lexical_stats": lambda sf: lexical_stats_pdf(sf),
    "bm25_topk": lambda sf: bm25_topk_pdf(sf),
    "doc_curation_lm": lambda sf: curation_lm_pdf(sf),
    "langid_classifier": lambda sf: langid_pdf(sf),
    "lm_perplexity": lambda sf: lm_perplexity_pdf(sf),
    "export_shards": lambda sf: export_manifest_pdf(sf),
    "quality_classifier": lambda sf: classifier_pdf(sf),
    "doc_minhash_pairs": lambda sf: minhash_pairs_pdf(sf),
    "minhash_cand_est": lambda sf: minhash_cand_est_pdf(sf),
    "doc_simhash_pairs": lambda sf: simhash_pairs_pdf(sf, hamming_threshold=4),
    "dup_clusters": lambda sf: dup_clusters_pdf(sf),
    "doc_winnow_pairs": lambda sf: winnow_pairs_pdf(sf),
    "doc_quality_scores": lambda sf: quality_scores_pdf(sf),
    "transcript_pipeline": lambda sf: transcript_labels_pdf(),
    "transcript_pipeline_loop": lambda sf: transcript_labels_pdf(loop=True),
    # same fixture under rules.strict_config() — the label_drift B run
    "transcript_labels_strict": lambda sf: transcript_labels_pdf(strict=True),
    # asymmetric rule variants for keep_drop_eval: the candidate drops
    # turns the reference keeps AND vice versa, and the reference scrubs
    # in pseudonymize mode so kept-text equality is non-trivial too
    "transcript_labels_eval_a": lambda sf: transcript_labels_pdf(
        variant="eval_pred"
    ),
    "transcript_labels_eval_b": lambda sf: transcript_labels_pdf(
        variant="eval_ref"
    ),
    # per-turn language ids (shared language_id kernel, like the
    # pipeline's lang column) — the conv_language oracle re-derives the
    # mode/switch rollup in GENUINE SQL on top of this
    "turn_langs": lambda sf: turn_langs_pdf(),
    "rule_bits": lambda sf: rule_bits_pdf(),
    "sweep_cells": lambda sf: sweep_cells_pdf(),
    "conv_neardup": lambda sf: conv_neardup_pdf(),
    "bpe_tokens": lambda sf: bpe_tokens_pdf(sf),
    "tokenize_pack": lambda sf: tokenize_pack_pdf(sf),
    "ann_lsh_topk": lambda sf: lsh_topk_pdf(sf),
    "ann_ivf_topk": lambda sf: ivf_topk_pdf(sf),
    "embedding_neardup_lsh": lambda sf: embedding_neardup_pdf(sf),
    "semantic_dedup": lambda sf: semantic_dedup_pdf(sf),
    "diverse_sample": lambda sf: diverse_sample_pdf(sf),
    "doc_curation": lambda sf: curation_pdf(sf),
    "doc_curation_clf": lambda sf: curation_clf_pdf(sf),
    "conv_pack_isolated": lambda sf: conv_pack_isolated_pdf(),
    "para_neardup": lambda sf: paragraph_neardup_pdf(sf),
    "moore_lewis": lambda sf: moore_lewis_pdf(sf),
    "compressibility": lambda sf: compressibility_pdf(sf),
    "pack_ffd": lambda sf: pack_ffd_pdf(),
}


def ensure_oracles(sf_dir: str, names: list[str] | None = None) -> dict[str, str]:
    """Materialize the requested oracle relations for ``sf_dir``; returns
    name -> parquet path. Recomputed once per process per sf."""
    out: dict[str, str] = {}
    for name in names or list(_RELATIONS):
        path = oracle_path(sf_dir, name)
        key = (sf_dir, name)
        if key not in _BUILT or not os.path.exists(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            pdf = _RELATIONS[name](sf_dir)
            # atomic publish: concurrent processes (driver harnesses) may
            # build the same relation — rename is atomic on one filesystem
            tmp = f"{path}.tmp.{os.getpid()}"
            pdf.to_parquet(tmp, index=False)
            os.replace(tmp, path)
            _BUILT.add(key)
        out[name] = path
    return out
