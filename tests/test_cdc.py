"""Content-defined chunking (Gear/FastCDC) near-dup: kernel parity vs the
sequential scalar reference, the shift-robustness property the technique
exists for, self-synchronization, the boilerplate df cap, and the plan
shape (no cartesian, equi-keyed aggregation only)."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from feast_spark import textkit
from feast_spark.operators.dedup import (
    _cdc_chunk_batch,
    cdc_chunks,
    cdc_neardup_pairs,
)


def _naive_distinct(text: str, bits: int) -> list[tuple[int, int]]:
    data = (text or "").encode("utf-8", "surrogatepass")
    first: dict[int, int] = {}
    for h, ln in textkit.cdc_chunks_py(data, bits):
        first.setdefault(h, ln)
    return sorted(first.items())


def test_kernel_parity_randomized():
    rng = random.Random(11)
    texts: list[str | None] = [
        "".join(
            rng.choice("abcdefg hij klmnoé中\n\t")
            for _ in range(rng.randrange(0, 500))
        )
        for _ in range(80)
    ]
    texts += ["", None, "z", "\ud800ok"]  # empty / null / 1-byte / surrogate
    s = pd.Series(texts)
    for bits in (4, 6, 8):
        hs, ls = _cdc_chunk_batch(s, bits)
        for i, t in enumerate(texts):
            got = sorted(zip(hs[i].tolist(), ls[i].tolist()))
            assert got == _naive_distinct(t or "", bits), (bits, i)


def test_chunk_lengths_cover_document():
    # stream-order (non-distinct) coverage: naive chunk lens sum to the
    # byte length — the vectorized kernel's distinct set is a subset with
    # identical (hash, len) pairs, already pinned by parity above
    t = "covering test " * 57
    chunks = textkit.cdc_chunks_py(t.encode(), 5)
    assert sum(ln for _, ln in chunks) == len(t.encode())


def test_shift_robustness(spark):
    # the reason CDC exists: the same byte run at DIFFERENT offsets still
    # shares interior chunks (fixed-size blocking shares none)
    rng = random.Random(5)
    base = " ".join(
        rng.choice(["alpha", "beta", "gamma", "delta", "eps"])
        for _ in range(300)
    )
    rows = [
        (1, "short head " + base),
        (2, "an entirely different and much longer head 0123456789 " + base),
        (3, "".join(rng.choice("qwerty uiop") for _ in range(900))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = cdc_neardup_pairs(df, avg_bits=6, min_shared=2).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.id_a, p.id_b) == (1, 2)
    assert p.shared >= 3 and p.shared_bytes > 100


def test_self_synchronization(spark):
    # cuts re-align within ~64 bytes after an edit: interior chunks of a
    # doc reappear when the doc is embedded in another
    inner = "self sync property check " * 40  # 1000 bytes
    df = spark.createDataFrame(
        [(1, inner), (2, "PREFIX-" + inner + "-SUFFIX")],
        "doc_id long, text string",
    )
    ch = {
        r.id: set()
        for r in df.select("doc_id").withColumnRenamed("doc_id", "id").collect()
    }
    for r in cdc_chunks(df, avg_bits=5).collect():
        ch[r.id].add(r.chunk_hash)
    shared = ch[1] & ch[2]
    assert len(shared) >= len(ch[1]) // 2


def test_chunk_df_cap_drops_boilerplate(spark):
    # chunks held by every doc (boilerplate: 10 identical docs -> every
    # bucket df=10) are dropped by the cap BEFORE any pair is emitted,
    # while a low-df planted dup (df=2) still surfaces
    rng = random.Random(23)
    same = "".join(rng.choice("abcdefghij klmnop") for _ in range(600))
    dup = "".join(rng.choice("qrstuvwx yz") for _ in range(600))
    rows = [(i, same) for i in range(10)]
    rows += [(10, "head A " + dup), (11, "other head B " + dup)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = cdc_neardup_pairs(df, avg_bits=5, min_shared=1)
    capped = cdc_neardup_pairs(
        df, avg_bits=5, min_shared=1, max_chunk_df=5
    )
    assert uncapped.count() == 46  # C(10,2) boilerplate + the planted pair
    got = capped.collect()
    assert len(got) == 1 and (got[0].id_a, got[0].id_b) == (10, 11)
    from feast_spark.operators.dedup import release_dedup_caches

    release_dedup_caches()


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "some real content here")],
        "doc_id long, text string",
    )
    ch = cdc_chunks(df).collect()
    assert {r.id for r in ch} == {3}
    assert cdc_neardup_pairs(df).count() == 0


def test_plan_no_cartesian(spark):
    import contextlib
    import io

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = cdc_neardup_pairs(df, avg_bits=6, min_shared=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # pair emission is map-side off the collect_set: exactly two
    # aggregation keys appear (chunk_hash, then the pair)
    assert "chunk_hash" in plan
