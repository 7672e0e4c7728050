"""Blocklist trie-scan: trie-pattern equivalence to the naive
per-position check (randomized over a tiny alphabet so phrase nesting,
prefix-sharing and overlap all occur), plus Spark-side null/case
handling and the map-only plan shape."""

from __future__ import annotations

import random
import re

import pytest

from feast_spark.operators.blocklist import (
    DEMO_PHRASES,
    blocklist_hits,
    trie_pattern,
)


def _naive_positions(text: str, phrases: list[str]) -> list[int]:
    low = text.lower()
    return [
        i
        for i in range(len(low))
        if any(low.startswith(p, i) for p in phrases)
    ]


def test_trie_pattern_matches_naive_randomized():
    rng = random.Random(42)
    for trial in range(50):
        n_phr = rng.randrange(1, 12)
        phrases = sorted(
            {
                "".join(rng.choice("ab.") for _ in range(rng.randrange(1, 5)))
                for _ in range(n_phr)
            }
        )
        pat = re.compile(f"(?=(?:{trie_pattern(phrases)}))")
        for _ in range(20):
            s = "".join(rng.choice("abc.") for _ in range(rng.randrange(0, 40)))
            got = [m.start() for m in pat.finditer(s)]
            assert got == _naive_positions(s, phrases), (phrases, s)


def test_trie_pattern_nesting_and_prefixes():
    phrases = ["spark", "sparkle", "ark", "a"]
    pat = re.compile(f"(?=(?:{trie_pattern(phrases)}))")
    s = "sparkle and arks"
    got = [m.start() for m in pat.finditer(s)]
    assert got == _naive_positions(s, phrases)
    # "sparkle" position counted once even though "spark" also matches
    assert got.count(0) == 1


def test_empty_phrase_rejected():
    with pytest.raises(ValueError):
        trie_pattern(["ok", ""])
    with pytest.raises(ValueError):
        trie_pattern([])


def test_blocklist_hits_spark(spark):
    rows = [
        (1, "a FAST TABLE and a sparkle here"),   # case-blind
        (2, None),                                  # null text
        (3, ""),
        (4, "nothing matching at all xyz qqq"),
        (5, "table table"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in blocklist_hits(df, DEMO_PHRASES).collect()}
    assert len(out) == 5
    naive = {
        i: _naive_positions((t or ""), [p.lower() for p in DEMO_PHRASES])
        for i, t in rows
    }
    for i, pos in naive.items():
        assert out[i].n_hits == len(pos)
        assert out[i].first_hit == (pos[0] if pos else -1)
        assert out[i].flagged == bool(pos)
    assert out[1].flagged and not out[4].flagged
    # "table table": positions 0 and 6 both hit ("table table", "table")
    assert out[5].n_hits == 2


def test_plan_map_only(spark):
    import contextlib
    import io

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = blocklist_hits(df, DEMO_PHRASES)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan  # no shuffle: broadcast + map pass only
