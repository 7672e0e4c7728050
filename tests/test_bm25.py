"""BM25 sparse retrieval (operators/bm25.py) — value tests against an
inline textbook implementation, determinism/tie-break checks, and plan
audits for the broadcast-pruned scale shape."""

from __future__ import annotations

import contextlib
import io
import math
from collections import Counter

import pytest


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _naive_bm25(corpus, queries, k=10, k1=1.2, b=0.75):
    """Textbook BM25 with the operator's quantization contract."""
    toks = {i: t.lower().split() for i, t in corpus}
    n = len(toks)
    avgdl = float(sum(len(t) for t in toks.values())) / float(n)
    out = {}
    for qid, qtext in queries:
        terms = sorted({t for t in qtext.lower().split() if t})
        df = {
            t: sum(1 for tt in toks.values() if t in tt) for t in terms
        }
        idf = {
            t: math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            for t in terms
        }
        scored = []
        for i, tt in toks.items():
            c = Counter(tt)
            units, hit = 0, False
            for t in terms:
                tf = c.get(t, 0)
                if not tf or not df[t]:
                    continue
                hit = True
                denom = tf + k1 * ((1.0 - b) + b * len(tt) / avgdl)
                units += int(
                    math.floor(idf[t] * (tf * (k1 + 1.0)) / denom * 1048576.0)
                )
            if hit:
                scored.append((-units, i))
        scored.sort()
        out[qid] = [(i, -u) for u, i in scored[:k]]
    return out


CORPUS = [
    (0, "apple banana apple cherry"),
    (1, "banana banana banana"),
    (2, "cherry date elderberry fig grape"),
    (3, "apple apple apple apple apple apple"),
    (4, "date banana apple"),
    (5, "unrelated words entirely here now"),
]
QUERIES = [("qa", "apple cherry"), ("qb", "banana"), ("qc", "zzz-absent")]


def test_bm25_matches_textbook_reference(spark):
    from feast_spark.operators.bm25 import bm25_topk

    got = bm25_topk(_docs(spark, CORPUS), QUERIES, k=4).collect()
    want = _naive_bm25(CORPUS, QUERIES, k=4)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [(r.doc_id, r.score_units) for r in rows] == want[qid]
        for r in rows:
            assert r.score == r.score_units / 1048576.0
    # a query whose terms appear nowhere returns no rows
    assert "qc" not in by_q and want["qc"] == []
    # non-matching doc 5 never appears
    assert all(r.doc_id != 5 for r in got)


def test_bm25_rank_ties_break_by_doc_id(spark):
    from feast_spark.operators.bm25 import bm25_topk

    # docs 1,2,3 are identical -> identical integer scores; ranks must
    # follow doc_id deterministically
    rows = [(i, "same exact text") for i in (3, 1, 2)] + [(9, "other")]
    got = sorted(
        bm25_topk(_docs(spark, rows), [("q", "same")], k=3).collect(),
        key=lambda r: r.rank,
    )
    assert [r.doc_id for r in got] == [1, 2, 3]
    assert len({r.score_units for r in got}) == 1


def test_bm25_more_occurrences_rank_higher(spark):
    from feast_spark.operators.bm25 import bm25_topk

    got = sorted(
        bm25_topk(_docs(spark, CORPUS), [("q", "apple")], k=6).collect(),
        key=lambda r: r.rank,
    )
    # same dl ordering: doc 3 (tf=6) beats doc 0 (tf=2) beats doc 4 (tf=1)
    ids = [r.doc_id for r in got]
    assert ids.index(3) < ids.index(0) < ids.index(4)


def test_bm25_plan_prunes_before_shuffle(spark):
    from feast_spark.operators.bm25 import bm25_topk
    from feast_spark.operators.dedup import release_dedup_caches

    df = bm25_topk(_docs(spark, CORPUS), QUERIES, k=3)
    plan = _plan(df)
    # query terms + idf table are broadcast (never a shuffled join side)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # top-k is a WindowGroupLimit rank filter, not a global sort
    assert "WindowGroupLimit" in plan, plan
    release_dedup_caches()


def test_bm25_empty_terms_raises(spark):
    from feast_spark.operators.bm25 import bm25_topk

    with pytest.raises(ValueError):
        bm25_topk(_docs(spark, CORPUS), [("q", "   ")])
