"""HTML boilerplate removal: randomized Spark-vs-python regex-program
parity, the semantic guarantees (script/style payloads vanish, nav bars
fail link density, entities unescape, nulls safe), and the map-only
plan."""

from __future__ import annotations

import random

import pytest

from feast_spark.operators.html import extract_html_text
from feast_spark.oracles import _extract_html_py


def _rand_html(rng: random.Random) -> str:
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "&amp;", "x"]
    parts = ["<html><body>"]
    for _ in range(rng.randrange(0, 8)):
        kind = rng.randrange(5)
        txt = " ".join(rng.choice(words) for _ in range(rng.randrange(0, 9)))
        if kind == 0:
            parts.append(f"<p>{txt}</p>")
        elif kind == 1:
            parts.append(f'<div><a href="#">{txt}</a></div>')
        elif kind == 2:
            parts.append(f"<script>var x = '{txt}';</script>")
        elif kind == 3:
            parts.append(f"<li><B>{txt}</B> tail</li>")
        else:
            parts.append(f"<h2>{txt}</h2>")
    parts.append("</body></html>")
    return "".join(parts)


def test_random_pages_match_python_replay(spark):
    rng = random.Random(9)
    rows = [(i, _rand_html(rng)) for i in range(60)]
    rows += [(100, None), (101, ""), (102, "no tags at all just words here")]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r.doc_id: r for r in extract_html_text(df).collect()}
    assert len(got) == len(rows)
    for i, h in rows:
        t, nb, nk = _extract_html_py(h or "")
        r = got[i]
        assert (r.text, r.n_blocks, r.n_kept) == (t, nb, nk), (i, h)


def test_semantics(spark):
    html = (
        "<html><head><style>body{}</style></head><body>"
        '<div><a href="/">home page</a> <a href="/b">about this</a></div>'
        "<p>real content with enough words &amp; an &lt;entity&gt;</p>"
        "<p>too few</p>"
        "<script>alert('secret payload words words words')</script>"
        "</body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = extract_html_text(df).collect()[0]
    assert r.text == "real content with enough words & an <entity>"
    assert r.n_kept == 1
    assert r.n_blocks == 3  # nav, real, too-few (script payload gone)
    assert "secret" not in r.text and "home" not in r.text


def test_link_density_threshold(spark):
    # anchor text plus a few free words: below the default 30% only when
    # the free text dominates
    mostly_links = '<p><a href="#">one two three four five</a> x</p>'
    mostly_text = '<p><a href="#">one</a> two three four five six seven</p>'
    df = spark.createDataFrame(
        [(1, mostly_links), (2, mostly_text)], "doc_id long, html string"
    )
    out = {r.doc_id: r for r in extract_html_text(df).collect()}
    assert out[1].n_kept == 0 and out[1].n_blocks == 1
    assert out[2].n_kept == 1


def test_plan_map_only(spark):
    import contextlib
    import io

    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = docs.select("doc_id", F.col("text").alias("html"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        extract_html_text(df).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
