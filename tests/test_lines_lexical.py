"""C4 line-level cleaning (operators/lines.py) + lexical-diversity stats
(operators/lexical.py) — value tests against hand-computed / Counter-loop
references and plan audits for the map-only (zero-Exchange) claims."""

from __future__ import annotations

import contextlib
import io
import math
from collections import Counter

import numpy as np
import pandas as pd


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------- lines


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_lines_predicates(spark):
    from feast_spark.operators.lines import clean_lines

    rows = [
        # doc 1: mix of keep/drop lines
        (
            1,
            "Good first sentence here.\n"
            "short.\n"  # < 3 words
            "no terminal punctuation at all\n"  # no . ! ?
            "this has some javascript inside.\n"  # blocklist
            "   \n"  # blank (trimmed away, not counted)
            "  Another good line survives!  \n"  # trimmed, kept
            "Lorem Ipsum dolor sit amet.",  # blocklist, case-insensitive
        ),
        (2, ""),  # empty doc
        (3, "Only one good line here."),  # kept but < min_kept_lines
    ]
    out = (
        clean_lines(_docs(spark, rows))
        .orderBy("doc_id")
        .collect()
    )
    d1, d2, d3 = out
    assert d1.n_lines == 6 and d1.n_kept == 2
    assert d1.text_clean == (
        "Good first sentence here.\nAnother good line survives!"
    )
    assert d1.kept_frac == 2 / 6
    assert d1.n_chars_clean == len(d1.text_clean)
    assert d1.doc_ok is True
    assert (d2.n_lines, d2.n_kept, d2.text_clean, d2.doc_ok) == (
        0,
        0,
        "",
        False,
    )
    assert d2.kept_frac == 0.0
    assert (d3.n_kept, d3.doc_ok) == (1, False)


def test_clean_lines_knobs(spark):
    from feast_spark.operators.lines import clean_lines

    rows = [(1, "one two\nthree four five")]
    # require_terminal off + min_words=2: both lines keep
    out = clean_lines(
        _docs(spark, rows),
        require_terminal=False,
        min_words=2,
        min_kept_lines=1,
        join_sep=" | ",
    ).collect()[0]
    assert out.n_kept == 2 and out.text_clean == "one two | three four five"
    assert out.doc_ok is True


def test_clean_lines_null_text_gets_zero_stats(spark):
    # size(split(NULL)) is NULL in Spark 3+ — without the coalesce a
    # NULL-text doc would carry NULL n_lines/doc_ok and silently vanish
    # from BOTH branches of a doc_ok filter (curation would misattribute
    # the drop); it must instead get deterministic zero stats
    from feast_spark.operators.lines import clean_lines

    df = spark.createDataFrame(
        [(1, None), (2, "one two three.")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in clean_lines(df).collect()}
    r1 = rows[1]
    assert (r1.n_lines, r1.n_kept, r1.kept_frac, r1.text_clean) == (
        0, 0, 0.0, "",
    )
    assert r1.doc_ok is False
    # the two filter branches now partition the corpus
    out = clean_lines(df)
    assert out.filter("doc_ok").count() + out.filter("NOT doc_ok").count() == 2


def test_clean_lines_map_only_plan(spark):
    from feast_spark.operators.lines import clean_lines

    df = clean_lines(_docs(spark, [(1, "a b c.")]))
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -------------------------------------------------------------- lexical


def _naive_lexical(text: str) -> dict:
    toks = text.lower().split()
    n = len(toks)
    c = Counter(toks)
    rec = {
        "n_tokens": n,
        "n_types": len(c),
        "type_token_ratio": len(c) / n if n else 0.0,
        "hapax_frac": (
            sum(1 for v in c.values() if v == 1) / len(c) if c else 0.0
        ),
        "mean_word_len": sum(len(t) for t in toks) / n if n else 0.0,
    }
    if n:
        cnt = np.array(list(c.values()), dtype=np.int64)
        p = cnt / np.int64(n)
        q = np.floor(-(p * np.log2(p)) * float(2**40))
        rec["unigram_entropy"] = float(q.sum()) / float(2**40)
    else:
        rec["unigram_entropy"] = 0.0
    return rec


def test_lexical_stats_values(spark):
    from feast_spark.operators.lexical import lexical_stats

    texts = [
        "the cat sat on the mat",
        "aaa aaa aaa aaa",  # zero entropy, one type
        "a b c d e f g h",  # all hapax, max entropy = 3 bits
        "",
        "  Mixed CASE mixed case  ",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    got = {
        r["doc_id"]: r.asDict()
        for r in lexical_stats(_docs(spark, rows)).collect()
    }
    for i, t in enumerate(texts):
        want = _naive_lexical(t)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v)
    # spot-check closed forms
    assert got[1]["n_types"] == 1 and got[1]["unigram_entropy"] == 0.0
    assert got[2]["hapax_frac"] == 1.0
    assert abs(got[2]["unigram_entropy"] - 3.0) < 1e-9
    assert got[4]["n_types"] == 2  # case-folded


def test_lexical_kernel_batch_independence():
    # quantized entropy terms sum exactly in any order: the kernel over
    # one batch equals per-row singleton batches bit-for-bit
    from feast_spark.operators.lexical import lexical_stats_pdf_batch

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = pd.Series(
        [
            " ".join(rng.choice(vocab, size=rng.integers(1, 60)))
            for _ in range(50)
        ]
    )
    whole = lexical_stats_pdf_batch(texts)
    parts = pd.concat(
        [lexical_stats_pdf_batch(texts[i : i + 1]) for i in range(len(texts))],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(whole, parts)


def test_lexical_stats_map_only_plan(spark):
    from feast_spark.operators.lexical import lexical_stats

    plan = _plan(lexical_stats(_docs(spark, [(1, "a b")])))
    assert "Exchange" not in plan


# ---------------------------------------------------------- source c-TF-IDF


def test_source_top_terms_surfaces_distinctive_terms(spark):
    from feast_spark.operators.lexical import source_top_terms

    rows = [
        (1, "a", "kubernetes cluster deploys kubernetes pods"),
        (2, "a", "kubernetes nodes and the common filler words"),
        (3, "b", "sourdough starter feeds sourdough loaves"),
        (4, "b", "sourdough bakers and the common filler words"),
        (5, "c", "telescope optics and the common filler words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = source_top_terms(df, k=3).toPandas()
    top1 = out[out["rank"] == 1].set_index("group")["term"].to_dict()
    # each group's exclusive high-tf term wins; the shared filler loses.
    # group c's exclusive terms all tie at tf=1/df=1, so the term
    # tie-break (ascending) picks 'optics'
    assert top1 == {"a": "kubernetes", "b": "sourdough", "c": "optics"}
    assert (out.groupby("group").size() <= 3).all()
    # shared-by-all terms carry df_groups == 3
    shared = out[out["term"] == "the"]
    assert (shared["df_groups"] == 3).all() if len(shared) else True


def test_source_top_terms_plan_bounds_topk(spark):
    from feast_spark.operators.lexical import source_top_terms

    df = spark.createDataFrame(
        [(1, "a", "x y z")], "doc_id long, source string, text string"
    )
    plan = (
        source_top_terms(df, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_source_vocab_stats_counts_and_blank_group(spark):
    from feast_spark.operators.lexical import source_vocab_stats

    docs = spark.createDataFrame(
        [
            (1, "red red blue", "a"),
            (2, "blue green", "a"),
            # 'a': tokens=5, types=3 (red, blue, green), hapax=1 (green)
            (3, "solo", "b"),
            (4, None, "c"),
            (5, "  ", "c"),  # all-blank group -> zero counts, NULL ttr
        ],
        "doc_id long, text string, source string",
    )
    out = {r["group"]: r.asDict() for r in source_vocab_stats(docs).collect()}
    a = out["a"]
    assert (a["n_docs"], a["n_tokens"], a["n_types"], a["n_hapax"]) == (2, 5, 3, 1)
    assert a["ttr_units"] == 3 * (1 << 20) // 5
    b = out["b"]
    assert (b["n_tokens"], b["n_types"], b["n_hapax"]) == (1, 1, 1)
    assert b["ttr_units"] == 1 << 20
    c = out["c"]
    assert (c["n_docs"], c["n_tokens"], c["n_types"]) == (2, 0, 0)
    assert c["ttr_units"] is None


def test_compression_stats_two_tails_and_sentinel(spark):
    import random

    from feast_spark.operators.lexical import compression_stats

    rng = random.Random(7)
    garbage = "".join(chr(rng.randrange(33, 127)) for _ in range(2000))
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam " * 200),          # boilerplate tail
            (2, garbage),                          # incompressible tail
            (3, ""),                               # sentinel
            (4, None),                             # sentinel
            (5, "a normal english sentence with ordinary words in it"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in compression_stats(docs).collect()}
    u = 1 << 20
    assert out[1]["ratio_units"] < u // 10        # repeats compress hard
    assert out[2]["ratio_units"] > (3 * u) // 4   # randomness barely does
    assert out[3]["ratio_units"] == -1 and out[3]["raw_len"] == 0
    assert out[4]["ratio_units"] == -1
    assert 0 < out[5]["ratio_units"] <= (3 * u) // 2
    # raw_len counts UTF-8 bytes, comp_len is positive even when empty
    assert out[5]["raw_len"] == 51 and out[5]["comp_len"] > 0
