"""Round-5 session-13 operators: exact grouped quantiles, writing-script
census, Zipf rank-frequency profile.

Value tests replay each contract naively in Python (Counter / sorted
lists) on planted inputs; plan tests pin the scale shapes the docstrings
claim (one exchange for both quantile window frames, broadcast probe
dimension, map-side WindowGroupLimit for the Zipf top-R, broadcast role
totals for the script census)."""

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


# ---------------------------------------------------------------- quantiles


def _naive_quantiles(rows, probes, units=1 << 20):
    """(group, value) rows -> {(group, p): (n, rank, q_value)} by the
    documented contract: smallest v with cum(v) >= ceil(p*n/units)."""
    by_g: dict[str, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    out = {}
    for g, vs in by_g.items():
        vs.sort()
        n = len(vs)
        for p in probes:
            k = -(-p * n // units)  # ceil
            out[(g, p)] = (n, k, vs[k - 1])
    return out


def test_grouped_quantiles_matches_naive_replay(spark):
    from feast_spark.operators.aggregate import grouped_quantiles

    import random

    rng = random.Random(13)
    rows = [
        (f"g{i % 3}", rng.randrange(0, 40))
        for i in range(500)
    ] + [("g_single", 7)]  # one-row group: every probe must answer 7
    probes = [1, 262144, 524288, 943718, 1048576]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r["g"], r["probe_units"]): (r["n_rows"], r["rank"], r["q_value"])
        for r in grouped_quantiles(df, ["g"], "v", probes).collect()
    }
    exp = _naive_quantiles(rows, probes)
    assert got == exp
    # every group emits every probe
    assert len(got) == 4 * len(probes)


def test_grouped_quantiles_probe_validation(spark):
    from feast_spark.operators.aggregate import grouped_quantiles

    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError, match="non-empty"):
        grouped_quantiles(df, ["g"], "v", [])
    with pytest.raises(ValueError, match="out of"):
        grouped_quantiles(df, ["g"], "v", [0])
    with pytest.raises(ValueError, match="out of"):
        grouped_quantiles(df, ["g"], "v", [(1 << 20) + 1])
    with pytest.raises(ValueError, match="duplicate"):
        grouped_quantiles(df, ["g"], "v", [5, 5])


def test_turn_length_quantiles_counts_blank_and_null_as_zero(spark):
    from feast_spark.operators.conversation import turn_length_quantiles

    rows = [
        ("c1", 0, "user", None, None, "2026-01-01 00:00:00"),
        ("c1", 1, "user", "   ", None, "2026-01-01 00:00:01"),
        ("c1", 2, "user", "one two three", None, "2026-01-01 00:00:02"),
        ("c1", 3, "user", "a b", None, "2026-01-01 00:00:03"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts string",
    ).withColumn("ts", __import__("pyspark").sql.functions.col("ts").cast("timestamp"))
    # median over word counts [0, 0, 2, 3] -> rank ceil(0.5*4)=2 -> 0
    out = {
        r["probe_units"]: r["q_value"]
        for r in turn_length_quantiles(df, probe_units=[524288, 1048576]).collect()
    }
    assert out == {524288: 0, 1048576: 3}


def test_grouped_quantiles_plan_one_exchange_two_frames(spark):
    from pyspark.sql import functions as F

    from feast_spark.operators.aggregate import grouped_quantiles

    df = spark.range(1000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") % 17).alias("v"),
    )
    plan = _plan(grouped_quantiles(df, ["g"], "v", [524288]))
    # the cumulative and total frames must share ONE group-keyed
    # exchange: exactly two Window nodes, and exchanges = input agg
    # partials (id->g,v agg needs one) + the window's g exchange
    assert plan.count("Window") >= 2
    # probes ride a broadcast nested-loop join, never a real cartesian
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # exchanges: one for the (g, v) agg, one for the window partition —
    # nothing else (the final agg reuses the window partitioning's
    # output via partial agg; a 3rd exchange appears for the final
    # (g, probe) agg which is dimension-sized)
    assert plan.count("Exchange hashpartitioning") <= 3


# --------------------------------------------------------------- script mix


def test_script_mix_stats_exact_counts(spark):
    from pyspark.sql import functions as F

    from feast_spark.operators.textqa import script_mix_stats

    rows = [
        # 5 latin + 2 digit + 4 han chars, total len 13 (2 spaces)
        ("c1", 0, "user", "hello 42 你好世界", None,
         "2026-01-01 00:00:00"),
        # 6 kana, total len 6
        ("c1", 1, "assistant", "こんにちはカ", None,
         "2026-01-01 00:00:01"),
        # duplicate delivery of turn 0 (earlier ts) — dedup must drop it
        ("c1", 0, "user", "zzzz zzzz zzzz zzzz", None,
         "2025-12-31 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r["script"], r["role"]): (
            r["n_chars"], r["n_turns"], r["n_convs"], r["share_units"]
        )
        for r in script_mix_stats(df).collect()
    }
    assert got == {
        ("latin", "user"): (5, 1, 1, 5 * (1 << 20) // 13),
        ("digit", "user"): (2, 1, 1, 2 * (1 << 20) // 13),
        ("han", "user"): (4, 1, 1, 4 * (1 << 20) // 13),
        ("kana", "assistant"): (6, 1, 1, 6 * (1 << 20) // 6),
    }


def test_script_mix_stats_validates_classes(spark):
    from feast_spark.operators.textqa import script_mix_stats

    df = spark.createDataFrame(
        [("c", 0, "user", "x", None, None)],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    with pytest.raises(ValueError, match="non-empty"):
        script_mix_stats(df, classes=[])
    with pytest.raises(ValueError, match="non-empty"):
        script_mix_stats(df, classes=[("x", "")])


def test_script_mix_plan_broadcasts_role_totals(spark):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.textqa import script_mix_stats

    t = transcripts_spark(spark, 20, seed=1)
    plan = _plan(script_mix_stats(t))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------- zipf


def _naive_zipf(docs, top_r=64, units=1 << 20):
    out = {}
    by_g: dict[str, Counter] = {}
    for g, text in docs:
        toks = [w for w in (text or "").replace("\t", " ").split(" ") if w]
        by_g.setdefault(g, Counter()).update(toks)
    for g, c in by_g.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_r]
        pts = [
            (len(bin(i + 1)) - 3, len(bin(tf)) - 3)  # '0b' prefix
            for i, (_, tf) in enumerate(ranked)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        su = None
        if den != 0:
            q = num * units / den
            su = math.floor(q) if q >= 0 else -math.floor(-q)  # trunc to 0
            su = int(num * units // den) if (num * units) % den == 0 else su
            # exact truncation toward zero:
            su = int(
                (num * units) // den
                if (num * units) % den == 0 or num * units >= 0
                else -((-num * units) // den)
            )
        out[g] = (n, ranked[0][0], ranked[0][1], num, den, su)
    return out


def test_zipf_profile_matches_naive_replay(spark):
    from feast_spark.operators.lexical import zipf_profile

    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for i in range(80):
        g = f"s{i % 3}"
        # zipf-ish draw: term j with weight 1/(j+1)
        words = rng.choices(vocab, weights=[1 / (j + 1) for j in range(60)], k=120)
        docs.append((g, " ".join(words)))
    docs.append(("one_term", "solo solo solo"))  # den = 0 -> NULL slope
    df = spark.createDataFrame(docs, "source string, text string")
    got = {
        r["group"]: (
            r["n_terms"], r["top_term"], r["top_tf"],
            r["slope_num"], r["slope_den"], r["slope_units"],
        )
        for r in zipf_profile(df, top_r=64).collect()
    }
    exp = _naive_zipf(docs, top_r=64)
    assert got == exp
    assert got["one_term"][4] == 0 and got["one_term"][5] is None


def test_zipf_profile_negative_truncation_toward_zero(spark):
    from feast_spark.operators.lexical import zipf_profile

    # two-point curve: rank 1 (lx=0) tf=4 (ly=2), rank 2 (lx=1) tf=1
    # (ly=0): num = 2*0 - 1*2 = -2, den = 2*1 - 1 = 1 -> units exact;
    # then a 3-point curve engineered so num*units/den is fractional
    # and negative, pinning trunc-toward-zero against Python floor
    df = spark.createDataFrame(
        [("a", "x x x x y")], "source string, text string"
    )
    r = zipf_profile(df, top_r=8).collect()[0]
    assert (r["slope_num"], r["slope_den"]) == (-2, 1)
    assert r["slope_units"] == -2 * (1 << 20)

    # a 5-term curve with a NON-divisible negative num/den so the
    # rounding direction is observable: tfs 16,4,2,1,1 -> (lx, ly)
    # points (0,4),(1,2),(1,1),(2,0),(2,0): sxy=3, sx=6, sy=7, sxx=10,
    # num = 5*3 - 6*7 = -27, den = 5*10 - 36 = 14 -> -27*2^20/14 =
    # -2022253.71..., trunc toward zero -> -2022253 (floor would give
    # -2022254)
    df3 = spark.createDataFrame(
        [("b", " ".join(["p"] * 16 + ["q"] * 4 + ["r"] * 2 + ["s", "t"]))],
        "source string, text string",
    )
    r3 = zipf_profile(df3, top_r=8).collect()[0]
    assert (r3["slope_num"], r3["slope_den"]) == (-27, 14)
    assert r3["slope_units"] == -2022253  # NOT the floor -2022254


def test_zipf_profile_rejects_bad_top_r(spark):
    from feast_spark.operators.lexical import zipf_profile

    df = spark.createDataFrame([("a", "x")], "source string, text string")
    with pytest.raises(ValueError, match="top_r"):
        zipf_profile(df, top_r=0)


def test_zipf_profile_plan_has_mapside_window_group_limit(spark):
    from feast_spark.operators.lexical import zipf_profile

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(zipf_profile(df, top_r=64))
    # the top-R rank prune must run BEFORE the exchange (map-side
    # WindowGroupLimit) so a mega-source never funnels its vocabulary
    # through one sort — formatted plans list operators bottom-up per
    # subtree; assert both the partial and final forms exist
    assert plan.count("WindowGroupLimit") >= 2
    assert "CartesianProduct" not in plan


# ----------------------------------------------------------- heavy hitters


def test_frequent_terms_matches_exact_replay(spark):
    from pyspark.sql import functions as F

    from feast_spark.operators.lexical import frequent_terms

    import random

    rng = random.Random(5)
    vocab = [f"t{i}" for i in range(200)]  # vocab >> k forces evictions
    docs = []
    for i in range(300):
        words = rng.choices(vocab, k=30)
        if i % 3 == 0:
            words += ["heavy_a"] * 4
        if i % 5 == 0:
            words += ["heavy_b"] * 6
        docs.append((" ".join(words),))
    df = spark.createDataFrame(docs, "text string").repartition(7)
    k = 64
    out = {r["term"]: r["cnt"] for r in frequent_terms(df, k=k).collect()}
    c = Counter(w for (t,) in docs for w in t.split(" "))
    n = sum(c.values())
    exp = {t: v for t, v in c.items() if v * k > n}
    assert out == exp
    assert "heavy_a" in out and "heavy_b" in out
    # partitioning must not change the OUTPUT (sketch is mechanism only)
    out2 = {
        r["term"]: r["cnt"]
        for r in frequent_terms(df.repartition(2), k=k).collect()
    }
    assert out2 == exp
    # ratio_units exactness
    row = [
        r for r in frequent_terms(df, k=k).collect() if r["term"] == "heavy_a"
    ][0]
    assert row["n_tokens"] == n
    assert row["ratio_units"] == exp["heavy_a"] * (1 << 20) // n


def test_frequent_terms_edges(spark):
    from feast_spark.operators.lexical import frequent_terms

    with pytest.raises(ValueError, match="k must be"):
        frequent_terms(
            spark.createDataFrame([("x",)], "text string"), k=0
        )
    # all-blank corpus -> empty frame with the contract schema
    df = spark.createDataFrame([("",), (None,), ("   ",)], "text string")
    out = frequent_terms(df, k=4)
    assert out.count() == 0
    assert out.columns == ["term", "cnt", "n_tokens", "ratio_units"]


def test_frequent_terms_verify_pass_broadcasts_candidates(spark):
    from feast_spark.operators.lexical import frequent_terms

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(frequent_terms(df, k=32))
    # the exact pass must semi-join the broadcast candidate set BEFORE
    # the exchange — never hash-aggregate the raw vocabulary
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------- data card


def test_dataset_profile_invariants(spark):
    from pyspark.sql import functions as F

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.profile import dataset_profile

    t = transcripts_spark(spark, 60, seed=9)
    card = {r["metric"]: r["value"] for r in dataset_profile(t).collect()}
    # role counts partition the deduped corpus
    roles = {k: v for k, v in card.items() if k.startswith("turns_role_")}
    assert sum(roles.values()) == card["n_turns"]
    assert card["n_turns"] <= card["n_turns_raw"]
    assert card["n_convs"] == 60
    # quantiles are monotone and n_words-consistent
    assert card["words_p50"] <= card["words_p90"] <= card["words_p99"]
    # every PII pattern emits a row (zero included); script classes only
    # emit on hits
    from feast_spark.rules import SCRUB_PATTERNS

    for k, _, _ in SCRUB_PATTERNS:
        assert f"pii_{k}_hits" in card
    assert all(v > 0 for k, v in card.items() if k.startswith("script_chars_"))
    # cross-check two direct facts
    assert card["n_turns_raw"] == t.count()
    ded = t.groupBy("conv_id", "turn_idx").count().count()
    assert card["n_turns"] == ded


def test_dataset_profile_quantiles_match_kernel(spark):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import turn_length_quantiles
    from feast_spark.operators.profile import dataset_profile

    t = transcripts_spark(spark, 40, seed=3)
    card = {r["metric"]: r["value"] for r in dataset_profile(t).collect()}
    # global quantiles from the card == role-pooled quantiles from the
    # kernel run with a single collapsed group
    pooled = turn_length_quantiles(
        t.withColumn("role", __import__("pyspark").sql.functions.lit("x")),
        probe_units=[524288, 943718, 1038090],
    ).collect()
    by_probe = {r["probe_units"]: r["q_value"] for r in pooled}
    assert card["words_p50"] == by_probe[524288]
    assert card["words_p90"] == by_probe[943718]
    assert card["words_p99"] == by_probe[1038090]


def test_profile_drift_composition(spark):
    from pyspark.sql import functions as F

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.profile import dataset_profile, profile_drift

    t = transcripts_spark(spark, 50, seed=11)
    idx = F.substring("conv_id", 2, 9).cast("int")
    a = t.filter(F.pmod(idx, F.lit(2)) == 0)
    b = t.filter(F.pmod(idx, F.lit(2)) == 1)
    drift = {r["metric"]: r for r in profile_drift(a, b).collect()}
    card_a = {r["metric"]: r["value"] for r in dataset_profile(a).collect()}
    card_b = {r["metric"]: r["value"] for r in dataset_profile(b).collect()}
    assert set(drift) == set(card_a) | set(card_b)
    for m, r in drift.items():
        assert r["value_a"] == card_a.get(m)
        assert r["value_b"] == card_b.get(m)
        if m in card_a and m in card_b:
            assert r["delta"] == card_b[m] - card_a[m]
            if card_a[m] > 0:
                d = card_b[m] - card_a[m]
                exp = (
                    (d * (1 << 20)) // card_a[m]
                    if d >= 0
                    else -((-d * (1 << 20)) // card_a[m])
                )
                assert r["rel_units"] == exp, (m, r["rel_units"], exp)
            else:
                assert r["rel_units"] is None
        else:
            assert r["delta"] is None and r["rel_units"] is None
    # an identical pair drifts nowhere
    same = profile_drift(a, a).filter("delta != 0 OR delta IS NULL").count()
    assert same == 0


def test_grouped_quantiles_excludes_null_values(spark):
    from feast_spark.operators.aggregate import grouped_quantiles

    rows = [("g", None), ("g", None), ("g", None), ("g", 5), ("g", 100)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        r["probe_units"]: (r["n_rows"], r["q_value"])
        for r in grouped_quantiles(df, ["g"], "v", [524288, 1048576]).collect()
    }
    # NULLs excluded: n = 2, median = 5, max = 100 (NULLS-FIRST counting
    # would have given n = 5 and a phantom median)
    assert out == {524288: (2, 5), 1048576: (2, 100)}


def test_dataset_profile_empty_corpus_contract(spark):
    from feast_spark.operators.profile import dataset_profile
    from feast_spark.rules import SCRUB_PATTERNS

    empty = spark.createDataFrame(
        [],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    card = {r["metric"]: r["value"] for r in dataset_profile(empty).collect()}
    # counts and PII rows are present with ZERO (not NULL); distribution
    # rows (quantiles, ttr, zipf, scripts, roles) are absent
    assert card["n_turns_raw"] == 0 and card["n_turns"] == 0
    assert card["n_words"] == 0 and card["n_chars"] == 0
    for k, _, _ in SCRUB_PATTERNS:
        assert card[f"pii_{k}_hits"] == 0
    assert "ttr_units" not in card and "words_p50" not in card
    assert not any(m.startswith("script_chars_") for m in card)


def test_dataset_profile_reuses_vocab_exchange(spark):
    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.profile import dataset_profile

    t = transcripts_spark(spark, 20, seed=1)
    df = dataset_profile(t)
    df.collect()  # AQE decides reuse at runtime — read the FINAL plan
    plan = _plan(df)
    # ttr and zipf branches must reference the IDENTICAL (group, term)
    # aggregation so the tokenize+shuffle runs once (ReusedExchange in
    # the executed plan), not once per branch
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan


def test_grouped_quantiles_negative_values(spark):
    from feast_spark.operators.aggregate import grouped_quantiles

    import random

    rng = random.Random(99)
    rows = [("g", rng.randrange(-50, 50)) for _ in range(301)]
    df = spark.createDataFrame(rows, "g string, v long")
    probes = [1, 262144, 524288, 1048576]
    got = {
        r["probe_units"]: (r["n_rows"], r["rank"], r["q_value"])
        for r in grouped_quantiles(df, ["g"], "v", probes).collect()
    }
    exp = _naive_quantiles(rows, probes)
    assert got == {p: exp[("g", p)] for p in probes}
    # p=1/2^20 of 301 rows -> rank 1 -> the minimum (a negative)
    assert got[1][1] == 1 and got[1][2] == min(v for _, v in rows)


def test_language_script_agreement_detects_mojibake(spark):
    from pyspark.sql import functions as F

    from feast_spark.fixtures import transcripts_spark
    from feast_spark.operators.conversation import language_script_agreement

    t = transcripts_spark(spark, 40, seed=17)
    idx = F.substring("conv_id", 2, 9).cast("int")
    # every 5th conversation keeps its en marker words (classifier still
    # says en) but drowns them in Cyrillic — the double-decoded-cp1252
    # signature: langid and script evidence must now DISAGREE
    planted = t.withColumn(
        "text",
        F.when(
            F.pmod(idx, F.lit(5)) == 0,
            F.concat(
                F.lit("the and is of with "),
                F.expr("repeat('привет мир это тест ', 20)"),
            ),
        ).otherwise(F.col("text")),
    )
    out = {r["conv_id"]: r for r in language_script_agreement(planted).collect()}
    assert len(out) == 40
    for cid, r in out.items():
        i = int(cid[1:10])
        if i % 5 == 0:
            assert r["lang_mode"] == "en", (cid, r)
            assert r["dominant_script"] == "cyrillic", (cid, r)
            assert r["verdict"] == "disagree", (cid, r)
        elif r["verdict"] is not None:
            # organic convs: expectation maps en/de/es/fr->latin, zh->han
            want = {"en": "latin", "de": "latin", "es": "latin",
                    "fr": "latin", "zh": "han"}[r["lang_mode"]]
            assert r["expected_script"] == want
            assert (r["verdict"] == "agree") == (
                r["dominant_script"] == want
            )
    # NULL arms: an unmapped label and a no-script conversation
    extra = spark.createDataFrame(
        [
            ("x1", 0, "user", "zzz qqq vvv www", None, None),  # und
            ("x2", 0, "user", "!!! ??? ... 〜〜", None, None),  # no script
        ],
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )
    o2 = {r["conv_id"]: r for r in language_script_agreement(extra).collect()}
    assert o2["x1"]["expected_script"] is None and o2["x1"]["verdict"] is None
    assert o2["x2"]["dominant_script"] is None and o2["x2"]["verdict"] is None
    assert o2["x2"]["script_chars"] == 0
