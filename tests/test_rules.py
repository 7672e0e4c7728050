"""Unit tests per rule on hand-built micro cases (SURVEY §5 item 3)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from feast_spark import rules


def one(text: str) -> pd.Series:
    out = rules.score_turns(pd.Series([text]))
    return out.iloc[0]


def test_clean_english_kept():
    row = one("We should review this plan before the next meeting starts today.")
    assert row["keep"]
    assert row["lang"] == "en"
    assert row["perplexity"] < 100


def test_clean_german_kept():
    row = one("der schnelle braune fuchs springt über den faulen hund und läuft")
    assert row["keep"] and row["lang"] == "de"


def test_chinese_detected_and_kept():
    row = one("今天天气很好我们应该在下次会议之前审查这个计划")
    assert row["keep"] and row["lang"] == "zh"


def test_symbol_soup_dropped():
    row = one("@@## !!$$ %%^^ &&** (()) __++ ~~|| <<>>")
    assert not row["keep"]
    assert row["drop_reason"] == "symbol_ratio"


def test_repetition_dropped():
    row = one("buy now " * 12)
    assert not row["keep"]
    assert row["drop_reason"] == "repetition"


def test_digit_spam_dropped():
    row = one("12345 98213 11111 49230 55555 10293 88431 22222 90911 33210")
    assert not row["keep"]
    assert row["drop_reason"] == "digit_ratio"


def test_low_stopword_english_dropped():
    row = one(
        "the spark shuffle partition executor broadcast catalyst parquet iceberg "
        "lineage checkpoint snapshot window rowgroup codegen arrow batch executor "
        "broadcast catalyst parquet iceberg lineage checkpoint snapshot window "
        "rowgroup codegen arrow batch"
    )
    # one marker hit makes it 'en'; keyword soup has ~no other stopwords
    assert row["lang"] == "en"
    assert not row["keep"] and row["drop_reason"] == "stopword_ratio"


def test_short_turn_dropped():
    row = one("ok")
    assert not row["keep"] and row["drop_reason"] == "too_short"


def test_empty_dropped():
    row = one("")
    assert not row["keep"] and row["drop_reason"] == "too_short"


def test_toxicity_dropped_and_scrubbed():
    row = one("you are a stupid idiot and i hate this damn thing")
    assert not row["keep"] and row["drop_reason"] == "toxicity"
    assert "<TOX>" in row["scrubbed_text"]
    assert "stupid" not in row["scrubbed_text"]


def test_pii_scrub_exact():
    s = pd.Series(
        ["mail john.doe@example.com phone 555-123-4567 ssn 123-45-6789 "
         "card 4111-1111-1111-1111 ip 192.168.0.1"]
    )
    out = rules.scrub_text(s).iloc[0]
    assert out == "mail <EMAIL> phone <PHONE> ssn <SSN> card <CC> ip <IP>"


def test_scrub_order_ssn_before_phone():
    # an SSN must not be half-eaten by the phone pattern
    assert rules.scrub_text(pd.Series(["123-45-6789"])).iloc[0] == "<SSN>"


def test_perplexity_deterministic_and_batch_invariant():
    texts = ["the quick brown fox jumps over a lazy dog", "zz!! qq@@ kk##"]
    a = rules.perplexity(pd.Series(texts))
    b = rules.perplexity(pd.Series(texts * 3))[:2]
    one_at_a_time = np.array([rules.perplexity(pd.Series([t]))[0] for t in texts])
    assert np.array_equal(a, b)
    assert np.array_equal(a, one_at_a_time)
    assert a[0] < a[1]


def test_langid_tie_break_lexicographic():
    # a text with zero marker hits in any language -> und
    out = rules.language_id(pd.Series(["qqq www zzz"]))
    assert out.iloc[0] == "und"


def test_heuristic_stats_vectorized_consistency():
    texts = pd.Series(["one two three", "", "a a a a a a a a a a"])
    st = rules.heuristic_stats(texts)
    assert st.loc[0, "word_count"] == 3
    assert st.loc[1, "word_count"] == 0
    assert st.loc[2, "top2gram_frac"] > 0.9


def test_pii_match_counts_crafted():
    import pandas as pd

    from feast_spark.rules import pii_match_counts

    df = pii_match_counts(
        pd.Series(
            [
                "mail a@b.com and c.d@e.org, call 415-555-2671",
                "ssn 123-45-6789 card 1234-5678-9012-3456 ip 10.0.0.1",
                "totally clean text with no digits at all",
                None,
            ]
        )
    )
    assert df.loc[0, "n_email"] == 2
    assert df.loc[0, "n_phone"] == 1
    assert df.loc[1, "n_ssn"] == 1
    assert df.loc[1, "n_credit_card"] == 1
    assert df.loc[1, "n_ipv4"] == 1
    # the SSN was consumed before the phone pass (scrub order contract)
    assert df.loc[1, "n_phone"] == 0
    assert df.loc[2].sum() == 0 and df.loc[3].sum() == 0
    assert all(str(t) == "int64" for t in df.dtypes)


def test_pii_match_counts_sequential_contract():
    import pandas as pd

    from feast_spark.rules import pii_match_counts, scrub_text

    # an email whose local part looks like a phone: the email pass
    # replaces it first, so the phone counter must NOT fire
    s = pd.Series(["dial 415-555-2671@example.com now"])
    df = pii_match_counts(s)
    assert df.loc[0, "n_email"] == 1 and df.loc[0, "n_phone"] == 0
    assert "<EMAIL>" in scrub_text(s).iloc[0]


def test_pii_stats_spark_matches_kernel(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from feast_spark.rules import pii_match_counts, pii_stats

    texts = [
        "a@b.com twice a@b.com",
        "nothing here",
        "ip 8.8.8.8 and ssn 987-65-4321",
    ]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = (
        pii_stats(sdf).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    exp = pii_match_counts(pd.Series(texts))
    for c in exp.columns:
        assert list(got[c]) == list(exp[c]), c
    # map-only: no shuffle
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pii_stats(sdf).explain("formatted")
    assert "Exchange" not in buf.getvalue()
