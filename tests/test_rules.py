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
