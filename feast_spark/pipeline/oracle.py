"""Pandas oracle for the quality pipeline — the reference's test strategy.

Mirrors ``/root/reference/sdk/python/tests/utils/feature_records.py``:
``find_latest_record`` (:23-47) is a naive linear scan per entity row;
``validate_dataframes`` (:385-422) compares engine output with the naive
recomputation after stable sorting. Here the naive recomputation is pure
pandas, importing the SAME :mod:`feast_spark.rules` functions the Spark
UDFs run — so text handling is identical by construction and the oracle
only re-implements the *relational* semantics (dedup, aggregation, as-of
join) naively.
"""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pandas as pd

from feast_spark import rules
from feast_spark.pipeline.quality import CONV_RULE_ORDER  # noqa: F401  (order doc)
from feast_spark.pipeline.quality import QualityConfig


def oracle_dedup_latest(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Latest row per (conv_id, turn_idx) by (ts, text) — matches the Spark
    window ORDER BY ts DESC, text DESC / ROW_NUMBER()=1."""
    s = transcripts.sort_values(
        ["conv_id", "turn_idx", "ts", "text"], kind="mergesort"
    )
    return s.groupby(["conv_id", "turn_idx"], as_index=False, sort=False).tail(1)


def oracle_score(transcripts: pd.DataFrame, cfg: QualityConfig) -> pd.DataFrame:
    out = transcripts.reset_index(drop=True).copy()
    scored = rules.score_turns(out["text"], cfg.rules)
    out["lang"] = scored["lang"]
    out["perplexity"] = scored["perplexity"]
    out["word_count"] = scored["word_count"]
    out["keep_turn"] = scored["keep"]
    out["drop_reason_turn"] = scored["drop_reason"]
    out["scrubbed_text"] = scored["scrubbed_text"]
    return out


def oracle_conv_features(scored: pd.DataFrame, created_ts: datetime) -> pd.DataFrame:
    def mode_lang(langs: pd.Series) -> str:
        counts = langs.value_counts()
        top = counts[counts == counts.max()]
        return sorted(top.index)[0]  # lexicographic tie-break

    scored = scored.copy()
    # mirror quality.conversation_features: zero-word turns excluded from mean
    scored["__ppl_nonempty"] = scored["perplexity"].where(
        rules.heuristic_stats(scored["text"])["word_count"].to_numpy() > 0
    )
    g = scored.groupby("conv_id")
    feats = g.agg(
        mean_perplexity=("__ppl_nonempty", "mean"),
        tool_call_density=("tool", lambda t: t.notna().mean()),
        n_turns=("turn_idx", "size"),
        ts=("ts", "max"),
    )
    feats["lang_mode"] = g["lang"].apply(mode_lang)
    feats["created_ts"] = created_ts
    return feats.reset_index()


def find_latest_feature(
    conv_history: pd.DataFrame,
    conv_id: str,
    asof_ts,
    ttl_seconds: int | None,
) -> pd.Series | None:
    """Naive per-entity linear scan (feature_records.py:23-47 shape):
    among rows with key match and ts <= asof (and >= asof - ttl), take
    max (ts, created_ts)."""
    rows = conv_history[conv_history["conv_id"] == conv_id]
    rows = rows[rows["ts"] <= asof_ts]
    if ttl_seconds:
        rows = rows[rows["ts"] >= asof_ts - pd.Timedelta(seconds=ttl_seconds)]
    if len(rows) == 0:
        return None
    rows = rows.sort_values(["ts", "created_ts"], kind="mergesort")
    return rows.iloc[-1]


def oracle_labels(
    transcripts: pd.DataFrame,
    cfg: QualityConfig,
    decision_ts: datetime,
    created_ts: datetime,
    conv_history: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Full naive pipeline -> labels sorted by (conv_id, turn_idx)."""
    deduped = oracle_dedup_latest(transcripts)
    scored = oracle_score(deduped, cfg)
    conv = oracle_conv_features(scored, created_ts)
    history = conv if conv_history is None else conv_history

    decision = pd.Timestamp(decision_ts).tz_localize(None)
    feats = {}
    for cid in scored["conv_id"].unique():
        feats[cid] = find_latest_feature(history, cid, decision, cfg.feature_ttl_seconds)

    r = cfg.rules
    conv_reason = {}
    for cid, f in feats.items():
        reason = None
        if f is not None:
            if f["mean_perplexity"] > r.conv_max_mean_perplexity:
                reason = "conv_perplexity"
            elif f["tool_call_density"] > r.conv_max_tool_density:
                reason = "conv_tool_spam"
        conv_reason[cid] = reason

    out = scored.copy()
    cr = out["conv_id"].map(conv_reason)
    if cfg.loop_min_repeats is not None:
        norm = (
            out["scrubbed_text"]
            .str.lower()
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )
        grp = out.assign(__norm=norm).groupby(["conv_id", "__norm"])["turn_idx"]
        loop = (
            (out["word_count"] >= cfg.loop_min_words)
            & (grp.transform("size") >= cfg.loop_min_repeats)
            & (out["turn_idx"] > grp.transform("min"))
        )
    else:
        loop = pd.Series(False, index=out.index)
    out["drop_reason"] = np.where(
        out["drop_reason_turn"].notna(),
        out["drop_reason_turn"],
        np.where(loop, "agent_loop", cr),
    )
    out["drop_reason"] = out["drop_reason"].where(out["drop_reason"].notna(), None)
    out["keep"] = out["keep_turn"] & ~loop & cr.isna()
    return (
        out[["conv_id", "turn_idx", "keep", "drop_reason", "scrubbed_text", "ts"]]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def f1_score(expected_keep: np.ndarray, actual_keep: np.ndarray) -> float:
    tp = float(np.sum(expected_keep & actual_keep))
    fp = float(np.sum(~expected_keep & actual_keep))
    fn = float(np.sum(expected_keep & ~actual_keep))
    if tp == 0:
        return 0.0
    p = tp / (tp + fp)
    rcl = tp / (tp + fn)
    return 2 * p * rcl / (p + rcl)
