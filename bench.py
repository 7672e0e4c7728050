"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., "pipeline": {...}, "scaling": {...}, "docs_large": {...}}

- Headline queries run on $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  at local[$SPARK_GRAFT_CPUS]; each timed to full materialization via the
  noop sink (no driver collect). Every query is sampled in TWO interleaved
  passes and the per-query MIN is recorded (external load only ever slows a
  run, so the fastest observation is closest to the machine's true wall);
  per-pass external CPU (non-bench processes, measured from /proc/stat
  minus this process tree) is recorded alongside so a contaminated window
  is visible in the artifact, not an after-the-fact explanation.
- The transcript quality pipeline is benchmarked on a deterministic
  generated corpus (cached parquet), reporting turns/sec (min of 2 runs).
- docs_large: the pair/near-dup queries at a 50k-doc corpus with planted
  near-dup clusters (10x the sf0.1 documents table) — walls there measure
  the algorithms, not per-job fixed overhead.
- Scaling evidence (BASELINE.md "N vs 4N executors" rule, sandboxed): the
  same pipeline job at local[N/4] and local[N] on identical input, each in
  a FRESH subprocess (no JIT cross-contamination), min over interleaved
  samples. Corpus is sized so Python scoring dominates fixed overhead
  (~2M turns). Disable with SPARK_GRAFT_SCALING=0.

Usage: python bench.py            # full benchmark, one JSON line
       python bench.py --scale-run CPUS CORPUS_PATH   # internal helper
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
DOCS_LARGE = int(os.environ.get("SPARK_GRAFT_DOCS_LARGE", "50000"))
SCALE_TURN_TARGET = int(os.environ.get("SPARK_GRAFT_SCALE_TURNS", "2000000"))

HEADLINE = [
    "tpch_q1",
    "pull_latest_events",
    "pit_last_click",
    "two_role_join",
    "hourly_window_agg",
    "numeric_stats",
    "doc_token_stats",
    "doc_minhash_pairs",
    "doc_simhash_pairs",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "doc_quality_scores",
    "session_window_agg",
    "rollup_orders",
    "historical_two_views",
    "pit_created_cutoff",
    # round 2 additions
    "dup_clusters",
    "derived_view_historical",
    "embedding_neardup_lsh",
    "odfv_request_scale",
    "ann_ivf_topk",
    "doc_winnow_pairs",
    # round 3 additions: training-data selection operators
    "span_dedup",
    "dsir_weights",
    "contamination_check",
    "semantic_dedup",
    "doc_curation",
    # round 4 additions
    "doc_jaccard_prefix",
    "label_resolve_recency",
    "quality_classifier",
    "substring_dedup",
    "diverse_sample",
    # tokenize_pack is NOT in the headline: its wall is BPE-train
    # iteration overhead (fixed per merge, corpus-independent); encode +
    # pack are benched in docs_large with the train wall recorded aside
    # round 4 session 6: conversation ops + Gopher repetition + NFC
    "conv_structure",
    "conv_windows",
    "conv_render",
    "gopher_repetition",
    "text_normalize",
    "clean_lines",
    "lexical_stats",
    "paragraph_dedup",
    "bm25_topk",
    "conv_pii",
    # round 5: paragraph-grain fuzzy near-dup, weighted sampling,
    # per-source c-TF-IDF terms
    "para_neardup",
    "weighted_sample",
    "source_top_terms",
    "moore_lewis",
    # round 5 session 2: CDC near-dup + blocklist scan + HTML
    # extraction. token_fertility is NOT in the headline for the
    # tokenize_pack reason (BPE-train merge-iteration overhead
    # dominates); it's benched in docs_large under the shared trained
    # model with the train wall recorded aside.
    "cdc_neardup",
    "blocklist_hits",
    "html_extract",
    # round 5 session 3: turn-grain dedup + loop stats (driver-fixture
    # forms; the ~2M-turn corpus forms are in the conv_grain section)
    # + UniMax sampling over the sf documents table
    "turn_dedup",
    "conv_repetition",
    "unimax_sample",
    "sessionize",
    "conv_contamination",
    "pii_exposure",
    # round 5 session 4: conversation-shape analytics (driver-fixture
    # forms; corpus-scale forms join the conv_grain section)
    "reply_latency",
    "tool_transitions",
    "turn_novelty",
    "turn_length_trend",
    # round 5 session 4b: fork detection, template mining, shape histogram
    # (driver-fixture forms; corpus-scale forms join the conv_grain section)
    "conv_forks",
    "conv_templates",
    "role_patterns",
    # round 5 session 4c: consistent pseudonymization (corpus-sized Arrow
    # regex pass), PSI drift, conv-grain holdout split, turn-grain fuzzy
    # near-dup
    "pseudonymize",
    "drift_psi",
    "drift_categorical",
    "holdout_split",
    "turn_neardup",
    # round 5 session 5: edit-similarity verification of the shared
    # minhash pairs (pair-bounded cost), context-echo per assistant
    # turn, per-source vocabulary health
    "neardup_verify",
    "assistant_echo",
    "source_vocab",
    "compressibility",
    # round 5 session 6: truncated-generation QA + decode-loop detector
    # (driver-fixture forms; corpus-scale forms join the conv_grain
    # section), cross-source overlap matrix, FK readability
    "truncation",
    "suffix_loops",
    "source_overlap",
    "readability",
    "label_drift",
    "conv_language",
    # round 5 session 7: minhash threshold-retention profile (shares the
    # signature kernel), quality-ordered token-budget carving
    "minhash_profile",
    "token_budget",
    # round 5 session 8: fenced code-block census, conversation
    # key/temporal integrity, per-role distinct-n diversity, temperature
    # mixture allocation
    "code_blocks",
    "conv_integrity",
    "role_diversity",
    "alpha_rates",
    # round 5 session 9: cross-role PII echo, per-tool failure census,
    # fork-prefix masking
    "pii_echo",
    "tool_errors",
    "fork_mask",
    "pref_pairs",
    # round 5 session 10: alternation repair, context-window fit,
    # system-prompt census, special-token leakage census
    "alternation_repair",
    "context_fit",
    "system_prompts",
    "special_tokens",
    "refusal_stats",
    "tool_json",
    # round 5 session 11: north-rule F1/agreement gate, per-tool latency
    # histogram, rule co-fire matrix, invisible-codepoint census
    "keep_drop_eval",
    "tool_latency",
    "rule_matrix",
    "unicode_anomalies",
    # round 5 session 12: rule threshold tuning curve, tool argument-key
    # census, timestamp-order repair
    "rule_sweep",
    "tool_args",
    "repair_order",
    # round 5 session 13: exact grouped length quantiles, writing-script
    # census, Zipf rank-frequency slope
    "length_quantiles",
    "script_mix",
    "zipf_profile",
    "frequent_terms",
    "dataset_profile",
    "profile_drift",
    # round 5 session 15: packing seq-len sweep, shuffle-skew diagnostic,
    # assistant grounding, KMV distinct sketch
    "packing_sweep",
    "skew_report",
    "grounding",
    "kmv_distinct",
    "interleave",
    "tool_loops",
    "pack_ffd",
    "embedding_qa",
    "bucketed_batches",
    "sentence_chunks",
]

# pipeline corpus sized to the sf (~80k turns at sf0.1)
N_CONVS = {"sf0.001": 150, "sf0.01": 1000, "sf0.1": 8000}.get(
    os.path.basename(SF_DIR.rstrip("/")), 8000
)
# ~11.7 turns/conv on average with the default generator mix
SCALE_CONVS = max(SCALE_TURN_TARGET // 12, 1000)


# ---------------------------------------------------------------------------
# external-load instrumentation: CPU consumed by processes OUTSIDE this
# bench's process tree during a window. Jiffies from /proc/stat (whole
# host) minus the sum over /proc/<pid>/stat of this process and its live
# descendants (driver + JVM + python workers). Workers that exit inside a
# window undercount "own" time, which OVERSTATES external load — the
# conservative direction for a "the window was clean" claim.
# ---------------------------------------------------------------------------

_CLK = os.sysconf("SC_CLK_TCK")


def _host_busy_jiffies() -> int:
    with open("/proc/stat") as f:
        v = list(map(int, f.readline().split()[1:]))
    return sum(v) - v[3] - v[4]  # minus idle + iowait


def _own_tree_jiffies() -> int:
    procs: dict[int, tuple[int, int]] = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                st = f.read()
        except OSError:
            continue
        rest = st[st.rindex(")") + 2 :].split()
        procs[int(p)] = (int(rest[1]), int(rest[11]) + int(rest[12]))
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        kids.setdefault(ppid, []).append(pid)
    total, stack, seen = 0, [os.getpid()], set()
    while stack:
        x = stack.pop()
        if x in seen or x not in procs:
            continue
        seen.add(x)
        total += procs[x][1]
        stack.extend(kids.get(x, []))
    return total


class _Window:
    """Context manager: external cores (avg) used during the window."""

    def __enter__(self):
        self.t0 = time.time()
        self.h0, self.o0 = _host_busy_jiffies(), _own_tree_jiffies()
        return self

    def __exit__(self, *exc):
        wall = max(time.time() - self.t0, 1e-9)
        ext = (_host_busy_jiffies() - self.h0) - (_own_tree_jiffies() - self.o0)
        self.wall = wall
        self.external_cores = round(max(ext, 0) / _CLK / wall, 2)
        return False


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _session(cpus: int):
    from feast_spark.session import get_spark

    return get_spark(f"bench_{cpus}", cpus=cpus)


def _corpus(spark, n_convs: int, files: int) -> str:
    """Materialize the deterministic corpus once (cached across runs)."""
    path = f"/tmp/feast_spark_bench/transcripts_{n_convs}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        from feast_spark.fixtures import transcripts_spark

        (
            transcripts_spark(spark, n_convs, seed=42, partitions=files)
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def _docs_corpus(spark, n_docs: int) -> str:
    path = f"/tmp/feast_spark_bench/documents_{n_docs}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        from feast_spark.fixtures import documents_spark

        (
            documents_spark(spark, n_docs, seed=42)
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def _run_pipeline(spark, path: str, lm_model=None) -> tuple[float, int]:
    from feast_spark.pipeline.quality import QualityConfig, run_quality_pipeline

    transcripts = spark.read.parquet(path)
    cfg = (
        QualityConfig(lm_model=lm_model, lm_max_ppl=3.0)
        if lm_model is not None
        else QualityConfig()
    )
    t0 = time.time()
    res = run_quality_pipeline(
        spark, transcripts, cfg, run_id="bench",
        decision_ts=datetime(2026, 1, 1, tzinfo=timezone.utc),
    )
    _noop_write(res.labels)
    wall = time.time() - t0
    res.scored.unpersist()
    n_turns = transcripts.count()
    return wall, n_turns


def _bench_docs_large(spark) -> dict:
    """Pair/near-dup queries at 50k docs (planted 3-clusters, 10k-token
    vocab): walls here are algorithm-dominated, not job-overhead-dominated.
    Pair counts are reported as evidence the planted structure was found."""
    from feast_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
        release_dedup_caches,
        simhash_dup_pairs,
        winnow_overlap_pairs,
    )

    path = _docs_corpus(spark, DOCS_LARGE)
    docs = spark.read.parquet(path)
    out: dict = {"n_docs": DOCS_LARGE}

    release_dedup_caches()
    with _Window() as w:
        pairs = minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=32, bands=8,
            jaccard_threshold=0.5, max_bucket_size=200,
        ).localCheckpoint()
        n_pairs = pairs.count()
    release_dedup_caches()
    out["minhash_pairs"] = {
        "wall_sec": round(w.wall, 3), "pairs": n_pairs,
        "external_cores": w.external_cores,
    }
    # invariants (round-3 verdict Next #6: scale runs carry correctness
    # evidence, not just walls). 3 planted pairs per 10-doc group; LSH
    # banding recall must stay >= 99% of them, and every emitted pair is
    # verify-joined at jaccard >= 0.5 by construction — assert the
    # verified floor holds in the artifact too.
    planted_pairs = (DOCS_LARGE // 10) * 3
    assert n_pairs >= 0.99 * planted_pairs, (n_pairs, planted_pairs)
    from pyspark.sql import functions as _F

    min_j = pairs.agg(_F.min("jaccard")).collect()[0][0]
    assert min_j is not None and min_j >= 0.5, min_j
    out["minhash_pairs"]["min_jaccard"] = round(float(min_j), 4)
    out["minhash_pairs"]["planted"] = planted_pairs

    # round 5 session 5: edit-similarity confirmation of the SAME pair
    # table (Lee-et-al verify step) — cost is pair-bounded: linear in
    # |pairs| x max_chars^2 DP cells (the cap is the cost lever; at the
    # planted 15k pairs x 2000-char cap this wall is comparable to the
    # LSH wall itself, recorded honestly here). Planted pairs mutate ~3% of
    # words (~6% copy-to-copy) => edit sim >= ~0.88, so >= 99% of the
    # planted count must confirm at 0.8; chance shingle pairs may
    # legitimately fail the edit check.
    from feast_spark.operators.dedup import neardup_verify

    with _Window() as wv:
        ver = neardup_verify(
            pairs, docs, "doc_id", "text", threshold=0.8, max_chars=2000
        ).agg(
            _F.count(_F.lit(1)).alias("n"),
            _F.sum(_F.col("is_dup").cast("long")).alias("confirmed"),
        ).collect()[0]
    assert int(ver["n"]) == n_pairs, ver
    assert int(ver["confirmed"]) >= 0.99 * planted_pairs, (ver, planted_pairs)
    out["neardup_verify"] = {
        "wall_sec": round(wv.wall, 3),
        "pairs_verified": int(ver["n"]),
        "confirmed": int(ver["confirmed"]),
        "external_cores": wv.external_cores,
    }
    # banded early-exit arm over the SAME pairs: verdict parity is
    # asserted in-artifact (confirmed counts equal); the wall delta is
    # the recorded evidence for the 10^12-row cost lever
    with _Window() as wvb:
        verb = neardup_verify(
            pairs, docs, "doc_id", "text", threshold=0.8, max_chars=2000,
            early_exit=True,
        ).agg(
            _F.count(_F.lit(1)).alias("n"),
            _F.sum(_F.col("is_dup").cast("long")).alias("confirmed"),
        ).collect()[0]
    assert int(verb["n"]) == n_pairs, verb
    assert int(verb["confirmed"]) == int(ver["confirmed"]), (verb, ver)
    out["neardup_verify_banded"] = {
        "wall_sec": round(wvb.wall, 3),
        "confirmed": int(verb["confirmed"]),
        "external_cores": wvb.external_cores,
    }

    with _Window() as w:
        comp = connected_components(pairs)
        n_dup_docs = comp.filter("id != component").count()
    out["dup_clusters"] = {
        "wall_sec": round(w.wall, 3), "dup_docs": n_dup_docs,
        "external_cores": w.external_cores,
    }
    # exactly 2 planted dup docs per group reachable from member 0; a few
    # may be missed by banding (mirrors the pair recall above)
    planted_dups = (DOCS_LARGE // 10) * 2
    assert 0.99 * planted_dups <= n_dup_docs <= 1.01 * planted_dups, (
        n_dup_docs, planted_dups)
    out["dup_clusters"]["planted"] = planted_dups
    # the localCheckpoint pins its blocks in executor memory; release
    # before the later sections or their windows pay the GC pressure
    pairs.unpersist()

    # max_fingerprint_df=10: the synthetic random-token vocab has a uniform
    # accidental-overlap floor (shared token + one coinciding context
    # letter = shared k-gram, df ~ token_df/26 ~ 37 at 50k docs) that
    # natural text's Zipfian df profile doesn't; capping below that floor
    # keeps the pair list dup-dominated (planted dup fingerprints have
    # df=3) while the measured work — fingerprint equi-join + pair
    # groupBy — is unchanged in shape.
    with _Window() as w:
        n_win = winnow_overlap_pairs(
            docs, "doc_id", "text", k=5, window=4, min_shared=2,
            max_fingerprint_df=10,
        ).count()
    out["winnow_pairs"] = {
        "wall_sec": round(w.wall, 3), "pairs": n_win,
        "external_cores": w.external_cores,
    }

    with _Window() as w:
        n_sim = simhash_dup_pairs(
            docs, "doc_id", "text", hamming_threshold=4, max_bucket_size=200,
        ).count()
    release_dedup_caches()
    out["simhash_pairs"] = {
        "wall_sec": round(w.wall, 3), "pairs": n_sim,
        "external_cores": w.external_cores,
    }

    # byte-grain CDC near-dup over the same corpus: 3%-mutated copies keep
    # long identical byte runs, so content-defined chunks recover the
    # planted 3-clusters at a different grain than shingle LSH.
    # max_chunk_df=8 caps the short-chunk noise floor (an 8-16 byte chunk
    # is 1-2 vocab words — corpus-wide df) the same way the winnow cap
    # does; planted chunk dfs are 2-3.
    from feast_spark.operators.dedup import cdc_neardup_pairs

    with _Window() as w:
        cdc = cdc_neardup_pairs(
            docs, avg_bits=6, min_shared=3, max_chunk_df=8
        ).localCheckpoint()
        n_cdc = cdc.count()
    release_dedup_caches()
    out["cdc_pairs"] = {
        "wall_sec": round(w.wall, 3), "pairs": n_cdc,
        "external_cores": w.external_cores,
    }
    # recall floor + purity: measured 97.8% planted recall with ZERO
    # non-planted pairs at 5k docs; assert >= 95% and dup-domination
    cdc_planted = cdc.filter(
        ((_F.col("id_a") % 10 == 0) & ((_F.col("id_b") - _F.col("id_a")).isin(8, 9)))
        | ((_F.col("id_a") % 10 == 8) & (_F.col("id_b") == _F.col("id_a") + 1))
    ).count()
    cdc.unpersist()
    assert cdc_planted >= 0.95 * planted_pairs, (cdc_planted, planted_pairs)
    assert n_cdc <= 1.02 * cdc_planted, (n_cdc, cdc_planted)
    out["cdc_pairs"]["planted_found"] = cdc_planted
    out["cdc_pairs"]["planted"] = planted_pairs

    # corpus selection at 50k docs. Planted evidence: the two 3%-mutated
    # copies per 10-doc group keep ~0.97^10 = 74% of their 10-word spans
    # IDENTICAL to member 0, so span_dedup must find cut docs at roughly
    # 2 per group.
    from pyspark.sql import functions as F

    from feast_spark.operators.selection import dsir_weights, span_dedup

    # both arms: the portable string-keyed form (oracle twin) and the
    # xxhash64 8-byte-keyed scale form (round-3 verdict Wrong #5). The
    # wall gap is the evidence; identical cut counts are the invariant.
    sd_stats = {}
    for method in ("portable", "xxhash64"):
        with _Window() as w:
            sd = span_dedup(docs, method=method).agg(
                F.count(F.lit(1)).alias("docs_out"),
                F.sum((F.col("n_spans_kept") < F.col("n_spans_total")).cast("long")
                      ).alias("docs_with_cuts"),
                F.sum(F.col("n_spans_total") - F.col("n_spans_kept")).alias("spans_cut"),
            ).collect()[0]
        sd_stats[method] = sd
        out[f"span_dedup_{method}"] = {
            "wall_sec": round(w.wall, 3), "docs_out": sd["docs_out"],
            "docs_with_cuts": sd["docs_with_cuts"], "spans_cut": sd["spans_cut"],
            "external_cores": w.external_cores,
        }
    assert tuple(sd_stats["portable"]) == tuple(sd_stats["xxhash64"]), (
        "span_dedup arms diverged", sd_stats)
    # round-trip invariant: docs that lost no span reconstruct to their
    # whitespace-normalized text exactly. Runs on a 1/97 corpus SAMPLE so
    # the untimed check doesn't re-pay the full dedup a third time (the
    # reconstruction property is per-doc; dedup over the subset exercises
    # the identical code path).
    sub = docs.filter(F.col("doc_id") % 97 == 0)
    norm = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    sample = span_dedup(sub, method="xxhash64").filter(
        F.col("n_spans_kept") == F.col("n_spans_total")
    )
    mism = (
        sample.join(sub.select("doc_id", "text"), "doc_id")
        .filter(F.col("dedup_text") != norm)
        .count()
    )
    assert mism == 0, f"span_dedup round-trip failed on {mism} sampled docs"
    out["span_dedup_roundtrip_ok"] = True

    # ExactSubstr (stride-1 k-grams, ~10x the gram instances of span
    # dedup): the xxhash64 scale arm runs the full 50k corpus; the
    # string-keyed portable arm is parity-pinned on a 1/7 subset so the
    # untimed invariant doesn't pay the full string shuffle twice.
    from feast_spark.operators.selection import substring_dedup

    with _Window() as w:
        ss = substring_dedup(docs, k=8, method="xxhash64").agg(
            F.count(F.lit(1)).alias("docs_out"),
            F.sum((F.col("n_kept") < F.col("n_tokens")).cast("long")
                  ).alias("docs_with_cuts"),
            F.sum(F.col("n_tokens") - F.col("n_kept")).alias("tokens_cut"),
        ).collect()[0]
    out["substring_dedup_xxhash64"] = {
        "wall_sec": round(w.wall, 3), "docs_out": ss["docs_out"],
        "docs_with_cuts": ss["docs_with_cuts"], "tokens_cut": ss["tokens_cut"],
        "external_cores": w.external_cores,
    }
    # the 2 near-copies per 10-doc group share long runs with member 0:
    # at least ~2 cut docs per group must be found
    assert ss["docs_with_cuts"] >= 0.95 * (DOCS_LARGE // 10) * 2, ss
    sub7 = docs.filter(F.col("doc_id") % 7 == 0)
    a = substring_dedup(sub7, k=8, method="portable")
    b = substring_dedup(sub7, k=8, method="xxhash64")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (
        "substring_dedup arms diverged on subset")
    out["substring_dedup_arm_parity_ok"] = True

    # both hash methods at 50k: md5 is the oracle-portable form, xxhash64
    # the documented scale path — the wall gap IS the evidence
    target = F.col("source").isin("web", "wiki")
    for method in ("md5", "xxhash64"):
        with _Window() as w:
            n_dsir = dsir_weights(docs, target, method=method).count()
        out[f"dsir_weights_{method}"] = {
            "wall_sec": round(w.wall, 3), "docs": n_dsir,
            "external_cores": w.external_cores,
        }

    # full curation chain (span dedup -> quality -> decontaminate -> DSIR
    # -> sample) — the document-side pipeline flagship at 50k docs. The
    # synthetic random-letter vocab carries no lid markers / stopwords /
    # plausible 5-grams, so the natural-text quality gates are relaxed
    # here — otherwise stage 2 drops all 50k docs and stages 3-5 measure
    # nothing.
    from feast_spark.pipeline.curation import (
        CurationConfig,
        run_curation,
        stage_counts,
    )
    from feast_spark.rules import RuleConfig

    bench_items = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias("bench_text")
    )
    cur_cfg = CurationConfig(
        rule_config=RuleConfig(
            allowed_langs=None, min_stopword_ratio=0.0, max_perplexity=1e9
        ),
        target_sources=("web", "wiki"),
        dsir_method="xxhash64",
    )
    with _Window() as w:
        res = run_curation(spark, docs, bench_items, cur_cfg)
        stages = {
            r["stage"]: r["n_docs"] for r in stage_counts(res.decisions).collect()
        }
    res.release()
    out["curation"] = {
        "wall_sec": round(w.wall, 3), "stages": stages,
        "external_cores": w.external_cores,
    }
    # invariant: first-failing-stage accounting — every input doc lands in
    # exactly one decision bucket, none vanish
    assert sum(stages.values()) == DOCS_LARGE, stages
    assert stages.get("kept", 0) > 0, stages

    # incremental curation over the SAME corpus in 5 id-ordered batches:
    # per-batch walls stay ~flat (each batch pays its own size plus one
    # hash-keyed anti join against the accumulated span state — never a
    # recompute of prior batches), and the span stage is provably
    # equivalent to the one-shot run (asserted below via the one-shot
    # stage counts).
    import shutil

    from feast_spark.pipeline.incremental import run_curation_incremental

    inc_state = "/tmp/feast_spark_bench/inc_state"
    shutil.rmtree(inc_state, ignore_errors=True)
    n_batches = 5
    step = DOCS_LARGE // n_batches
    inc_walls, inc_counts = [], []
    span_survivors = 0
    for b in range(n_batches):
        batch = docs.filter(
            (F.col("doc_id") >= b * step) & (F.col("doc_id") < (b + 1) * step)
        )
        with _Window() as wb:
            rb = run_curation_incremental(
                spark, batch, bench_items, inc_state, f"b{b}", cur_cfg
            )
            counts = rb.stage_counts
        rb.release()
        inc_walls.append(round(wb.wall, 3))
        inc_counts.append(counts)
        span_survivors += counts["after_span_dedup"]
    # span-stage equivalence with the one-shot run: same survivors
    assert span_survivors == DOCS_LARGE - stages.get("span_dup", 0), (
        span_survivors, stages)
    # the number that matters is MARGINAL cost: when a new batch lands on
    # an already-curated corpus, incremental pays only the delta (last
    # batch, max prior state) — re-running one-shot pays the whole corpus
    # again. The 5-batch total is NOT the comparison (a static corpus
    # should be one-shot).
    out["incremental_curation"] = {
        "n_batches": n_batches,
        "batch_walls_sec": inc_walls,
        "total_wall_sec": round(sum(inc_walls), 3),
        "last_batch_wall_sec": inc_walls[-1],
        "one_shot_wall_sec": out["curation"]["wall_sec"],
        "marginal_vs_one_shot": round(
            inc_walls[-1] / out["curation"]["wall_sec"], 3
        ),
        "kept_per_batch": [c["kept"] for c in inc_counts],
        "span_equivalence_ok": True,
    }

    # fuzzy incremental arm (session 6): two batches with the MinHash
    # signature state on — batch 2 carries planted near-clones (suffix-
    # mutated copies of every 50th batch-1 doc under fresh ids) that
    # ONLY the fuzzy state can catch before span dedup; every planted
    # clone must be absent from batch-2's kept set.
    from dataclasses import replace as _dc_replace

    inc_mh = "/tmp/feast_spark_bench/inc_state_mh"
    shutil.rmtree(inc_mh, ignore_errors=True)
    nd_cfg = _dc_replace(cur_cfg, use_neardup=True)
    b1 = docs.filter(F.col("doc_id") < step)
    clones = (
        b1.filter(F.col("doc_id") % 50 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
        .withColumn("text", F.concat(F.col("text"), F.lit(" zq zq zq")))
    )
    n_planted = clones.count()
    b2 = (
        docs.filter(
            (F.col("doc_id") >= step) & (F.col("doc_id") < 2 * step)
        ).unionByName(clones.select(*docs.columns))
    )
    mh_walls = []
    with _Window() as w1:
        r1 = run_curation_incremental(
            spark, b1, bench_items, inc_mh, "m0", nd_cfg
        )
        c1 = r1.stage_counts
    r1.release()
    mh_walls.append(round(w1.wall, 3))
    with _Window() as w2:
        r2 = run_curation_incremental(
            spark, b2, bench_items, inc_mh, "m1", nd_cfg
        )
        c2 = r2.stage_counts
        kept_planted = r2.kept.filter(
            F.col("doc_id") >= 10_000_000
        ).count()
    r2.release()
    mh_walls.append(round(w2.wall, 3))
    assert kept_planted == 0, kept_planted
    assert c2["after_neardup"] <= c2["input"] - n_planted, (c2, n_planted)
    out["incremental_curation"]["fuzzy"] = {
        "batch_walls_sec": mh_walls,
        "n_planted_cross_clones": n_planted,
        "planted_kept": 0,
        "after_neardup": [c1["after_neardup"], c2["after_neardup"]],
        "external_cores": [w1.external_cores, w2.external_cores],
    }

    # SemDeDup at 50k vectors with planted ground truth (1 near-copy of
    # member 0 per 10-vec group, cosine ~0.999): drops must recover the
    # planted set.
    from feast_spark.fixtures import embeddings_spark
    from feast_spark.operators.similarity import semantic_dedup

    emb_path = "/tmp/feast_spark_bench/embeddings_50000"
    if not os.path.exists(f"{emb_path}/_SUCCESS"):
        embeddings_spark(spark, 50000).write.mode("overwrite").parquet(emb_path)
    emb = spark.read.parquet(emb_path)
    with _Window() as w:
        sem = semantic_dedup(emb, n_clusters=224, threshold=0.95)
        agg = (
            sem.join(emb.select("vec_id", "is_dup"), "vec_id")
            .agg(
                F.sum((~F.col("is_kept")).cast("long")).alias("dropped"),
                F.sum((~F.col("is_kept") & F.col("is_dup")).cast("long")
                      ).alias("dropped_planted"),
            )
            .collect()[0]
        )
    out["semantic_dedup"] = {
        "wall_sec": round(w.wall, 3),
        "dropped": agg["dropped"],
        "dropped_planted": agg["dropped_planted"],
        "planted": 5000,
        "external_cores": w.external_cores,
    }
    # invariants: >=90% of the planted cosine-0.999 copies are dropped
    # (misses are the documented cross-cluster blind spot) and NOTHING
    # unplanted is dropped at threshold 0.95 on gaussian vectors
    assert agg["dropped_planted"] >= 4500, agg
    assert agg["dropped"] == agg["dropped_planted"], agg

    # multi-probe arm (n_probe=2): every vector also joins its 2nd-nearest
    # cluster, so base/copy pairs split across a boundary get compared —
    # the blind-spot misses above must shrink, still zero false positives
    with _Window() as w2:
        sem2 = semantic_dedup(emb, n_clusters=224, threshold=0.95, n_probe=2)
        agg2 = (
            sem2.join(emb.select("vec_id", "is_dup"), "vec_id")
            .agg(
                F.sum((~F.col("is_kept")).cast("long")).alias("dropped"),
                F.sum((~F.col("is_kept") & F.col("is_dup")).cast("long")
                      ).alias("dropped_planted"),
            )
            .collect()[0]
        )
    out["semantic_dedup_probe2"] = {
        "wall_sec": round(w2.wall, 3),
        "dropped": agg2["dropped"],
        "dropped_planted": agg2["dropped_planted"],
        "planted": 5000,
        "external_cores": w2.external_cores,
    }
    assert agg2["dropped_planted"] >= agg["dropped_planted"], (agg, agg2)
    assert agg2["dropped"] == agg2["dropped_planted"], agg2

    # greedy k-center diversity sampling over the same 50k vectors:
    # per-cluster budget exactness is the invariant (ceil(rate * n_c)
    # selected per cluster, coverage 0 iff selected)
    from feast_spark.operators.similarity import diverse_sample

    with _Window() as w3:
        div = diverse_sample(emb, rate=0.02, n_clusters=224)
        dagg = div.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("selected").cast("long")).alias("sel"),
            F.sum(((F.col("coverage") == 0.0) != F.col("selected")).cast("long")
                  ).alias("cov_viol"),
        ).collect()
    n_sel = sum(r["sel"] for r in dagg)
    assert all(r["sel"] == math.ceil(0.02 * r["n"]) for r in dagg), dagg[:4]
    assert sum(r["cov_viol"] for r in dagg) == 0
    assert sum(r["n"] for r in dagg) == 50000
    out["diverse_sample"] = {
        "wall_sec": round(w3.wall, 3), "selected": n_sel,
        "clusters": len(dagg), "external_cores": w3.external_cores,
    }

    # last mile at 50k docs: BPE encode-to-ids + token-exact sequence
    # packing. Training is untimed (its wall is merge-iteration overhead,
    # corpus-independent — recorded aside); the timed window is the
    # corpus-sized work. Invariant: packing preserves every token and
    # at most one sequence is short.
    from feast_spark.operators.bpe import bpe_encode, train_bpe
    from feast_spark.operators.selection import pack_token_sequences

    t0 = time.time()
    model = train_bpe(docs.filter(F.col("doc_id") % 10 == 0), num_merges=16)
    train_wall = time.time() - t0
    with _Window() as w4:
        enc = bpe_encode(docs, model).persist()
        n_tok_total = enc.agg(F.sum("n_tokens")).collect()[0][0]
        seqs = pack_token_sequences(enc, seq_len=512)
        sagg = seqs.agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_tokens").alias("tok"),
            F.sum((F.col("n_tokens") < 512).cast("long")).alias("short"),
        ).collect()[0]
        enc.unpersist()
    assert sagg["tok"] == n_tok_total, (sagg, n_tok_total)
    assert sagg["short"] <= 1, sagg
    out["tokenize_pack"] = {
        "wall_sec": round(w4.wall, 3), "train_wall_sec": round(train_wall, 3),
        "n_seqs": sagg["n_seqs"], "n_tokens": int(n_tok_total),
        "external_cores": w4.external_cores,
    }

    # per-language fertility under the SAME trained model (train untimed
    # above — like tokenize_pack, the operator is excluded from the
    # headline because its wall would be merge-iteration overhead).
    # Invariant: corpus token mass agrees exactly with the encode pass.
    from feast_spark.operators.bpe import token_fertility

    with _Window() as wf:
        fert = token_fertility(docs, model, group_col="lang").collect()
    fert_tokens = sum(r.n_bpe_tokens for r in fert)
    assert fert_tokens == n_tok_total, (fert_tokens, n_tok_total)
    out["token_fertility"] = {
        "wall_sec": round(wf.wall, 3), "groups": len(fert),
        "n_tokens": int(fert_tokens), "external_cores": wf.external_cores,
    }

    # paragraph dedup at 50k: every doc = its (unique) body paragraph +
    # one shared boilerplate footer paragraph. Invariant: the footer
    # survives in EXACTLY one document; every doc keeps its body.
    from feast_spark.operators.selection import paragraph_dedup

    footer = "shared boilerplate footer paragraph for every page"
    pdocs = docs.select(
        "doc_id",
        F.concat("text", F.lit("\n\n" + footer)).alias("text"),
    )
    with _Window() as w5:
        pd_out = paragraph_dedup(pdocs, method="xxhash64")
        pagg = pd_out.agg(
            F.count(F.lit(1)).alias("docs_out"),
            F.sum("n_paras_kept").alias("paras_kept"),
            F.sum(
                F.col("dedup_text").contains(footer).cast("long")
            ).alias("docs_with_footer"),
        ).collect()[0]
    assert pagg["docs_out"] == DOCS_LARGE, pagg
    assert pagg["docs_with_footer"] == 1, pagg
    assert pagg["paras_kept"] == DOCS_LARGE + 1, pagg
    out["paragraph_dedup_xxhash64"] = {
        "wall_sec": round(w5.wall, 3), "docs_out": pagg["docs_out"],
        "footer_survivors": pagg["docs_with_footer"],
        "external_cores": w5.external_cores,
    }
    # portable-arm parity on a 1/7 subset (untimed invariant)
    psub = pdocs.filter(F.col("doc_id") % 7 == 0)
    pa = paragraph_dedup(psub, method="portable")
    pb = paragraph_dedup(psub, method="xxhash64")
    assert pa.exceptAll(pb).count() == 0 and pb.exceptAll(pa).count() == 0
    out["paragraph_dedup_arm_parity_ok"] = True

    # BM25 retrieval at 50k docs: query terms drawn from a fixed corpus
    # doc so the queries match real vocabulary; invariant: k results per
    # query with non-increasing integer scores.
    from feast_spark.operators.bm25 import bm25_topk
    from feast_spark.operators.dedup import release_dedup_caches as _rdc

    w0 = (
        docs.filter(F.col("doc_id") == 0)
        .select(F.split("text", " ").alias("w"))
        .collect()[0]["w"][:6]
    )
    qrs = [("q1", " ".join(w0[:3])), ("q2", " ".join(w0[3:6]))]
    with _Window() as w6:
        hits = bm25_topk(docs, qrs, k=10).collect()
    _rdc()
    by_q: dict = {}
    for r in hits:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows_q in by_q.items():
        rows_q.sort(key=lambda r: r.rank)
        assert len(rows_q) == 10, (qid, len(rows_q))
        assert all(
            a.score_units >= b.score_units
            for a, b in zip(rows_q, rows_q[1:])
        ), qid
    out["bm25_topk"] = {
        "wall_sec": round(w6.wall, 3), "hits": len(hits),
        "queries": len(by_q), "external_cores": w6.external_cores,
    }
    return out


def _bench_docs_shared(spark) -> dict:
    """Prefix-Jaccard crossover evidence (round-3 verdict Next #7): a
    corpus whose documents share one boilerplate sentence is exactly the
    regime where the plain n-gram equi-join's Σ C(df, 2) cost goes
    quadratic in corpus size while the PPJoin prefix filter never joins
    on the high-df grams. Both arms run on identical input; identical
    pair counts are asserted, walls recorded."""
    from pyspark.sql import functions as F

    from feast_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )

    n_docs = int(os.environ.get("SPARK_GRAFT_DOCS_SHARED", "20000"))
    boiler = F.lit("all rights reserved worldwide")  # 4 words -> 2 trigrams
    uniq = F.transform(
        F.sequence(F.lit(1), F.lit(25)),
        lambda j: F.concat(F.lit("u"), F.col("id"), F.lit("x"), j),
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", boiler, F.array_join(uniq, " ")).alias("text"),
    ).persist()
    docs.count()
    out: dict = {"n_docs": n_docs}
    counts = {}
    for name, fn in (
        ("prefix", lambda: prefix_jaccard_pairs(docs, "doc_id", "text", n=3,
                                                threshold=0.5)),
        ("plain", lambda: ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                              threshold=0.5)),
    ):
        with _Window() as w:
            counts[name] = fn().count()
        out[f"{name}_join"] = {
            "wall_sec": round(w.wall, 3), "pairs": counts[name],
            "external_cores": w.external_cores,
        }
    assert counts["prefix"] == counts["plain"], counts
    docs.unpersist()
    return out


def scale_run(cpus: int, corpus: str) -> None:
    """Subprocess entry: warm once (JIT, codegen, python workers), then
    time one steady-state run. The caller aggregates min across repeated
    subprocesses — external interference only ever slows a run, so the
    fastest observation is closest to the machine's true throughput."""
    spark = _session(cpus)
    _run_pipeline(spark, corpus)          # warm: JIT, codegen, python workers
    walls, exts, n_turns = [], [], 0
    for _ in range(3):
        with _Window() as w:
            wall, n_turns = _run_pipeline(spark, corpus)
        walls.append(wall)
        exts.append(w.external_cores)
    with open("/proc/loadavg") as f:
        load = float(f.read().split()[0])
    # min of the steady-state runs: external load (including host-level
    # throttling that /proc/stat cannot see — observed ±20% swings on
    # identical builds) only ever slows a run
    print(json.dumps({
        "cpus": cpus, "wall_sec": min(walls), "n_turns": n_turns,
        "walls_sec": [round(x, 3) for x in walls],
        "loadavg": load,
        "external_cores_per_run": exts,
    }))
    spark.stop()


def _scale_subprocess(cpus: int, corpus: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--scale-run", str(cpus), corpus],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "SPARK_GRAFT_SCALING": "0"},
    )
    lines = out.stdout.strip().splitlines()
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"scale-run cpus={cpus} failed (rc={out.returncode}); "
            f"stderr tail: {out.stderr.strip()[-800:]}"
        )
    return json.loads(lines[-1])


def main() -> None:
    import __spark_entry__ as entry_mod

    spark = _session(CPUS)
    # headline list spans the driver window and the rotated pytest-only
    # queries (the bench measures operators, not the driver cap)
    qs = {**entry_mod.extra_queries(), **entry_mod.queries()}

    # warm the JVM/Arrow paths AND the python-UDF workers once
    spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    spark.range(64).mapInPandas(
        lambda it: (pdf.assign(x=1.0) for pdf in it), "id long, x double"
    ).write.format("noop").mode("overwrite").save()

    # two interleaved passes over the headline list; per-query min. Each
    # pass clears the entry-layer memo so the shared minhash pair table is
    # recomputed (and charged to doc_minhash_pairs) exactly once per pass.
    samples: list[dict[str, float]] = []
    pass_meta: list[dict] = []
    for _ in range(2):
        entry_mod.clear_query_memo()
        t: dict[str, float] = {}
        with _Window() as w:
            for name in HEADLINE:
                t0 = time.time()
                _noop_write(qs[name](spark, SF_DIR))
                t[name] = round(time.time() - t0, 3)
        samples.append(t)
        pass_meta.append(
            {"wall_sec": round(w.wall, 3), "external_cores": w.external_cores}
        )
    timings = {
        name: min(s[name] for s in samples) for name in HEADLINE
    }

    tpath = _corpus(spark, N_CONVS, files=CPUS * 2)
    pipe_walls = []
    n_turns = 0
    for _ in range(2):
        wall, n_turns = _run_pipeline(spark, tpath)
        pipe_walls.append(wall)
    pipe_wall = min(pipe_walls)
    pipeline = {
        "n_turns": n_turns,
        "wall_sec": round(pipe_wall, 3),
        "turns_per_sec": round(n_turns / pipe_wall, 1),
        "cpus": CPUS,
    }
    timings["transcript_pipeline"] = round(pipe_wall, 3)

    # full north-star config: every opt-in gate on — corpus-trained LM
    # perplexity gate (trained on a 30% conv slice, broadcast into the
    # scoring pass) + the agent-loop rule. Records what the PRODUCTION
    # shape of the pipeline costs vs the heuristic-only default above.
    from pyspark.sql import functions as F

    from feast_spark.operators.lm import train_ngram_lm
    from feast_spark.pipeline.quality import QualityConfig, run_quality_pipeline

    t0 = time.time()
    lm_model = train_ngram_lm(
        spark.read.parquet(tpath).where(F.pmod(F.hash("conv_id"), F.lit(10)) < 3),
        text_col="text", method="numpy", order=5, n_buckets=1 << 18,
    )
    lm_train_wall = round(time.time() - t0, 3)
    full_cfg = QualityConfig(lm_model=lm_model, lm_max_ppl=3.0, loop_min_repeats=3)
    full_walls = []
    for _ in range(2):
        transcripts = spark.read.parquet(tpath)
        t0 = time.time()
        res = run_quality_pipeline(
            spark, transcripts, full_cfg, run_id="bench_full",
            decision_ts=datetime(2026, 1, 1, tzinfo=timezone.utc),
        )
        _noop_write(res.labels)
        full_walls.append(time.time() - t0)
        res.scored.unpersist()
    pipeline_full = {
        "n_turns": n_turns,
        "lm_train_wall_sec": lm_train_wall,
        "wall_sec": round(min(full_walls), 3),
        "turns_per_sec": round(n_turns / min(full_walls), 1),
        "gates": ["heuristics", "lm_perplexity", "agent_loop"],
        "cpus": CPUS,
    }

    # transcript last mile at the same corpus: conversations -> masked
    # fixed-length training sequences (BPE train on rendered turns is
    # corpus-independent merge overhead, recorded aside; the timed window
    # is encode + conv assembly + packing). Invariants in-artifact:
    # token/mask length parity and at most one short sequence.
    from feast_spark.operators.bpe import train_bpe
    from feast_spark.operators.conversation import pack_conversations

    turns_df = spark.read.parquet(tpath)
    t0 = time.time()
    pk_model = train_bpe(
        turns_df.where(F.pmod(F.hash("conv_id"), F.lit(10)) == 0).select(
            F.concat("role", F.lit(": "), F.coalesce("text", F.lit(""))
                     ).alias("text")
        ),
        num_merges=16,
    )
    pk_train_wall = round(time.time() - t0, 3)
    with _Window() as wpk:
        seqs = pack_conversations(turns_df, pk_model, seq_len=512)
        pk = seqs.agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_tokens").alias("tok"),
            F.sum((F.col("n_tokens") < 512).cast("long")).alias("short"),
            F.sum(
                (F.size("token_ids") != F.size("loss_mask")).cast("long")
            ).alias("mask_mismatch"),
            F.sum(F.aggregate("loss_mask", F.lit(0).cast("long"),
                              lambda a, x: a + x)).alias("unmasked"),
        ).collect()[0]
    assert pk["short"] <= 1 and pk["mask_mismatch"] == 0, pk
    assert 0 < pk["unmasked"] < pk["tok"], pk
    conv_pack = {
        "n_turns": n_turns,
        "train_wall_sec": pk_train_wall,
        "wall_sec": round(wpk.wall, 3),
        "n_seqs": pk["n_seqs"],
        "n_tokens": int(pk["tok"]),
        "assistant_token_frac": round(float(pk["unmasked"]) / float(pk["tok"]), 4),
        "turns_per_sec": round(n_turns / wpk.wall, 1),
        "external_cores": wpk.external_cores,
    }

    # turn-grain dedup + per-conversation loop stats on the same corpus:
    # the conv-family operators whose cost is corpus-sized (the headline
    # rows time the small driver fixtures). Invariants in-artifact:
    # ranks bounded by copy counts, every conversation with an assistant
    # turn reported, loop convs consistent with their run stats.
    from feast_spark.operators.conversation import (
        conversation_repetition,
        turn_dedup,
    )

    with _Window() as wtd:
        td = turn_dedup(spark.read.parquet(tpath)).agg(
            F.count(F.lit(1)).alias("n_eligible"),
            F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
            F.sum((F.col("copy_rank") > F.col("n_copies")).cast("long")
                  ).alias("rank_overflow"),
        ).collect()[0]
    assert td["rank_overflow"] == 0, td
    with _Window() as wcr:
        cr = conversation_repetition(spark.read.parquet(tpath)).agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum(F.col("is_loop").cast("long")).alias("n_loops"),
            F.sum((F.col("max_run") > F.col("n_role_turns")).cast("long")
                  ).alias("run_overflow"),
            F.sum((F.col("n_distinct_texts") > F.col("n_role_turns"))
                  .cast("long")).alias("distinct_overflow"),
        ).collect()[0]
    assert cr["run_overflow"] == 0 and cr["distinct_overflow"] == 0, cr

    # round 5 session 4: conversation-shape analytics at the same corpus.
    # Invariants in-artifact: replies bounded by user turns, transition
    # conv counts bounded by transition counts, novelty bounded by gram
    # counts with every gram's first occurrence counted exactly once
    # globally, slope denominators non-negative (zero iff single turn).
    from feast_spark.operators.conversation import (
        reply_latency,
        tool_transitions,
        turn_length_trend,
        turn_novelty,
    )

    with _Window() as wrl:
        rl = reply_latency(spark.read.parquet(tpath)).agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum((F.col("n_replies") > F.col("n_user_turns")).cast("long")
                  ).alias("reply_overflow"),
            F.sum("total_latency_us").alias("total_lat"),
        ).collect()[0]
    assert rl["reply_overflow"] == 0 and rl["total_lat"] >= 0, rl
    with _Window() as wtt:
        tt = tool_transitions(spark.read.parquet(tpath)).agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum("n_transitions").alias("n_trans"),
            F.sum((F.col("n_convs") > F.col("n_transitions")).cast("long")
                  ).alias("conv_overflow"),
        ).collect()[0]
    assert tt["conv_overflow"] == 0, tt
    with _Window() as wtn:
        tn = turn_novelty(spark.read.parquet(tpath), n=8).agg(
            F.count(F.lit(1)).alias("n_turns_scored"),
            F.sum("n_grams").alias("grams"),
            F.sum("n_novel").alias("novel"),
            F.sum((F.col("n_novel") > F.col("n_grams")).cast("long")
                  ).alias("novel_overflow"),
        ).collect()[0]
    assert tn["novel_overflow"] == 0 and 0 < tn["novel"] <= tn["grams"], tn
    with _Window() as wlt:
        lt = turn_length_trend(spark.read.parquet(tpath)).agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum((F.col("slope_den") < 0).cast("long")).alias("neg_den"),
            F.sum(((F.col("slope_den") == 0)
                   != (F.col("n_role_turns") == 1)).cast("long")
                  ).alias("den_zero_mismatch"),
        ).collect()[0]
    assert lt["neg_den"] == 0 and lt["den_zero_mismatch"] == 0, lt

    # round 5 session 4b: fork/template/shape mining at the same corpus.
    # Invariants in-artifact: every fork group holds >= 2 conversations,
    # template turn counts bound conv counts, and the shape histogram
    # conserves BOTH totals exactly (conversations and deduped turns).
    from feast_spark.operators.conversation import (
        assistant_templates,
        conversation_forks,
        role_patterns,
    )

    with _Window() as wcf:
        cf = conversation_forks(spark.read.parquet(tpath)).agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_groups"),
            F.coalesce(
                F.sum((F.col("n_convs") < 2).cast("long")), F.lit(0)
            ).alias("under_min"),
        ).collect()[0]
    assert cf["under_min"] == 0, cf
    with _Window() as wat:
        at = assistant_templates(spark.read.parquet(tpath)).agg(
            F.count(F.lit(1)).alias("n_templates"),
            F.sum((F.col("n_convs") > F.col("n_turns")).cast("long")
                  ).alias("conv_overflow"),
        ).collect()[0]
    assert at["conv_overflow"] == 0, at
    with _Window() as wrp:
        rp = role_patterns(spark.read.parquet(tpath), max_turns=16).agg(
            F.count(F.lit(1)).alias("n_patterns"),
            F.sum("n_convs").alias("convs_total"),
            F.sum("n_turns_total").alias("turns_total"),
        ).collect()[0]
    # repetition only reports conversations WITH assistant turns; the
    # shape histogram covers every conversation — so >=, and the summed
    # full lengths can't exceed the raw corpus turn count (dedup only
    # removes rows)
    assert int(rp["convs_total"]) >= int(cr["n_convs"]), (rp, cr)
    assert int(rp["convs_total"]) <= int(rp["turns_total"]) <= n_turns, rp

    # round 5 session 5: context-echo at the same corpus — the
    # conv-window lens whose cost is corpus-sized. Invariants
    # in-artifact: echoed grams bounded by gram counts, echo_units
    # bounded by the unit scale.
    from feast_spark.operators.conversation import assistant_echo

    with _Window() as wae:
        ae = assistant_echo(spark.read.parquet(tpath), n=3).agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum("n_grams").alias("grams"),
            F.sum("n_echoed").alias("echoed"),
            F.sum((F.col("n_echoed") > F.col("n_grams")).cast("long")
                  ).alias("echo_overflow"),
            F.max("echo_units").alias("max_units"),
        ).collect()[0]
    assert ae["echo_overflow"] == 0, ae
    assert int(ae["n_scored"]) > 0, ae
    assert 0 <= int(ae["max_units"]) <= (1 << 20), ae

    # round 5 session 6: generation-artifact QA at the same corpus —
    # both map-only, so these walls ARE the scan+dedup cost at this
    # grain. Invariants in-artifact: a truncated verdict implies one of
    # its two causes; loop accounting stays inside the turn.
    from feast_spark.operators.textqa import (
        generation_artifacts,
        suffix_loop_stats,
    )
    from feast_spark.operators.conversation import _deduped

    with _Window() as wga:
        ga = generation_artifacts(spark.read.parquet(tpath)).agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum(F.col("truncated").cast("long")).alias("n_truncated"),
            F.sum(
                (
                    F.col("truncated")
                    & F.col("fence_balanced")
                    & F.col("ends_clean")
                ).cast("long")
            ).alias("causeless"),
        ).collect()[0]
    assert ga["causeless"] == 0, ga
    assert 0 <= int(ga["n_truncated"]) <= int(ga["n_scored"]), ga
    with _Window() as wsl:
        sl = suffix_loop_stats(
            _deduped(spark.read.parquet(tpath)),
            id_cols=("conv_id", "turn_idx"),
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((F.col("loop_words") > F.col("n_words")).cast("long")
                  ).alias("loop_overflow"),
            F.sum(((F.col("period") == 0) != (F.col("loop_words") == 0))
                  .cast("long")).alias("period_mismatch"),
            F.max("loop_units").alias("max_loop_units"),
            F.sum((F.col("loop_units") >= (1 << 19)).cast("long")
                  ).alias("n_half_loop"),
        ).collect()[0]
    assert sl["loop_overflow"] == 0 and sl["period_mismatch"] == 0, sl
    assert 0 <= int(sl["max_loop_units"]) <= (1 << 20), sl

    # round 5 session 9: the fork-family curation action + preference
    # pairs at the same corpus. Invariants in-artifact: every non-rep
    # group member contributes exactly k masked turns (n_masked = k *
    # n_masked_convs), exactly one representative per group, preference
    # margins strictly positive and never self-paired.
    from feast_spark.operators.conversation import (
        mask_fork_prefixes,
        preference_pairs,
    )

    # the fixture has no organic shared prefixes, so plant them at the
    # corpus grain exactly like the driver query: every 25th conversation
    # cloned under a 'd' suffix with its tail (turn_idx >= 2) rewritten —
    # original + clone share the 2-turn prefix, tails diverge
    _raw = spark.read.parquet(tpath)
    _fidx = F.substring("conv_id", 2, 9).cast("int")
    _clones = _raw.filter(F.pmod(_fidx, F.lit(25)) == 0).withColumn(
        "conv_id", F.concat("conv_id", F.lit("d"))
    ).withColumn(
        "text",
        F.when(
            F.col("turn_idx") >= 2,
            F.concat(F.coalesce("text", F.lit("")), F.lit(" fork variant")),
        ).otherwise(F.col("text")),
    )
    forked = _raw.unionByName(_clones)
    n_planted = _raw.filter(F.pmod(_fidx, F.lit(25)) == 0).select(
        "conv_id"
    ).distinct().count()

    with _Window() as wfm:
        fm = mask_fork_prefixes(forked, k=2).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((~F.col("keep_turn")).cast("long")).alias("n_masked"),
            F.count_distinct(
                F.when(~F.col("keep_turn"), F.col("conv_id"))
            ).alias("n_masked_convs"),
            F.count_distinct("fork_md5").alias("n_groups"),
            F.count_distinct(
                F.when(F.col("is_rep"), F.col("conv_id"))
            ).alias("n_reps"),
        ).collect()[0]
    assert int(fm["n_masked"]) == 2 * int(fm["n_masked_convs"]), fm
    assert int(fm["n_reps"]) == int(fm["n_groups"]), fm
    # every planted clone pair with >= 2 turns forms a group; clones of
    # 1-turn conversations carry no fingerprint, so >= is the bound
    assert int(fm["n_masked_convs"]) >= int(0.8 * n_planted), (fm, n_planted)
    with _Window() as wpp:
        raw = forked
        sc = (
            raw.filter(F.col("role") == "assistant")
            .groupBy("conv_id")
            .agg(
                F.sum(F.length(F.coalesce("text", F.lit(""))))
                .cast("long")
                .alias("score")
            )
        )
        pp = preference_pairs(raw, sc, k=2).agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_pairs"),
            F.coalesce(
                F.sum((F.col("margin") <= 0).cast("long")), F.lit(0)
            ).alias("bad_margin"),
            F.coalesce(
                F.sum(
                    (F.col("chosen_conv") == F.col("rejected_conv")).cast(
                        "long"
                    )
                ),
                F.lit(0),
            ).alias("self_pair"),
        ).collect()[0]
    assert int(pp["bad_margin"]) == 0 and int(pp["self_pair"]) == 0, pp
    # clone tails (>= 3-turn conversations with an assistant tail turn)
    # outscore their originals -> pairs exist at corpus scale
    assert int(pp["n_pairs"]) > 0, (pp, n_planted)

    # round 5 session 10: alternation repair, context-window fit,
    # system-prompt census, special-token census at the same corpus.
    # Invariants in-artifact: merge conserves the deduped turn count,
    # new indices are contiguous per conversation, every system turn is
    # kept by the fit and kept non-system tokens respect the remaining
    # budget, the census conserves conversations and turns, and marker
    # hits bound turns bound convs.
    from feast_spark.operators.conversation import (
        fit_context_budget,
        repair_alternation,
        system_prompt_census,
    )
    from feast_spark.operators.textqa import special_token_stats

    n_dedup = _deduped(spark.read.parquet(tpath)).count()
    with _Window() as wra:
        ra_df = repair_alternation(spark.read.parquet(tpath))
        ra = ra_df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_merged").alias("merged_total"),
        ).collect()[0]
    assert int(ra["merged_total"]) == n_dedup, (ra, n_dedup)
    bad_idx = (
        ra_df.groupBy("conv_id")
        .agg((F.max("turn_idx") + 1 != F.count(F.lit(1))).alias("bad"))
        .filter("bad")
        .count()
    )
    assert bad_idx == 0, bad_idx
    with _Window() as wfc:
        fc_df = fit_context_budget(spark.read.parquet(tpath), 256)
        fc = fc_df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("keep_turn").cast("long")).alias("n_kept"),
            F.sum(
                ((F.col("role") == "system") & ~F.col("keep_turn")).cast(
                    "long"
                )
            ).alias("sys_dropped"),
        ).collect()[0]
    assert int(fc["sys_dropped"]) == 0, fc
    over_budget = (
        fc_df.groupBy("conv_id")
        .agg(
            F.sum(
                F.when(F.col("role") == "system", F.col("n_tokens")).otherwise(0)
            ).alias("sys_tot"),
            F.sum(
                F.when(
                    F.col("keep_turn") & (F.col("role") != "system"),
                    F.col("n_tokens"),
                ).otherwise(0)
            ).alias("kept_rest"),
        )
        .filter(F.col("kept_rest") > F.lit(256) - F.col("sys_tot"))
        .count()
    )
    assert over_budget == 0, over_budget
    with _Window() as wsp:
        sp = system_prompt_census(spark.read.parquet(tpath)).agg(
            F.count(F.lit(1)).alias("n_prompts"),
            F.sum("n_convs").alias("convs_total"),
            F.sum("n_turns").alias("turns_total"),
        ).collect()[0]
    assert int(sp["turns_total"]) == n_dedup, (sp, n_dedup)
    # marker plant at the corpus grain (the organic fixture text cannot
    # produce template tokens): every 11th (cid*5+idx) turn leaks a pair
    _sidx = F.substring("conv_id", 2, 9).cast("long")
    _leaky = spark.read.parquet(tpath).withColumn(
        "text",
        F.when(
            F.pmod(_sidx * 5 + F.col("turn_idx"), F.lit(11)) == 0,
            F.concat(
                F.coalesce("text", F.lit("")),
                F.lit(" <|im_start|>assistant oops <|im_end|>"),
            ),
        ).otherwise(F.col("text")),
    )
    with _Window() as wst:
        st = special_token_stats(_leaky).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_hits").alias("hits"),
            F.sum(
                (
                    (F.col("n_convs") > F.col("n_turns"))
                    | (F.col("n_turns") > F.col("n_hits"))
                ).cast("long")
            ).alias("bound_violations"),
        ).collect()[0]
    assert int(st["bound_violations"]) == 0, st
    assert int(st["hits"]) > 0, st
    from feast_spark.operators.conversation import (
        assistant_refusals,
        tool_call_json_stats,
    )

    with _Window() as wrf:
        rf = assistant_refusals(spark.read.parquet(tpath)).agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum(
                (F.col("n_refusal_turns") > F.col("n_assistant_turns"))
                .cast("long")
            ).alias("turn_overflow"),
            F.max("refusal_units").alias("max_units"),
        ).collect()[0]
    assert int(rf["turn_overflow"]) == 0, rf
    assert 0 <= int(rf["max_units"]) <= (1 << 20), rf
    with _Window() as wtj:
        tj = tool_call_json_stats(spark.read.parquet(tpath)).agg(
            F.count(F.lit(1)).alias("n_tools"),
            F.sum("n_calls").alias("calls"),
            F.sum(
                (
                    (F.col("n_parsed") > F.col("n_object_like"))
                    | (F.col("n_object_like") > F.col("n_calls"))
                ).cast("long")
            ).alias("bound_violations"),
        ).collect()[0]
    assert int(tj["bound_violations"]) == 0 and int(tj["calls"]) > 0, tj

    # round 5 session 14: the data card at corpus scale. Invariants
    # in-artifact: role rows partition the deduped count, quantiles
    # monotone, every PII pattern row present.
    from feast_spark.operators.profile import dataset_profile

    with _Window() as wdc:
        dc = {
            r["metric"]: r["value"]
            for r in dataset_profile(spark.read.parquet(tpath)).collect()
        }
    assert sum(
        v for k, v in dc.items() if k.startswith("turns_role_")
    ) == dc["n_turns"], dc
    assert dc["words_p50"] <= dc["words_p90"] <= dc["words_p99"], dc
    from feast_spark.rules import SCRUB_PATTERNS as _card_scrub

    assert all(f"pii_{k}_hits" in dc for k, _, _ in _card_scrub), dc

    conv_grain = {
        "n_turns": n_turns,
        "data_card_wall_sec": round(wdc.wall, 3),
        "data_card_turns_per_sec": round(n_turns / wdc.wall, 1),
        "card_n_metrics": len(dc),
        "turn_dedup_wall_sec": round(wtd.wall, 3),
        "turn_dedup_turns_per_sec": round(n_turns / wtd.wall, 1),
        "n_eligible": int(td["n_eligible"]),
        "n_dropped": int(td["n_dropped"]),
        "repetition_wall_sec": round(wcr.wall, 3),
        "repetition_turns_per_sec": round(n_turns / wcr.wall, 1),
        "n_convs": int(cr["n_convs"]),
        "n_loops": int(cr["n_loops"]),
        "reply_latency_wall_sec": round(wrl.wall, 3),
        "tool_transitions_wall_sec": round(wtt.wall, 3),
        "n_tool_edges": int(tt["n_edges"]),
        "turn_novelty_wall_sec": round(wtn.wall, 3),
        "turn_novelty_turns_per_sec": round(n_turns / wtn.wall, 1),
        "novel_gram_frac": round(float(tn["novel"]) / float(tn["grams"]), 4),
        "length_trend_wall_sec": round(wlt.wall, 3),
        "forks_wall_sec": round(wcf.wall, 3),
        "n_fork_groups": int(cf["n_groups"]),
        "templates_wall_sec": round(wat.wall, 3),
        "n_templates": int(at["n_templates"]),
        "role_patterns_wall_sec": round(wrp.wall, 3),
        "n_role_patterns": int(rp["n_patterns"]),
        "assistant_echo_wall_sec": round(wae.wall, 3),
        "assistant_echo_turns_per_sec": round(n_turns / wae.wall, 1),
        "echo_gram_frac": round(
            float(ae["echoed"]) / max(float(ae["grams"]), 1.0), 4
        ),
        "truncation_wall_sec": round(wga.wall, 3),
        "truncation_turns_per_sec": round(n_turns / wga.wall, 1),
        "truncated_frac": round(
            float(ga["n_truncated"]) / max(float(ga["n_scored"]), 1.0), 4
        ),
        "suffix_loop_wall_sec": round(wsl.wall, 3),
        "suffix_loop_turns_per_sec": round(n_turns / wsl.wall, 1),
        "n_half_loop_turns": int(sl["n_half_loop"]),
        "fork_mask_wall_sec": round(wfm.wall, 3),
        "fork_mask_turns_per_sec": round(n_turns / wfm.wall, 1),
        "n_masked_turns": int(fm["n_masked"]),
        "pref_pairs_wall_sec": round(wpp.wall, 3),
        "n_pref_pairs": int(pp["n_pairs"]),
        "alternation_repair_wall_sec": round(wra.wall, 3),
        "alternation_repair_turns_per_sec": round(n_turns / wra.wall, 1),
        "n_repaired_rows": int(ra["n_rows"]),
        "context_fit_wall_sec": round(wfc.wall, 3),
        "context_fit_turns_per_sec": round(n_turns / wfc.wall, 1),
        "context_fit_kept_frac": round(
            float(fc["n_kept"]) / max(float(fc["n_rows"]), 1.0), 4
        ),
        "system_prompts_wall_sec": round(wsp.wall, 3),
        "n_system_prompts": int(sp["n_prompts"]),
        "special_tokens_wall_sec": round(wst.wall, 3),
        "special_tokens_turns_per_sec": round(n_turns / wst.wall, 1),
        "refusals_wall_sec": round(wrf.wall, 3),
        "tool_json_wall_sec": round(wtj.wall, 3),
        "n_tools_json": int(tj["n_tools"]),
        "external_cores": [
            wtd.external_cores, wcr.external_cores, wrl.external_cores,
            wtt.external_cores, wtn.external_cores, wlt.external_cores,
            wcf.external_cores, wat.external_cores, wrp.external_cores,
            wae.external_cores, wga.external_cores, wsl.external_cores,
            wfm.external_cores, wpp.external_cores, wra.external_cores,
            wfc.external_cores, wsp.external_cores, wst.external_cores,
            wrf.external_cores, wtj.external_cores,
        ],
    }

    docs_large = _bench_docs_large(spark) if DOCS_LARGE else None
    docs_shared = _bench_docs_shared(spark) if DOCS_LARGE else None

    scaling = None
    if SCALING and CPUS >= 4:
        scale_corpus = _corpus(spark, SCALE_CONVS, files=max(CPUS * 4, 128))
        spark.stop()
        # N -> 4N evidence at 2 -> 8 cores: this sandbox shares its host
        # with other tenants (external bursts observed up to loadavg 7-11),
        # so a local[32] run is descheduled unpredictably while 2- and
        # 8-core runs both fit under the host's free capacity — the pair
        # isolates the ENGINE's scaling from host contention. Override with
        # SPARK_GRAFT_SCALE_SMALL.
        small = int(os.environ.get("SPARK_GRAFT_SCALE_SMALL", "2"))
        big = small * 4
        # Sample each config in THREE fresh subprocesses, interleaved, and
        # keep the min wall per config — a burst landing in any one window
        # is discarded; each subprocess additionally mins over two internal
        # steady-state runs and reports external (non-bench) CPU per run.
        # (Three because run-to-run variance on the big config was the
        # largest noise source in recorded artifacts: two clean full runs
        # drew 0.864 and 0.763 efficiency from the same build — the extra
        # sample tightens the min.)
        runs = []
        for _ in range(3):
            runs.append(("big", _scale_subprocess(big, scale_corpus)))
            runs.append(("small", _scale_subprocess(small, scale_corpus)))
        r_big = min((r for k, r in runs if k == "big"),
                    key=lambda r: r["wall_sec"])
        r_small = min((r for k, r in runs if k == "small"),
                      key=lambda r: r["wall_sec"])
        tput_small = r_small["n_turns"] / r_small["wall_sec"]
        tput_big = r_big["n_turns"] / r_big["wall_sec"]
        scaling = {
            "corpus_turns": r_big["n_turns"],
            "cpus_small": small,
            "cpus_big": big,
            "turns_per_sec_small": round(tput_small, 1),
            "turns_per_sec_big": round(tput_big, 1),
            "speedup": round(tput_big / tput_small, 3),
            "efficiency": round(tput_big / (tput_small * (big / small)), 3),
            "external_cores_per_window": [
                r.get("external_cores_per_run") for _, r in runs
            ],
            "host_loadavg_per_window": [r.get("loadavg") for _, r in runs],
            "samples_turns_per_sec": [
                (k, round(r["n_turns"] / r["wall_sec"], 1)) for k, r in runs
            ],
        }

    out = {
        "metric": "headline_query_wall_clock_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "headline_passes": pass_meta,
        "pipeline": pipeline,
        "pipeline_full": pipeline_full,
        "conv_pack": conv_pack,
        "conv_grain": conv_grain,
        "docs_large": docs_large,
        "docs_shared": docs_shared,
        "scaling": scaling,
    }
    # Full detail (per-query walls, per-sample arrays, per-window
    # external-core traces, docs_large/docs_shared sections) goes to a side
    # file; the PRINTED line is the slim summary sized for the driver's
    # stdout-tail capture, which is exactly 2000 bytes (measured from
    # BENCH_r03/r04: both tails are len 2000 and begin mid-object — the
    # 3.7 KB "compact" line of r4 still overflowed it). _slim_line() is
    # unit-tested to stay under 1500 bytes with worst-case float widths.
    with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(_slim_line(out), separators=(",", ":")))


def _slim_line(out: dict) -> dict:
    """Compact summary of a full bench result ``out`` — the ONE printed
    JSON line. Hard budget: ≤ 1500 serialized bytes (driver tail window is
    2000 bytes and may include a trailing newline plus stray stderr); the
    size is pinned by tests/test_bench_artifact.py with worst-case floats.

    Keeps the driver-contract keys (metric/value/unit/queries/sf) with
    ``queries`` cut to the TOP-10 walls (the full per-query map lives in
    BENCH_DETAIL.json, pointed to by ``detail``), plus the headline
    numbers a reader needs: scaling efficiency, pipeline turns/sec, and
    the min per-pass external-core reading so a contaminated draw is
    visible in the artifact itself."""
    timings = out["queries"]
    top10 = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    slim = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "n_queries": len(timings),
        "queries": {k: round(v, 2) for k, v in top10.items()},
        "sf": os.path.basename(str(out["sf"]).rstrip("/")),
        "detail": "BENCH_DETAIL.json",
    }
    passes = out.get("headline_passes") or []
    if passes:
        slim["min_pass_external_cores"] = round(
            min(p.get("external_cores", 0.0) for p in passes), 2
        )
    pipeline = out.get("pipeline") or {}
    if pipeline:
        slim["pipeline_turns_per_sec"] = round(pipeline["turns_per_sec"], 1)
        slim["pipeline_n_turns"] = pipeline["n_turns"]
    full = out.get("pipeline_full") or {}
    if full:
        slim["pipeline_full_turns_per_sec"] = round(full["turns_per_sec"], 1)
    pk = out.get("conv_pack") or {}
    if pk:
        slim["conv_pack_turns_per_sec"] = round(pk["turns_per_sec"], 1)
    scaling = out.get("scaling") or {}
    if scaling:
        slim["scaling"] = {
            "efficiency": round(scaling["efficiency"], 3),
            "speedup": round(scaling["speedup"], 3),
            "cpus_small": scaling["cpus_small"],
            "cpus_big": scaling["cpus_big"],
            "turns_per_sec_small": round(scaling["turns_per_sec_small"], 1),
            "turns_per_sec_big": round(scaling["turns_per_sec_big"], 1),
            "corpus_turns": scaling["corpus_turns"],
        }
    return slim


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--scale-run":
        scale_run(int(sys.argv[2]), sys.argv[3])
    else:
        main()
