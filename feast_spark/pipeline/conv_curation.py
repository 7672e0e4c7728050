"""Conversation-level curation — the transcript-grain counterpart of the
document chain in ``pipeline/curation.py``: structural validation →
turn-quality keep fraction → whole-conversation near-dup → deterministic
sampling, with a first-failing-stage audit row per conversation.

Composition of already-verified operators, each at its own proven scale
shape:

1. **structure** — :func:`conversation_structure` (one conv_id shuffle):
   conversations failing role-alternation / tool-consistency checks drop
   first (malformed agent logs are not worth scoring).
2. **quality** — the shared :func:`feast_spark.rules.score_turns` kernel
   per deduped turn (map-only Arrow pass) aggregated to a per-conv kept
   fraction; conversations under ``min_keep_frac`` drop (a transcript
   where most turns fail the C4/Gopher rules is noise even if a few
   turns survive).
3. **near-dup** — :func:`conversation_neardup_pairs` (MinHash-LSH over
   turn-ordered conv text, int64 id surrogates through the shuffles) on
   the stage-1/2 SURVIVORS only, then
   :func:`connected_components`: every conversation whose component
   representative (min conv_id) is another conversation drops as a
   near-duplicate.
4. **sample** — :func:`deterministic_sample` on ``conv_id`` (map-only,
   key-stable).

Opt-in post-stages over the KEPT set: 5 — fork-prefix masking
(``fork_mask_k``); 6 — alternation repair (``repair_alternation_sep``;
the structure gate then forgives role repeats, the defect repair fixes);
7 — context-budget fit (``context_budget``, over the repaired turns when
both are on). 6/7 emit ``training_turns``.

The audit table is built like the document chain's: one row per input
conversation, LEFT joins of per-stage flag tables (each tiny — one row
per conv), first failing stage wins.

Reference: feast has no transcript curation; the staged-filter shape
mirrors public corpus pipelines (Dolma / RefinedWeb) at conversation
grain.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feast_spark.operators.conversation import (
    _deduped,
    conversation_structure,
)
from feast_spark.operators.dedup import (
    connected_components,
    conversation_neardup_pairs,
    release_dedup_caches,
)
from feast_spark.operators.selection import deterministic_sample

__all__ = ["ConvCurationConfig", "ConvCurationResult", "curate_conversations"]


@dataclass
class ConvCurationConfig:
    rule_config: object | None = None  # None = rules.RuleConfig() defaults
    min_keep_frac: float = 0.5
    num_hashes: int = 32
    bands: int = 8
    shingle_k: int = 5
    jaccard_threshold: float = 0.5
    sample_rate: float = 0.5
    # OPT-IN verify arm of stage 3 (Lee et al. 2022's confirmation
    # step, the conv-grain twin of CurationConfig's): LSH pairs must
    # also pass character edit similarity >= this fraction on the
    # RENDERED conversations before connected components — two convs
    # sharing shingle sets but not turn content (templated fleets with
    # reshuffled payloads) stop collapsing. Pair-bounded cost: one
    # render agg over the survivors + two conv-keyed joins carrying
    # ``neardup_verify_max_chars``-capped text to the tiny pair table.
    neardup_verify_threshold: float | None = None
    neardup_verify_max_chars: int | None = 4000
    # OPT-IN stage 5 (round 5 session 9): fork-prefix masking over the
    # KEPT conversations. Near-dup (stage 3) drops whole-conversation
    # clones, but fork SIBLINGS — retries / best-of-n reruns sharing a
    # verbatim k-turn prefix with genuinely distinct tails — survive it
    # by design (their tails dominate the shingle sets). When set, the
    # result carries ``kept_turns``: the deduped turns of every kept
    # conversation annotated by :func:`mask_fork_prefixes` so a packer
    # trains each shared prefix exactly once (``keep_turn`` -> loss
    # mask). Turn-grain output; the conv-grain tables are unchanged.
    fork_mask_k: int | None = None
    # OPT-IN stages 6/7 (round 5 session 10): training-table prep over
    # the KEPT conversations. ``repair_alternation_sep`` merges
    # consecutive same-role turns (texts joined by the separator) —
    # the repair strict chat templates need; ``context_budget`` then
    # tail-fits each conversation to a token budget with the system
    # prompt pinned (fit runs over the REPAIRED turns when both are on,
    # since repair re-indexes turns). The result carries
    # ``training_turns``; conv-grain tables are unchanged. NOTE:
    # ``fork_mask_k`` masks by ORIGINAL turn_idx — combine it with
    # repair only through ``kept_turns`` (documented, not composed).
    repair_alternation_sep: str | None = None
    context_budget: int | None = None


@dataclass
class ConvCurationResult:
    kept: DataFrame
    decisions: DataFrame
    config: ConvCurationConfig = field(default_factory=ConvCurationConfig)
    # stage-5 output (cfg.fork_mask_k): deduped turns of kept
    # conversations + (fork_md5, is_rep, keep_turn); None when off
    kept_turns: DataFrame | None = None
    # stage-6/7 output (cfg.repair_alternation_sep / cfg.context_budget):
    # the training turn table — repaired and/or budget-fitted; None when
    # both are off
    training_turns: DataFrame | None = None
    _cached: list = field(default_factory=list)

    def release(self) -> None:
        for df in self._cached:
            df.unpersist()
        release_dedup_caches()


def curate_conversations(
    spark: SparkSession,
    turns: DataFrame,
    cfg: ConvCurationConfig | None = None,
    materialize: bool = True,
) -> ConvCurationResult:
    """Run the four-stage conversation chain; see module docstring.

    ``materialize`` persists the deduped turn table and the per-conv flag
    table with eager count() barriers — both fan into multiple stages,
    and persist-without-a-barrier double-executes when a broadcast
    subquery fires before the cache fills (the pipeline's documented
    trap)."""
    from feast_spark import rules

    cfg = cfg or ConvCurationConfig()
    rule_cfg = cfg.rule_config or rules.RuleConfig()

    d = _deduped(turns)
    cached: list = []
    if materialize:
        d = d.persist()
        d.count()
        cached.append(d)

    # stage 1: structure on the already-deduped turns (pre_deduped skips
    # the operator's internal re-dedup shuffle). When stage 6 (alternation
    # repair) is on, role repeats are REPAIRABLE, not fatal — the gate
    # forgives exactly the defect the repair stage fixes and still drops
    # orphan/stray-tool, empty-turn and bad-start conversations.
    st_full = conversation_structure(d, pre_deduped=True)
    if cfg.repair_alternation_sep is not None:
        gate = (
            (F.col("n_orphan_tools") == 0)
            & (F.col("n_missing_tool_name") == 0)
            & (F.col("n_stray_tool_name") == 0)
            & (F.col("n_empty") == 0)
            & ~F.col("bad_start")
        )
    else:
        gate = F.col("structure_ok")
    st = st_full.select("conv_id", gate.alias("structure_ok"))

    # stage 2: per-turn quality via the shared kernel, conv keep fraction
    def _score(batches):
        for pdf in batches:
            out = pdf[["conv_id"]].reset_index(drop=True).copy()
            out["keep"] = rules.score_turns(pdf["text"], rule_cfg)[
                "keep"
            ].to_numpy()
            yield out

    scored = d.select("conv_id", "text").mapInPandas(
        _score, "conv_id string, keep boolean"
    )
    q = scored.groupBy("conv_id").agg(
        (
            F.sum(F.col("keep").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("keep_frac")
    )
    flags = st.join(q, "conv_id")
    if materialize:
        flags = flags.persist()
        flags.count()
        cached.append(flags)

    surv = flags.filter(
        F.col("structure_ok")
        & (F.col("keep_frac") >= F.lit(float(cfg.min_keep_frac)))
    ).select("conv_id")

    # stage 3: near-dup among survivors only — the pair table is
    # conv-keyed and tiny relative to turns
    pairs = conversation_neardup_pairs(
        d.join(surv, "conv_id", "left_semi"),
        num_hashes=cfg.num_hashes,
        bands=cfg.bands,
        shingle_k=cfg.shingle_k,
        jaccard_threshold=cfg.jaccard_threshold,
        pre_deduped=True,
    )
    if cfg.neardup_verify_threshold is not None:
        from feast_spark.operators.conversation import render_conversations
        from feast_spark.operators.dedup import neardup_verify

        # consumed twice below (member ids + verify join) — checkpoint so
        # the LSH job runs once; the pair table is tiny by stage-3 design
        pairs = pairs.localCheckpoint()
        members = (
            pairs.select(F.col("id_a").alias("conv_id"))
            .unionByName(pairs.select(F.col("id_b").alias("conv_id")))
            .distinct()
        )
        # render ONLY the pair-member conversations (d is already
        # deduped; the members relation is pair-bounded, so this agg
        # touches a vanishing fraction of the survivor turns)
        rendered = render_conversations(
            d.join(members, "conv_id", "left_semi"), pre_deduped=True
        ).select("conv_id", "text")
        # banded early-exit arm: only is_dup is consumed (parity-pinned
        # to the exact oracle-checked arm)
        pairs = neardup_verify(
            pairs, rendered, "conv_id", "text",
            threshold=cfg.neardup_verify_threshold,
            max_chars=cfg.neardup_verify_max_chars,
            early_exit=True,
        ).filter("is_dup").select("id_a", "id_b")
    comp = connected_components(pairs)
    dups = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("conv_id"), F.col("component").alias("dup_of")
    )
    if materialize:
        dups = dups.persist()
        dups.count()
        cached.append(dups)

    # stage 4: deterministic sampling over non-dup survivors
    nd = surv.join(dups.select("conv_id"), "conv_id", "left_anti")
    kept = deterministic_sample(
        nd, F.col("conv_id"), F.lit(float(cfg.sample_rate))
    ).select("conv_id", "sample_bucket")

    audit = (
        flags.join(dups, "conv_id", "left")
        .join(
            kept.select("conv_id", F.lit(True).alias("__kept")),
            "conv_id",
            "left",
        )
    )
    stage = (
        F.when(~F.col("structure_ok"), "structure")
        .when(F.col("keep_frac") < F.lit(float(cfg.min_keep_frac)), "quality")
        .when(F.col("dup_of").isNotNull(), "near_dup")
        .when(~F.coalesce("__kept", F.lit(False)), "sampled_out")
        .otherwise("kept")
    )
    decisions = audit.select(
        "conv_id",
        "structure_ok",
        "keep_frac",
        F.coalesce("dup_of", F.lit("")).alias("dup_of"),
        F.coalesce("__kept", F.lit(False)).alias("kept"),
        stage.alias("drop_stage"),
    )
    # stage 5 (opt-in): fork-prefix masking over the kept conversations'
    # turns — groups are computed AMONG the kept set (a dropped
    # conversation's prefix should not mask a survivor's turns)
    kept_turns = None
    if cfg.fork_mask_k is not None:
        from feast_spark.operators.conversation import mask_fork_prefixes

        kt = d.join(kept.select("conv_id"), "conv_id", "left_semi")
        kept_turns = mask_fork_prefixes(
            kt, k=cfg.fork_mask_k, pre_deduped=True
        )

    # stages 6/7 (opt-in): training-table prep over the kept
    # conversations — alternation repair, then context-budget fit over
    # the repaired turns (repair re-indexes, so fit must run after)
    training_turns = None
    if cfg.repair_alternation_sep is not None or cfg.context_budget is not None:
        tt = d.join(kept.select("conv_id"), "conv_id", "left_semi")
        if cfg.repair_alternation_sep is not None:
            from feast_spark.operators.conversation import repair_alternation

            tt = repair_alternation(
                tt, sep=cfg.repair_alternation_sep, pre_deduped=True
            )
        if cfg.context_budget is not None:
            from feast_spark.operators.conversation import fit_context_budget

            fit = fit_context_budget(
                tt, cfg.context_budget, pre_deduped=True
            ).select("conv_id", "turn_idx", "n_tokens", "keep_turn")
            # conv-dimension-scaled join back onto the turn table: both
            # sides share the (conv_id, turn_idx) grain — SHUFFLE_HASH,
            # never a driver-collecting broadcast of a corpus-sized side
            tt = tt.join(fit.hint("shuffle_hash"), ["conv_id", "turn_idx"])
        training_turns = tt

    return ConvCurationResult(
        kept=kept,
        decisions=decisions,
        config=cfg,
        kept_turns=kept_turns,
        training_turns=training_turns,
        _cached=cached,
    )
