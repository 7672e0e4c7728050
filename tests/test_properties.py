"""Property-based robustness for the rule library (hypothesis).

The rules run on arbitrary web text at 10^12-turn scale — they must never
crash, must be batch-invariant (same row -> same result regardless of
batch composition, the Arrow-batch execution model), and the scrubber
must be idempotent (re-scrubbing scrubbed text is a no-op)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from feast_spark import rules

# arbitrary unicode text, including controls, emoji, CJK, RTL
texts_strategy = st.lists(
    st.text(max_size=300) | st.none(),
    min_size=1,
    max_size=30,
)


@settings(max_examples=60, deadline=None)
@given(texts_strategy)
def test_score_turns_never_crashes(raw):
    s = pd.Series(raw, dtype=object)
    out = rules.score_turns(s)
    assert len(out) == len(s)
    assert out["perplexity"].notna().all()
    assert out["keep"].dtype == bool
    # dropped rows always carry a reason; kept rows never do
    kept = out["keep"].to_numpy()
    reasons = out["drop_reason"].to_numpy()
    assert all(r is None for r in reasons[kept])
    assert all(r is not None for r in reasons[~kept])


@settings(max_examples=30, deadline=None)
@given(texts_strategy)
def test_batch_invariance(raw):
    s = pd.Series(raw, dtype=object)
    full = rules.score_turns(s)
    # same rows scored inside a different batch composition
    padded = pd.concat(
        [pd.Series(["padding text row one two three"] * 3, dtype=object), s],
        ignore_index=True,
    )
    sub = rules.score_turns(padded).iloc[3:].reset_index(drop=True)
    assert full["keep"].tolist() == sub["keep"].tolist()
    assert full["scrubbed_text"].tolist() == sub["scrubbed_text"].tolist()
    assert np.allclose(full["perplexity"], sub["perplexity"], rtol=0, atol=0)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=400))
def test_scrub_idempotent(text):
    once = rules.scrub_text(pd.Series([text], dtype=object))
    twice = rules.scrub_text(once)
    assert once.iloc[0] == twice.iloc[0]


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=200))
def test_perplexity_finite_and_positive(text):
    ppl = rules.perplexity(pd.Series([text], dtype=object))
    assert np.isfinite(ppl).all()
    assert (ppl > 0).all()


def test_connected_components_partition_invariant(spark):
    import pandas as pd

    from feast_spark.operators.dedup import connected_components

    pairs_pdf = pd.DataFrame(
        {
            "id_a": [1, 2, 5, 8, 9, 3],
            "id_b": [2, 3, 6, 9, 10, 1],
        }
    )
    base = connected_components(
        spark.createDataFrame(pairs_pdf)
    ).toPandas().sort_values("id").reset_index(drop=True)
    # shuffled row order + different partitioning must give identical comps
    shuffled = pairs_pdf.sample(frac=1.0, random_state=7)
    alt = connected_components(
        spark.createDataFrame(shuffled).repartition(7)
    ).toPandas().sort_values("id").reset_index(drop=True)
    assert base.equals(alt)
    comp = dict(zip(base.id, base.component))
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[8] == comp[9] == comp[10] == 8


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=12, deadline=None)
def test_winnow_and_bpe_crash_free_on_arbitrary_unicode(texts):
    import pandas as pd

    from feast_spark.operators.dedup import _winnow_batch

    fps = _winnow_batch(pd.Series(texts), k=5, window=4)
    assert len(fps) == len(texts)
    # every non-trivial text yields at least one fingerprint
    for t, f in zip(texts, fps):
        if len(t) >= 5:
            assert len(f) >= 1


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None)
def test_connected_components_equals_union_find(spark, edges):
    from feast_spark.operators.dedup import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [a for a, _ in edges], "id_b": [b for _, b in edges]})
    )
    got = dict(
        connected_components(pairs).toPandas()[["id", "component"]].itertuples(
            index=False, name=None
        )
    )
    # naive union-find ground truth
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    exp = {n: find(n) for n in nodes}
    assert got == exp


def test_connected_components_adversarial_scale(spark):
    """10^5-edge random graph vs union-find, plus the long-chain worst
    case; round count must respect the Kiveris et al. O(log n) bound
    (asserted as <= 2*ceil(log2(n_nodes)) with the cheap fingerprint
    convergence check — round-2 VERDICT Next #9)."""
    import math

    import numpy as np

    from feast_spark.operators import dedup
    from feast_spark.operators.dedup import connected_components

    def union_find(edges):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {n for e in edges for n in e}
        return {n: find(n) for n in nodes}

    # -- random graph: 100k edges over 30k nodes (many mid-size components)
    rng = np.random.default_rng(7)
    a = rng.integers(0, 30_000, 100_000)
    b = rng.integers(0, 30_000, 100_000)
    keep = a != b
    edges = list(zip(a[keep].tolist(), b[keep].tolist()))
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [x for x, _ in edges], "id_b": [y for _, y in edges]})
    )
    got = dict(
        connected_components(pairs).toPandas()[["id", "component"]].itertuples(
            index=False, name=None
        )
    )
    assert got == union_find(edges)
    n_nodes = len({n for e in edges for n in e})
    assert dedup.last_cc_rounds <= 2 * math.ceil(math.log2(n_nodes))

    # -- long chain: the diameter-n worst case for label propagation;
    # star-contraction must still converge logarithmically
    m = 1024
    chain = [(i, i + 1) for i in range(m - 1)]
    cpairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [x for x, _ in chain], "id_b": [y for _, y in chain]})
    )
    cgot = connected_components(cpairs).toPandas()
    assert set(cgot["component"]) == {0} and len(cgot) == m
    assert dedup.last_cc_rounds <= 2 * math.ceil(math.log2(m))


# ---------------------------------------------------------------------------
# session-5 kernels: greedy k-center, token packing, substring dedup
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 30),  # n points
    st.integers(1, 35),  # requested k (may exceed n)
    st.integers(2, 6),   # dim
    st.integers(0, 10_000),
)
def test_greedy_kcenter_invariants(n, k, dim, seed):
    from feast_spark.operators.similarity import greedy_kcenter

    rng = np.random.default_rng(seed)
    ids = rng.choice(10_000, size=n, replace=False)
    mat = rng.normal(size=(n, dim))
    sel_rank, cov = greedy_kcenter(ids, mat, k)
    k_eff = min(k, n)
    ranks = sorted(r for r in sel_rank if r >= 0)
    assert ranks == list(range(k_eff))              # dense pick order
    assert (cov[sel_rank >= 0] == 0.0).all()        # selected fully covered
    assert (cov[sel_rank < 0] >= 0.0).all()
    # first pick is the smallest id
    assert sel_rank[np.argmin(ids)] == 0
    # coverage is monotone non-increasing in k (more centers never hurt)
    if k_eff > 1:
        _, cov_smaller = greedy_kcenter(ids, mat, k_eff - 1)
        assert (cov <= cov_smaller + 1e-12).all()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 99), max_size=25),
        min_size=1,
        max_size=20,
    ),
    st.integers(2, 17),
)
def test_pack_token_sequences_reference_parity(spark, id_arrays, L):
    from feast_spark.operators.selection import pack_token_sequences

    enc = spark.createDataFrame(
        [(i, ids) for i, ids in enumerate(id_arrays)],
        "doc_id long, token_ids array<int>",
    )
    out = {
        r["seq_id"]: (list(r["token_ids"]), r["n_docs"])
        for r in pack_token_sequences(enc, seq_len=L, bucket_docs=3).collect()
    }
    stream, bounds = [], []
    for i, ids in enumerate(id_arrays):
        bounds.append((len(stream), len(stream) + len(ids)))
        stream.extend(ids)
    exp = {}
    for s in range((len(stream) + L - 1) // L):
        seg = stream[s * L : (s + 1) * L]
        nd = sum(1 for a, b in bounds if a < (s + 1) * L and b > s * L and b > a)
        exp[s] = (seg, nd)
    assert out == exp


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=20).map(" ".join),
        min_size=1,
        max_size=12,
    ),
    st.integers(2, 4),
)
def test_substring_dedup_reference_parity(spark, texts, k):
    from feast_spark.operators.selection import substring_dedup

    rows = list(enumerate(texts))
    out = {
        r["doc_id"]: (r["dedup_text"], r["n_tokens"], r["n_kept"])
        for r in substring_dedup(
            spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"])),
            k=k,
        ).collect()
    }
    seen: set = set()
    expected = {}
    for doc_id, text in rows:
        w = text.split(" ")
        cut: set = set()
        for i in range(len(w) - k + 1):
            g = tuple(w[i : i + k])
            if g in seen:
                cut.update(range(i, i + k))
            else:
                seen.add(g)
        kept = [w[t] for t in range(len(w)) if t not in cut]
        if kept:
            expected[doc_id] = (" ".join(kept), len(w), len(kept))
    assert out == expected
