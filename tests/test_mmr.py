"""Unit tests for operators/mmr.py against a pure-Python greedy mirror."""

from __future__ import annotations

import random

from x8313_etl_spark.operators.mmr import mmr_select


def _ref_mmr(rels: dict, sims: dict, k: int):
    """Greedy MMR: (id, rel, score, sel_rank) tuples in selection order."""
    out = []
    selected = []
    remaining = set(rels)
    for r in range(1, k + 1):
        if not remaining:
            break
        best = None
        for i in sorted(remaining):
            if r == 1:
                score = rels[i]
            else:
                score = rels[i] - max(sims[(i, s)] for s in selected)
            if best is None or score > best[1]:
                best = (i, score)
        out.append((best[0], rels[best[0]], best[1], r))
        selected.append(best[0])
        remaining.discard(best[0])
    return out


def _build(spark, groups):
    cand_rows, sim_rows = [], []
    for g, (rels, sims) in groups.items():
        for i, rel in rels.items():
            cand_rows.append((g, i, rel))
        for (a, b), s in sims.items():
            sim_rows.append((g, a, b, s))
    cand = spark.createDataFrame(cand_rows, "probe_id long, vec_id long, rel double")
    ps = spark.createDataFrame(sim_rows, "probe_id long, a long, b long, sim double")
    return cand, ps


def _random_group(rng, n):
    ids = rng.sample(range(100), n)
    rels = {i: round(rng.uniform(-1, 1), 3) for i in ids}
    sims = {}
    for a in ids:
        for b in ids:
            if a < b:
                s = round(rng.uniform(-1, 1), 3)
                sims[(a, b)] = s
                sims[(b, a)] = s
    return rels, sims


def test_mmr_matches_python_reference_on_random_inputs(spark):
    rng = random.Random(60613)
    groups = {g: _random_group(rng, 8) for g in range(5)}
    cand, ps = _build(spark, groups)
    got = {
        (r["probe_id"], r["sel_rank"]): (r["vec_id"], r["rel"], r["score"])
        for r in mmr_select(cand, ps, k=4).collect()
    }
    for g, (rels, sims) in groups.items():
        for i, rel, score, rank in _ref_mmr(rels, sims, 4):
            assert got[(g, rank)] == (i, rel, score), (g, rank)
    assert len(got) == 5 * 4


def test_mmr_short_group_returns_all_in_order(spark):
    rng = random.Random(7)
    groups = {0: _random_group(rng, 2)}
    cand, ps = _build(spark, groups)
    rows = mmr_select(cand, ps, k=5).collect()
    assert sorted(r["sel_rank"] for r in rows) == [1, 2]


def test_mmr_prefers_diverse_over_redundant(spark):
    """A near-duplicate of the top pick must lose to a slightly less
    relevant but dissimilar candidate — the operator's whole point."""
    rels = {1: 0.95, 2: 0.94, 3: 0.80}
    sims = {(1, 2): 0.99, (2, 1): 0.99, (1, 3): 0.10, (3, 1): 0.10,
            (2, 3): 0.15, (3, 2): 0.15}
    cand, ps = _build(spark, {0: (rels, sims)})
    rows = {r["sel_rank"]: r["vec_id"] for r in mmr_select(cand, ps, k=2).collect()}
    assert rows == {1: 1, 2: 3}


def test_mmr_deep_k_stays_bounded(spark):
    """Per-round checkpointing (ADVICE r6): without it the unrolled
    loop's plan grows ~3^k and k=12 would already be intractable —
    this must finish quickly and return exactly k rows per group."""
    rng = random.Random(1234)
    groups = {0: _random_group(rng, 14)}
    cand, ps = _build(spark, groups)
    rows = mmr_select(cand, ps, k=12).collect()
    assert sorted(r["sel_rank"] for r in rows) == list(range(1, 13))
    rels, sims = groups[0]
    ref = {rank: (i, rel, score) for i, rel, score, rank in _ref_mmr(rels, sims, 12)}
    got = {r["sel_rank"]: (r["vec_id"], r["rel"], r["score"]) for r in rows}
    assert got == ref
