"""Tests for operators/ppr.py: integer power iterations must match a
driver-side reference exactly (all arithmetic is integer, so zero
tolerance), mass must localize to the seed neighbourhood, and
unreachable nodes must stay at zero."""

from __future__ import annotations

from collections import Counter, defaultdict

from hypothesis import given, settings, strategies as st

from x8313_etl_spark.operators.ppr import PPR_SCALE, personalized_pagerank

_SETTINGS = dict(max_examples=8, deadline=None)

_edges = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=12,
    unique=True,
)


def _ref(edges, seeds, rounds, num=85, den=100, scale=PPR_SCALE):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = Counter(s for s, _ in edges)
    ns = len(seeds)
    base = {
        v: (scale * (den - num)) // (den * ns) if v in seeds else 0
        for v in nodes
    }
    r = {v: scale // ns if v in seeds else 0 for v in nodes}
    for _ in range(rounds):
        msum = defaultdict(int)
        for s, d in edges:
            msum[d] += r[s] // outdeg[s]
        r = {v: base[v] + (num * msum[v]) // den for v in nodes}
    return r


def _run(spark, edges, seeds, rounds):
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    s = spark.createDataFrame([(x,) for x in seeds], "node bigint")
    return {
        r.node: r.rank_pico
        for r in personalized_pagerank(e, s, rounds).collect()
    }


@settings(**_SETTINGS)
@given(edges=_edges, data=st.data())
def test_matches_integer_reference(spark, edges, data):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    seeds = data.draw(
        st.lists(st.sampled_from(nodes), min_size=1, max_size=3, unique=True)
    )
    rounds = data.draw(st.integers(1, 3))
    assert _run(spark, edges, set(seeds), rounds) == _ref(
        edges, set(seeds), rounds
    )


def test_mass_localizes_and_unreachable_stay_zero(spark):
    # Two disjoint 3-cycles; seeding one leaves the other at exactly 0.
    cyc = lambda base: [(base + i, base + (i + 1) % 3) for i in range(3)]  # noqa: E731
    got = _run(spark, cyc(0) + cyc(10), {0}, rounds=4)
    assert all(got[v] > 0 for v in (0, 1, 2))
    assert all(got[v] == 0 for v in (10, 11, 12))
    # NOTE: no "seed has max mass" claim — in a DIRECTED cycle mass
    # circulates, so at a finite round count the maximum can sit on a
    # successor; only the teleport-localization property is invariant.
