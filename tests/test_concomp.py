"""Unit tests for the connected-components operator on crafted graphs
(the oracle test covers the registered p_dedup_clusters query; these
pin the operator's own contract: topology handling and the fixpoint
guarantee independent of the SimHash pipeline)."""

from __future__ import annotations

import pytest

from x8313_etl_spark.operators.concomp import ConvergenceError, connected_components


def _cc(spark, nodes, edges, **kw):
    n = spark.createDataFrame([(x,) for x in nodes], "node bigint")
    e = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(None, None)], "src bigint, dst bigint"
    )
    if not edges:
        e = e.filter("src IS NOT NULL")
    out = connected_components(n, e, **kw)
    return {r.node: r.component for r in out.collect()}


def test_chain_cycle_singleton(spark):
    """A 4-chain, a 3-cycle (given directed, with a duplicate edge and a
    self-loop), and two isolated vertices — all labeled by component
    minimum."""
    got = _cc(
        spark,
        nodes=range(10),
        edges=[(3, 2), (2, 1), (1, 0), (5, 6), (6, 7), (7, 5), (7, 5), (8, 8)],
    )
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 5, 8: 8, 9: 9}


def test_no_edges_all_singletons(spark):
    assert _cc(spark, nodes=[7, 9, 11], edges=[]) == {7: 7, 9: 9, 11: 11}


def test_diameter_exceeds_max_iter_raises(spark):
    """A 30-hop chain cannot converge in 3 rounds — the operator must
    fail loudly, not return a half-propagated labeling."""
    with pytest.raises(ConvergenceError):
        _cc(
            spark,
            nodes=range(31),
            edges=[(i, i + 1) for i in range(30)],
            max_iter=3,
        )
