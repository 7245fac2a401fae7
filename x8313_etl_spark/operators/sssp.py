"""Bounded-round weighted shortest paths — the (min, +) frontier loop
(SURVEY.md §2 g7; factored so the relaxation core is property-testable
against a driver-side reference on literal graphs).

Bellman-Ford restricted to ``rounds`` relaxation rounds computes the
exact shortest distance among paths of ≤ ``rounds`` edges — the
fixed-round discipline every iterative operator here uses (g1/g2's
lesson): a FIXED round count on both engines removes any
convergence-detection divergence, and integer weights keep every
distance exact in any engine.

Per round: ONE edge⋈frontier equi-shuffle on ``src`` (identical key
every round — co-partitioning reused), a map-side-combined MIN
aggregate, and a per-round persist to truncate lineage. Cost per round
is O(E) worst case but tracks the ACTIVE frontier once labels
stabilize — the Pregel model. The 100 TB upgrade is delta-stepping
(bucketed priority), which changes the round schedule, not this
per-round join shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def bounded_sssp(edges: DataFrame, seeds: DataFrame, rounds: int) -> DataFrame:
    """Multi-source shortest distances over ≤ ``rounds`` edges.

    ``edges``: (src, dst, w) — DIRECTED; symmetrize first for an
    undirected graph. ``w`` must be non-negative (min-plus semiring).
    ``seeds``: (node) — distance-0 sources. Returns (node, dist) for
    every node reached within ``rounds`` edges; unreached nodes are
    absent (callers left-join and coalesce to their sentinel).
    """
    from pyspark import StorageLevel

    dist = seeds.select("node", F.lit(0).cast("bigint").alias("dist"))
    for _ in range(rounds):
        relaxed = edges.join(dist, edges.src == dist.node).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    return dist
