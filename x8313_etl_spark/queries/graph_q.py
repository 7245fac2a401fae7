"""Graph analytics (round 2): PageRank by power iteration.

Second iterative-algorithm showcase next to connected components
(operators/concomp.py). The graph is the supplier↔customer bipartite
relation implied by lineitem×orders, made symmetric so every node has
out-degree. The Spark side builds the whole power iteration as ONE
declarative plan chain (per-iteration persists keep lineage shallow);
the DuckDB twin is the same five iterations generated as chained CTEs.

Cross-engine exactness: an iterated float computation cannot be
oracle'd through the decimal-rounding trick — dividing an on-grid rank
by an even out-degree lands exactly on the half-grid, where the
engines' double→decimal tie-rounding rules diverge (Spark HALF_UP on
the shortest decimal form vs DuckDB's scaled-binary path; observed as
±1e-6 flips). So ranks here are FIXED-POINT: all mass lives in integer
pico-rank units (total mass 10^12), every step is integer div/mul
(floor semantics, bit-identical in any engine), and no float exists
anywhere in the loop. Fixed-point is also the real-world answer for
reproducible iterative pipelines across heterogeneous executors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register

#: damping as an integer ratio; total mass = SCALE pico-rank units
DAMP_NUM, DAMP_DEN = 85, 100
SCALE = 10**12
ITERATIONS = 5


def _pagerank_oracle(iterations: int = ITERATIONS) -> str:
    ctes = [
        """e AS (
  SELECT DISTINCT 'S' || CAST(l.l_suppkey AS VARCHAR) AS src,
                  'C' || CAST(o.o_custkey AS VARCHAR) AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)""",
        "ed AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)",
        "deg AS (SELECT src, count(*) AS outdeg FROM ed GROUP BY src)",
        "nn AS (SELECT count(*) AS n_nodes FROM deg)",
        f"r0 AS (SELECT deg.src AS node, {SCALE} // nn.n_nodes AS r FROM deg, nn)",
    ]
    base = f"({SCALE} * {DAMP_DEN - DAMP_NUM}) // ({DAMP_DEN} * nn.n_nodes)"
    for i in range(1, iterations + 1):
        ctes.append(
            f"""s{i} AS (
  SELECT ed.dst AS node, SUM(p.r // deg.outdeg) AS msum
  FROM ed JOIN r{i - 1} p ON ed.src = p.node JOIN deg ON deg.src = ed.src
  GROUP BY ed.dst
),
r{i} AS (
  SELECT deg.src AS node,
         {base} + ({DAMP_NUM} * coalesce(s.msum, 0)) // {DAMP_DEN} AS r
  FROM deg CROSS JOIN nn LEFT JOIN s{i} s ON s.node = deg.src
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, CAST(r AS BIGINT) AS rank_pico FROM r{iterations}"
    )


@register(
    "g1_pagerank",
    category="graph",
    oracle=_pagerank_oracle(),
)
def g1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: PageRank, {n} power iterations at damping {num}/{den} over
    the symmetric supplier↔customer graph, in fixed-point pico-rank
    units (module docstring explains why fixed-point). Each iteration is
    one edge⋈rank join (shuffle on src — the SAME key every round, so
    co-partitioning is reused), a per-node integer sum (map-side
    combined), and a left join back onto the node list so nodes that
    received no mass keep the teleport base. Per-iteration persists
    truncate lineage — the classic iterative-on-Spark discipline (at
    100 TB you'd checkpoint every few rounds instead; same idea,
    spill-proof). No collect anywhere: the node count enters the plan
    as a crossed-in scalar aggregate.""".format(
        n=ITERATIONS, num=DAMP_NUM, den=DAMP_DEN
    )
    from pyspark import StorageLevel

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    ed = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ed = ed.persist(StorageLevel.MEMORY_AND_DISK)
    deg = ed.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    deg = deg.persist(StorageLevel.MEMORY_AND_DISK)
    nn = deg.agg(F.count(F.lit(1)).alias("n_nodes"))

    ranks = deg.crossJoin(nn).select(
        F.col("src").alias("node"),
        F.expr(f"{SCALE} div n_nodes").alias("r"),
    )
    base = F.expr(f"({SCALE} * {DAMP_DEN - DAMP_NUM}) div ({DAMP_DEN} * n_nodes)")
    for _ in range(ITERATIONS):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .join(deg, "src")
            .select("dst", F.expr("r div outdeg").alias("c"))
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("msum"))
        ranks = (
            deg.crossJoin(nn)
            .join(sums, deg.src == sums.dst, "left")
            .select(
                F.col("src").alias("node"),
                (
                    base
                    + F.expr(f"({DAMP_NUM} * coalesce(msum, 0)) div {DAMP_DEN}")
                ).alias("r"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    return ranks.select("node", F.col("r").cast("bigint").alias("rank_pico"))
