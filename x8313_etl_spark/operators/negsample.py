"""Deterministic negative sampling — the contrastive-training staple
(word2vec/SGNS, DPR/recsys retrieval training, public literature): for
every query, draw k pseudo-random candidates that are NOT among its
positives.

The naive formulation is query × candidate-pool with a per-pair
random() — quadratic AND nondeterministic. This operator is linear and
engine-exact:

1. The candidate pool gets a 0-based dense index ONCE via the
   two-phase global rank (operators/globalrank.py — no sort-to-one).
2. Each query explodes to ``over_factor·k`` draw slots; draw i maps to
   a pool index by the house md5 fingerprint arithmetic
   (md5(qid:i) mod 2³¹−1 mod N) — the same deterministic-hash idiom as
   p_hash_split / minhash, reproducible in any engine, no RNG state.
3. One equi-join on the index attaches candidates; an anti-join drops
   positives; duplicate draws of the same candidate collapse to their
   FIRST slot; the first k survivors (by slot order) are the sample.

Over-sampling covers the losses from positive-hits and duplicate
draws: a query whose survivors still fall short yields fewer than k
rows (the honest outcome — callers needing exactly-k raise
``over_factor``; with positives ≪ pool and over_factor=2 the shortfall
probability is negligible). Every stage is an equi-join or a bounded
explode; the only scalar is the pool size, crossed in as a one-row
broadcast (the house scalar pattern).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

FP_MOD = 2_147_483_647


def draw_hash(qid: F.Column, i: F.Column) -> F.Column:
    """31-bit md5-derived draw hash of (query, slot) — cross-engine
    reproducible (the functions/text.py fingerprint idiom)."""
    s = F.concat(qid.cast("string"), F.lit(":"), i.cast("string"))
    return F.pmod(
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"),
        F.lit(FP_MOD),
    )


def negative_samples(
    queries: DataFrame,
    candidates: DataFrame,
    positives: DataFrame,
    k: int,
    *,
    q_col: str,
    cand_col: str,
    rank_key: str,
    over_factor: int = 2,
) -> DataFrame:
    """(qid, cand_id, draw_rank 1..≤k): k deterministic negatives per
    query. ``queries``: one row per query id; ``candidates``: the pool
    (unique ``cand_col``); ``positives``: (q_col, cand_col) pairs to
    exclude. ``rank_key`` names the swap-pool slot for the pool index
    (unique per call site, the globalrank contract)."""
    from ..session import default_parallelism
    from .globalrank import with_global_rank

    idxed = with_global_rank(
        candidates.select(F.col(cand_col).alias("cand_id")),
        [F.col("cand_id")],
        partitions=default_parallelism(),
        key=rank_key,
        rank_col="__idx",
    )
    nn = candidates.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    draws = (
        queries.select(F.col(q_col).alias("qid"))
        .crossJoin(F.broadcast(nn))
        .select(
            "qid",
            F.explode(F.sequence(F.lit(0), F.lit(over_factor * k - 1))).alias(
                "draw"
            ),
            "__n",
        )
        .select(
            "qid",
            "draw",
            F.pmod(draw_hash(F.col("qid"), F.col("draw")), F.col("__n")).alias(
                "__idx"
            ),
        )
    )
    pos = positives.select(
        F.col(q_col).alias("qid"), F.col(cand_col).alias("cand_id")
    )
    hits = (
        draws.join(idxed, "__idx")
        .join(pos, ["qid", "cand_id"], "left_anti")
        .groupBy("qid", "cand_id")
        .agg(F.min("draw").alias("first_draw"))
    )
    w = Window.partitionBy("qid").orderBy("first_draw")
    return (
        hits.withColumn("draw_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("draw_rank") <= k)
        .select("qid", "cand_id", "draw_rank")
    )
