"""Streaming maintenance of a JOIN view — m8's delta-join rule driven
by foreachBatch epochs (the t17 registration candidate, ROADMAP.md).

Each micro-batch carries Z-SET delta rows for either base table of the
view customer⋈orders (side 'A' = customer-shaped (c_custkey,
c_nationkey, bal, m), side 'B' = orders-shaped (o_orderkey, o_custkey,
price, m); update = retract old ⊎ assert new, exactly
queries/etl_q.py's m8 encoding). The sink maintains THREE tables —
both bases and the view — because the delta-join rule needs A and B
as-of the batch start: ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB
(m8_delta_join_maintain), then A/B advance by Z-set consolidation.

Exactly-once contract (same as operators/upsert_sink.py, whose
commit/replay discipline this reuses): all three tables commit
TOGETHER under one ``v{batch_id}`` directory via write-to-temp +
atomic rename — a replayed epoch finds its version present and skips,
and a crash can never publish a view that disagrees with its bases.
Batch boundaries are not semantics for SET-respecting delta streams
(the keyed-CDC contract — see _consolidate's precondition): the
delta-join rule composes, so any split of such a stream into epochs
yields the same final state (pinned by tests/test_viewmaint.py
alongside replay idempotency and the incremental ≡ full-recompute
gold standard).

Scale: per epoch, two delta×base equi-joins keyed on the view's own
join key (co-partitioned with the stored view in a real deployment;
AQE broadcasts the delta side at the usual <1% rate), one delta×delta
join, and copy-on-write parquet commits — the base tables are never
rescanned, which is the point of incremental view maintenance. The
concrete customer/orders schema keeps the operator oracle-checkable
against the m8 fixtures; the generalization to arbitrary schemas is a
column-map parameter, not a new algorithm.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .verdir import VersionedStateDir

A_COLS = ("c_custkey", "c_nationkey", "bal")
B_COLS = ("o_orderkey", "o_custkey", "price")
V_COLS = ("o_orderkey", "c_custkey", "c_nationkey", "bal", "price")


def _consolidate(
    base: DataFrame, zset: DataFrame, cols: tuple, mult_col: str
) -> DataFrame:
    """Z-set apply: multiplicity-sum per tuple, keep m > 0. The
    multiplicity column is named EXPLICITLY (a positional last-column
    grab would silently sum a data column if a caller reordered its
    schema — review round 6).

    SET-semantics precondition (shared with m8_delta_join_maintain and
    documented there): bases are sets (each tuple multiplicity ≤ 1) and
    each batch's delta respects that — assert (+1) only for absent
    tuples, retract (−1) only for present ones, which is exactly what a
    primary-keyed CDC feed produces. State stores presence, not counts,
    so a delta stream that drives a tuple's multiplicity above 1 within
    ONE batch and retracts it in a LATER batch is out of contract (the
    general multiset upgrade stores the multiplicity column in state —
    a column, not a new algorithm)."""
    return (
        base.withColumn("m", F.lit(1))
        .unionByName(zset.select(*cols, F.col(mult_col).alias("m")))
        .groupBy(*cols)
        .agg(F.sum("m").alias("m"))
        .filter(F.col("m") > 0)
        .select(*cols)
    )


class JoinViewSink(VersionedStateDir):
    """Copy-on-write (A, B, V) state advanced by foreachBatch epochs of
    two-sided Z-set deltas. Batch schema: ``side`` ('A'/'B') + the
    union of both sides' columns (the absent side's columns null) +
    ``m`` (±1). Commit/replay/prune discipline inherited from
    VersionedStateDir (operators/verdir.py) — including negative-
    version parsing for the seed commit, which the first copy-pasted
    implementation got wrong (v-1 was invisible to restart recovery
    and exempt from pruning)."""

    def init_bases(self, a0: DataFrame, b0: DataFrame) -> None:
        """Seed epoch (version -1): materialize A, B, and V = A⋈B."""
        if self.current is not None:
            return  # already initialized (restart path)
        v = b0.join(a0, b0.o_custkey == a0.c_custkey).select(*V_COLS)
        self._commit_abv(-1, a0, b0, v)

    def _commit_abv(self, batch_id: int, a, b, v) -> None:
        def write(tmp: str) -> None:
            a.write.mode("overwrite").parquet(os.path.join(tmp, "A"))
            b.write.mode("overwrite").parquet(os.path.join(tmp, "B"))
            v.write.mode("overwrite").parquet(os.path.join(tmp, "V"))

        # atomic: A/B/V publish together or not at all
        self._commit(batch_id, write)

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        """One epoch: split the two-sided Z-set, maintain V by the
        delta-join rule against batch-start A/B, advance A/B.
        Idempotent per batch_id (version-dir token, replay skips)."""
        from ..queries.etl_q import m8_delta_join_maintain

        if os.path.exists(self._version_dir(batch_id)):
            self._note_replay(batch_id)
            return
        assert self.current is not None, "init_bases must run first"
        spark = batch.sparkSession
        a_old = spark.read.parquet(os.path.join(self.current, "A"))
        b_old = spark.read.parquet(os.path.join(self.current, "B"))
        v_old = spark.read.parquet(os.path.join(self.current, "V"))
        da = batch.filter(F.col("side") == "A").select(
            *A_COLS, F.col("m").alias("am")
        )
        db = batch.filter(F.col("side") == "B").select(
            *B_COLS, F.col("m").alias("bm")
        )
        v_new = m8_delta_join_maintain(v_old, a_old, b_old, da, db)
        a_new = _consolidate(a_old, da, A_COLS, "am")
        b_new = _consolidate(b_old, db, B_COLS, "bm")
        self._commit_abv(batch_id, a_new, b_new, v_new)

    def read_view(self, spark: SparkSession) -> DataFrame:
        assert self.current is not None, "no epoch has been applied"
        return spark.read.parquet(os.path.join(self.current, "V"))

    def read_bases(self, spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        assert self.current is not None
        return (
            spark.read.parquet(os.path.join(self.current, "A")),
            spark.read.parquet(os.path.join(self.current, "B")),
        )
