"""Streaming ingest dedup: arrival-order MinHash dedup as a
foreachBatch sink (the streaming form of operators/increment.py).

Production corpora are not deduplicated in one batch job — documents
ARRIVE, and each arrival must be judged against everything that
arrived before it (accepted AND rejected arrivals both index — the
exact all-pairs-vs-earlier semantics, so a dup-of-a-dup reports its
true nearest partner; an accepted-only index is the other defensible
policy, with different verdicts on dup chains). This sink keeps the
standing MinHash signature/shingle state on disk and advances it per
micro-batch:

  verdict(d) = is d a banded near-dup (exact Jaccard ≥ τ on band-
  colliding candidates) of ANY earlier document — the seeded index, a
  document from an earlier micro-batch, or a smaller-id document in
  d's own micro-batch.

"Earlier" is document id order: the feed contract is that micro-batch
boundaries respect id order (batch k's ids all precede batch k+1's),
which the file-source harness enforces with id-range files in
modification-time order. Under that contract the verdict stream is
exactly the one-shot SQL over the whole feed (the t18 twin), so the
incremental state machinery is verified against a full recompute —
the m3/m8 discipline applied to dedup.

State/commit discipline is inherited from VersionedStateDir
(operators/verdir.py): every epoch rewrites SIG/SH/VERD copy-on-write
into ``v{batch_id}`` with an atomic rename, replayed batch_ids are
idempotent no-ops, restart recovers from the highest version on disk.
Copy-on-write full rewrites are fixture convenience; at corpus scale
the same contract holds with per-epoch APPEND directories plus
compaction (the snapshots.py shapes) — the sink's join topology
(batch × state band join, never state × state) is what survives 100 TB,
because per-epoch work is |batch| sketching plus band-bucket-bounded
candidate verification, independent of accumulated corpus size.

Hot-bucket cap caveat: ``max_bucket_size`` drops over-cap band buckets
on BOTH candidate-supplying sides — the accumulated index AND the
within-batch self-join (one hot key inside a single micro-batch pairs
quadratically just like one in the index). The cap is epoch-relative
(a bucket crosses it at some arrival point, earlier epochs saw it
smaller), so the exact equivalence to the one-shot SQL twin holds only
while no bucket ever exceeds the cap — the default cap needs a
5000-strong near-identical cluster to fire, and the t18 twin corpus
never approaches it.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .bandjoin import DEFAULT_MAX_BUCKET_SIZE
from .minhash import band_keys, shingle_table, signature_table
from .verdir import VersionedStateDir

_VERD_SCHEMA = "doc_id long, is_dup boolean, dup_of long, jaccard double"


class IngestDedupSink(VersionedStateDir):
    """foreachBatch sink accumulating (SIG, SH, VERD) state."""

    def __init__(
        self,
        state_root: str,
        threshold: float = 0.3,
        k: int = 3,
        max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
        keep_versions: int = 2,
    ) -> None:
        super().__init__(state_root, keep_versions)
        self.threshold = threshold
        self.k = k
        self.max_bucket_size = max_bucket_size

    def init_index(
        self, index_docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> None:
        """Seed epoch (version -1): the pre-existing corpus index."""
        if self.current is not None:
            return  # restart path
        spark = index_docs.sparkSession
        sig = signature_table(index_docs, id_col, text_col, self.k)
        sh = shingle_table(index_docs, id_col, text_col, self.k)
        verd = spark.createDataFrame([], _VERD_SCHEMA)
        self._commit_state(-1, sig, sh, verd)

    def _commit_state(self, batch_id: int, sig, sh, verd) -> None:
        def write(tmp: str) -> None:
            sig.write.mode("overwrite").parquet(os.path.join(tmp, "SIG"))
            sh.write.mode("overwrite").parquet(os.path.join(tmp, "SH"))
            verd.write.mode("overwrite").parquet(os.path.join(tmp, "VERD"))

        self._commit(batch_id, write)

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._version_dir(batch_id)):
            self._note_replay(batch_id)
            return
        assert self.current is not None, "init_index must run first"
        spark = batch.sparkSession
        sig_old = spark.read.parquet(os.path.join(self.current, "SIG"))
        sh_old = spark.read.parquet(os.path.join(self.current, "SH"))
        verd_old = spark.read.parquet(os.path.join(self.current, "VERD"))

        batch = batch.localCheckpoint(eager=True)  # pin the epoch's rows
        bsig = signature_table(batch, "doc_id", "text", self.k)
        bsh = shingle_table(batch, "doc_id", "text", self.k)

        banded_new = bsig.select(
            F.col("doc_id").alias("new_id"),
            F.posexplode(band_keys(F.col("sig"))).alias("band", "key"),
        )
        banded_seen = sig_old.select(
            F.col("doc_id").alias("old_id"),
            F.posexplode(band_keys(F.col("sig"))).alias("band", "key"),
        )
        if self.max_bucket_size is not None:
            hot = (
                banded_seen.groupBy("band", "key")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > self.max_bucket_size)
                .select("band", "key")
            )
            banded_seen = banded_seen.join(
                F.broadcast(hot), ["band", "key"], "left_anti"
            )
        cross = banded_new.join(banded_seen, ["band", "key"]).select(
            "new_id", "old_id"
        )
        banded_new_rhs = banded_new.select(
            F.col("new_id").alias("old_id"), "band", "key"
        )
        if self.max_bucket_size is not None:
            # the same DROP posture as the index side: one hot band key
            # INSIDE a micro-batch pairs quadratically too (a crawl
            # burst of boilerplate arriving in one batch). Over-cap
            # buckets are dropped ENTIRELY from the candidate-supplying
            # side (0 pairs from them — on_hot="drop", not a capped
            # sample), so a doc whose only collisions are hot buckets
            # is reported non-dup; the docstring's one-shot-twin caveat
            # covers exactly this divergence when the cap fires
            hot_new = (
                banded_new.groupBy("band", "key")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > self.max_bucket_size)
                .select("band", "key")
            )
            banded_new_rhs = banded_new_rhs.join(
                F.broadcast(hot_new), ["band", "key"], "left_anti"
            )
        within = (
            banded_new.alias("a")
            .join(banded_new_rhs.alias("b"), ["band", "key"])
            .filter(F.col("old_id") < F.col("new_id"))
            .select("new_id", "old_id")
        )
        cand = cross.unionByName(within).distinct()

        sh_all_old = sh_old.unionByName(bsh)
        jac = (
            F.size(F.array_intersect(F.col("sa"), F.col("sb"))).cast("double")
            / F.size(F.array_distinct(F.concat(F.col("sa"), F.col("sb"))))
        )
        verified = (
            cand.join(
                bsh.select(F.col("doc_id").alias("new_id"), F.col("sh").alias("sa")),
                "new_id",
            )
            .join(
                sh_all_old.select(
                    F.col("doc_id").alias("old_id"), F.col("sh").alias("sb")
                ),
                "old_id",
            )
            .select("new_id", "old_id", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= self.threshold)
        )
        from pyspark.sql import Window

        w = Window.partitionBy("new_id").orderBy(
            F.col("jaccard").desc(), F.col("old_id").asc()
        )
        best = (
            verified.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        verd_batch = (
            batch.select(F.col("doc_id"))
            .join(best.withColumnRenamed("new_id", "doc_id"), "doc_id", "left")
            .select(
                "doc_id",
                F.col("old_id").isNotNull().alias("is_dup"),
                F.col("old_id").alias("dup_of"),
                "jaccard",
            )
        )
        self._commit_state(
            batch_id,
            sig_old.unionByName(bsig),
            sh_old.unionByName(bsh),
            verd_old.unionByName(verd_batch),
        )

    def read_verdicts(self, spark) -> DataFrame:
        assert self.current is not None
        return spark.read.parquet(os.path.join(self.current, "VERD"))
