"""10x scale spot-check for the round-9 registration batch members with
a join/block candidate-volume term (the standing pre-registration
invariant — it has caught a real quadratic or re-execution five rounds
running). Batches A/C were swept in round 7; this covers the batch-E/F
joins plus the one batch-A composition that had not been growth-measured
as a whole:

- j18_asof_nearest: two union+window asof passes keyed by user — no
  join fan-out anywhere in the Spark plan, but the final back x fwd
  assembly is a purchase-keyed equi-join; expect ~linear in events.
- j19_scd2_lookup: fact x SCD2-dim interval join. Every fact matches
  EXACTLY one version, so output is fact-sized; the hazard the sweep
  watches is the per-user version count growing with data (it does:
  more events => more change rows per user => wider interval lists per
  join key), which would show as super-linear join probe work.
- m10_snapshot_diff: keyed full-outer join of two manifest versions —
  linear; sweeping mostly to pin the SnapshotTable commit+apply_cdc
  write path's growth (it rewrites data files, so wall ~ data size).
- t19_stream_semi_join: stream-stream LEFT SEMI with two-sided
  watermark + 60-min time bound; state is watermark-bounded, and the
  semi form emits each view at most once (no pair fan-out by design —
  the sweep confirms the state-store probe volume stays ~linear).
- sim_hybrid_rrf: BM25 (already growth-measured via p_bm25_topk's
  bench history) + brute-force cosine probe top-k at a FIXED 10-probe
  set — candidate volume is probes x corpus = 10 x N, expected ~linear
  in corpus size.

Reuses the FK-consistent bench replica (scripts/scale10x_bench.py
build) — events/documents/embeddings are key-shifted 10x copies with
near-dup (not exact-dup) document texts.

Usage: python scripts/scale10x_bench.py build   # once per fixture regen
       python scripts/scale10x_r9.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_bench"


def run():
    # measured pre-registration from the (since-retired) candidate test
    # modules; the registered fns below are verbatim copies, so a re-run
    # reproduces the same growth law
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.queries.etl_q import m10_snapshot_diff
    from x8313_etl_spark.queries.joins import j18_asof_nearest, j19_scd2_lookup
    from x8313_etl_spark.queries.similarity_q import sim_hybrid_rrf
    from x8313_etl_spark.queries.streaming_q import t19_stream_semi_join
    from x8313_etl_spark.session import get_spark

    fns = {
        "j18_asof_nearest": j18_asof_nearest,
        "j19_scd2_lookup": j19_scd2_lookup,
        "m10_snapshot_diff": m10_snapshot_diff,
        "sim_hybrid_rrf": sim_hybrid_rrf,
        "t19_stream_semi_join": t19_stream_semi_join,
    }
    spark = get_spark("scale10x-r9", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        for name, fn in fns.items():
            clear_pool()  # cold pooled caches: measure each query's own build
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            print(
                f"{tag:6s} {name:22s} {time.perf_counter()-t0:7.2f}s  {n} rows",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    run()
