"""Round-13 standing-watch measurements (r12 verdict item 8 + the
g14→g4 transfer from item 3):

1. g4_label_propagation checkpoint law — the r11 watch item was
   authored against the batch-K candidate g14, which r13 found
   output-identical to the registered g4 (ROADMAP.md); the law
   transfers. Question on record: does CHECKPOINT WALL dominate the
   |E|-linear compute term at 10×? Measured by running g4 twice per
   scale — once as registered (audited localCheckpoints per round)
   and once with audited_checkpoint monkeypatched to identity (pure
   lineage, 3 rounds is shallow enough to plan) — the delta is the
   checkpoint-machinery share of wall.

2. g12_node_jaccard wedge-volume constant — re-measure the 10× wall
   ratio so PERF.md's growth-law table carries a fresh constant
   (watch: the Σ deg² wedge term's coefficient).

Usage: python scripts/scale10x_bench.py build   # once per fixture regen
       python scripts/scale10x_r13watch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_bench"


def run():
    from x8313_etl_spark import audit
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.queries.graph_q import (
        g4_label_propagation,
        g12_node_jaccard,
    )
    from x8313_etl_spark.session import get_spark

    spark = get_spark("scale10x-r13watch", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    real_cp = audit.audited_checkpoint
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        # g4 as registered (checkpoints on)
        clear_pool()
        t0 = time.perf_counter()
        n = g4_label_propagation(spark, sf_dir).count()
        wall_cp = time.perf_counter() - t0
        # g4 with checkpoints bypassed (identity): pure compute+plan
        audit.audited_checkpoint = lambda key, df, **kw: df
        try:
            clear_pool()
            t0 = time.perf_counter()
            n2 = g4_label_propagation(spark, sf_dir).count()
            wall_nocp = time.perf_counter() - t0
        finally:
            audit.audited_checkpoint = real_cp
        assert n == n2, (n, n2)
        print(
            f"{tag:6s} g4_label_propagation  wall={wall_cp:7.2f}s "
            f"nocp={wall_nocp:7.2f}s  checkpoint_share="
            f"{(wall_cp - wall_nocp) / wall_cp:+.1%}  rows={n}",
            flush=True,
        )
        clear_pool()
        t0 = time.perf_counter()
        n = g12_node_jaccard(spark, sf_dir).count()
        print(
            f"{tag:6s} g12_node_jaccard      wall={time.perf_counter()-t0:7.2f}s  rows={n}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    run()
