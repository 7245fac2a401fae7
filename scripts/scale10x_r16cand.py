"""10x scale spot-check for the round-11-authored batch-N candidates
(tests/test_r16_candidates.py — the r16 registration pipeline):

- g15_harmonic_centrality: the one member with a join volume term —
  per-round edge⋈frontier shuffles whose state is (node, landmark)
  pairs, |V|·|L| bounded by the landmark fraction (mod-4 sampling);
  the co-supply threshold keeps |E| ~flat as lineitem grows (the
  g13/g3 law), so expect sub-linear wall.
- p_ngram_novelty: held-out gram explode LEFT ANTI the train gram
  vocabulary — linear in corpus grams (the decontaminate shape); the
  replica's near-dup copies shrink novelty (cross-copy grams land in
  train) without changing the law.
- a28_group_trend_ols / a29_gini_concentration / ts_ewma_dyadic:
  pure partial-agg + bounded-window shapes, no join term — swept to
  pin the linear laws on record.

Usage: python scripts/scale10x_bench.py build   # once per fixture regen
       python scripts/scale10x_r16cand.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_bench"


def run():
    from tests.test_r16_candidates import (
        _a28_fn,
        _a29_fn,
        _ewma_fn,
        _g15_fn,
        _novelty_fn,
    )
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.session import get_spark

    fns = {
        "g15_harmonic_centrality": _g15_fn,
        "p_ngram_novelty": _novelty_fn,
        "a28_group_trend_ols": _a28_fn,
        "a29_gini_concentration": _a29_fn,
        "ts_ewma_dyadic": _ewma_fn,
    }
    spark = get_spark("scale10x-r16cand", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        for name, fn in fns.items():
            clear_pool()  # cold pooled caches: measure each query's own build
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            print(
                f"{tag:6s} {name:24s} {time.perf_counter()-t0:7.2f}s  {n} rows",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    run()
