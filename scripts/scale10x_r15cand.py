"""10x scale spot-check for the round-10-authored batch-M candidates
(tests/test_r15_candidates.py — the r15 registration pipeline):

- p_dedup_recall_eval: exact posting join (Σ df²) + uncapped band join
  (Σ bucket²) — both documented laws (l2c / l2); the replica's near-dup
  copies inflate both true-pair and candidate-pair OUTPUT density
  (every 10-copy group pairs quadratically — the known artifact), so
  read wall per output pair, not raw wall. At 100 TB this op runs on a
  SAMPLE by design (it is a calibration instrument).
- ts_top_motif: per-series O(len²) window pairs at FIXED series length
  (the replica adds series, not length) — expect ~linear wall in
  series count.

Usage: python scripts/scale10x_bench.py build   # once per fixture regen
       python scripts/scale10x_r15cand.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_bench"


def run():
    from tests.test_r15_candidates import _dedup_eval_fn, _motif_fn
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.session import get_spark

    fns = {"p_dedup_recall_eval": _dedup_eval_fn, "ts_top_motif": _motif_fn}
    spark = get_spark("scale10x-r15cand", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        for name, fn in fns.items():
            clear_pool()  # cold pooled caches: measure each query's own build
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            n = rows[0].n_true if name == "p_dedup_recall_eval" else len(rows)
            print(
                f"{tag:6s} {name:22s} {time.perf_counter()-t0:7.2f}s  out={n}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    run()
