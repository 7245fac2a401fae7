"""10x scale spot-check for the round-10-authored batch-L candidates
(tests/test_r14_candidates.py — the r14 registration pipeline) with a
join/volume term, run at AUTHORING time per the standing invariant:

- p_hard_negatives: anchor-bucket join — candidate volume is
  Σ anchor-bucket sizes; anchors scale with the corpus (%50 modulus),
  so expect the sim_ivf_multiprobe-style law (volume ~100x → wall well
  under 10x; the capped-anchor posture is the registration dial).
- ts_anomaly_mad: three window passes over the pooled series table —
  expected ~linear in events.
- w20_position_attribution: one user-keyed join + window — linear.

dq9_fd_audit is three key-cardinality-sized aggregates and
s24_nested_json_roundtrip is write-bound; neither has a pair term.

Usage: python scripts/scale10x_bench.py build   # once per fixture regen
       python scripts/scale10x_r14cand.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_bench"


def run():
    from tests.test_r14_candidates import _hard_negatives_fn, _mad_fn, _w20_fn
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.session import get_spark

    fns = {
        "p_hard_negatives": _hard_negatives_fn,
        "ts_anomaly_mad": _mad_fn,
        "w20_position_attr": _w20_fn,
    }
    spark = get_spark("scale10x-r14cand", cpus=32)
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
