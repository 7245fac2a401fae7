"""10x scale spot-check for the round-11-authored batch-O candidates
(tests/test_r17_candidates.py — the r17 registration pipeline):

- g16_adamic_adar: wedge join over the thresholded co-supply graph —
  Σ deg² candidate volume (the g12/g13 law; the quantile threshold
  keeps the graph sparse as lineitem grows).
- sim_matryoshka_topk: the coarse stage is a capped-probe × corpus
  prefix-dim scan — probes scale with the corpus at the fixture's
  mod-50 rule, so candidate volume is ~100× at 10× (the
  sim_ivf_multiprobe posture: the capped-probe dial is documented;
  at 100 TB the probe set is the workload, not a corpus slice).
- w22_time_to_conversion / dq10_benford_audit /
  p_quality_weighted_sample: window-keyed, 9-digit bounded, and
  map-only shapes — swept to pin the linear laws on record.

Usage: python scripts/scale10x_bench.py build   # once per fixture regen
       python scripts/scale10x_r17cand.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_bench"


def run():
    from tests.test_r17_candidates import (
        _dq10_fn,
        _g16_fn,
        _matryoshka_fn,
        _pqws_fn,
        _w22_fn,
    )
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.session import get_spark

    fns = {
        "g16_adamic_adar": _g16_fn,
        "sim_matryoshka_topk": _matryoshka_fn,
        "w22_time_to_conversion": _w22_fn,
        "dq10_benford_audit": _dq10_fn,
        "p_quality_weighted_sample": _pqws_fn,
    }
    spark = get_spark("scale10x-r17cand", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        for name, fn in fns.items():
            clear_pool()  # cold pooled caches: measure each query's own build
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            print(
                f"{tag:6s} {name:26s} {time.perf_counter()-t0:7.2f}s  {n} rows",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    run()
