"""10x scale spot-check for the round-11-authored batch-P candidates
(tests/test_r18_candidates.py — the r18 registration pipeline):

- w23_user_stickiness: the 7x activity fan-out + two exact-distinct
  aggregates — the only member with a (bounded) fan term; expect
  ~linear wall in events.
- p_label_noise_audit: rides the pooled IVF assignment (broadcast
  seed cross, corpus-linear) + two bucket-keyed aggregates.
- a31_ks_two_sample: value-cardinality cumulative window — linear in
  distinct order totals.
- ts_seasonal_mase / a32_mix_entropy: partial-agg + lag-window /
  day-keyed shapes — swept to pin the linear laws on record.

Usage: python scripts/scale10x_bench.py build   # once per fixture regen
       python scripts/scale10x_r18cand.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_bench"


def run():
    from tests.test_r18_candidates import (
        _a31_fn,
        _entropy_fn,
        _mase_fn,
        _noise_fn,
        _w23_fn,
    )
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.session import get_spark

    fns = {
        "w23_user_stickiness": _w23_fn,
        "p_label_noise_audit": _noise_fn,
        "a31_ks_two_sample": _a31_fn,
        "ts_seasonal_mase": _mase_fn,
        "a32_mix_entropy": _entropy_fn,
    }
    spark = get_spark("scale10x-r18cand", cpus=32)
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
