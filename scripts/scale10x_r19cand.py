"""10x scale spot-check for the round-11-authored batch-Q candidates
(tests/test_r19_candidates.py — the r19 registration pipeline):

- g17_ktruss: per-round wedge joins among surviving edges (Σ deg²,
  shrinking per peel round — the g3/g13 term over the thresholded
  co-supply graph).
- a33_theil_sen: per-supplier month-pair slopes — calendar-squared
  constant per group; wall should track supplier count.
- p_fim_transform / f17_codec_roundtrip: map-only; s26_path_options:
  write-bound + driver-side listing — swept to pin on record.

Usage: python scripts/scale10x_bench.py build   # once per fixture regen
       python scripts/scale10x_r19cand.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_bench"


def run():
    from tests.test_r19_candidates import (
        _a33_fn,
        _f17_fn,
        _fim_fn,
        _g17_fn,
        _s26_fn,
    )
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.session import get_spark

    fns = {
        "g17_ktruss": _g17_fn,
        "a33_theil_sen": _a33_fn,
        "p_fim_transform": _fim_fn,
        "f17_codec_roundtrip": _f17_fn,
        "s26_path_options": _s26_fn,
    }
    spark = get_spark("scale10x-r19cand", cpus=32)
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
