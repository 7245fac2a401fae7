"""10x scale spot-check for the round-11-authored batch-R candidates
(tests/test_r20_candidates.py — the r20 registration pipeline):

- w24_cohort_ltv: user-keyed min window + (cohort, age) aggregates —
  events-linear; the cumulative window is (cohort × age)-sized.
- a34_mann_whitney_u: value-cardinality cumulative window, like a31.
- x15_pandas_udf_iter: Arrow-batched map — rows-linear.
- m13_snapshot_expiry: nation-sized commits + vacuum — fixture-bound
  (no scale term; swept to pin on record).

Usage: python scripts/scale10x_bench.py build   # once per fixture regen
       python scripts/scale10x_r20cand.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_bench"


def run():
    from tests.test_r20_candidates import _a34_fn, _m13_fn, _w24_fn, _x15_fn
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.session import get_spark

    fns = {
        "w24_cohort_ltv": _w24_fn,
        "a34_mann_whitney_u": _a34_fn,
        "x15_pandas_udf_iter": _x15_fn,
        "m13_snapshot_expiry": _m13_fn,
    }
    spark = get_spark("scale10x-r20cand", cpus=32)
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
