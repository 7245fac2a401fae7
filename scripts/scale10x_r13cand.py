"""10x scale spot-check for the round-10-authored batch-K candidates
(tests/test_r13_candidates.py — the r13 registration pipeline) with a
join/block or per-round volume term, run at AUTHORING time per the
standing invariant:

- g14_label_propagation: per-round edge⋈labels shuffle — expected
  |E|-linear per round (the g1/g2 cost model; rounds fixed at 3).
- w19_rfm_cells: one orders groupBy + three two-phase global ranks over
  the customer table — expected ~linear in orders.
- p_budget_allocation: source-sized allocation broadcast into one
  corpus pass + a per-source rank — expected ~linear in documents.

p_span_corruption is map-only (explode of a per-doc sequence) and
m12_dynamic_partition_overwrite is write-bound (its cost IS the delta's
partitions); neither has a pair/block term, so neither needs the sweep.

Reuses the FK-consistent bench replica (scripts/scale10x_bench.py
build). The candidate fns are imported from the test module — they move
into query modules verbatim at registration.

Usage: python scripts/scale10x_bench.py build   # once per fixture regen
       python scripts/scale10x_r13cand.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_bench"


def run():
    from tests.test_r13_candidates import _budget_fn, _lpa_fn, _rfm_fn
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.session import get_spark

    fns = {
        "g14_label_propagation": _lpa_fn,
        "w19_rfm_cells": _rfm_fn,
        "p_budget_allocation": _budget_fn,
    }
    spark = get_spark("scale10x-r13cand", cpus=32)
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
