"""10x scale spot-check for g3/j14/l10 (round 4 tail additions).

Builds replicas of the sf0.1 tables each query reads:
- events x10 (user_id/event_id shifted per copy, ts unchanged):
  sessions replicate 10x; error density 10x merges incidents into
  fewer, longer ones — j14's candidate volume grows with per-block
  co-occurrence, the honest stress for temporal blocking.
- lineitem x10 (orderkey shifted, suppkey unchanged): shared-order
  counts ~10x over the same 1000 suppliers — a DENSER graph, stressing
  the wedge bound rather than embarrassing parallelism.
- embeddings x10 (vec_id shifted by a multiple of the probe modulus):
  10x corpus AND 10x probes.
Usage: python scripts/scale10x_r4tail.py [build|run]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_r4tail"
COPIES = 10


def build():
    from replica_util import replicate_table

    os.makedirs(DST, exist_ok=True)
    replicate_table(
        SRC, DST, "events", {"event_id": 10**9, "user_id": 10**7}, COPIES
    )
    replicate_table(SRC, DST, "lineitem", {"l_orderkey": 10**9}, COPIES)
    replicate_table(SRC, DST, "embeddings", {"vec_id": 10**7}, COPIES)
    print("built", DST)


def run():
    from x8313_etl_spark.session import get_spark
    from x8313_etl_spark.registry import registry

    spark = get_spark("scale10x-r4tail", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        for name in ("g3_triangle_count", "j14_interval_overlap_join",
                     "l10_knn_classify"):
            t0 = time.perf_counter()
            n = specs[name].fn(spark, sf_dir).count()
            print(f"{tag:6s} {name:28s} {time.perf_counter()-t0:7.2f}s  {n} rows")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    (build if mode == "build" else run)()
