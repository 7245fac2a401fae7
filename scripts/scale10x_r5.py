"""10x scale spot-check for the round-5 additions with non-trivial
scale posture: the bucketed similarity primaries, k-core peeling, and
the window-pass pattern matcher.

Replicas of the sf0.1 tables each query reads (same discipline as
scale10x_r4tail.py):
- embeddings x10 (vec_id shifted by 10^7, a multiple of both probe
  moduli): 10x corpus; sim_pq/ivf probe sets scale 10x with it, while
  l10_knn_ivf's capped probe budget stays FIXED — exactly its contract
  (work should scale ~linearly with the corpus, not quadratically).
- lineitem x10 (orderkey shifted, suppkey unchanged): denser co-supply
  graph over the same 1000 suppliers — g5's peel rounds see ~10x
  edges.
- events x10 (event_id/user_id shifted): 10x users for w13's per-key
  window pass.
Usage: python scripts/scale10x_r5.py [build|run]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_r5"
COPIES = 10

QUERIES = (
    "p_semantic_dedup_lsh",
    "l10_knn_ivf",
    "sim_pq_topk",
    "g5_kcore",
    "w13_match_recognize",
)


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
    from x8313_etl_spark.registry import registry
    from x8313_etl_spark.session import get_spark

    spark = get_spark("scale10x-r5", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        for name in QUERIES:
            t0 = time.perf_counter()
            n = specs[name].fn(spark, sf_dir).count()
            print(f"{tag:6s} {name:24s} {time.perf_counter()-t0:7.2f}s  {n} rows")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    (build if mode == "build" else run)()
