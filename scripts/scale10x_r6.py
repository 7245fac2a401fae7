"""10x scale spot-check for the round-6 additions.

Replicas of the sf0.1 tables each query reads (same discipline as
scale10x_r4tail.py / scale10x_r5.py):
- lineitem x10 (orderkey shifted by 10^9, suppkey/linenumber unchanged):
  a24's rank input grows 10x (expect ~linear — the two-phase selection
  has no data-sized concentration point); g7's co-supply graph gets
  ~10x denser edges over the same 1000 suppliers.
- embeddings x10 (vec_id shifted by 10^7, a multiple of the %25 probe
  modulus): both the corpus AND the probe set grow 10x, so
  sim_ivf_multiprobe's candidate volume follows probesxbucket — the
  honest growth law for the textbook IVF shape is ~100x candidates /
  ~10x when the probe set is capped; we measure the uncapped shape and
  report it (the capped posture is l10_knn_ivf's contract).
- customer+orders x10 (custkey shifted by 10^7 in BOTH so the FK is
  preserved; orderkey by 10^9): m8's view, deltas, and all three
  delta-join terms grow 10x (expect ~linear — the rule's entire point).
- part x10 (partkey shifted by 10^7, a multiple of the %10 probe
  modulus): p_er_blocked_match's blocks AND probes grow 10x, so pair
  volume follows Sigma block^2 — ~100x within-block work; the measured
  number documents why production blocking adds finer keys at scale.

Usage: python scripts/scale10x_r6.py [build|run]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_r6"
COPIES = 10

QUERIES = (
    "a24_global_median_twophase",
    "sim_ivf_multiprobe",
    "g7_weighted_sssp",
    "m8_delta_join_view",
    "p_er_blocked_match",
)


def build():
    from replica_util import replicate_table

    os.makedirs(DST, exist_ok=True)
    replicate_table(SRC, DST, "lineitem", {"l_orderkey": 10**9}, COPIES)
    replicate_table(SRC, DST, "embeddings", {"vec_id": 10**7}, COPIES)
    replicate_table(SRC, DST, "customer", {"c_custkey": 10**7}, COPIES)
    replicate_table(
        SRC, DST, "orders", {"o_orderkey": 10**9, "o_custkey": 10**7}, COPIES
    )
    replicate_table(SRC, DST, "part", {"p_partkey": 10**7}, COPIES)
    print("built", DST)


def run():
    from x8313_etl_spark.registry import registry
    from x8313_etl_spark.session import get_spark

    spark = get_spark("scale10x-r6", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        for name in QUERIES:
            t0 = time.perf_counter()
            n = specs[name].fn(spark, sf_dir).count()
            print(f"{tag:6s} {name:28s} {time.perf_counter()-t0:7.2f}s  {n} rows")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    (build if mode == "build" else run)()
