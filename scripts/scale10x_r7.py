"""10x scale spot-check for the round-7 registrations whose candidate
volume carries a join/block term (the standing pre-registration
invariant; the other r7 registrations are scans/per-series recurrences
or were already swept: substr spans scripts/scale10x_substr.py, IVF-PQ
scripts/scale10x_ivfpq.py, kmeans scripts/scale10x_kmeans.py, setjoin
interning measured in ROADMAP/PERF).

Replicas of the sf0.1 tables each query reads (replica_util key-shift
discipline):
- part x10 (partkey shifted by 10**7, a multiple of the %10/%20 probe
  moduli): p_er_blocked_multikey's blocks AND probes grow 10x — pair
  volume follows Sigma block^2 per block family; name interning keeps
  distinct-name work 10x, and the vocabulary of block keys grows with
  the name space, so the honest expectation is between 10x and 100x
  depending on block-occupancy growth (the single-key r6 measurement
  was ~linear after interning).
- lineitem x10 (orderkey shifted by 10**9): g8/g9's graphs. g8's
  co-supply pair table grows ~10x denser over the same 1000 suppliers
  (the g7 shape — bucket schedule unchanged); g9's bipartite edge set
  grows ~10x with the same 5 seeds.
- orders x10 (orderkey 10**9, custkey 10**7) joined by g9 against the
  replicated lineitem: the supplier->customer edges multiply
  accordingly.
- embeddings x10 (vec_id shifted by 10**7): p_semdedup_prune's kmeans
  input and within-cluster pair term (Sigma cluster^2 — clusters grow
  10x => ~100x pair work at fixed k=8; the paper's posture is k ~
  sqrt(N), documented in the query docstring — the measurement makes
  that dial's cost visible).

Usage: python scripts/scale10x_r7.py [build|run]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_r7"
COPIES = 10

QUERIES = (
    "p_er_blocked_multikey",
    "g8_delta_stepping",
    "g9_personalized_pagerank",
    "p_semdedup_prune",
)


def build():
    from replica_util import replicate_table

    os.makedirs(DST, exist_ok=True)
    replicate_table(SRC, DST, "part", {"p_partkey": 10**7}, COPIES)
    replicate_table(SRC, DST, "lineitem", {"l_orderkey": 10**9}, COPIES)
    replicate_table(
        SRC, DST, "orders", {"o_orderkey": 10**9, "o_custkey": 10**7}, COPIES
    )
    replicate_table(SRC, DST, "embeddings", {"vec_id": 10**7}, COPIES)
    print("built", DST)


def run():
    from x8313_etl_spark.registry import registry
    from x8313_etl_spark.session import get_spark

    spark = get_spark("scale10x-r7", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        for name in QUERIES:
            t0 = time.perf_counter()
            n = specs[name].fn(spark, sf_dir).count()
            print(
                f"{tag:6s} {name:26s} {time.perf_counter()-t0:7.2f}s  {n} rows",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    (build if mode == "build" else run)()
