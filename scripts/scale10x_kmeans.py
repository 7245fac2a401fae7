"""10x scale spot-check for operators/kmeans.py (pre-registration).

Reuses the r6 embeddings replica (vec_id shifted by 10^7). Per round
the assignment is a broadcast NLJ over N×k with k fixed, and the
centroid update collapses to k×dim cells map-side before its shuffle —
so total cost must grow ~linearly in N at fixed (k, rounds). This
sweep pins that growth law (the ROADMAP 10x invariant for any operator
with join/block structure).

Usage: python scripts/scale10x_kmeans.py   (expects the r6 replica dir;
rebuild it with `python scripts/scale10x_r6.py build` if missing)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_r6"
K, ROUNDS = 8, 3


def run():
    from x8313_etl_spark.operators.kmeans import lloyd_kmeans
    from x8313_etl_spark.session import get_spark

    spark = get_spark("scale10x-kmeans", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        t0 = time.perf_counter()
        assign, cents = lloyd_kmeans(e, k=K, rounds=ROUNDS)
        n = assign.count()
        t1 = time.perf_counter()
        print(f"{tag:6s} kmeans k={K} r={ROUNDS}: {t1-t0:6.2f}s ({n} assigned)")


if __name__ == "__main__":
    run()
