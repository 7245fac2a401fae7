"""10x scale spot-check for operators/substrdedup.py (pre-registration,
the standing invariant: every new operator with join/block structure
gets a measured growth law before the round closes).

Replica: documents x10 with doc_id shifted by 10^7 and NO text prefix —
exact text copies are the WORST case for this operator (every k-gram's
count multiplies by 10, so every position in the corpus becomes a
marked duplicated window and the interval merge sees maximal input).
Unlike the pairwise near-dup queries, nothing here pairs quadratically:
candidate volume is one row per position (semi join against the
duplicated-gram set), so the honest expectation is ~linear wall clock
even in the all-duplicated regime.

Usage: python scripts/scale10x_substr.py [build|run]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_substr"
COPIES = 10
K = 8


def build():
    from replica_util import replicate_table

    os.makedirs(DST, exist_ok=True)
    replicate_table(SRC, DST, "documents", {"doc_id": 10**7}, COPIES)
    print("built", DST)


def run():
    from x8313_etl_spark.operators.setjoin import similarity_join
    from x8313_etl_spark.operators.substrdedup import duplicated_spans
    from x8313_etl_spark.session import get_spark

    spark = get_spark("scale10x-substr", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t0 = time.perf_counter()
        n = duplicated_spans(docs, K).count()
        print(f"{tag:6s} duplicated_spans k={K} {time.perf_counter()-t0:7.2f}s  {n} rows")
        # setjoin on the exact-copy replica is its worst case: every
        # doc gains 9 identical twins, so each shingle's prefix-df
        # multiplies by 10 and candidate volume follows Σ prefix-df².
        # Measured: the UN-interned form went 16.9s -> 1195s (~71x) —
        # the catch that forced identical-set interning into
        # similarity_join; the interned form measures 18.9s -> 23.6s
        # for the same 250,600 pairs (quadratic stages run on distinct
        # sets, expansion is output-bound).
        t0 = time.perf_counter()
        n = similarity_join(docs, 1, 2, shingle_k=3).count()
        print(f"{tag:6s} similarity_join t=1/2 {time.perf_counter()-t0:6.2f}s  {n} pairs")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    (build if mode == "build" else run)()
