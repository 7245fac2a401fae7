"""10x scale spot-check for the incremental-dedup candidate.

documents x10 (doc_id shifted by 10^7, a multiple of the %5 delta
modulus so both the batch and the index grow 10x; per-copy text prefix
so copies are NEAR-dups, not exact ones — exact copies pair
quadratically, the r4 measured artifact). The expected growth law is
~linear-plus-band-collisions: batch sketching is 10x rows, and the
candidate volume follows Sigma |batch_bucket| x |index_bucket|, which
grows ~100x only if a band bucket is corpus-wide (the hot-bucket cap's
job at real scale).

Usage: python scripts/scale10x_increment.py [build|run]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_increment"
COPIES = 10
MOD = 5


def build():
    from replica_util import replicate_table

    os.makedirs(DST, exist_ok=True)
    replicate_table(
        SRC, DST, "documents", {"doc_id": 10**7}, COPIES, text_prefix="text"
    )
    print("built", DST)


def run():
    import pyspark.sql.functions as F

    from x8313_etl_spark.io import load_table
    from x8313_etl_spark.operators.increment import incremental_near_dups
    from x8313_etl_spark.session import get_spark

    spark = get_spark("scale10x-increment", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        d = load_table(spark, sf_dir, "documents")
        index = d.filter(F.col("doc_id") % MOD != 0)
        batch = d.filter(F.col("doc_id") % MOD == 0)
        t0 = time.perf_counter()
        out = incremental_near_dups(index, batch).persist()
        n = out.count()
        dups = out.filter(F.col("is_dup")).count()
        print(
            f"{tag:6s} incremental_near_dups {time.perf_counter()-t0:7.2f}s  "
            f"{n} batch docs, {dups} flagged dup"
        )
        out.unpersist()
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    (build if mode == "build" else run)()
