"""10x scale spot-check for operators/ivfpq.py (pre-registration).

Reuses the r6 embeddings replica (vec_id shifted by 10^7): corpus AND
probe set both grow 10x, with the probe budget CAPPED at a fixed 200
probes (the l10_knn_ivf fixed-budget contract — the honest production
posture; the uncapped probes×bucket law was already measured for IVF in
scripts/scale10x_r6.py). Expected: index build ~linear (argmin assign +
code argmin are map-side over vectors); capped search ~linear in bucket
size (10x corpus → 10x rows per probed bucket).

Usage: python scripts/scale10x_ivfpq.py   (expects the r6 replica dir;
rebuild it with `python scripts/scale10x_r6.py build` if missing)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_r6"
PROBE_CAP = 200


def run():
    from x8313_etl_spark.operators.ivfpq import ivfpq_index, ivfpq_search
    from x8313_etl_spark.session import get_spark

    spark = get_spark("scale10x-ivfpq", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        probes = (
            e.filter(F.col("vec_id") % 25 == 0)
            .filter(F.col("vec_id") < PROBE_CAP * 25)
            .select(F.col("vec_id").alias("probe_id"), "embedding")
        )
        t0 = time.perf_counter()
        idx = ivfpq_index(e, k_coarse=16, m=8, sub=8, k_code=16)
        nc = idx.codes.count()
        t1 = time.perf_counter()
        n = ivfpq_search(idx, probes, nprobe=4, topk=5).count()
        t2 = time.perf_counter()
        print(
            f"{tag:6s} build {t1-t0:6.2f}s ({nc} codes)  "
            f"search {t2-t1:6.2f}s ({n} rows, {PROBE_CAP} probes capped)"
        )
    spark.stop()


if __name__ == "__main__":
    run()
