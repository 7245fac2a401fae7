"""10x scale spot-check for the round-8 registrations whose candidate
volume carries a join/block term (the standing pre-registration
invariant — it has caught a real quadratic four rounds running).

Covered here:
- g11_knn_graph: embeddings x10 — the within-IVF-bucket self-join's
  pair volume follows Sigma bucket^2 over the SAME 16 seed centroids,
  so buckets grow 10x => ~100x raw pair work is the honest worst case;
  the WindowGroupLimit top-k prune keeps the exchanged rows 10x. The
  measurement makes the documented salted-bucket dial's trigger point
  visible.
- sim_mmr_rerank: embeddings x10 — probes grow 10x (vec_id % 25 keeps
  its meaning under the key shift), candidates are a FIXED N=10 per
  probe, so pairsim is 10x rows of constant N^2-per-probe work and the
  k=5 greedy rounds are probe-parallel: expected ~linear.
- a26_dim_covariance (+ the composed sim_pca_power matvec): embeddings
  x10 — the vec_id self-join has exactly d=64 rows per key, so pair
  work is a CONSTANT d^2 per vector: expected ~linear into the fixed
  d^2/2-cell combine. (sim_pca_power adds only constant d x d rounds on
  top; measured via the covariance term it shares.)

Queries registered this round WITHOUT a join/block volume term (and so
not swept here): w16/w17 (user-keyed window passes), dq4 (two-phase
rank, plan-guarded), m9 (manifest reads), p_rag_context_pack (ranked
rows x token counts equi-join, bounded by queries x k),
p_unigram_train/encode (dictionary-interned map-only rounds),
t18 (the ingest band join's growth law is scripts/scale10x_increment.py's
measurement — same operator core), p_incremental_dedup
(scripts/scale10x_increment.py), p_er_golden_record
(scripts/scale10x_golden.py).

Usage: python scripts/scale10x_r8.py [build|run]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_r8"
COPIES = 10

QUERIES = (
    "g11_knn_graph",
    "sim_mmr_rerank",
    "a26_dim_covariance",
)


def build():
    from replica_util import replicate_table

    os.makedirs(DST, exist_ok=True)
    replicate_table(SRC, DST, "embeddings", {"vec_id": 10**7}, COPIES)
    print("built", DST)


def run():
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.registry import registry
    from x8313_etl_spark.session import get_spark

    spark = get_spark("scale10x-r8", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        for name in QUERIES:
            clear_pool()  # cold pooled caches: measure each query's own build
            t0 = time.perf_counter()
            n = specs[name].fn(spark, sf_dir).count()
            print(
                f"{tag:6s} {name:22s} {time.perf_counter()-t0:7.2f}s  {n} rows",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    (build if mode == "build" else run)()
