"""10x scale spot-check for the round-8 candidates with join/block
candidate-volume terms (the standing pre-registration invariant):

- g12_node_jaccard: wedge join — Σ deg² over the quantile-thresholded
  co-supply graph. THE SWEEP'S CATCH (round 7, the p_er lesson
  repeating): the all-pairs form measured 499,500 output rows at
  sf0.1 — C(1000,2), i.e. EVERY supplier pair was a wedge pair on the
  dense co-supply graph (n² OUTPUT, 22.7 s → 137 s / 4.995 M rows at
  10x). Reworked to TOP-K per node before any registration: output is
  now k·|V| (5,000 → 50,000 rows, linear) and wall tracks wedge
  volume linearly (33 s → 266 s for ~10x wedges — each replica copy
  is its own equally-dense component).
- p_shingle_containment: inverted-index posting self-join — Σ df² over
  shingle dfs; the bench replica's documents are NEAR-duplicated
  (per-copy prefix token). Measured 6.4 s → 435 s, which decomposes as
  an OUTPUT-DENSITY artifact (512 → 501,200 qualifying pairs, 979× —
  every 10-copy near-dup group mutually contains) with wall per
  output row IMPROVING 14× (12.5 ms → 0.87 ms) — the sim_lsh_neardup
  artifact class, documented in the candidate docstring with the
  production dials (df cap / containment prefix filter).
- p_embed_outliers composes the already-swept kmeans loop
  (scripts/scale10x_kmeans.py) with a cid-keyed window — no new join
  volume term; measured 5.3 s → 10.2 s for 10x vectors (linear).

Reuses the FK-consistent bench replica directory
(scripts/scale10x_bench.py build) rather than building another copy.

Usage: python scripts/scale10x_bench.py build   # once
       python scripts/scale10x_r8cand.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_bench"


def run():
    # the candidate fns were registered in round 10 (candidate module
    # retired per protocol); the registered copies are verbatim, so the
    # historical sweep re-runs against them — scripts/scale10x_r10.py
    # is the registration-dated re-measurement
    from x8313_etl_spark.queries.graph_q import g12_node_jaccard
    from x8313_etl_spark.queries.pipeline_q import p_shingle_containment
    from x8313_etl_spark.queries.similarity_q import p_embed_outliers
    from x8313_etl_spark.session import get_spark

    fns = {
        "g12_node_jaccard": g12_node_jaccard,
        "p_shingle_containment": p_shingle_containment,
        "p_embed_outliers": p_embed_outliers,
    }
    spark = get_spark("scale10x-r8cand", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            print(
                f"{tag:6s} {name:24s} {time.perf_counter()-t0:7.2f}s  {n} rows",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    run()
