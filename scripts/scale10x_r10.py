"""10x scale spot-check for the round-10 registration batch members
with a join/block candidate-volume term (the standing invariant — it
has caught a real quadratic or re-execution six rounds running). The
C/D/H candidates were all swept at authoring time (r7–r9, from the
since-retired candidate test modules); this re-runs the registered
copies so the r10 PERF entry carries registration-dated numbers:

- p_item_cf: basket self-join — Σ basket² pair volume (the r10 watch
  item per the r9 verdict). Baskets are order-bounded (≤7 lineitems),
  so the term is linear in orders; authoring sweep measured 3.1×.
- g12_node_jaccard: wedge join (Σ deg² over the thresholded co-supply
  graph), top-k output contract — authoring sweep measured linear wall
  in wedge volume after the top-k rework (all-pairs form was n² OUTPUT
  and was rejected).
- p_shingle_containment: posting self-join (Σ df²) — authoring sweep
  6.4 s → 435 s decomposed as a 979× OUTPUT-density artifact (near-dup
  replica: every 10-copy group mutually contains) with per-row wall
  IMPROVING 14×; documented in the registered docstring.
- p_embed_outliers: composes the already-swept kmeans loop with a
  cid-keyed window — no new join volume term; authoring sweep linear.
- m11_incremental_view_maintenance: delta-sized aggregates + MV-sized
  merge — expected ~linear in the scan (no pair term; swept to pin the
  law on record).

Reuses the FK-consistent bench replica (scripts/scale10x_bench.py
build) — events/documents/embeddings are key-shifted 10x copies with
near-dup (not exact-dup) document texts.

Usage: python scripts/scale10x_bench.py build   # once per fixture regen
       python scripts/scale10x_r10.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_bench"


def run():
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.queries.etl_q import m11_incremental_view_maintenance
    from x8313_etl_spark.queries.graph_q import g12_node_jaccard
    from x8313_etl_spark.queries.pipeline_q import (
        p_item_cf,
        p_shingle_containment,
    )
    from x8313_etl_spark.queries.similarity_q import p_embed_outliers
    from x8313_etl_spark.session import get_spark

    fns = {
        "p_item_cf": p_item_cf,
        "g12_node_jaccard": g12_node_jaccard,
        "p_shingle_containment": p_shingle_containment,
        "p_embed_outliers": p_embed_outliers,
        "m11_ivm": m11_incremental_view_maintenance,
    }
    spark = get_spark("scale10x-r10", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        for name, fn in fns.items():
            clear_pool()  # cold pooled caches: measure each query's own build
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            print(
                f"{tag:6s} {name:24s} {time.perf_counter()-t0:7.2f}s  {n} rows",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    run()
