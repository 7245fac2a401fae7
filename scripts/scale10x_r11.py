"""10x scale spot-check for the round-11 registration batch (batch I)
members with a join/block candidate-volume term (the standing
invariant — it has caught a real quadratic or re-execution six rounds
running). All five were swept at authoring time (round 9, from the
since-retired tests/test_r11_candidates.py); this re-runs the
registered copies so the r11 PERF entry carries registration-dated
numbers:

- g13_local_clustering: the g3 wedge join (edges ⋈ edges ⋈ edges —
  Σ deg² candidate volume over the quantile-thresholded co-supply
  graph); authoring sweep measured 1.3× (the threshold keeps the graph
  sparse as lineitem grows).
- p_query_expansion: embeds the BM25 ranking (query-term semi-join
  pruned posting join) + a feedback-doc × corpus-tf join; authoring
  sweep 5.3→21.6 s — the BM25 corpus-explode law (4.1×: tf/df tables
  grow linearly, the feedback set stays queries×k).
- w18_event_paths: per-user lead window + path count — no pair term
  (swept to pin the law on record; expected ~linear in events).
- p_media_dedup / s23_csv_quoted_multiline: fixed-size file corpus /
  write-bound round-trip — no join volume term, exempt (the m12/span
  precedent).

Reuses the FK-consistent bench replica (scripts/scale10x_bench.py
build) — events/documents/embeddings are key-shifted 10x copies with
near-dup (not exact-dup) document texts.

Usage: python scripts/scale10x_bench.py build   # once per fixture regen
       python scripts/scale10x_r11.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_bench"


def run():
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.queries.corpus_q import p_query_expansion
    from x8313_etl_spark.queries.graph_q import g13_local_clustering
    from x8313_etl_spark.queries.windows import w18_event_paths
    from x8313_etl_spark.session import get_spark

    fns = {
        "g13_local_clustering": g13_local_clustering,
        "p_query_expansion": p_query_expansion,
        "w18_event_paths": w18_event_paths,
    }
    spark = get_spark("scale10x-r11", cpus=32)
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
