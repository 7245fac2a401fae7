"""10x scale spot-check for the round-12 registration batch (batch J)
members with a join/block candidate-volume term (the standing
invariant — real catches seven rounds running), plus the reworked
p_query_expansion (r12: feedback-vocabulary df prune replaced the
full-vocab broadcast — the law should stay the BM25 corpus-explode
shape, re-measured on record):

- sim_radius_neighbors: bucket self-join over the IVF assignment —
  Σ bucket² candidate volume (the sim_ivf_topk family's term); probes
  are a fixed 1/25 slice so the pair term grows ~quadratically in
  bucket size but buckets stay corpus/K-sized.
- dq8_freshness: per-key lag table + two-phase global rank — expected
  ~linear in events (swept to pin the law on record; the rank's
  count-table stage is partition-bounded, not data-bounded).
- ts_changepoint: one per-series ordered window over events + a
  WindowGroupLimit argmax — expected ~linear (pinned on record).
- a27_weighted_median / p_systematic_sample: groupBy + bounded
  per-group/per-source windows over lineitem/documents — linear
  map-side-combine shapes, exempt from the pair-term concern but swept
  once here for the registration-dated law.
- p_query_expansion (rework re-sweep, r11 verdict item 2).

Reuses the FK-consistent bench replica (scripts/scale10x_bench.py
build) — events/documents/embeddings are key-shifted 10x copies with
near-dup (not exact-dup) document texts.

Usage: python scripts/scale10x_bench.py build   # once per fixture regen
       python scripts/scale10x_r12.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_bench"


def run():
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.queries.aggregates import a27_weighted_median
    from x8313_etl_spark.queries.corpus_q import p_query_expansion
    from x8313_etl_spark.queries.etl_q import dq8_freshness
    from x8313_etl_spark.queries.pipeline_q import p_systematic_sample
    from x8313_etl_spark.queries.similarity_q import sim_radius_neighbors
    from x8313_etl_spark.queries.timeseries_q import ts_changepoint

    fns = {
        "sim_radius_neighbors": sim_radius_neighbors,
        "dq8_freshness": dq8_freshness,
        "ts_changepoint": ts_changepoint,
        "a27_weighted_median": a27_weighted_median,
        "p_systematic_sample": p_systematic_sample,
        "p_query_expansion": p_query_expansion,
    }
    from x8313_etl_spark.session import get_spark

    spark = get_spark("scale10x-r12", cpus=32)
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
