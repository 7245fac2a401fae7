"""10x scale spot-check for the round-13 registration batches (batch K
minus the g14 duplicate plus the batch-M substitution, AND batch L
under the raised ≤10 budget) — the standing registration-dated
growth-law invariant:

- p_dedup_recall_eval: the instrument's exact posting self-join is
  Σ df² BY DESIGN (it measures the banding against exact Jaccard — on
  a 100 TB corpus it runs on a sample); the banded candidate side is
  Σ bucket². Swept to pin BOTH terms on record.
- w19_rfm_cells: three two-phase global ranks over the per-customer
  aggregate — expected ~linear in orders.
- p_budget_allocation: source-sized allocation + per-source pick rank
  — expected ~linear in documents.
- p_span_corruption: map-only explode — expected ~linear (no shuffle).
- m12_dynamic_partition_overwrite: write-bound; swept for the record.
- p_hard_negatives: Σ anchor-bucket candidate volume (the IVF law);
  with the registration-time anchor cap the anchor side is FLAT and
  only bucket sizes grow with the corpus.
- ts_anomaly_mad / w20_position_attribution: series-/user-keyed
  windows — expected ~linear in events.
- dq9_fd_audit: key-cardinality aggregates; s24 write-bound (no pair
  term — swept once for the record).
- ALSO re-measured here: the three r13 probe-CAP queries
  (sim_ivf_topk / sim_ivf_multiprobe / sim_radius_neighbors) — with
  the fixed absolute probe budget the probe side must now be FLAT
  across 10x while the bucket term stays Σ bucket².

Reuses the FK-consistent bench replica (scripts/scale10x_bench.py
build) — events/documents/embeddings are key-shifted 10x copies with
near-dup (not exact-dup) document texts.

Usage: python scripts/scale10x_bench.py build   # once per fixture regen
       python scripts/scale10x_r13.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_bench"


def run():
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.queries.etl_q import (
        dq9_fd_audit,
        m12_dynamic_partition_overwrite,
    )
    from x8313_etl_spark.queries.pipeline_q import (
        p_budget_allocation,
        p_dedup_recall_eval,
        p_hard_negatives,
        p_span_corruption,
    )
    from x8313_etl_spark.queries.similarity_q import (
        sim_ivf_multiprobe,
        sim_ivf_topk,
        sim_radius_neighbors,
    )
    from x8313_etl_spark.queries.sources_q import s24_nested_json_roundtrip
    from x8313_etl_spark.queries.timeseries_q import ts_anomaly_mad
    from x8313_etl_spark.queries.windows import (
        w19_rfm_cells,
        w20_position_attribution,
    )

    fns = {
        "p_dedup_recall_eval": p_dedup_recall_eval,
        "w19_rfm_cells": w19_rfm_cells,
        "p_budget_allocation": p_budget_allocation,
        "p_span_corruption": p_span_corruption,
        "m12_dynamic_partition_overwrite": m12_dynamic_partition_overwrite,
        "p_hard_negatives": p_hard_negatives,
        "w20_position_attribution": w20_position_attribution,
        "dq9_fd_audit": dq9_fd_audit,
        "ts_anomaly_mad": ts_anomaly_mad,
        "s24_nested_json_roundtrip": s24_nested_json_roundtrip,
        "sim_ivf_topk": sim_ivf_topk,
        "sim_ivf_multiprobe": sim_ivf_multiprobe,
        "sim_radius_neighbors": sim_radius_neighbors,
    }
    from x8313_etl_spark.session import get_spark

    spark = get_spark("scale10x-r13", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        for name, fn in fns.items():
            clear_pool()  # cold pooled caches: measure each query's own build
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            print(
                f"{tag:6s} {name:32s} {time.perf_counter()-t0:7.2f}s  {n} rows",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    run()
