"""sim_pq_topk vs the exact scan: recall bound.

The registered query's own gate is its DuckDB twin (exact ADC algebra).
This test relates the APPROXIMATION to ground truth: PQ top-5 against
the exact L2 top-5 over the same probes. On the fixture's isotropic
random vectors PQ is at its theoretical worst (quantization error ≈
data variance — there is no block structure to compress), measured
recall@5 = 0.13; chance overlap for top-5 of ~500 candidates is ~0.01.
The floor asserts PQ stays well above chance (≥ 5×), so a broken
codebook/ADC pipeline (which collapses to chance) trips, while the
fixture's inherent hardness does not.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from x8313_etl_spark.io import load_table
from x8313_etl_spark.queries.similarity_q import _PQ_PROBE_MOD, _PQ_TOPK
from x8313_etl_spark.registry import registry


def test_pq_recall_beats_chance(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    a = e.filter(F.col("vec_id") % _PQ_PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pa")
    )
    b = e.select(F.col("vec_id").alias("vec_id"), F.col("embedding").alias("pb"))
    d2 = F.aggregate(
        F.zip_with(
            "pa",
            "pb",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("probe_id").orderBy("d2", "vec_id")
    exact = (
        a.join(b, F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PQ_TOPK)
        .select("probe_id", "vec_id")
    )
    pq = registry()["sim_pq_topk"].fn(spark, sf_dir).select("probe_id", "vec_id")
    n_exact = exact.count()
    hit = pq.join(exact, ["probe_id", "vec_id"], "semi").count()
    assert n_exact > 0
    recall = hit / n_exact
    assert recall >= 0.05, (
        f"PQ recall@{_PQ_TOPK} = {recall:.2f} — at/below chance (~0.01), "
        "codebook or ADC pipeline is broken"
    )
