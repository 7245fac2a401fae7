"""sim_ivf_multiprobe vs sim_ivf_topk: the recall dial must dial.

Both queries' own gates are their DuckDB twins (bucket choice included).
This test relates the two APPROXIMATIONS to ground truth: top-5 cosine
recall of nprobe=4 vs nprobe=1 against the exact scan over the same
probes. PERF.md records nprobe=1 recall = 0.19 on the isotropic fixture
(θ ≈ 66° pairs — the hardest regime for every bucketing scheme); probing
the 4 nearest centroid buckets must be STRICTLY better (it is a superset
of the nprobe=1 candidate set with more chances to contain true
neighbors), at a candidate cost bounded by NPROBE× the bucket volume.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from x8313_etl_spark.functions.vector import dot, norm
from x8313_etl_spark.io import load_table
from x8313_etl_spark.queries.similarity_q import _NPROBE, _TOP_K
from x8313_etl_spark.registry import registry


def _exact_topk(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "vnorm", norm(F.col("embedding"))
    )
    a = e.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pvec"),
        F.col("vnorm").alias("pnorm"),
    )
    b = e.select("vec_id", F.col("embedding").alias("xvec"),
                 F.col("vnorm").alias("xnorm"))
    cos = dot(F.col("pvec"), F.col("xvec")) / (F.col("pnorm") * F.col("xnorm"))
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        a.join(b, F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("probe_id", "vec_id")
    )


def test_multiprobe_recall_strictly_above_nprobe1(spark, sf_dir):
    reg = registry()
    exact = _exact_topk(spark, sf_dir).cache()
    n_exact = exact.count()
    assert n_exact > 0

    def recall(name):
        got = reg[name].fn(spark, sf_dir).select("probe_id", "vec_id")
        return got.join(exact, ["probe_id", "vec_id"], "semi").count() / n_exact

    r1 = recall("sim_ivf_topk")
    r4 = recall("sim_ivf_multiprobe")
    exact.unpersist()
    assert r4 > r1, f"nprobe=4 recall {r4:.3f} must beat nprobe=1 {r1:.3f}"
    assert r4 >= 0.3, f"nprobe=4 recall {r4:.3f} suspiciously low"


def test_multiprobe_candidates_superset_and_bounded(spark, sf_dir):
    """The nprobe=4 result per probe is at least as good as nprobe=1's
    on every probe (candidate superset ⇒ per-probe top-5 min cosine is
    ≥), and the probe fan-out is exactly ≤ NPROBE buckets per probe."""
    reg = registry()
    r1 = (
        reg["sim_ivf_topk"].fn(spark, sf_dir)
        .groupBy("probe_id")
        .agg(F.min("cos_sim").alias("worst1"), F.count(F.lit(1)).alias("k1"))
    )
    r4 = (
        reg["sim_ivf_multiprobe"].fn(spark, sf_dir)
        .groupBy("probe_id")
        .agg(
            F.min("cos_sim").alias("worst4"),
            F.countDistinct("cent_id").alias("n_buckets"),
            F.count(F.lit(1)).alias("k"),
        )
    )
    j = r1.join(r4, "probe_id").collect()
    assert j, "no probes compared"
    for row in j:
        if row.k1 == _TOP_K:
            # superset argument only holds when nprobe=1 already filled
            # its top-k; a short bucket's partial result may legitimately
            # have a higher min than nprobe=4's full top-k
            assert row.worst4 >= row.worst1 - 1e-12, row
        assert row.n_buckets <= _NPROBE, row
        assert row.k <= _TOP_K, row


def test_ivf_assign_pool_reuse_across_invocations(spark, sf_dir):
    """Two successive _ivf_assign calls must return the SAME pooled
    DataFrame object (r13 ADVICE): the pool hit requires sameSemantics
    over the pickled mapInPandas closure, whose numpy arrays are
    rebuilt per call — if serialized bytes ever differed, every call
    would silently unpersist/re-persist the shared assignment and the
    documented cross-consumer cache sharing would be gone."""
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.queries.similarity_q import _ivf_assign

    clear_pool(forget_ledger=False)
    a1 = _ivf_assign(spark, sf_dir)
    a2 = _ivf_assign(spark, sf_dir)
    assert a2 is a1, (
        "pool miss on an identical _ivf_assign invocation — the "
        "mapInPandas closure no longer pickles deterministically"
    )
