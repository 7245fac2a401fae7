"""10x scale spot-check for the ER golden-record candidate.

Reuses the part x10 replica from scale10x_r6.py (partkey shifted by
10^7, a multiple of the %10 probe modulus): probes, blocks, and match
edges all grow 10x over the SAME 64-name vocabulary, so clusters grow
10x in membership while the interned fuzzy core stays
vocabulary-bounded. Expected growth: ~linear — the survivorship
aggregates are one shuffle over members, and concomp's rounds are set
by cluster DIAMETER (stars through the min-key representative, ~2
hops), not cluster size.

Usage: python scripts/scale10x_r6.py build   # if the replica is absent
       python scripts/scale10x_golden.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scratch/replica10x_r6"


def golden(spark, sf_dir):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from x8313_etl_spark.io import load_table
    from x8313_etl_spark.operators.concomp import connected_components
    from x8313_etl_spark.queries.pipeline_q import p_er_blocked_match

    part = load_table(spark, sf_dir, "part")
    m = p_er_blocked_match(spark, sf_dir)
    edges = m.select(F.col("probe_id").alias("src"), F.col("cand_id").alias("dst"))
    labels = connected_components(
        part.select(F.col("p_partkey").alias("node")),
        edges,
        ledger_key="sweep.golden.concomp",
    )
    mem = part.join(labels, part.p_partkey == labels.node).drop("node")
    base = mem.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.max(F.round(F.col("p_retailprice") * 100).cast("bigint")).alias(
            "retail_cents_max"
        ),
        F.min("p_size").alias("size_min"),
    )
    gname = part.select(
        F.col("p_partkey").alias("component"), F.col("p_name").alias("golden_name")
    )
    wb = Window.partitionBy("component").orderBy(F.col("cnt").desc(), F.col("p_brand"))
    bmode = (
        mem.groupBy("component", "p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("component", F.col("p_brand").alias("brand_mode"))
    )
    return base.join(gname, "component").join(bmode, "component")


def run():
    import pyspark.sql.functions as F

    from x8313_etl_spark.session import get_spark

    spark = get_spark("scale10x-golden", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "10x")):
        t0 = time.perf_counter()
        out = golden(spark, sf_dir).persist()
        n = out.count()
        multi = out.filter(F.col("n_members") > 1).count()
        print(
            f"{tag:6s} p_er_golden_record {time.perf_counter()-t0:7.2f}s  "
            f"{n} golden records, {multi} multi-member clusters"
        )
        out.unpersist()
    spark.stop()


if __name__ == "__main__":
    run()
