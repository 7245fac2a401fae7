"""A/B p_item_cf: current plan vs explicit-broadcast cnt joins (r10
verdict 'what's wrong' #3 — the named candidate lever) on a quiet host
at sf0.1. Run: python scripts/ab_itemcf.py"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from x8313_etl_spark.io import load_table  # noqa: E402
from x8313_etl_spark.operators.cachepool import swap_persist  # noqa: E402
from x8313_etl_spark.queries.pipeline_q import _CF_TOPK, p_item_cf  # noqa: E402
from x8313_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 3


def variant_broadcast(spark, sf_dir):
    """p_item_cf with the two post-explode cnt joins broadcast."""
    bi = swap_persist(
        "icf.bi.ab",
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct(),
    )
    cnt = bi.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = bi.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = bi.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("pa").alias("item"),
                    F.col("pb").alias("other"),
                    F.col("c_ab"),
                ),
                F.struct(
                    F.col("pb").alias("item"),
                    F.col("pa").alias("other"),
                    F.col("c_ab"),
                ),
            )
        ).alias("e")
    ).select("e.item", "e.other", "e.c_ab")
    j = sym.join(
        F.broadcast(
            cnt.select(F.col("l_partkey").alias("item"), F.col("c").alias("c_i"))
        ),
        "item",
    ).join(
        F.broadcast(
            cnt.select(F.col("l_partkey").alias("other"), F.col("c").alias("c_o"))
        ),
        "other",
    )
    score = (F.col("c_ab") * F.col("c_ab")).cast("double") / (
        F.col("c_i") * F.col("c_o")
    ).cast("double")
    rk = Window.partitionBy("item").orderBy(score.desc(), F.col("other"))
    return (
        j.withColumn("rn", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rn") <= _CF_TOPK)
        .select("item", "other", "c_ab", "c_i", "c_o", "rn")
    )


def _run(df):
    df.write.format("noop").mode("overwrite").save()


def time_fn(fn, spark):
    _run(fn(spark, SF_DIR))  # warm-up
    s = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        _run(fn(spark, SF_DIR))
        s.append(time.perf_counter() - t0)
    return statistics.median(s), s


def main():
    spark = get_spark("ab-itemcf", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    print("loadavg", os.getloadavg())
    cur, cs = time_fn(p_item_cf, spark)
    bc, bs = time_fn(variant_broadcast, spark)
    print(f"current   median={cur:.3f} samples={[round(x,3) for x in cs]}")
    print(f"broadcast median={bc:.3f} samples={[round(x,3) for x in bs]}")
    # value-equality spot check
    a = sorted(map(tuple, p_item_cf(spark, SF_DIR).collect()))
    b = sorted(map(tuple, variant_broadcast(spark, SF_DIR).collect()))
    print("identical:", a == b, "rows:", len(a), len(b))
    spark.stop()


if __name__ == "__main__":
    main()


def variant_combos(spark, sf_dir):
    """Baskets grouped once; a<b pairs generated map-side from the
    sorted item array (no basket self-join shuffle)."""
    baskets = swap_persist(
        "icf.baskets.ab",
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("items")),
    )
    cnt = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pair_expr = F.expr(
        "flatten(transform(items, (x, i) -> "
        "transform(slice(items, i + 2, size(items)), y -> struct(x AS pa, y AS pb))))"
    )
    pairs = (
        baskets.select(F.explode(pair_expr).alias("p"))
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("pa").alias("item"), F.col("pb").alias("other"), F.col("c_ab")),
                F.struct(F.col("pb").alias("item"), F.col("pa").alias("other"), F.col("c_ab")),
            )
        ).alias("e")
    ).select("e.item", "e.other", "e.c_ab")
    j = sym.join(
        F.broadcast(cnt.select(F.col("item"), F.col("c").alias("c_i"))), "item"
    ).join(
        F.broadcast(cnt.select(F.col("item").alias("other"), F.col("c").alias("c_o"))),
        "other",
    )
    score = (F.col("c_ab") * F.col("c_ab")).cast("double") / (
        F.col("c_i") * F.col("c_o")
    ).cast("double")
    rk = Window.partitionBy("item").orderBy(score.desc(), F.col("other"))
    return (
        j.withColumn("rn", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rn") <= _CF_TOPK)
        .select("item", "other", "c_ab", "c_i", "c_o", "rn")
    )


def main2():
    spark = get_spark("ab-itemcf", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    print("loadavg", os.getloadavg())
    cur, cs = time_fn(p_item_cf, spark)
    cb, cbs = time_fn(variant_combos, spark)
    print(f"current median={cur:.3f} samples={[round(x,3) for x in cs]}")
    print(f"combos  median={cb:.3f} samples={[round(x,3) for x in cbs]}")
    a = sorted(map(tuple, p_item_cf(spark, SF_DIR).collect()))
    b = sorted(map(tuple, variant_combos(spark, SF_DIR).collect()))
    print("identical:", a == b, "rows:", len(a), len(b))
    spark.stop()
