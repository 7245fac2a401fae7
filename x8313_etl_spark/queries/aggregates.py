"""Aggregation operators (SURVEY.md §2.4, A1-A12).

All double sums/averages use the decimal-trick (functions/numeric.py)
so partial-agg order can't perturb the oracle hash. Everything here is
map-side partial-aggregated by Catalyst before the single shuffle on
the grouping key (A12 is a plan property, asserted in plan tests).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.numeric import davg, dsum, sql_davg, sql_dsum
from ..io import load_table
from ..registry import register


@register(
    "a1_groupby_basic",
    category="aggregation",
    bench=True,
    oracle=f"""
SELECT l_returnflag,
       l_linestatus,
       COUNT(*) AS cnt,
       {sql_dsum('l_quantity')} AS sum_qty,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       {sql_davg('l_discount')} AS avg_disc
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def a1_groupby_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: hash group-by with count/sum/min/max/avg."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("l_quantity").alias("sum_qty"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            davg("l_discount").alias("avg_disc"),
        )
    )


@register(
    "a2_global_agg",
    category="aggregation",
    oracle=f"""
SELECT COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       {sql_dsum('o_totalprice')} AS total_sales,
       {sql_davg('o_totalprice')} AS avg_sale,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders
""",
)
def a2_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: keyless (whole-table) aggregation."""
    return load_table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        dsum("o_totalprice").alias("total_sales"),
        davg("o_totalprice").alias("avg_sale"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@register(
    "a3_count_distinct",
    category="aggregation",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       COUNT(DISTINCT o_custkey) AS uniq_customers,
       COUNT(DISTINCT o_orderpriority) AS uniq_priorities,
       COUNT(*) AS n
FROM orders
GROUP BY 1
""",
)
def a3_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: exact distinct counts per group (expands to a two-phase agg)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(
            F.countDistinct("o_custkey").alias("uniq_customers"),
            F.countDistinct("o_orderpriority").alias("uniq_priorities"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "a4_approx_count_distinct",
    category="aggregation",
    oracle=None,  # HLL sketch: rows-only; accuracy bounded in unit tests
)
def a4_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: HyperLogLog++ distinct-count sketch — the 100 TB path where
    exact distinct (a full shuffle of the keys) is too expensive."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
    )


@register(
    "a5_conditional_agg",
    category="aggregation",
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
       {sql_dsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END")} AS urgent_sales,
       (CAST(SUM(CAST((CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN o_totalprice END) AS DECIMAL(25,6))) AS DOUBLE)
        / COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END)) AS avg_hipri
FROM orders
GROUP BY o_orderstatus
""",
)
def a5_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: filtered/conditional aggregation (CASE-guarded sums, count_if).

    Note `avg_hipri`: the CASE has no ELSE → nulls are excluded from both
    the sum and the count, matching SQL FILTER semantics.
    """
    o = load_table(spark, sf_dir, "orders")
    hipri = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.col("o_totalprice")
    )
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")).otherwise(0.0)
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        dsum(urgent).alias("urgent_sales"),
        (F.sum(hipri.cast("decimal(25,6)")).cast("double") / F.count(hipri)).alias("avg_hipri"),
    )
