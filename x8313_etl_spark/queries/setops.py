"""Set operations (SURVEY.md §2.7, U1-U5)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem")


@register(
    "u1_union_all",
    category="setops",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem WHERE l_quantity > 45
UNION ALL
SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem WHERE l_discount > 0.08
""",
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: positional bag union (overlapping inputs kept twice)."""
    li = _li(spark, sf_dir)
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_discount"]
    a = li.filter(F.col("l_quantity") > 45).select(*cols)
    b = li.filter(F.col("l_discount") > 0.08).select(*cols)
    return a.union(b)


@register(
    "u2_union_by_name",
    category="setops",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
UNION ALL BY NAME
SELECT o_totalprice, o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
""",
)
def u2_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: schema-aligned union with missing-column null fill (ETL staple
    for evolving schemas)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_totalprice")
    b = o.filter(F.col("o_orderstatus") == "O").select(
        "o_totalprice", "o_orderkey", "o_orderpriority"
    )
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "u3_union_distinct",
    category="setops",
    oracle="""
SELECT c_nationkey AS nk FROM customer
UNION
SELECT s_nationkey AS nk FROM supplier
""",
)
def u3_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: set union (union + distinct)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@register(
    "u4_intersect_all",
    category="setops",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
INTERSECT ALL
SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
""",
)
def u4_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: bag intersection (multiplicity = min of the two sides)."""
    li = _li(spark, sf_dir)
    a = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    b = li.filter(F.col("l_linestatus") == "F").select("l_partkey")
    return a.intersectAll(b)


@register(
    "u5_except_all",
    category="setops",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
EXCEPT ALL
SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F'
""",
)
def u5_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5: bag difference (multiplicity-aware)."""
    li = _li(spark, sf_dir)
    a = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    b = li.filter(F.col("l_linestatus") == "F").select("l_partkey")
    return a.exceptAll(b)
