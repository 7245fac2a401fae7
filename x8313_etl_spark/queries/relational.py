"""Projection / filter / predicate / sort / limit operators (SURVEY.md §2.2, §2.6).

P1-P9 and O1-O3. Sort-order semantics (O1-O3) are embedded into row
*values* via row_number over the same total order, because the driver's
value-hash is order-insensitive; every order is made total with a
unique-key tiebreaker (SURVEY.md §7 risk #5).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load_table
from ..operators.dedup import keep_first
from ..registry import register


@register(
    "p1_project_computed",
    category="projection",
    oracle="""
SELECT o_orderkey AS key,
       o_totalprice,
       o_totalprice * 1.07 AS with_tax,
       o_orderpriority AS priority
FROM orders
""",
)
def p1_project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: select / alias / computed column (double multiply is IEEE-exact)."""
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice"),
        (F.col("o_totalprice") * 1.07).alias("with_tax"),
        F.col("o_orderpriority").alias("priority"),
    )


@register(
    "p2_drop_columns",
    category="projection",
    oracle="SELECT c_custkey, c_nationkey, c_mktsegment FROM customer",
)
def p2_drop_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: drop columns (Catalyst prunes them out of the scan)."""
    return load_table(spark, sf_dir, "customer").drop("c_name", "c_acctbal")


@register(
    "p3_cast",
    category="projection",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       CAST(l_linenumber AS BIGINT) AS lineno_big,
       CAST(l_shipdate AS DATE) AS ship_date,
       CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS qty_fixed,
       CAST(l_returnflag = 'R' AS BOOLEAN) AS returned
FROM lineitem
""",
)
def p3_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: cast family. double→int is deliberately absent: Spark truncates
    while DuckDB rounds, so that cast can never be oracle-checked; the
    engine exposes it but via explicit floor()/round() composition."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_linenumber").cast("bigint").alias("lineno_big"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_quantity").cast("decimal(12,2)").cast("double").alias("qty_fixed"),
        (F.col("l_returnflag") == "R").cast("boolean").alias("returned"),
    )


@register(
    "p4_predicates",
    category="filter",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus
FROM lineitem
WHERE (l_returnflag = 'R' OR l_linestatus = 'F')
  AND l_quantity > 30
  AND NOT (l_discount < 0.02)
  AND l_tax <> 0.0
""",
)
def p4_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: comparison + boolean connectives; all pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    pred = (
        ((F.col("l_returnflag") == "R") | (F.col("l_linestatus") == "F"))
        & (F.col("l_quantity") > 30)
        & ~(F.col("l_discount") < 0.02)
        & (F.col("l_tax") != 0.0)
    )
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag", "l_linestatus",
    )


@register(
    "p5_in_between",
    category="filter",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_totalprice BETWEEN 10000 AND 150000
""",
)
def p5_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: IN-list membership and BETWEEN range (both scan-pushable)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(10000, 150000)
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@register(
    "p6_like_rlike",
    category="filter",
    oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_name LIKE '%red%'
  AND p_name NOT LIKE 'small%'
  AND regexp_matches(p_type, '^(ECONOMY|PROMO|LARGE)$')
""",
)
def p6_like_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: LIKE / NOT LIKE / regexp predicate."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%red%")
        & ~F.col("p_name").like("small%")
        & F.col("p_type").rlike("^(ECONOMY|PROMO|LARGE)$")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "p7_null_semantics",
    category="filter",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       NULLIF(l_discount, 0.0) AS disc_n,
       NULLIF(l_discount, 0.0) IS NULL AS is_free,
       NULLIF(l_discount, 0.0) IS NOT DISTINCT FROM NULLIF(l_tax, 0.0) AS same_rate,
       COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_filled
FROM lineitem
""",
)
def p7_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: IS NULL / null-safe equality / COALESCE (nulls induced via NULLIF
    since the fixtures are null-free)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_n = F.nullif(F.col("l_discount"), F.lit(0.0))
    tax_n = F.nullif(F.col("l_tax"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_n.alias("disc_n"),
        disc_n.isNull().alias("is_free"),
        disc_n.eqNullSafe(tax_n).alias("same_rate"),
        F.coalesce(disc_n, F.lit(-1.0)).alias("disc_filled"),
    )


@register(
    "p8_distinct",
    category="filter",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def p8_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: distinct — a hash aggregate on all projected columns."""
    return load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment"
    ).distinct()


@register(
    "p9_drop_duplicates",
    category="dedup",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate
FROM orders
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
""",
)
def p9_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: order-pinned dropDuplicates — first order per customer by
    (orderdate, orderkey). See operators/dedup.py for why bare
    dropDuplicates is unusable under an oracle."""
    o = load_table(spark, sf_dir, "orders")
    first = keep_first(o, ["o_custkey"], [F.col("o_orderdate"), F.col("o_orderkey")])
    return first.select("o_custkey", "o_orderkey", "o_orderdate")


@register(
    "o1_multikey_sort",
    category="sort",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal,
       ROW_NUMBER() OVER (
         ORDER BY (CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END)
                  DESC NULLS LAST,
                  c_custkey
       ) AS rn
FROM customer
""",
)
def o1_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: multi-key sort with DESC NULLS LAST, order embedded as rank.
    The rank uses the TWO-PHASE global row number
    (operators/globalrank.py) — the original unpartitioned
    ``Window.orderBy`` planned an Exchange SinglePartition over every
    customer row, the all-to-one shape the repo-wide shuffle audit
    exists to catch; range-exchange + local rank + broadcast offsets
    computes the identical rank with no all-to-one stage. The final
    orderBy is the operator's own semantics (range exchange)."""
    from ..operators.globalrank import with_global_rank
    from ..session import default_parallelism

    c = load_table(spark, sf_dir, "customer")
    bal = F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    ranked = with_global_rank(
        c.select("c_custkey", bal.alias("bal")),
        [F.col("bal").desc_nulls_last(), F.col("c_custkey")],
        default_parallelism(),
        key="relational.o1_ranked",
    )
    return ranked.select(
        "c_custkey", "bal", (F.col("rn") + 1).cast("int").alias("rn")
    ).orderBy(F.col("bal").desc_nulls_last(), "c_custkey")


@register(
    "o2_limit_offset",
    category="sort",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_orderkey
LIMIT 25 OFFSET 100
""",
)
def o2_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: pagination over a total order (orderkey is unique)."""
    o = load_table(spark, sf_dir, "orders")
    return o.orderBy("o_orderkey").select("o_orderkey", "o_totalprice").offset(100).limit(25)


@register(
    "o3_global_topk",
    category="sort",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15
""",
)
def o3_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: global top-k → TakeOrderedAndProject (per-partition heap, no
    full sort; verified in plan-shape tests)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(15)
    )


@register(
    "o4_global_sorted_write",
    category="sort",
    oracle="""
SELECT fileno, o_orderkey, o_totalprice
FROM (
  SELECT o_orderkey, o_totalprice,
         NTILE(8) OVER (ORDER BY o_totalprice, o_orderkey) AS fileno
  FROM orders
)
""",
)
def o4_global_sorted_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: TOTALLY-ORDERED output files — the terasort shape. A plain
    ``orderBy().write`` already yields range-partitioned sorted files,
    but silently: nothing pins which rows land in which file. Here the
    range boundaries are made EXPLICIT (exact per-file row quotas à la
    NTILE, computed from a rank — deterministic because the sort key
    (o_totalprice, o_orderkey) is total), the files are written sorted
    via repartitionByRange on the file number + sortWithinPartitions,
    and the read-back is verified file-by-file against the NTILE twin —
    i.e. the oracle checks the FILE ASSIGNMENT, not just the row set.

    Scale: the global rank is computed in TWO PHASES so no stage is
    all-to-one — a naive row_number() over an unpartitioned window
    would funnel every row through a single task, the exact 100 TB
    failure this operator exists to avoid. Phase 1 range-partitions on
    the sort key (Spark's sampled boundaries — they decide only WHERE
    rows sit, never the rank) and ranks locally per partition; phase 2
    broadcasts the per-partition row counts (one tiny bounded-row agg)
    back as cumulative offsets, so global rank = offset + local rank.
    The only single-partition window runs over the per-PARTITION count
    table — bounded by the partition count at any data size (h15's
    bounded-window argument). The write is n_files parallel sorted
    streams; at 100 TB you raise both partition and file counts.

    Spark-vs-classic note: Spark's own orderBy().write uses SAMPLED
    range boundaries (RangePartitioner), which are not reproducible
    across engines — the exact-quota NTILE formulation computed ON the
    rank is what makes the file layout deterministic and
    oracle-checkable while still using the sampled exchange for
    balance."""
    import shutil

    from .sources_q import scratch, _tag

    n_files = 8
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # two-phase global rank (operators/globalrank.py — factored from
    # this query): range-exchange + local rank, bounded-count offsets
    # broadcast back; persisted via the keyed pool because both the
    # counts branch and the rank branch consume the ranked table
    from ..operators.globalrank import with_global_rank

    ranked = with_global_rank(
        o,
        [F.col("o_totalprice"), F.col("o_orderkey")],
        n_files * 4,
        key="relational.o4_ranked",
        count_col="cnt",
    )
    # exact NTILE quotas in-plan: first (cnt % n) files get ceil, rest floor
    base = F.floor(F.col("cnt") / n_files)
    extra = F.col("cnt") % n_files
    fileno = F.when(
        F.col("rn") < (base + 1) * extra,
        F.floor(F.col("rn") / (base + 1)) + 1,
    ).otherwise(
        extra + F.floor((F.col("rn") - (base + 1) * extra) / base) + 1
    ).cast("int")
    assigned = ranked.select(
        fileno.alias("fileno"), "o_orderkey", "o_totalprice"
    )
    path = scratch(f"o4_sorted_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    (
        assigned.repartitionByRange(n_files, "fileno")
        .sortWithinPartitions("fileno", "o_totalprice", "o_orderkey")
        .write.partitionBy("fileno")
        .parquet(path)
    )
    return spark.read.schema(
        "o_orderkey long, o_totalprice double, fileno int"
    ).parquet(path).select("fileno", "o_orderkey", "o_totalprice")
