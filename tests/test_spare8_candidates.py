"""Pre-registration oracle checks — round-13-authored candidate batch Z
(spare capacity, third restock batch after X and Y — API/function
surface fill for the corners the operator-level batches don't touch).

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0 — including the int128 oracle-type gate and
the strict int-vs-float transport dtype check) on an ad-hoc
UNREGISTERED QuerySpec, so a future round's registration is a verbatim
fn+oracle copy. Twins verify at BOTH fixture sfs. ROADMAP.md
"Candidate surface" carries the registration notes.

Batch Z members:
- a29_bit_bool_aggs: the bitwise/boolean aggregate surface (BIT_AND /
  BIT_OR / BIT_XOR / BOOL_AND / BOOL_OR per nation) the A-family's
  numeric rows don't exercise — all exact integers/booleans.
- g19_degree_histogram: log₂-bucketed degree distribution of the
  supplier↔customer graph — THE graph-datasheet profiling op; the
  bucket is the MSB position via length(bin(deg)), which is exact
  integer string length in BOTH engines (log2() itself is a libm call
  with no cross-engine rounding guarantee — deliberately avoided).
- s26_csv_custom_delims: CSV round-trip with a custom delimiter AND
  an explicit nullValue marker, with REAL nulls in the data — without
  the marker, NULL vs empty-string is ambiguous on re-read (the
  remaining CSV-dialect knob after s3/s18/s23).
- u6_symmetric_difference: (A EXCEPT ALL B) ∪ (B EXCEPT ALL A) with
  multiset semantics — the set-op family's missing row after u1–u5.
- x15_pandas_window_udf: an Arrow-batched GROUPED_AGG pandas UDF
  evaluated OVER a bounded window frame — the one pandas-UDF
  execution surface (PandasUDF WindowAgg) x1–x14 don't cover; the
  sum is int64-exact so the SQL twin is the plain window SUM.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from x8313_etl_spark import audit
from x8313_etl_spark.io import load_table
from x8313_etl_spark.registry import QuerySpec

from .oracle_utils import compare_query


@pytest.fixture(autouse=True, scope="module")
def _scrub_ledger_keys():
    before = set(audit.ledger())
    yield
    for key in set(audit.ledger()) - before:
        audit.forget(key)


# ---------------------------------------------------------------------------
# a29_bit_bool_aggs — bitwise/boolean aggregate surface
# ---------------------------------------------------------------------------


def _bitbool_fn(spark, sf_dir):
    """Bitwise/boolean aggregates per nation over customer: BIT_AND /
    BIT_OR / BIT_XOR of the account-balance cents (exact int64 lattice
    ops — order-insensitive, so engine-exact by construction) and
    BOOL_AND / BOOL_OR of a positive-balance predicate. The aggregate
    surface row next to a8's numeric statistics; one map-side-combined
    groupBy at any scale."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("bigint").alias("nation"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    return c.groupBy("nation").agg(
        F.bit_and("cents").alias("band"),
        F.bit_or("cents").alias("bor"),
        F.bit_xor("cents").alias("bxor"),
        F.bool_and(F.col("cents") > 0).alias("all_positive"),
        F.bool_or(F.col("cents") > 0).alias("any_positive"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


_BITBOOL_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS nation,
       CAST(BIT_AND(cents) AS BIGINT) AS band,
       CAST(BIT_OR(cents) AS BIGINT) AS bor,
       CAST(BIT_XOR(cents) AS BIGINT) AS bxor,
       BOOL_AND(cents > 0) AS all_positive,
       BOOL_OR(cents > 0) AS any_positive,
       CAST(count(*) AS BIGINT) AS n
FROM (SELECT c_nationkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer)
GROUP BY c_nationkey
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_a29_bit_bool_aggs_twin(spark, d):
    spec = QuerySpec(
        name="rZ:a29_bit_bool_aggs", fn=_bitbool_fn, oracle=_BITBOOL_SQL,
        category="aggregates",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_a29_lattice_identities_hold(spark, sf_oracle_dir):
    """Per group: band must be a submask of bor (AND ⊆ OR), and the
    boolean pair must be consistent (all ⇒ any); at least one group
    must have mixed signs so BOOL_AND ≠ BOOL_OR somewhere."""
    rows = _bitbool_fn(spark, sf_oracle_dir).collect()
    assert rows
    for r in rows:
        assert r.band & r.bor == r.band
        assert (not r.all_positive) or r.any_positive
    assert any(r.any_positive and not r.all_positive for r in rows)


# ---------------------------------------------------------------------------
# g19_degree_histogram — exact MSB-bucketed degree distribution
# ---------------------------------------------------------------------------


def _deghist_fn(spark, sf_dir):
    """Log₂-bucketed degree distribution of the symmetric supplier↔
    customer graph — the first chart of any graph datasheet. The
    bucket is the MSB position computed as length(bin(deg)): exact
    integer string length in both engines, deliberately NOT log2()
    (libm log2 has no cross-engine correctly-rounded guarantee at
    exact powers of two, where floor() would flip). Output: bucket →
    node count + the bucket's degree range [2^(b-1), 2^b)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    ed = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = ed.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    bucket = F.length(F.bin(F.col("deg"))).cast("bigint")
    return (
        deg.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .select(
            "bucket",
            F.expr("CAST(pow(2, bucket - 1) AS BIGINT)").alias("deg_lo"),
            F.expr("CAST(pow(2, bucket) - 1 AS BIGINT)").alias("deg_hi"),
            "n_nodes",
        )
    )


_DEGHIST_SQL = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT 'S' || CAST(l.l_suppkey AS VARCHAR) AS src,
                  'C' || CAST(o.o_custkey AS VARCHAR) AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
ed AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        FROM ed GROUP BY src),
h AS (
  SELECT CAST(length(bin(deg)) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_nodes
  FROM deg GROUP BY length(bin(deg))
)
SELECT bucket,
       CAST(pow(2, bucket - 1) AS BIGINT) AS deg_lo,
       CAST(pow(2, bucket) - 1 AS BIGINT) AS deg_hi,
       n_nodes
FROM h
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_g19_degree_histogram_twin(spark, d):
    spec = QuerySpec(
        name="rZ:g19_degree_histogram", fn=_deghist_fn, oracle=_DEGHIST_SQL,
        category="graph",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_g19_histogram_covers_all_nodes_across_buckets(spark, sf_oracle_dir):
    """Bucket ranges must tile (2^(b-1) ≤ deg ≤ 2^b − 1), total mass
    must equal the node count, and the distribution must span >1
    bucket (a single-bucket histogram profiles nothing)."""
    rows = _deghist_fn(spark, sf_oracle_dir).collect()
    assert len(rows) > 1
    for r in rows:
        assert r.deg_lo == 2 ** (r.bucket - 1)
        assert r.deg_hi == 2**r.bucket - 1
    li = load_table(spark, sf_oracle_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    o = load_table(spark, sf_oracle_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    n_s = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_suppkey")
        .distinct()
        .count()
    )
    n_c = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_nodes for r in rows) == n_s + n_c


# ---------------------------------------------------------------------------
# s26_csv_custom_delims — pipe-delimited CSV with an explicit NULL marker
# ---------------------------------------------------------------------------


def _s26_fn(spark, sf_dir):
    """S26: CSV round-trip under a NON-default dialect — pipe
    delimiter and an explicit nullValue marker — with REAL nulls in
    the data (mktsegment 'BUILDING' nulled before the write). Without
    a marker, NULL and '' collapse on re-read; the dialect knobs are
    what make CSV interchange with legacy exports lossless. Schema is
    pinned on read (no inference scan). The twin states the net
    null-introduction effect declaratively."""
    from x8313_etl_spark.queries.sources_q import _tag, scratch

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("segment"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    path = scratch(f"s26_csv_{_tag(sf_dir)}")
    (
        c.write.mode("overwrite")
        .option("sep", "|")
        .option("nullValue", "\\N")
        .option("header", "true")
        .csv(path)
    )
    back = (
        spark.read.schema("c_custkey bigint, segment string, cents bigint")
        .option("sep", "|")
        .option("nullValue", "\\N")
        .option("header", "true")
        .csv(path)
    )
    return back


_S26_SQL = """
SELECT c_custkey,
       CASE WHEN c_mktsegment = 'BUILDING' THEN NULL
            ELSE c_mktsegment END AS segment,
       CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
FROM customer
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_s26_csv_custom_delims_twin(spark, d):
    spec = QuerySpec(
        name="rZ:s26_csv_custom_delims", fn=_s26_fn, oracle=_S26_SQL,
        category="sources",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_s26_nulls_and_dialect_survive_the_trip(spark, sf_oracle_dir):
    """Real nulls must exist after the trip (the BUILDING rows), the
    written files must actually use the pipe delimiter and the \\N
    marker, and non-null segments must never be empty strings."""
    import glob
    import os

    from x8313_etl_spark.queries.sources_q import _SCRATCH

    rows = _s26_fn(spark, sf_oracle_dir).collect()
    assert any(r.segment is None for r in rows)
    assert all(r.segment != "" for r in rows)
    tag = os.path.basename(sf_oracle_dir.rstrip("/"))
    files = glob.glob(os.path.join(_SCRATCH, f"s26_csv_{tag}", "part-*.csv"))
    assert files
    body = open(files[0]).read()
    assert "|" in body and "\\N" in body


# ---------------------------------------------------------------------------
# u6_symmetric_difference — multiset symmetric difference
# ---------------------------------------------------------------------------


def _u6_fn(spark, sf_dir):
    """Multiset symmetric difference (A EXCEPT ALL B) ∪ (B EXCEPT ALL
    A) — the set-op family's missing row after u1–u5. A = customers
    of nations 0–14 bucketed by balance sign, B = nations 10–24 same
    shape; the overlap (10–14) cancels EXCEPT-ALL-style (by
    multiplicity, not existence), which is exactly what distinguishes
    this from an anti-join. Tagged with the surviving side so the
    output is self-describing."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("bigint").alias("nation"),
        (F.col("c_acctbal") > 0).alias("positive"),
    )
    a = c.filter(F.col("nation") < 15)
    b = c.filter(F.col("nation") >= 10)
    only_a = a.exceptAll(b).select(
        F.lit("A").alias("side"), "nation", "positive"
    )
    only_b = b.exceptAll(a).select(
        F.lit("B").alias("side"), "nation", "positive"
    )
    return only_a.unionAll(only_b)


_U6_SQL = """
WITH c AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_acctbal > 0 AS positive
  FROM customer
),
a AS (SELECT * FROM c WHERE nation < 15),
b AS (SELECT * FROM c WHERE nation >= 10)
SELECT 'A' AS side, nation, positive FROM (
  SELECT nation, positive FROM a EXCEPT ALL SELECT nation, positive FROM b
)
UNION ALL
SELECT 'B' AS side, nation, positive FROM (
  SELECT nation, positive FROM b EXCEPT ALL SELECT nation, positive FROM a
)
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_u6_symmetric_difference_twin(spark, d):
    spec = QuerySpec(
        name="rZ:u6_symmetric_difference", fn=_u6_fn, oracle=_U6_SQL,
        category="setops",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_u6_overlap_cancels_by_multiplicity(spark, sf_oracle_dir):
    """Both sides must survive, no surviving A-row may come from the
    exclusive-B zone and vice versa, and the overlap zone (nations
    10–14) must cancel EXACTLY (equal multisets on both sides there —
    its rows appear in neither side's output)."""
    rows = _u6_fn(spark, sf_oracle_dir).collect()
    a = [r for r in rows if r.side == "A"]
    b = [r for r in rows if r.side == "B"]
    assert a and b
    assert all(r.nation < 15 for r in a)
    assert all(r.nation >= 10 for r in b)
    assert not any(10 <= r.nation < 15 for r in rows)  # overlap cancelled


# ---------------------------------------------------------------------------
# x15_pandas_window_udf — GROUPED_AGG pandas UDF over a window frame
# ---------------------------------------------------------------------------

_X15_FRAME = 4  # trailing frame length (rows)


def _x15_fn(spark, sf_dir):
    """X15: an Arrow-batched GROUPED_AGG pandas UDF evaluated OVER a
    bounded window frame — the PandasUDF WindowAgg execution surface
    (x2 covers scalar, x3 grouped-agg over groupBy, x4/x5 the map
    families; a pandas UDF as a WINDOW function exercises a distinct
    Arrow transfer path: one batch per frame). The UDF sums int64
    cents (pandas int64 sum — exact), so the SQL twin is the plain
    window SUM and the compare is strict. Production note: prefer the
    built-in SUM for this exact shape — the row exists to verify the
    API surface for aggregations SQL can't express; the frame is the
    batch-size dial."""
    # the GROUPED_AGG eval type is inferred from the Series -> scalar
    # hints; under `from __future__ import annotations` the hints are
    # STRINGS resolved against the function's module globals, so pd/np
    # must be imported at module level (a function-local import left
    # 'pd.Series' unresolvable and the signature unsupported)
    @F.pandas_udf("bigint")
    def psum(v: pd.Series) -> int:
        return int(v.sum())

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("series"),
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("series").orderBy("ts", "event_id").rowsBetween(
        -(_X15_FRAME - 1), 0
    )
    return ev.select(
        "series",
        "event_id",
        "cents",
        psum("cents").over(w).alias("rolling_sum_cents"),
    )


_X15_SQL = f"""
SELECT user_id AS series, event_id,
       CAST(round(value * 100) AS BIGINT) AS cents,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN {_X15_FRAME - 1} PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS rolling_sum_cents
FROM events
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_x15_pandas_window_udf_twin(spark, d):
    spec = QuerySpec(
        name="rZ:x15_pandas_window_udf", fn=_x15_fn, oracle=_X15_SQL,
        category="udf",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_x15_plan_runs_pandas_window_agg(spark, sf_oracle_dir):
    """The plan must actually execute the pandas-UDF window path (a
    silent fallback to a JVM SUM would verify nothing about the
    surface)."""
    plan = _x15_fn(spark, sf_oracle_dir)._jdf.queryExecution().executedPlan().toString()
    # Spark 4 names the node ArrowWindowPython (3.x: WindowInPandas)
    assert "ArrowWindowPython" in plan or "WindowInPandas" in plan, plan[:2000]
