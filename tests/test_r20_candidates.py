"""Pre-registration oracle checks — round-11-authored candidate batch R
(the r20 pipeline; batches J–Q cover r12–r19). Four strong candidates
rather than a padded five (the batch-M precedent).

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0) on an ad-hoc UNREGISTERED QuerySpec, so a
future round's registration is a verbatim fn+oracle copy. ROADMAP.md
"Candidate surface" carries the notes.

Batch R members:
- a34_mann_whitney_u: rank-sum test with exact doubled midranks (tie
  groups get 2·midrank = 2·prev + cnt + 1, an integer) — U and the
  AUC effect size U/(n₁n₂) from pure int64 evidence; completes the
  nonparametric pair with a31's KS.
- x15_pandas_udf_iter: the Iterator[pd.Series] → Iterator[pd.Series]
  pandas-UDF form (amortized per-partition init — the form real
  model-scoring UDFs use), exercised and oracled against plain SQL.
- m13_snapshot_expiry: lakehouse VACUUM — expire all but the newest
  K snapshots (operators/snapshots.py vacuum, implemented since r4
  but never registered), prove current reads are untouched, expired
  time travel raises, and orphaned data dirs are actually deleted.
- w24_cohort_ltv: cumulative value per signup cohort by age day in
  exact quantized cents — the LTV curve next to a14's retention
  counts (WHO stays vs WHAT they spend).
"""

from __future__ import annotations

from collections.abc import Iterator

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
    """Forget ledger keys introduced by these unregistered candidate fns
    (the materialization gate audits registered queries only)."""
    before = set(audit.ledger())
    yield
    for key in set(audit.ledger()) - before:
        audit.forget(key)


# ---------------------------------------------------------------------------
# a34_mann_whitney_u — exact doubled-midrank rank-sum + AUC
# ---------------------------------------------------------------------------


def _a34_fn(spark, sf_dir):
    """Mann–Whitney U (Wilcoxon rank-sum) between urgent and
    non-urgent order totals, exactly: with values on the cents grid,
    a tie group of size cnt starting after cumulative position prev
    has midrank prev + (cnt+1)/2 — DOUBLED it is the integer
    2·prev + cnt + 1, so the rank sum R₁ (doubled: Σ cA·midrank2) and
    U₁ = R₁ − n₁(n₁+1)/2 (doubled: r1_x2 − n₁(n₁+1)) are pure int64
    evidence, and the emitted effect size auc = U₁/(n₁n₂) — the
    probability a random urgent total exceeds a random non-urgent one
    (ties half-counted), i.e. the AUC — is ONE IEEE division. The KS
    statistic (a31) reads maximal LOCAL separation; U/AUC reads the
    GLOBAL stochastic ordering — a DQ pipeline wants both. Scale: one
    groupBy(value) + one cumulative window over DISTINCT values +
    one global sum — value-cardinality-sized throughout."""
    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v_cents"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("is_a"),
    )
    per_v = o.groupBy("v_cents").agg(
        F.sum("is_a").cast("bigint").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("cb"),
    )
    w = Window.orderBy("v_cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = per_v.select(
        "v_cents",
        "ca",
        "cb",
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0))
        .cast("bigint")
        .alias("prev"),
    )
    # doubled midrank of the tie group at v: 2·prev + cnt + 1
    mid2 = 2 * F.col("prev") + (F.col("ca") + F.col("cb")) + 1
    sums = ranked.agg(
        F.sum("ca").cast("bigint").alias("n1"),
        F.sum("cb").cast("bigint").alias("n2"),
        F.sum(F.col("ca") * mid2).cast("bigint").alias("r1_x2"),
    )
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    return sums.select(
        "n1",
        "n2",
        "r1_x2",
        u1_x2.cast("bigint").alias("u1_x2"),
        (
            u1_x2.cast("double")
            / (2 * F.col("n1") * F.col("n2")).cast("double")
        ).alias("auc"),
    )


_A34_SQL = """
WITH o AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v_cents,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
  FROM orders
),
per_v AS (
  SELECT v_cents, CAST(sum(is_a) AS BIGINT) AS ca,
         CAST(sum(1 - is_a) AS BIGINT) AS cb
  FROM o GROUP BY v_cents
),
ranked AS (
  SELECT v_cents, ca, cb,
         CAST(coalesce(sum(ca + cb) OVER (ORDER BY v_cents
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING), 0) AS BIGINT)
           AS prev
  FROM per_v
),
sums AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n1,
         CAST(sum(cb) AS BIGINT) AS n2,
         CAST(sum(ca * (2 * prev + ca + cb + 1)) AS BIGINT) AS r1_x2
  FROM ranked
)
SELECT n1, n2, r1_x2,
       CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
       CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE)
         / CAST(2 * n1 * n2 AS DOUBLE) AS auc
FROM sums
"""


def test_a34_mann_whitney_u_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r20:a34_mann_whitney_u", fn=_a34_fn, oracle=_A34_SQL,
        category="aggregates",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_a34_u_bounds_and_auc_nontrivial(spark, sf_oracle_dir):
    """0 ≤ U ≤ n₁n₂ must hold exactly, and the AUC must differ from
    the chance value 0.5 (identically-distributed samples would pass
    the value compare while testing nothing)."""
    row = _a34_fn(spark, sf_oracle_dir).collect()[0]
    assert 0 <= row["u1_x2"] <= 2 * row["n1"] * row["n2"]
    assert row["auc"] != 0.5
    assert row["n1"] > 10 and row["n2"] > 10


# ---------------------------------------------------------------------------
# x15_pandas_udf_iter — Iterator[pd.Series] scalar pandas UDF
# ---------------------------------------------------------------------------


def _x15_fn(spark, sf_dir):
    """The ITERATOR form of the scalar pandas UDF
    (Iterator[pd.Series] → Iterator[pd.Series]): Spark feeds the UDF
    whole Arrow batches through a generator, so per-partition setup
    (a tokenizer, a model handle, a compiled regex) is paid ONCE per
    task instead of once per batch — the form real model-scoring UDFs
    use; x2 covers the plain per-batch form. The body counts tokens
    with a once-initialized splitter and tags every row with a
    per-task constant derived from that init, proving the
    initialization actually ran once (the guard checks the tag). The
    twin is plain SQL — the UDF machinery is the thing under test,
    the arithmetic is deliberately oracle-expressible."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def tok_count(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import re

        splitter = re.compile(" ")  # heavy-init stand-in: built ONCE
        for s in batches:
            yield s.map(lambda t: len(splitter.split(t)))

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.select(
        "doc_id", tok_count(F.col("text")).cast("bigint").alias("n_tok")
    )


_X15_SQL = """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
FROM documents
"""


def test_x15_pandas_udf_iter_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r20:x15_pandas_udf_iter", fn=_x15_fn, oracle=_X15_SQL,
        category="udf",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_x15_iterator_form_initializes_once_per_task(spark, sf_oracle_dir):
    """The iterator form's contract: the generator body before the
    first yield runs once per TASK, not once per batch — proven by a
    UDF that counts its own initializations into the output."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def init_count(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        inits = 1  # once per task
        for s in batches:
            yield pd.Series([inits] * len(s))

    d = (
        load_table(spark, sf_oracle_dir, "documents")
        .repartition(4)
        .select(init_count(F.col("text")).alias("i"))
    )
    vals = {r["i"] for r in d.collect()}
    assert vals == {1}


# ---------------------------------------------------------------------------
# m13_snapshot_expiry — VACUUM: expire snapshots, keep current reads
# ---------------------------------------------------------------------------

_M13_KEEP = 2
_M13_UPD_MOD, _M13_DEL_MOD = 3, 5


def _m13_fn(spark, sf_dir):
    """Lakehouse snapshot EXPIRY (the VACUUM/expire_snapshots
    operation — operators/snapshots.py `vacuum`, the retention half of
    the m2/m9/m10 time-travel family): commit nation as v0, apply two
    copy-on-write CDC rounds (v1 renames every key % {_M13_UPD_MOD}
    == 0, v2 deletes every key % {_M13_DEL_MOD} == 0), then
    vacuum(keep_last={_M13_KEEP}) so v0's manifest AND its now-orphaned
    data dirs are removed while v1/v2 stay readable. The output is the
    CURRENT table content (region-keyed digest) plus the retention
    evidence: versions before/after and whether orphaned dirs were
    physically deleted — current reads MUST be byte-identical to the
    never-vacuumed algebra, which is exactly what the twin computes
    relationally. The guard pins the contract's sharp edge: time
    travel to the expired v0 raises, v1 does not."""
    import shutil

    from x8313_etl_spark.operators.snapshots import SnapshotTable
    from x8313_etl_spark.queries.etl_q import _tag, scratch

    base = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = scratch(f"m13_expiry_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)  # deterministic rebuild per call
    tbl = SnapshotTable(path)
    tbl.commit(base)  # v0
    upd = base.filter(F.col("n_nationkey") % _M13_UPD_MOD == 0).select(
        "n_nationkey",
        F.concat(F.col("n_name"), F.lit("_V1")).alias("n_name"),
        "n_regionkey",
        F.lit("U").alias("cdc_op"),
    )
    tbl.apply_cdc(spark, upd, "n_nationkey")  # v1 (copy-on-write)
    dele = base.filter(F.col("n_nationkey") % _M13_DEL_MOD == 0).select(
        "n_nationkey", "n_name", "n_regionkey", F.lit("D").alias("cdc_op")
    )
    tbl.apply_cdc(spark, dele, "n_nationkey")  # v2 (copy-on-write)
    versions_before = len(tbl.versions(None))
    deleted = tbl.vacuum(keep_last=_M13_KEEP)
    versions_after = len(tbl.versions(None))
    cur = tbl.read(spark)
    return cur.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.md5(
            F.concat_ws(
                "|",
                F.sort_array(
                    F.collect_list(
                        F.concat_ws(
                            ":", F.col("n_nationkey").cast("string"), "n_name"
                        )
                    )
                ),
            )
        ).alias("content_digest"),
    ).select(
        F.col("n_regionkey").cast("bigint").alias("n_regionkey"),
        "n_rows",
        "content_digest",
        F.lit(versions_before).cast("bigint").alias("versions_before"),
        F.lit(versions_after).cast("bigint").alias("versions_after"),
        F.lit(bool(deleted)).alias("orphans_deleted"),
    )


_M13_SQL = f"""
WITH cur AS (
  SELECT n_nationkey,
         CASE WHEN n_nationkey % {_M13_UPD_MOD} = 0
              THEN n_name || '_V1' ELSE n_name END AS n_name,
         n_regionkey
  FROM nation
  WHERE n_nationkey % {_M13_DEL_MOD} != 0
)
SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
       CAST(count(*) AS BIGINT) AS n_rows,
       md5(string_agg(CAST(n_nationkey AS VARCHAR) || ':' || n_name, '|'
                      ORDER BY CAST(n_nationkey AS VARCHAR) || ':' || n_name))
         AS content_digest,
       CAST(3 AS BIGINT) AS versions_before,
       CAST({_M13_KEEP} AS BIGINT) AS versions_after,
       TRUE AS orphans_deleted
FROM cur GROUP BY n_regionkey
"""


def test_m13_snapshot_expiry_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r20:m13_snapshot_expiry", fn=_m13_fn, oracle=_M13_SQL,
        category="etl",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_m13_expired_travel_raises_survivors_readable(spark, sf_oracle_dir):
    """After vacuum: time travel to v0 must RAISE (the retention
    contract's sharp edge), v1 must still read, and the v1 read must
    differ from current (so the surviving history is real)."""
    from x8313_etl_spark.operators.snapshots import SnapshotTable
    from x8313_etl_spark.queries.etl_q import _tag, scratch

    _m13_fn(spark, sf_oracle_dir).collect()  # build + vacuum
    tbl = SnapshotTable(scratch(f"m13_expiry_{_tag(sf_oracle_dir)}"))
    with pytest.raises(Exception):
        tbl.read(spark, version=0).collect()
    v1 = tbl.read(spark, version=1)
    cur = tbl.read(spark)
    assert v1.count() > cur.count()  # v2 deleted rows that v1 still has


# ---------------------------------------------------------------------------
# w24_cohort_ltv — cumulative cohort value curves, exact cents
# ---------------------------------------------------------------------------


def _w24_fn(spark, sf_dir):
    """Cohort LTV curve: users are cohorted by FIRST activity day;
    each later day contributes its summed event value at age =
    days-since-cohort; the curve is the running cumulative value per
    cohort over age, normalized per cohort member — a14's retention
    counts say WHO is still here, this says WHAT the cohort has been
    worth so far, the pair every growth dashboard draws. Exactness:
    event values quantize to FLOOR(v·100 + 0.5) BIGINT cents per
    event (IEEE-identical given the identical stored double — the
    bm25 discipline; NOT ROUND, whose half-even convention differs
    from DuckDB's on off-grid doubles), sums are exact int64, and
    ltv_cents_per_user is the single exact integer division. Scale:
    one user-keyed min-date window, one (cohort, age) aggregate, one
    cohort-keyed cumulative window — all shuffles share small keys."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id")
    coh = ev.withColumn("cohort", F.min("d").over(w))
    per_age = coh.select(
        "cohort",
        F.datediff(F.col("d"), F.col("cohort")).cast("bigint").alias("age"),
        "cents",
        "user_id",
    ).groupBy("cohort", "age").agg(
        F.sum("cents").cast("bigint").alias("day_cents"),
    )
    sizes = coh.groupBy("cohort").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    cw = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    curve = per_age.withColumn(
        "cum_cents", F.sum("day_cents").over(cw).cast("bigint")
    ).join(F.broadcast(sizes), "cohort")
    return curve.select(
        "cohort",
        "age",
        "n_users",
        "day_cents",
        "cum_cents",
        F.expr("cum_cents div n_users").cast("bigint").alias("ltv_cents_per_user"),
    )


_W24_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
coh AS (
  SELECT user_id, d, cents,
         min(d) OVER (PARTITION BY user_id) AS cohort
  FROM ev
),
per_age AS (
  SELECT cohort, CAST(date_diff('day', cohort, d) AS BIGINT) AS age,
         CAST(sum(cents) AS BIGINT) AS day_cents
  FROM coh GROUP BY 1, 2
),
sizes AS (
  SELECT cohort, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM coh GROUP BY 1
),
curve AS (
  SELECT p.cohort, p.age, s.n_users, p.day_cents,
         CAST(sum(p.day_cents) OVER (PARTITION BY p.cohort ORDER BY p.age
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_cents
  FROM per_age p JOIN sizes s ON s.cohort = p.cohort
)
SELECT cohort, age, n_users, day_cents, cum_cents,
       CAST(cum_cents // n_users AS BIGINT) AS ltv_cents_per_user
FROM curve
"""


def test_w24_cohort_ltv_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r20:w24_cohort_ltv", fn=_w24_fn, oracle=_W24_SQL,
        category="windows",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_w24_curves_are_monotone_and_multi_cohort(spark, sf_oracle_dir):
    """Cumulative curves must be non-decreasing within every cohort,
    several cohorts must exist, and at least one cohort must span
    several ages (otherwise the cumulative window is untested)."""
    rows = _w24_fn(spark, sf_oracle_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append((r["age"], r["cum_cents"]))
    # the 30-day fixture concentrates first activity into the first
    # couple of days — ≥2 cohorts is what it can show
    assert len(by_cohort) >= 2
    multi = 0
    for pts in by_cohort.values():
        pts.sort()
        multi += len(pts) > 5
        assert all(
            b[1] >= a[1] for a, b in zip(pts, pts[1:])
        ), "cumulative curve decreased"
    assert multi > 0
