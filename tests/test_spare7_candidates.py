"""Pre-registration oracle checks — round-13-authored candidate batch Y
(spare capacity, second r13 batch after X — the raised ≤10/round budget
drains the pre-verified bank ~2 rounds sooner; X and Y restock it).

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0 — including the int128 oracle-type gate and
the strict int-vs-float transport dtype check) on an ad-hoc
UNREGISTERED QuerySpec, so a future round's registration is a verbatim
fn+oracle copy. Twins verify at BOTH fixture sfs. ROADMAP.md
"Candidate surface" carries the registration notes.

Batch Y members (graph/quant/curation/API-surface spread):
- g18_degree_assortativity: Newman's degree assortativity coefficient
  over the supplier↔customer graph — all five moment sums exact int64
  from one edge⋈degree join; the final r is one fixed-shape double
  expression over those exact sums (sqrt and division are correctly
  rounded IEEE ops, so identical inputs give identical doubles).
- ts_drawdown: per-series maximum drawdown (peak-to-trough) with the
  trough row as evidence — running max by window, drawdown in exact
  cents, argmax with pinned (dd DESC, event_id ASC) tie-break. The
  quant risk metric next to ts_ohlc/ts_vwap.
- p_stratified_kfold: deterministic K-fold assignment by salted md5
  (the house hash rule — reproducible, repartition-stable, no RNG),
  emitted row-level so fold balance per source is verifiable; the
  split-hygiene sibling of p_hash_split (train/val/test).
- w25_interarrival_histogram: per-series inter-arrival-time histogram
  (lag-diff in exact microseconds → capped minute buckets → counts) —
  the telemetry-cadence profile behind gap/burst detection.
- o6_keyset_page: keyset (cursor) pagination — the scalable
  alternative to o2's LIMIT/OFFSET: WHERE (k1,k2) > (a,b) ORDER BY
  LIMIT page, which prunes at the scan instead of sorting and
  skipping the whole prefix; at 100 TB OFFSET N is O(N) wasted work
  per page while keyset is O(page).
"""

from __future__ import annotations

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
# g18_degree_assortativity — exact integer moments, one IEEE tail
# ---------------------------------------------------------------------------


def _assort_fn(spark, sf_dir):
    """Degree assortativity (Newman 2002) over the symmetric
    supplier↔customer graph (g1/g2/g4's edge set): Pearson correlation
    of endpoint degrees across directed edges. The five moment sums
    (M, Σx, Σxy, Σx², and Σy fields — x=src degree, y=dst degree; on a
    symmetric edge set Σx=Σy and Σx²=Σy², which the guard asserts) are
    EXACT int64 out of one edges⋈degrees join with map-side-combined
    aggregation; r is one fixed-shape double expression over those
    exact sums — sqrt/division are correctly rounded, so identical
    int inputs give identical doubles cross-engine. int64 headroom:
    M·Σxy needs ~Σdeg³ < 2⁶³ — holds to ~10⁸-edge graphs; beyond
    that, promote the tail to DECIMAL (documented dial)."""
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
    j = (
        ed.join(deg.select(F.col("node").alias("src"), F.col("deg").alias("dx")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("deg").alias("dy")), "dst")
    )
    m = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("m_edges"),
        F.sum("dx").cast("bigint").alias("sx"),
        F.sum("dy").cast("bigint").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("bigint").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("bigint").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("syy"),
    )
    r = (
        F.col("m_edges").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        F.sqrt(
            F.col("m_edges").cast("double") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
        * F.sqrt(
            F.col("m_edges").cast("double") * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double")
        )
    )
    return m.select(
        "m_edges", "sx", "sy", "sxy", "sxx", "syy", r.alias("assortativity")
    )


_ASSORT_SQL = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT 'S' || CAST(l.l_suppkey AS VARCHAR) AS src,
                  'C' || CAST(o.o_custkey AS VARCHAR) AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
ed AS MATERIALIZED (
  SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e
),
deg AS MATERIALIZED (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY src
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS m_edges,
         CAST(SUM(dx.deg) AS BIGINT) AS sx,
         CAST(SUM(dy.deg) AS BIGINT) AS sy,
         CAST(SUM(dx.deg * dy.deg) AS BIGINT) AS sxy,
         CAST(SUM(dx.deg * dx.deg) AS BIGINT) AS sxx,
         CAST(SUM(dy.deg * dy.deg) AS BIGINT) AS syy
  FROM ed JOIN deg dx ON ed.src = dx.node JOIN deg dy ON ed.dst = dy.node
)
SELECT m_edges, sx, sy, sxy, sxx, syy,
       (CAST(m_edges AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(m_edges AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(m_edges AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS assortativity
FROM m
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_g18_degree_assortativity_twin(spark, d):
    spec = QuerySpec(
        name="rY:g18_degree_assortativity", fn=_assort_fn, oracle=_ASSORT_SQL,
        category="graph",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_g18_symmetry_and_range(spark, sf_oracle_dir):
    """On the symmetric edge set Σx=Σy and Σx²=Σy² must hold exactly,
    and r must be a real number in [−1, 1] (bipartite co-purchase
    graphs are typically disassortative — but the guard only pins the
    mathematical range, not the sign)."""
    row = _assort_fn(spark, sf_oracle_dir).collect()[0]
    assert row.sx == row.sy and row.sxx == row.syy
    assert row.m_edges > 0
    assert -1.0 <= row.assortativity <= 1.0


# ---------------------------------------------------------------------------
# ts_drawdown — per-series max peak-to-trough, exact cents
# ---------------------------------------------------------------------------


def _drawdown_fn(spark, sf_dir):
    """Per-series maximum drawdown: running peak by window, drawdown =
    peak − value in exact cents, and the trough row as evidence —
    argmax with the pinned (drawdown DESC, event_id ASC) tie-break so
    both engines pick the identical trough. One series-keyed window
    pass + one WindowGroupLimit argmax; linear at any scale."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("series"),
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    wrun = Window.partitionBy("series").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = ev.select(
        "series",
        "event_id",
        "cents",
        F.max("cents").over(wrun).cast("bigint").alias("peak_cents"),
    ).withColumn("dd_cents", F.col("peak_cents") - F.col("cents"))
    wbest = Window.partitionBy("series").orderBy(
        F.col("dd_cents").desc(), F.col("event_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "series",
            F.col("dd_cents").alias("max_drawdown_cents"),
            F.col("event_id").alias("trough_event_id"),
            "peak_cents",
            F.col("cents").alias("trough_cents"),
        )
    )


_DRAWDOWN_SQL = """
WITH ev AS (
  SELECT user_id AS series, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
d AS MATERIALIZED (
  SELECT series, event_id, cents,
         CAST(MAX(cents) OVER (
           PARTITION BY series ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS peak_cents
  FROM ev
)
SELECT series,
       peak_cents - cents AS max_drawdown_cents,
       event_id AS trough_event_id,
       peak_cents,
       cents AS trough_cents
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY series ORDER BY peak_cents - cents DESC, event_id
         ) AS rn
  FROM d
) WHERE rn = 1
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ts_drawdown_twin(spark, d):
    spec = QuerySpec(
        name="rY:ts_drawdown", fn=_drawdown_fn, oracle=_DRAWDOWN_SQL,
        category="timeseries",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_ts_drawdown_evidence_is_consistent(spark, sf_oracle_dir):
    """Every reported drawdown must equal peak − trough exactly, be
    non-negative, and be positive for at least one series (a monotone-
    increasing fixture would make the metric vacuous)."""
    rows = _drawdown_fn(spark, sf_oracle_dir).collect()
    assert rows
    for r in rows:
        assert r.max_drawdown_cents == r.peak_cents - r.trough_cents
        assert r.max_drawdown_cents >= 0
    assert any(r.max_drawdown_cents > 0 for r in rows)


# ---------------------------------------------------------------------------
# p_stratified_kfold — salted-md5 deterministic fold assignment
# ---------------------------------------------------------------------------

_KFOLD_K = 5


def _kfold_fn(spark, sf_dir):
    """Deterministic K-fold assignment: fold = H(doc_id ∥ '-fold') mod
    K with the house md5-prefix hash (reproducible, repartition-
    stable, independent of every other hash use via the salt — no RNG,
    so a re-run or a resumed job assigns identically). Row-level
    output so fold balance is verifiable per source; map-only, no
    shuffle at any scale. The cross-validation sibling of
    p_hash_split's train/val/test."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("-fold"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return d.select(
        "doc_id", "source", F.pmod(h, F.lit(_KFOLD_K)).cast("bigint").alias("fold")
    )


_KFOLD_SQL = f"""
SELECT doc_id, source,
       CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || '-fold'),
                                1, 15)) AS BIGINT) % {_KFOLD_K} AS fold
FROM documents
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_p_stratified_kfold_twin(spark, d):
    spec = QuerySpec(
        name="rY:p_stratified_kfold", fn=_kfold_fn, oracle=_KFOLD_SQL,
        category="pipeline",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_p_stratified_kfold_folds_are_balanced_and_complete(
    spark, sf_oracle_dir
):
    """All K folds must be populated, the global balance must sit
    within binomial noise of n/K (max−min ≤ 6·√mean — per-fold counts
    are Binomial(n, 1/K) with σ ≈ √(n/K), so a uniform hash stays
    well inside while a broken one — e.g. a modulus correlated with
    doc_id parity — blows it), and every source must see at least 2
    distinct folds (the property a per-source leave-fold-out split
    depends on)."""
    import collections
    import math

    rows = _kfold_fn(spark, sf_oracle_dir).collect()
    cnt = collections.Counter(r.fold for r in rows)
    assert set(cnt) == set(range(_KFOLD_K))
    mean = len(rows) / _KFOLD_K
    assert max(cnt.values()) - min(cnt.values()) <= 6 * math.sqrt(mean)
    per_src = collections.defaultdict(set)
    for r in rows:
        per_src[r.source].add(r.fold)
    assert all(len(v) >= 2 for v in per_src.values())


# ---------------------------------------------------------------------------
# w25_interarrival_histogram — per-series gap histogram, exact micros
# ---------------------------------------------------------------------------

_IAT_BUCKET_US = 60_000_000  # 1-minute buckets
_IAT_CAP = 60  # last bucket absorbs gaps >= 60 minutes


def _iat_fn(spark, sf_dir):
    """Per-series inter-arrival-time histogram: lag-diff in EXACT
    microseconds under the (ts, event_id) total order, floor-divided
    into 1-minute buckets capped at _IAT_CAP (the open-ended tail
    bucket), counted per (series, bucket). The cadence profile burst/
    gap detectors consume. One series-keyed window pass + one
    map-side-combined count; first events carry no gap and are
    excluded identically in both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("series"), "event_id", "ts"
    )
    w = Window.partitionBy("series").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; the UTC session invariant makes the cast an
    # identity, matching the twin's epoch_us (the ts_gap_fill idiom)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = ev.select(
        "series",
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    bucket = F.least(
        F.expr(f"gap_us div {_IAT_BUCKET_US}"), F.lit(_IAT_CAP)
    ).cast("bigint")
    return (
        g.select("series", bucket.alias("bucket"))
        .groupBy("series", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


_IAT_SQL = f"""
WITH ev AS (
  SELECT user_id AS series, event_id, ts FROM events
),
g AS (
  SELECT series,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY series ORDER BY ts, event_id
         ) AS gap_us
  FROM ev
)
SELECT series,
       CAST(LEAST(gap_us // {_IAT_BUCKET_US}, {_IAT_CAP}) AS BIGINT)
         AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM g WHERE gap_us IS NOT NULL
GROUP BY series, LEAST(gap_us // {_IAT_BUCKET_US}, {_IAT_CAP})
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_w25_interarrival_histogram_twin(spark, d):
    spec = QuerySpec(
        name="rY:w25_interarrival_histogram", fn=_iat_fn, oracle=_IAT_SQL,
        category="windows",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_w25_histogram_mass_and_spread(spark, sf_oracle_dir):
    """Total histogram mass must equal events − series (one lost gap
    per series), and more than one bucket must be populated (a
    single-bucket histogram profiles nothing)."""
    rows = _iat_fn(spark, sf_oracle_dir).collect()
    ev = load_table(spark, sf_oracle_dir, "events")
    n_events = ev.count()
    n_series = ev.select("user_id").distinct().count()
    assert sum(r.cnt for r in rows) == n_events - n_series
    assert len({r.bucket for r in rows}) > 1


# ---------------------------------------------------------------------------
# o6_keyset_page — cursor pagination, the scalable OFFSET alternative
# ---------------------------------------------------------------------------

_PAGE = 500
#: cursor: the last (l_orderkey, l_linenumber, cents) of the prior
#: page. The fixture's (orderkey, linenumber) pair is NOT unique
#: (synthetic generator), so the pagination key is the TRIPLE with
#: cents — measured unique on every fixture sf — because keyset
#: pagination is only deterministic under a total order.
_AFTER_OK = 1000
_AFTER_LN = 3
_AFTER_CENTS = 0


def _keyset_fn(spark, sf_dir):
    """Keyset (cursor) pagination: the page strictly AFTER the cursor
    under the (l_orderkey, l_linenumber, cents) total order —
    WHERE (k1, k2, k3) > (a, b, c) ORDER BY k1, k2, k3 LIMIT page.
    The leading-key predicate prunes at the scan (min/max row-group
    stats skip everything below the cursor) and the LIMIT plans as
    TakeOrderedAndProject — no global sort, no O(offset) skip, which
    is what makes this the 100 TB pagination idiom where o2's
    LIMIT/OFFSET pays the whole prefix on every page."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    after = (
        (F.col("l_orderkey") > _AFTER_OK)
        | (
            (F.col("l_orderkey") == _AFTER_OK)
            & (F.col("l_linenumber") > _AFTER_LN)
        )
        | (
            (F.col("l_orderkey") == _AFTER_OK)
            & (F.col("l_linenumber") == _AFTER_LN)
            & (F.col("cents") > _AFTER_CENTS)
        )
    )
    return (
        li.filter(after)
        .orderBy("l_orderkey", "l_linenumber", "cents")
        .limit(_PAGE)
    )


_KEYSET_SQL = f"""
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, cents
FROM li
WHERE l_orderkey > {_AFTER_OK}
   OR (l_orderkey = {_AFTER_OK} AND l_linenumber > {_AFTER_LN})
   OR (l_orderkey = {_AFTER_OK} AND l_linenumber = {_AFTER_LN}
       AND cents > {_AFTER_CENTS})
ORDER BY l_orderkey, l_linenumber, cents
LIMIT {_PAGE}
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_o6_keyset_page_twin(spark, d):
    spec = QuerySpec(
        name="rY:o6_keyset_page", fn=_keyset_fn, oracle=_KEYSET_SQL,
        category="order",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_o6_page_is_full_ordered_and_after_cursor(spark, sf_oracle_dir):
    """The page must be exactly _PAGE rows, strictly ascending in the
    pagination key, and start strictly after the cursor."""
    rows = _keyset_fn(spark, sf_oracle_dir).collect()
    assert len(rows) == _PAGE
    keys = [(r.l_orderkey, r.l_linenumber, r.cents) for r in rows]
    assert keys == sorted(keys) and len(set(keys)) == _PAGE
    assert keys[0] > (_AFTER_OK, _AFTER_LN, _AFTER_CENTS)
