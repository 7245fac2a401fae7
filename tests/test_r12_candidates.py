"""Pre-registration oracle checks — round-10-authored candidate batch J
(the r12 pipeline; ≤5/round budget — batch I in
tests/test_r11_candidates.py is the r11 pipeline).

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0 — which since r10 also plans the oracle
through the int128 gate and the strict int-vs-float dtype check) on an
ad-hoc UNREGISTERED QuerySpec, so a future round's registration is a
verbatim fn+oracle copy. Twins verify at BOTH fixture sfs. ROADMAP.md
"Candidate surface" carries the notes.

Batch J members:
- ts_changepoint: best single change-point per series by binary
  segmentation (the monitoring op behind regime-shift alerts) — the
  SSE-split argmax done with integer prefix-sum algebra and ONE IEEE
  division per split candidate.
- a27_weighted_median: exact weighted median (quantity-weighted price)
  per group — integer cross-multiplication, no interpolation.
- sim_radius_neighbors: radius (range) search over the IVF buckets —
  ALL neighbors with cos ≥ τ, the complement of the top-k family
  (sim_ivf_topk returns the best k even when nothing is close; radius
  search returns exactly what is close).
- p_systematic_sample: per-source systematic sampling along the
  cumulative token axis — the deterministic weighted without-
  replacement sample curation uses for token-budgeted subcorpora.
- dq8_freshness: per-key staleness audit (lag behind the global
  high-water mark, flagged against an exact rank-derived p75
  threshold) — the data-freshness monitor every ingest pipeline ships.
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
    """Forget ledger keys introduced by these unregistered candidate fns
    (the materialization gate audits registered queries only)."""
    before = set(audit.ledger())
    yield
    for key in set(audit.ledger()) - before:
        audit.forget(key)


# ---------------------------------------------------------------------------
# ts_changepoint — best single split per series, integer prefix algebra
# ---------------------------------------------------------------------------

_CP_MIN_N = 8  # series shorter than this carry no meaningful split


def _changepoint_fn(spark, sf_dir):
    """Single change-point per series (binary segmentation's inner step
    — Scott & Knott / CUSUM-style regime detection, public): the split
    k that minimizes SSE_left + SSE_right over the (ts, event_id)-
    ordered integer-cents series equivalently MAXIMIZES
    B(k) = a²/k + b²/(n−k) (a = prefix sum, b = total − a; the
    between-segment term of the ANOVA decomposition, total SSE fixed).
    ENGINE-EXACT: a, b, n, k are int64 prefix/total sums off ONE
    ordered window pass; B(k) is compared as the single IEEE division
    num/den with num = a²(n−k) + b²k and den = k(n−k) — both exact
    int64 (bounds: ≤99 events/user × cents ≤ 6e4 → a ≤ 6e6,
    num ≤ 4e15 < 2⁵³, so the doubles are exact and the argmax is
    engine-identical; ties break on smaller k). Warm-up: series with
    n < {_CP_MIN_N} are dropped; k ranges 1..n−1. One window shuffle
    keyed by series; the argmax is a WindowGroupLimit over the same
    key. Int64 headroom documents the decimal(38,0) escalation past
    ~10⁵ events/series."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("series"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w_ord = (
        Window.partitionBy("series")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_seq = Window.partitionBy("series").orderBy("ts", "event_id")
    w_all = Window.partitionBy("series")
    r = ev.select(
        "series",
        F.row_number().over(w_seq).cast("bigint").alias("k"),
        F.sum("cents").over(w_ord).alias("a"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("cents").over(w_all).alias("t"),
    ).filter((F.col("n") >= _CP_MIN_N) & (F.col("k") < F.col("n")))
    b = F.col("t") - F.col("a")
    num = (
        F.col("a") * F.col("a") * (F.col("n") - F.col("k"))
        + b * b * F.col("k")
    )
    den = F.col("k") * (F.col("n") - F.col("k"))
    scored = r.select(
        "series",
        "k",
        "n",
        F.col("a"),
        b.alias("b"),
        num.cast("bigint").alias("num"),
        den.cast("bigint").alias("den"),
        (num.cast("double") / den.cast("double")).alias("gain"),
    )
    best = Window.partitionBy("series").orderBy(F.col("gain").desc(), F.col("k"))
    return (
        scored.withColumn("rn", F.row_number().over(best))
        .filter(F.col("rn") == 1)
        .select(
            "series",
            F.col("n").cast("bigint").alias("n"),
            F.col("k").alias("k_split"),
            F.expr("a div k").alias("mu_l_cents"),
            F.expr("b div (n - k)").alias("mu_r_cents"),
            "num",
            "den",
        )
    )


_CP_SQL = f"""
WITH r AS (
  SELECT user_id AS series,
         CAST(row_number() OVER w AS BIGINT) AS k,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS a,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER
              (PARTITION BY user_id) AS BIGINT) AS t
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT series, k, n, a, t - a AS b,
         a * a * (n - k) + (t - a) * (t - a) * k AS num,
         k * (n - k) AS den
  FROM r WHERE n >= {_CP_MIN_N} AND k < n
)
SELECT series, n, k AS k_split,
       a // k AS mu_l_cents, b // (n - k) AS mu_r_cents, num, den
FROM (
  SELECT s.*, row_number() OVER (
           PARTITION BY series
           ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE) DESC, k
         ) AS rn
  FROM s
) WHERE rn = 1
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ts_changepoint_twin(spark, d):
    spec = QuerySpec(
        name="r12:ts_changepoint", fn=_changepoint_fn, oracle=_CP_SQL,
        category="timeseries",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_ts_changepoint_split_is_interior_and_varied(spark, sf_oracle_dir):
    """Splits must not degenerate to a constant position (k=1 or k=n−1
    everywhere would mean the gain term never discriminates), and the
    two segment means must differ for some series (a split with equal
    means detects nothing)."""
    rows = _changepoint_fn(spark, sf_oracle_dir).collect()
    assert rows
    ks = {r.k_split for r in rows}
    assert len(ks) >= 3
    assert any(r.mu_l_cents != r.mu_r_cents for r in rows)
    assert all(1 <= r.k_split < r.n for r in rows)


def test_ts_changepoint_recovers_planted_shift(spark):
    """A crafted series with a level shift at position 10 must split
    exactly there — the semantic contract, independent of fixtures."""
    rows = [(1, i, i, 100.0 if i <= 10 else 500.0) for i in range(1, 25)]
    import pandas as pd

    df = pd.DataFrame(rows, columns=["user_id", "event_id", "tick", "value"])
    df["ts"] = pd.to_datetime(df["tick"], unit="s")
    sdf = spark.createDataFrame(df[["user_id", "ts", "event_id", "value"]])
    sdf.createOrReplaceTempView("__cp_crafted")
    # reuse the fn body over the crafted frame via the same expressions
    ev = sdf.select(
        F.col("user_id").alias("series"), "ts", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w_ord = (
        Window.partitionBy("series").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_seq = Window.partitionBy("series").orderBy("ts", "event_id")
    w_all = Window.partitionBy("series")
    r = ev.select(
        "series",
        F.row_number().over(w_seq).cast("bigint").alias("k"),
        F.sum("cents").over(w_ord).alias("a"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("cents").over(w_all).alias("t"),
    ).filter(F.col("k") < F.col("n"))
    b = F.col("t") - F.col("a")
    num = (F.col("a") * F.col("a") * (F.col("n") - F.col("k")) + b * b * F.col("k"))
    den = F.col("k") * (F.col("n") - F.col("k"))
    best = Window.partitionBy("series").orderBy(
        (num.cast("double") / den.cast("double")).desc(), F.col("k")
    )
    got = (
        r.withColumn("rn", F.row_number().over(best))
        .filter(F.col("rn") == 1)
        .select("k")
        .collect()
    )
    assert got[0]["k"] == 10


# ---------------------------------------------------------------------------
# a27_weighted_median — exact weighted median, integer cross-multiplication
# ---------------------------------------------------------------------------


def _wmedian_fn(spark, sf_dir):
    """Exact weighted median per group (quantity-weighted price per
    return flag): the smallest price v whose cumulative weight reaches
    half the total — 2·cumw ≥ totw in integer cross-multiplication, no
    interpolation, no fp anywhere (the robust-statistics sibling of
    a24's unweighted exact median). Values are AGGREGATED per (group,
    cents) before the cumulative window, so the window input is
    distinct-value-sized, not row-sized (the long tail of duplicate
    prices collapses in the map-side combine); the per-group window is
    |distinct prices|-bounded. Output carries the integer evidence
    (total weight, cumulative weight at the median)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    g = li.groupBy("l_returnflag", "cents").agg(F.sum("qty").alias("w"))
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "cents",
        F.sum("w").over(wc).alias("cumw"),
        F.sum("w").over(wt).alias("totw"),
    ).filter(2 * F.col("cumw") >= F.col("totw"))
    first = Window.partitionBy("l_returnflag").orderBy("cents")
    return (
        c.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("cents").alias("median_cents"),
            F.col("cumw").cast("bigint").alias("cum_weight"),
            F.col("totw").cast("bigint").alias("total_weight"),
        )
    )


_WMED_SQL = """
WITH g AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
c AS (
  SELECT l_returnflag, cents,
         CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cumw,
         CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS totw
  FROM g
)
SELECT l_returnflag, cents AS median_cents,
       cumw AS cum_weight, totw AS total_weight
FROM (
  SELECT c.*, row_number() OVER (PARTITION BY l_returnflag ORDER BY cents)
           AS rn
  FROM c WHERE 2 * cumw >= totw
) WHERE rn = 1
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_a27_weighted_median_twin(spark, d):
    spec = QuerySpec(
        name="r12:a27_weighted_median", fn=_wmedian_fn, oracle=_WMED_SQL,
        category="aggregates",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_a27_weighted_differs_from_unweighted(spark, sf_oracle_dir):
    """The quantity weighting must MOVE the median for some group —
    otherwise the fixture never exercises the weighted path (a
    degenerate all-equal-weights table would pass the twin)."""
    li = load_table(spark, sf_oracle_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    unweighted = {
        r["l_returnflag"]: r["m"]
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(cents, 0.5)").alias("m"))
        .collect()
    }
    weighted = {
        r["l_returnflag"]: r["median_cents"]
        for r in _wmedian_fn(spark, sf_oracle_dir).collect()
    }
    assert any(
        abs(weighted[k] - unweighted[k]) > 0 for k in weighted
    ), (weighted, unweighted)


# ---------------------------------------------------------------------------
# sim_radius_neighbors — radius search over the IVF buckets
# ---------------------------------------------------------------------------

_RADIUS_TAU = 0.30
_RADIUS_PROBE_MOD = 25  # l4/sim_ivf_topk's probe convention


def _radius_fn(spark, sf_dir):
    """Radius (range) search: ALL in-bucket neighbors with
    cos ≥ τ={_RADIUS_TAU} for each probe — the complement of the top-k
    family (top-k returns the best k even when nothing is close; radius
    search returns exactly what IS close, the shape dedup-threshold and
    recall-sensitive retrieval consumers want). Reuses the pooled IVF
    assignment (one broadcast K=16 seed cross shared with sim_ivf_topk /
    l10_knn_ivf); probes broadcast against their own bucket, so the
    per-pair cosine runs inside the corpus scan's partitioning and ONLY
    matching rows shuffle. Cosine is the HOF double fold — bit-identical
    cross-engine (functions/vector.py), so the τ comparison is exact.
    Same nprobe=1 recall caveat as sim_ivf_topk (multiprobe is the
    registered recall dial)."""
    from x8313_etl_spark.functions.vector import dot
    from x8313_etl_spark.queries.similarity_q import _ivf_assign

    assign = _ivf_assign(spark, sf_dir)
    probes = assign.filter(F.col("vec_id") % _RADIUS_PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("cent_id"),
        F.col("embedding").alias("pvec"),
        F.col("vnorm").alias("pnorm"),
    )
    cos = dot(F.col("pvec"), F.col("embedding")) / (
        F.col("pnorm") * F.col("vnorm")
    )
    return (
        assign.join(F.broadcast(probes), on="cent_id")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "cent_id", "vec_id", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= _RADIUS_TAU)
    )


def _radius_sql() -> str:
    from x8313_etl_spark.functions.vector import sql_cosine
    from x8313_etl_spark.queries.similarity_q import _K_CENTROIDS

    return f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
cent AS (SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
         WHERE vec_id < {_K_CENTROIDS}),
assign AS MATERIALIZED (
  SELECT vec_id, cent_id, embedding FROM (
    SELECT e.vec_id, cent.cent_id, e.embedding,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {sql_cosine('e.embedding', 'cent.cvec')} DESC, cent.cent_id
           ) AS crn
    FROM e CROSS JOIN cent
  ) WHERE crn = 1
)
SELECT p.vec_id AS probe_id, p.cent_id, m.vec_id AS vec_id,
       {sql_cosine('p.embedding', 'm.embedding')} AS cos_sim
FROM assign p JOIN assign m
  ON p.cent_id = m.cent_id AND m.vec_id != p.vec_id
WHERE p.vec_id % {_RADIUS_PROBE_MOD} = 0
  AND {sql_cosine('p.embedding', 'm.embedding')} >= {_RADIUS_TAU}
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_sim_radius_neighbors_twin(spark, d):
    spec = QuerySpec(
        name="r12:sim_radius_neighbors", fn=_radius_fn, oracle=_radius_sql(),
        category="similarity",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_radius_is_selective_but_nonempty(spark, sf_dir, sf_oracle_dir):
    """τ must keep SOME pairs and reject MOST in-bucket pairs at every
    fixture sf — an always-empty or always-full radius verifies
    nothing."""
    from x8313_etl_spark.queries.similarity_q import _ivf_assign

    for d in (sf_dir, sf_oracle_dir):
        kept = _radius_fn(spark, d).count()
        assign = _ivf_assign(spark, d)
        probes = assign.filter(
            F.col("vec_id") % _RADIUS_PROBE_MOD == 0
        ).select(F.col("vec_id").alias("probe_id"), "cent_id")
        bucket_pairs = (
            assign.join(probes, "cent_id")
            .filter(F.col("vec_id") != F.col("probe_id"))
            .count()
        )
        assert kept > 0, d
        assert kept * 5 < bucket_pairs, (d, kept, bucket_pairs)


# ---------------------------------------------------------------------------
# p_systematic_sample — per-source systematic sampling on the token axis
# ---------------------------------------------------------------------------

_SYS_K = 5  # draws per source stratum (~20 sources in the fixture)


def _syssample_fn(spark, sf_dir):
    """Per-source systematic sampling along the cumulative token axis
    (probability-proportional-to-size without replacement — the
    curation draw for token-budgeted subcorpora; Madow's systematic
    PPS, public): within each source, docs are laid on the cumulative
    n_tokens axis in doc_id order and a doc is selected whenever the
    running total crosses one of k={_SYS_K} equally-spaced stride
    boundaries — floor(cum·k/T) > floor((cum−w)·k/T), all int64 floor
    division, engine-exact. Long docs can absorb multiple boundaries
    (selected once — the standard PPS behavior); selection count per
    source is ≤ k and ≥ 1. One per-source window pass; the per-source
    partition is the same series-key shape as the ts_* family —
    for a million-source corpus the two-phase globalrank core swaps in
    (documented, operators/globalrank.py)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    wc = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("source")
    c = d.select(
        "doc_id",
        "source",
        "n_tokens",
        F.sum("n_tokens").over(wc).alias("cum"),
        F.sum("n_tokens").over(wt).alias("tot"),
    )
    bucket = F.expr(f"(cum * {_SYS_K}) div tot")
    prev_bucket = F.expr(f"((cum - n_tokens) * {_SYS_K}) div tot")
    return (
        c.filter(bucket > prev_bucket)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.col("cum").cast("bigint").alias("cum_tokens"),
            bucket.cast("bigint").alias("stride_bucket"),
        )
    )


_SYS_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(sum(n_tokens) OVER (PARTITION BY source) AS BIGINT) AS tot
  FROM d
)
SELECT doc_id, source, n_tokens, cum AS cum_tokens,
       (cum * {_SYS_K}) // tot AS stride_bucket
FROM c
WHERE (cum * {_SYS_K}) // tot > ((cum - n_tokens) * {_SYS_K}) // tot
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_p_systematic_sample_twin(spark, d):
    spec = QuerySpec(
        name="r12:p_systematic_sample", fn=_syssample_fn, oracle=_SYS_SQL,
        category="pipeline",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_systematic_sample_is_proportional(spark, sf_oracle_dir):
    """Each source draws between 1 and k docs, the total draw is a
    small fraction of the corpus, and long docs are over-represented
    vs short (the PPS property: selected mean n_tokens > corpus
    mean)."""
    out = _syssample_fn(spark, sf_oracle_dir)
    per = {r["source"]: r["cnt"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert per and all(1 <= v <= _SYS_K for v in per.values())
    d = load_table(spark, sf_oracle_dir, "documents")
    n_docs = d.count()
    n_sel = out.count()
    assert n_sel * 4 < n_docs, (n_sel, n_docs)
    mean_all = d.select(
        F.avg(F.size(F.split(F.col("text"), " "))).alias("m")
    ).collect()[0]["m"]
    mean_sel = out.select(F.avg("n_tokens").alias("m")).collect()[0]["m"]
    assert mean_sel > mean_all, (mean_sel, mean_all)


# ---------------------------------------------------------------------------
# dq8_freshness — per-key staleness audit vs the global high-water mark
# ---------------------------------------------------------------------------


def _freshness_fn(spark, sf_dir):
    """Data-freshness audit (the ingest monitor behind 'is any feed
    stale?'): per user, lag_us = global max(ts) − that user's last
    event, flagged against an EXACT rank-derived p75 threshold — the
    lag at 1-based rank ceil(3n/4) in (lag, user_id) order, computed as
    (3n+3) div 10-free integer ceil ((3n+3) div 4), the p_embed_outliers
    discipline (no float quantile anywhere; epoch-µs ints throughout,
    so the audit is engine-exact). Quantile-derived ⇒ SOME keys flag
    and some don't at every fixture sf (production passes the SLA
    constant instead). Scale: one map-side-combined groupBy to the
    per-key lag table, the one-row high-water scalar broadcast, and
    the threshold rank via the TWO-PHASE globalrank core — no
    single-partition pass over the growing per-key table
    (operators/globalrank.py, dq4's shape)."""
    from x8313_etl_spark.operators.globalrank import with_global_rank

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("tus")
    )
    last = ev.groupBy("user_id").agg(F.max("tus").alias("last_us"))
    hwm = last.agg(F.max("last_us").alias("hwm_us"))
    lag = last.crossJoin(F.broadcast(hwm)).select(
        "user_id", (F.col("hwm_us") - F.col("last_us")).alias("lag_us")
    )
    ranked = with_global_rank(
        lag,
        [F.col("lag_us"), F.col("user_id")],
        partitions=8,
        key="dq8.rank",
        count_col="n",
    )
    thr = ranked.filter(
        F.col("rn") == F.expr("(3 * n + 3) div 4") - 1
    ).select(F.col("lag_us").alias("thr_us"))
    return (
        ranked.crossJoin(F.broadcast(thr))
        .select(
            "user_id",
            F.col("lag_us").cast("bigint").alias("lag_us"),
            F.col("thr_us").cast("bigint").alias("thr_us"),
            (F.col("lag_us") > F.col("thr_us")).alias("is_stale"),
        )
    )


_DQ8_SQL = """
WITH last AS (
  SELECT user_id, max(epoch_us(ts)) AS last_us FROM events GROUP BY user_id
),
hwm AS (SELECT max(last_us) AS hwm_us FROM last),
lag AS (
  SELECT user_id, hwm.hwm_us - last_us AS lag_us FROM last, hwm
),
r AS (
  SELECT user_id, lag_us,
         row_number() OVER (ORDER BY lag_us, user_id) AS rn,
         count(*) OVER () AS n
  FROM lag
),
thr AS (SELECT lag_us AS thr_us FROM r WHERE rn = (3 * n + 3) // 4)
SELECT r.user_id, CAST(r.lag_us AS BIGINT) AS lag_us,
       CAST(t.thr_us AS BIGINT) AS thr_us,
       r.lag_us > t.thr_us AS is_stale
FROM r, thr t
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_dq8_freshness_twin(spark, d):
    spec = QuerySpec(
        name="r12:dq8_freshness", fn=_freshness_fn, oracle=_DQ8_SQL,
        category="etl",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_dq8_flags_some_but_not_all(spark, sf_dir, sf_oracle_dir):
    """The rank-derived threshold must leave BOTH stale and fresh keys
    at every fixture sf (~25% stale by construction, modulo ties)."""
    for d in (sf_dir, sf_oracle_dir):
        rows = _freshness_fn(spark, d).groupBy("is_stale").count().collect()
        got = {r["is_stale"]: r["count"] for r in rows}
        assert got.get(True, 0) > 0, d
        assert got.get(True, 0) < got.get(False, 0), d
