"""Pre-registration oracle checks — round-11-authored candidate batch P
(the r18 pipeline; batches J–O cover r12–r17).

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0) on an ad-hoc UNREGISTERED QuerySpec, so a
future round's registration is a verbatim fn+oracle copy. ROADMAP.md
"Candidate surface" carries the notes.

Batch P members:
- a31_ks_two_sample: exact two-sample Kolmogorov–Smirnov D between
  order-total distributions of urgent vs non-urgent orders — the ECDF
  gap as an integer cross-multiplication (|cA·nB − cB·nA|, nA·nB),
  one IEEE division. The distribution-shift test a data-quality
  pipeline runs between snapshots.
- ts_seasonal_mase: seasonal-naive forecast backtest per event type —
  MASE as the exact integer ratio Σ|c−lag₂₄c| / Σ|c−lag₁c| over the
  common evaluation rows (counts are integers; no fp anywhere but the
  final division).
- w23_user_stickiness: DAU / trailing-7-day-distinct-users per day in
  exact ppm — the engagement ratio, computed by fanning each (day,
  user) activity to the 7 eval days it supports (distinct-over-window
  without any window-distinct machinery).
- p_label_noise_audit: per-IVF-bucket majority-label disagreement —
  the corpus-wide label-noise estimate (Northcutt et al.'s confident-
  learning framing, public) over the POOLED bucketing l10/sim_ivf
  share; l10 classifies probes, this audits the whole corpus.
- a32_mix_entropy: per-day Shannon entropy of the event-type mix in
  floor-quantized micro-nats (per-category FLOOR((c/n)·ln(n/c)·1e6 +
  0.5) BIGINT terms, exact integer sum — the bm25 quantization
  discipline, margin-guarded).
"""

from __future__ import annotations

import math

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
# a31_ks_two_sample — exact integer two-sample Kolmogorov–Smirnov
# ---------------------------------------------------------------------------


def _a31_fn(spark, sf_dir):
    """Two-sample KS test, exactly: sample A = totals of '1-URGENT'
    orders, sample B = the rest. At every distinct observed value v,
    the ECDF gap |F_A(v) − F_B(v)| equals |cA(v)·nB − cB(v)·nA| /
    (nA·nB) with cA/cB the cumulative counts THROUGH v (ties resolved
    by evaluating after the full tie group — the mathematically
    correct ECDF step) — all int64, so D's numerator/denominator are
    exact and the double is ONE IEEE division. Emits the evidence row:
    sizes, D as (num, den, double), and the smallest value attaining
    the max. Money values ride the cents grid (ROUND(x·100) BIGINT —
    the dsum_cents discipline) so even the value column is integer.
    Scale: one groupBy(value) + one cumulative window over DISTINCT
    values (value-cardinality-sized, not row-sized) + one global
    max-pick — the final one-row aggregate is the only
    single-partition node."""
    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v_cents"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("is_a"),
    )
    per_v = o.groupBy("v_cents").agg(
        F.sum("is_a").cast("bigint").alias("a"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("b"),
    )
    w = Window.orderBy("v_cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        "v_cents",
        F.sum("a").over(w).cast("bigint").alias("ca"),
        F.sum("b").over(w).cast("bigint").alias("cb"),
    )
    tot = o.agg(
        F.sum("is_a").cast("bigint").alias("na"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("nb"),
    )
    gap = F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
    scored = cum.crossJoin(F.broadcast(tot)).select(
        "v_cents", "na", "nb", gap.alias("gap")
    )
    pick = Window.orderBy(F.col("gap").desc(), F.col("v_cents"))
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "na",
            "nb",
            F.col("gap").alias("d_num"),
            (F.col("na") * F.col("nb")).cast("bigint").alias("d_den"),
            (
                F.col("gap").cast("double")
                / (F.col("na") * F.col("nb")).cast("double")
            ).alias("d_stat"),
            F.col("v_cents").alias("at_value_cents"),
        )
    )


_A31_SQL = """
WITH o AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v_cents,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
  FROM orders
),
per_v AS (
  SELECT v_cents, CAST(sum(is_a) AS BIGINT) AS a,
         CAST(sum(1 - is_a) AS BIGINT) AS b
  FROM o GROUP BY v_cents
),
cum AS (
  SELECT v_cents,
         CAST(sum(a) OVER (ORDER BY v_cents
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
         CAST(sum(b) OVER (ORDER BY v_cents
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
  FROM per_v
),
tot AS (
  SELECT CAST(sum(is_a) AS BIGINT) AS na,
         CAST(sum(1 - is_a) AS BIGINT) AS nb
  FROM o
)
SELECT na, nb,
       CAST(abs(ca * nb - cb * na) AS BIGINT) AS d_num,
       CAST(na * nb AS BIGINT) AS d_den,
       CAST(abs(ca * nb - cb * na) AS DOUBLE) / CAST(na * nb AS DOUBLE)
         AS d_stat,
       v_cents AS at_value_cents
FROM cum CROSS JOIN tot
ORDER BY abs(ca * nb - cb * na) DESC, v_cents
LIMIT 1
"""


def test_a31_ks_two_sample_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r18:a31_ks_two_sample", fn=_a31_fn, oracle=_A31_SQL,
        category="aggregates",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_a31_d_in_open_interval(spark, sf_oracle_dir):
    """Both samples must be non-trivially sized and D must land
    strictly inside (0, 1) — a D of 0 (identical ECDFs) or 1
    (disjoint supports) would pass the value compare while testing a
    degenerate fixture."""
    row = _a31_fn(spark, sf_oracle_dir).collect()[0]
    assert row["na"] > 10 and row["nb"] > 10
    assert 0 < row["d_num"] < row["d_den"]


# ---------------------------------------------------------------------------
# ts_seasonal_mase — seasonal-naive backtest, exact integer ratio
# ---------------------------------------------------------------------------

_MASE_SEASON = 24  # hourly data, daily seasonality


def _mase_fn(spark, sf_dir):
    """Seasonal-naive forecast backtest (Hyndman–Koehler's MASE,
    public): per event type, forecast each hourly count by the count
    one season ({_MASE_SEASON} observed buckets) earlier and score
    against the naive-1 benchmark on the SAME evaluation rows (those
    with a defined seasonal lag): mase = Σ|c − lag_s(c)| /
    Σ|c − lag_1(c)| — count differences are exact int64, both sums
    exact, ONE IEEE division at the end (< 1 means seasonality is
    real and a model should beat naive-1). Gaps: lags run over the
    OBSERVED bucket sequence (skip-gap semantics — ts_gap_fill is the
    densifier). Scale: one (type, hour) partial aggregate then a
    type-keyed lag window — no join term."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    )
    c = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = c.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("l1"),
        F.lag("c", _MASE_SEASON).over(w).alias("ls"),
    ).filter(F.col("ls").isNotNull())
    g = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum(F.abs(F.col("c") - F.col("ls"))).cast("bigint").alias("sae_seasonal"),
        F.sum(F.abs(F.col("c") - F.col("l1"))).cast("bigint").alias("sae_naive"),
    )
    return g.select(
        "event_type",
        "n_eval",
        "sae_seasonal",
        "sae_naive",
        (
            F.col("sae_seasonal").cast("double")
            / F.col("sae_naive").cast("double")
        ).alias("mase"),
    )


_MASE_SQL = f"""
WITH c AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
l AS (
  SELECT event_type, c,
         lag(c, 1) OVER w AS l1,
         lag(c, {_MASE_SEASON}) OVER w AS ls
  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY h)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_eval,
       CAST(sum(abs(c - ls)) AS BIGINT) AS sae_seasonal,
       CAST(sum(abs(c - l1)) AS BIGINT) AS sae_naive,
       CAST(sum(abs(c - ls)) AS DOUBLE) / CAST(sum(abs(c - l1)) AS DOUBLE)
         AS mase
FROM l WHERE ls IS NOT NULL
GROUP BY event_type
"""


def test_ts_seasonal_mase_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r18:ts_seasonal_mase", fn=_mase_fn, oracle=_MASE_SQL,
        category="timeseries",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_ts_mase_eval_set_nontrivial(spark, sf_oracle_dir):
    """Every type must have a real evaluation window and non-zero
    benchmark error (a constant series would divide by zero), and the
    statistic must not be constant across types."""
    rows = _mase_fn(spark, sf_oracle_dir).collect()
    assert rows
    assert all(r["n_eval"] > _MASE_SEASON for r in rows)
    assert all(r["sae_naive"] > 0 for r in rows)
    assert len({r["mase"] for r in rows}) > 1


# ---------------------------------------------------------------------------
# w23_user_stickiness — DAU / trailing-7-day distinct users, exact ppm
# ---------------------------------------------------------------------------

_STICKY_WINDOW = 7


def _w23_fn(spark, sf_dir):
    """Engagement stickiness per day: DAU(d) / WAU(d) where WAU is the
    distinct-user count over the trailing {_STICKY_WINDOW} days ending
    at d, in exact ppm (integer division). Distinct-over-sliding-
    window needs no window machinery: each DISTINCT (day, user)
    activity supports the {_STICKY_WINDOW} eval days it falls inside,
    so one bounded explode (day → day+0..{_STICKY_WINDOW}−1) + a
    distinct + a count per eval day computes every WAU in one shuffle
    — the calendar-join identity real engagement pipelines use at
    scale. Eval days restricted to those with a full trailing window
    inside the observed range (partial-history days would read as
    artificially sticky). Scale: rows fan {_STICKY_WINDOW}×, everything
    else is exact-distinct aggregation keyed by day."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    du = ev.distinct()
    dau = du.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    fan = du.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), _STICKY_WINDOW - 1)
            )
        ).alias("ed"),
    )
    wau = (
        fan.distinct()
        .groupBy("ed")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wau"))
    )
    rng = ev.agg(
        F.min("d").alias("dmin"), F.max("d").alias("dmax")
    )
    out = (
        dau.join(wau, dau.d == wau.ed)
        .crossJoin(F.broadcast(rng))
        .filter(F.col("d") >= F.date_add(F.col("dmin"), _STICKY_WINDOW - 1))
        .filter(F.col("d") <= F.col("dmax"))
    )
    return out.select(
        "d",
        "dau",
        "wau",
        F.expr("(1000000 * dau) div wau").cast("bigint").alias("sticky_ppm"),
    )


_W23_SQL = f"""
WITH du AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d),
fan AS (
  SELECT DISTINCT user_id,
         d + CAST(i AS INTEGER) AS ed
  FROM du, unnest(generate_series(0, {_STICKY_WINDOW - 1})) AS t(i)
),
wau AS (SELECT ed, CAST(count(*) AS BIGINT) AS wau FROM fan GROUP BY ed),
rng AS (SELECT min(CAST(ts AS DATE)) AS dmin, max(CAST(ts AS DATE)) AS dmax
        FROM events)
SELECT dau.d, dau.dau, wau.wau,
       CAST((1000000 * dau.dau) // wau.wau AS BIGINT) AS sticky_ppm
FROM dau JOIN wau ON wau.ed = dau.d CROSS JOIN rng
WHERE dau.d >= dmin + {_STICKY_WINDOW - 1} AND dau.d <= dmax
"""


def test_w23_user_stickiness_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r18:w23_user_stickiness", fn=_w23_fn, oracle=_W23_SQL,
        category="windows",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_w23_ratio_sane_and_varying(spark, sf_oracle_dir):
    """WAU must dominate DAU (superset), the ratio must vary across
    days, and at least {_STICKY_WINDOW} eval days must exist."""
    rows = _w23_fn(spark, sf_oracle_dir).collect()
    assert len(rows) >= _STICKY_WINDOW
    assert all(r["wau"] >= r["dau"] for r in rows)
    assert all(0 < r["sticky_ppm"] <= 1_000_000 for r in rows)
    assert len({r["sticky_ppm"] for r in rows}) > 1


# ---------------------------------------------------------------------------
# p_label_noise_audit — per-IVF-bucket majority disagreement
# ---------------------------------------------------------------------------


def _noise_fn(spark, sf_dir):
    """Corpus-wide label-noise estimate (the confident-learning
    framing, Northcutt et al., public): embed-space neighbors should
    mostly share labels, so a vector disagreeing with its IVF bucket's
    majority label is a noise suspect. Per bucket: n, the majority
    label (count DESC, label ASC tie-break), how many residents
    disagree, and noise_ppm = 1000000·n_disagree // n (exact integer
    division). l10 classifies a PROBE SET; this audits the WHOLE
    corpus from the same pooled assignment (similarity.ivf_assign —
    one cached bucketing across l10/sim_ivf/this), so the only new
    work is two bucket-keyed aggregates. Scale: bucket-cardinality
    outputs; no pair term at all. Fixture regime note: the isotropic
    embeddings carry near-chance label-bucket correlation (~80% noise
    at 10 uniform labels — the same regime PERF.md's round-5 recall
    note documents), so the guard pins the pigeonhole bound and
    variance, not an absolute purity level; on clustered corpora the
    statistic drops, which is what it monitors."""
    from x8313_etl_spark.queries.similarity_q import _ivf_assign

    assign = _ivf_assign(spark, sf_dir).select("cent_id", "vec_id", "label")
    votes = assign.groupBy("cent_id", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("votes")
    )
    pick = Window.partitionBy("cent_id").orderBy(
        F.col("votes").desc(), F.col("label")
    )
    maj = (
        votes.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "cent_id",
            F.col("label").alias("majority_label"),
            F.col("votes").alias("n_majority"),
        )
    )
    size = assign.groupBy("cent_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    out = size.join(maj, "cent_id")
    return out.select(
        F.col("cent_id").cast("bigint").alias("cent_id"),
        "n",
        F.col("majority_label").cast("int").alias("majority_label"),
        (F.col("n") - F.col("n_majority")).cast("bigint").alias("n_disagree"),
        F.expr("(1000000 * (n - n_majority)) div n")
        .cast("bigint")
        .alias("noise_ppm"),
    )


def _noise_sql():
    from x8313_etl_spark.functions.vector import sql_cosine
    from x8313_etl_spark.queries.similarity_q import _K_CENTROIDS

    return f"""
WITH e AS (SELECT vec_id, embedding, label FROM embeddings),
cent AS (SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
         WHERE vec_id < {_K_CENTROIDS}),
assign AS (
  SELECT vec_id, cent_id, label FROM (
    SELECT e.vec_id, cent.cent_id, e.label,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {sql_cosine('e.embedding', 'cent.cvec')} DESC, cent.cent_id
           ) AS crn
    FROM e CROSS JOIN cent
  ) WHERE crn = 1
),
votes AS (
  SELECT cent_id, label, CAST(count(*) AS BIGINT) AS votes
  FROM assign GROUP BY 1, 2
),
maj AS (
  SELECT cent_id, label AS majority_label, votes AS n_majority FROM (
    SELECT cent_id, label, votes,
           row_number() OVER (PARTITION BY cent_id
                              ORDER BY votes DESC, label) AS rn
    FROM votes
  ) WHERE rn = 1
),
size AS (SELECT cent_id, CAST(count(*) AS BIGINT) AS n FROM assign GROUP BY 1)
SELECT CAST(s.cent_id AS BIGINT) AS cent_id, s.n,
       CAST(m.majority_label AS INTEGER) AS majority_label,
       CAST(s.n - m.n_majority AS BIGINT) AS n_disagree,
       CAST((1000000 * (s.n - m.n_majority)) // s.n AS BIGINT) AS noise_ppm
FROM size s JOIN maj m ON m.cent_id = s.cent_id
"""


def test_p_label_noise_audit_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r18:p_label_noise_audit", fn=_noise_fn, oracle=_noise_sql(),
        category="pipeline",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_p_label_noise_bounds_and_varies(spark, sf_oracle_dir):
    """On the ISOTROPIC fixture labels are near-independent of the
    embedding geometry, so bucket purity sits near the uniform-label
    chance floor (measured ~76–88% noise at 10 labels) — the audit
    reports that honestly; on clustered corpora the number drops,
    which is the signal it exists for. The pinnable invariants:
    noise_ppm ∈ [0, 1e6), majority beats the pigeonhole floor
    (n_majority ≥ ceil(n / n_labels)) in EVERY bucket with strict
    excess somewhere, and the statistic varies across buckets."""
    rows = _noise_fn(spark, sf_oracle_dir).collect()
    assert rows
    n_labels = (
        load_table(spark, sf_oracle_dir, "embeddings")
        .select("label")
        .distinct()
        .count()
    )
    assert all(0 <= r["noise_ppm"] < 1_000_000 for r in rows)
    for r in rows:
        n_majority = r["n"] - r["n_disagree"]
        assert n_majority >= -(-r["n"] // n_labels), r  # ceil division
    assert any(
        (r["n"] - r["n_disagree"]) > -(-r["n"] // n_labels) for r in rows
    )
    assert len({r["noise_ppm"] for r in rows}) > 1


# ---------------------------------------------------------------------------
# a32_mix_entropy — per-day event-type mix entropy, floor-quantized
# ---------------------------------------------------------------------------

_ENT_SCALE = 1_000_000


def _entropy_fn(spark, sf_dir):
    """Per-day Shannon entropy of the event-type mix in micro-nats:
    H = Σ_cat (c/n)·ln(n/c), each term floor-quantized to
    FLOOR(t·1e6 + 0.5) BIGINT before the exact integer sum (the bm25
    discipline: multiply/divide/ln on IDENTICAL doubles are
    IEEE-identical across engines; the only residual hazard is libm-ln
    last-ulp wobble landing on a floor boundary, margin-guarded
    below). The mix-diversity statistic a domain-mixing pipeline
    monitors day over day (a collapsed mix — one event type crowding
    out the rest — drops H loudly). Scale: one (day, type) partial
    aggregate, a broadcast of day totals, one day-keyed sum."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "event_type"
    )
    c = ev.groupBy("d", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    n = ev.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    term = F.floor(
        (F.col("c").cast("double") / F.col("n").cast("double"))
        * F.log(F.col("n").cast("double") / F.col("c").cast("double"))
        * F.lit(float(_ENT_SCALE))
        + F.lit(0.5)
    ).cast("bigint")
    j = c.join(F.broadcast(n), "d")
    return (
        j.select("d", "n", term.alias("t"))
        .groupBy("d", "n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum("t").cast("bigint").alias("entropy_u6"),
        )
        .select("d", "n", "n_types", "entropy_u6")
    )


_ENTROPY_SQL = f"""
WITH c AS (
  SELECT CAST(ts AS DATE) AS d, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
n AS (SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1)
SELECT c.d, n.n,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CAST(FLOOR(
         (CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE))
         * ln(CAST(n.n AS DOUBLE) / CAST(c.c AS DOUBLE))
         * {_ENT_SCALE}.0 + 0.5) AS BIGINT)) AS BIGINT) AS entropy_u6
FROM c JOIN n ON n.d = c.d
GROUP BY c.d, n.n
"""


def test_a32_mix_entropy_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r18:a32_mix_entropy", fn=_entropy_fn, oracle=_ENTROPY_SQL,
        category="aggregates",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_a32_floor_boundary_margin(spark, sf_dir, sf_oracle_dir):
    """Every (c, n) term's (c/n)·ln(n/c)·1e6 + 0.5 must sit safely
    away from an integer floor boundary at every fixture sf, so a
    few-ulp cross-libm ln() wobble provably cannot flip a quantized
    term (the bm25 margin discipline)."""
    for d in (sf_dir, sf_oracle_dir):
        ev = load_table(spark, d, "events").select(
            F.to_date("ts").alias("d"), "event_type"
        )
        c = ev.groupBy("d", "event_type").count()
        n = ev.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
        pairs = [
            (r["count"], r["n"])
            for r in c.join(n, "d").select("count", "n").collect()
        ]
        for cc, nn in pairs:
            x = (cc / nn) * math.log(nn / cc) * _ENT_SCALE + 0.5
            frac = x - math.floor(x)
            margin = min(frac, 1 - frac)
            assert margin > 1e-6, (d, cc, nn, margin)


def test_a32_entropy_orders_days_sanely(spark, sf_oracle_dir):
    """Entropy must be positive everywhere (≥ 2 types per day on the
    fixture), bounded by ln(n_types) in micro-nats, and non-constant
    across days."""
    rows = _entropy_fn(spark, sf_oracle_dir).collect()
    assert rows
    for r in rows:
        assert r["n_types"] >= 2
        assert 0 < r["entropy_u6"] <= math.log(r["n_types"]) * _ENT_SCALE + r[
            "n_types"
        ]
    assert len({r["entropy_u6"] for r in rows}) > 1
