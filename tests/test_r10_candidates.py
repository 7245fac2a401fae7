"""Pre-registration oracle checks — round-9-authored candidate batch H.

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0) on an ad-hoc UNREGISTERED QuerySpec, so a
future round's registration is a verbatim fn+oracle copy. ROADMAP.md
"Candidate surface" carries the notes.

Batch H fills gaps the r9 self-review identified:
- ts_zscore_anomaly: rolling-window anomaly detection — the monitoring
  op every timeseries store ships; the |x−μ| > kσ decision is done in
  FULLY-INTEGER algebra ((n·x−S1)² vs k²(n·S2−S1²)) so there is no
  sqrt, no division, and no cross-engine fp surface at all.
- m11_incremental_view_maintenance: signed-delta MERGE maintenance of
  an aggregate materialized view — the warehouse op that avoids
  re-aggregating 100 TB per ingest; verified against a full-recompute
  twin.
- p_winsorize: per-slice quantile clamping of token counts (curation
  outlier handling; the g3 CEIL(quantile) integer-threshold
  discipline).
- t20_stream_windowed_topk: continuous per-window leaderboard — update
  mode over a REAL 4-micro-batch feed (t15's split-file pattern);
  final state reduced by max(n) per key (counts are monotone under
  update mode, so the reduction is batch-split-invariant), then ranked.
- p_item_cf: item-item co-occurrence similarity (the co-purchase /
  co-occurrence statistic; recsys + corpus-analysis staple) with
  exact-integer inputs and a single-IEEE-divide ranking score.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from x8313_etl_spark import audit
from x8313_etl_spark.io import load_table, stream_events
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
# ts_zscore_anomaly — rolling-window anomaly flags, fully-integer algebra
# ---------------------------------------------------------------------------

_ZS_W = 20  # rolling window (preceding rows, current row excluded)
_ZS_K2 = 9  # k² for the k=3σ rule


def _zscore_fn(spark, sf_dir):
    """Rolling z-score anomaly flags per series: a reading is anomalous
    when |x − μ| > kσ over the W preceding observations (current row
    excluded — the standard 'compare against recent history' form).
    ENGINE-EXACT BY CONSTRUCTION: with integer cents, n = W,
    S1 = Σ cents, S2 = Σ cents², the rule |x−μ| > kσ is equivalent to
    (W·x − S1)² > k²·(W·S2 − S1²) — every quantity an int64 (bounds:
    cents ≤ ~10⁴, W = 20 → dev² ≤ 1.6e11, W·S2 ≤ 4e10), so there is no
    sqrt, no division, and no fp at any point; the twin replays the
    identical integer algebra. Rows with fewer than W predecessors are
    warm-up and not emitted. One window shuffle keyed by series; the
    two rolling sums share the single (series, ts, event_id) sort."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("series"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("series")
        .orderBy("ts", "event_id")
        .rowsBetween(-_ZS_W, -1)
    )
    r = ev.select(
        "series",
        "event_id",
        "cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cents").over(w).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(w).alias("s2"),
    ).filter(F.col("n") == _ZS_W)
    dev = _ZS_W * F.col("cents") - F.col("s1")
    var_n = _ZS_W * F.col("s2") - F.col("s1") * F.col("s1")
    return r.select(
        "series",
        "event_id",
        "cents",
        (dev * dev).cast("bigint").alias("dev2"),
        (F.lit(_ZS_K2) * var_n).cast("bigint").alias("k2var"),
        (dev * dev > _ZS_K2 * var_n).alias("is_anomaly"),
    )


_ZS_SQL = f"""
WITH r AS (
  SELECT event_type AS series, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         count(*) OVER w AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS s1,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS s2
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN {_ZS_W} PRECEDING AND 1 PRECEDING)
)
SELECT series, event_id, cents,
       ({_ZS_W} * cents - s1) * ({_ZS_W} * cents - s1) AS dev2,
       {_ZS_K2} * ({_ZS_W} * s2 - s1 * s1) AS k2var,
       ({_ZS_W} * cents - s1) * ({_ZS_W} * cents - s1)
         > {_ZS_K2} * ({_ZS_W} * s2 - s1 * s1) AS is_anomaly
FROM r WHERE n = {_ZS_W}
"""


def test_ts_zscore_anomaly_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r10:ts_zscore_anomaly", fn=_zscore_fn, oracle=_ZS_SQL,
        category="timeseries",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_ts_zscore_flags_are_nontrivial(spark, sf_oracle_dir):
    """Some anomalies AND some normals — a threshold that never (or
    always) fires verifies nothing about the decision algebra."""
    out = _zscore_fn(spark, sf_oracle_dir).groupBy("is_anomaly").count()
    got = {r["is_anomaly"]: r["count"] for r in out.collect()}
    assert got.get(True, 0) > 0 and got.get(False, 0) > 0


# ---------------------------------------------------------------------------
# m11_incremental_view_maintenance — signed-delta MERGE of an aggregate MV
# ---------------------------------------------------------------------------

_M11_INS_MOD = 3  # l_orderkey % 3 == 0 rows arrive as inserts
_M11_DEL_MOD = 13  # base rows with l_partkey % 13 == 0 are deleted


def _m11_fn(spark, sf_dir):
    """Incremental view maintenance (IVM): a SUM/COUNT materialized view
    is advanced by a signed delta instead of a recompute — the
    warehouse op that keeps a 100 TB fact table's rollup fresh with
    delta-sized work. Base state = lineitem without the insert slice;
    the delta carries +1 rows (the arriving slice) and −1 rows (base
    rows deleted by predicate). The MV algebra: aggregate the SIGNED
    delta per group (sign·1 for counts, sign·cents for sums — all
    int64), full-outer-merge with the standing MV on the group key, add
    componentwise, drop groups whose count reaches zero. The twin
    recomputes the final state from scratch, so the compare proves the
    delta algebra ≡ recompute. Scale: delta-sized scan + one MV-sized
    merge (the MV is groups-sized, tiny); the recompute the operator
    replaces is the full-fact-table aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        "l_orderkey",
        "l_partkey",
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("qty_c"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
    )
    base = li.filter(F.col("l_orderkey") % _M11_INS_MOD != 0)
    ins = li.filter(F.col("l_orderkey") % _M11_INS_MOD == 0)
    dels = base.filter(F.col("l_partkey") % _M11_DEL_MOD == 0)

    def agg(df, sign):
        s = F.lit(sign)
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(s).cast("bigint").alias("dn"),
            F.sum(s * F.col("qty_c")).cast("bigint").alias("dqty"),
            F.sum(s * F.col("price_c")).cast("bigint").alias("dprice"),
        )

    mv = base.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("qty_c").cast("bigint").alias("qty_cents"),
        F.sum("price_c").cast("bigint").alias("price_cents"),
    )
    delta = (
        agg(ins, 1)
        .unionByName(agg(dels, -1))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("dn").cast("bigint").alias("dn"),
            F.sum("dqty").cast("bigint").alias("dqty"),
            F.sum("dprice").cast("bigint").alias("dprice"),
        )
    )
    merged = mv.join(delta, ["l_returnflag", "l_linestatus"], "full_outer")
    z = F.lit(0).cast("bigint")
    return (
        merged.select(
            "l_returnflag",
            "l_linestatus",
            (F.coalesce("n_rows", z) + F.coalesce("dn", z)).alias("n_rows"),
            (F.coalesce("qty_cents", z) + F.coalesce("dqty", z)).alias("qty_cents"),
            (F.coalesce("price_cents", z) + F.coalesce("dprice", z)).alias(
                "price_cents"
            ),
        )
        .filter(F.col("n_rows") > 0)
    )


_M11_SQL = f"""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS qty_cents,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM lineitem
WHERE NOT (l_orderkey % {_M11_INS_MOD} <> 0 AND l_partkey % {_M11_DEL_MOD} = 0)
GROUP BY 1, 2
"""


def test_m11_ivm_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r10:m11_incremental_view_maintenance", fn=_m11_fn,
        oracle=_M11_SQL, category="etl",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_m11_delta_is_nonempty_both_ways(spark, sf_oracle_dir):
    """Inserts AND deletes must both carry rows — a one-sided delta
    leaves half the signed-merge algebra unexercised."""
    li = load_table(spark, sf_oracle_dir, "lineitem")
    n_ins = li.filter(F.col("l_orderkey") % _M11_INS_MOD == 0).count()
    n_del = li.filter(
        (F.col("l_orderkey") % _M11_INS_MOD != 0)
        & (F.col("l_partkey") % _M11_DEL_MOD == 0)
    ).count()
    assert n_ins > 0 and n_del > 0


# ---------------------------------------------------------------------------
# p_winsorize — per-slice quantile clamp of token counts
# ---------------------------------------------------------------------------

_WINS_LO, _WINS_HI = 0.05, 0.95


def _winsorize_fn(spark, sf_dir):
    """Winsorization: clamp per-source token counts into the
    [p05, p95] band — the curation step that stops length outliers
    (boilerplate dumps, truncated fragments) from dominating
    length-sensitive statistics. Thresholds are the g3 CEIL(quantile)
    integer discipline: exact percentile over int64 token counts, CEIL
    to an integer bound — quantile-derived, so the operator stays
    nontrivially exercised at every sf. One groupBy for the per-source
    bounds (sources-sized, broadcast back), one map-side clamp."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    bounds = d.groupBy("source").agg(
        F.ceil(F.expr(f"percentile(n_tokens, {_WINS_LO})")).alias("lo"),
        F.ceil(F.expr(f"percentile(n_tokens, {_WINS_HI})")).alias("hi"),
    )
    out = d.join(F.broadcast(bounds), "source")
    clamped = F.least(F.greatest(F.col("n_tokens"), F.col("lo")), F.col("hi"))
    return out.select(
        "doc_id",
        "source",
        "n_tokens",
        F.col("lo").cast("bigint").alias("lo"),
        F.col("hi").cast("bigint").alias("hi"),
        clamped.cast("bigint").alias("clamped"),
        (clamped != F.col("n_tokens")).alias("was_clamped"),
    )


_WINS_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT source,
         CAST(ceil(quantile_cont(n_tokens, {_WINS_LO})) AS BIGINT) AS lo,
         CAST(ceil(quantile_cont(n_tokens, {_WINS_HI})) AS BIGINT) AS hi
  FROM d GROUP BY source
)
SELECT d.doc_id, d.source, d.n_tokens, b.lo, b.hi,
       least(greatest(d.n_tokens, b.lo), b.hi) AS clamped,
       least(greatest(d.n_tokens, b.lo), b.hi) <> d.n_tokens AS was_clamped
FROM d JOIN b ON b.source = d.source
"""


def test_p_winsorize_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r10:p_winsorize", fn=_winsorize_fn, oracle=_WINS_SQL,
        category="pipeline",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_p_winsorize_clamps_both_tails(spark, sf_oracle_dir):
    """Low-tail and high-tail clamps must both occur, and most rows must
    pass through unclamped (the definition of a 5/95 band)."""
    out = _winsorize_fn(spark, sf_oracle_dir)
    lo_hits = out.filter(F.col("clamped") > F.col("n_tokens")).count()
    hi_hits = out.filter(F.col("clamped") < F.col("n_tokens")).count()
    total = out.count()
    assert lo_hits > 0 and hi_hits > 0
    assert lo_hits + hi_hits < total / 2


# ---------------------------------------------------------------------------
# t20_stream_windowed_topk — continuous per-window leaderboard
# ---------------------------------------------------------------------------

_T20_TOPK = 3


def _t20_fn(spark, sf_dir):
    """Continuous per-window leaderboard: tumbling 1-hour counts per
    event type in UPDATE mode over a REAL 4-micro-batch feed (t15's
    split-file pattern), then the final top-{_T20_TOPK} per window.
    Update mode emits one row per (key, updating batch); counts are
    MONOTONE per key, so max(n) per key is the final state no matter
    how the feed splits into batches (batch-split invariance by
    algebra, not by luck) — the rank then runs on that reduced state.
    The twin is the batch tumbling top-k. Scale: the streaming agg
    state is keys-sized; the final rank is a WindowGroupLimit over the
    windows×types table."""
    import os
    import shutil
    import time as _time
    import uuid as _uuid

    from x8313_etl_spark.queries.sources_q import _tag, scratch
    from x8313_etl_spark.schemas import SCHEMAS
    from x8313_etl_spark.streaming import run_to_memory

    family = scratch(f"t20_topk_{_tag(sf_dir)}")
    cutoff = _time.time() - 1800
    for sub in os.listdir(family) if os.path.isdir(family) else []:
        p = os.path.join(family, sub)
        try:
            if os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    work = os.path.join(family, _uuid.uuid4().hex[:12])
    src_dir = os.path.join(work, "src")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(src_dir)

    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    agg = stream.groupBy(
        F.window(F.col("ts"), "1 hour").alias("w"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    sink = run_to_memory(spark, agg, "t20_topk", "update")
    final = sink.groupBy(F.col("w.start").alias("wstart"), "event_type").agg(
        F.max("n").cast("bigint").alias("n_events")
    )
    rk = Window.partitionBy("wstart").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        final.withColumn("rn", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rn") <= _T20_TOPK)
        .select("wstart", "event_type", "n_events", "rn")
    )


_T20_SQL = f"""
WITH c AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT wstart, event_type, n_events, rn FROM (
  SELECT wstart, event_type, n_events,
         CAST(row_number() OVER (PARTITION BY wstart
                                 ORDER BY n_events DESC, event_type)
              AS BIGINT) AS rn
  FROM c
) WHERE rn <= {_T20_TOPK}
"""


def test_t20_stream_windowed_topk_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r10:t20_stream_windowed_topk", fn=_t20_fn, oracle=_T20_SQL,
        category="streaming",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_t20_rank_actually_cuts(spark, sf_oracle_dir):
    """Some window must have more event types than the top-k keeps —
    otherwise the rank filter is vacuous at this sf."""
    from x8313_etl_spark.io import load_table as _lt

    types_per_window = (
        _lt(spark, sf_oracle_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
        .groupBy("window")
        .count()
    )
    assert types_per_window.filter(F.col("count") > _T20_TOPK).count() > 0


# ---------------------------------------------------------------------------
# p_item_cf — item-item co-occurrence similarity, integer-exact ranking
# ---------------------------------------------------------------------------

_CF_TOPK = 3


def _item_cf_fn(spark, sf_dir):
    """Item-item co-occurrence similarity (the co-purchase statistic:
    'users who bought X also bought Y'; the same shape scores term
    co-occurrence in corpus analysis): baskets are orders, items are
    parts. Co-occurrence counts c_ab come from the basket self-join
    (a < b, then symmetrized); each item ranks its neighbors by cosine
    over basket-incidence vectors, cos² = c_ab²/(c_a·c_b). The score
    is ONE IEEE division of exact int64s — engines given identical
    integers produce the identical double, so the ORDER BY is
    engine-exact (no sums of libm terms anywhere); the OUTPUT carries
    only the integer evidence (c_ab, c_a, c_b) + rank. Scale: the
    self-join's pair volume is Σ basket² — baskets are order-sized
    (≤7 lineitems), so the term is linear in orders; the top-k is a
    WindowGroupLimit. 10×-sweep before registration (join-term
    invariant)."""
    bi = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
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
        F.col("pa").alias("item"), F.col("pb").alias("other"), "c_ab"
    ).unionByName(
        pairs.select(
            F.col("pb").alias("item"), F.col("pa").alias("other"), "c_ab"
        )
    )
    j = (
        sym.join(cnt.select(F.col("l_partkey").alias("item"), F.col("c").alias("c_i")), "item")
        .join(cnt.select(F.col("l_partkey").alias("other"), F.col("c").alias("c_o")), "other")
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


_CF_SQL = f"""
WITH bi AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
),
cnt AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM bi GROUP BY p),
pairs AS MATERIALIZED (
  SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS c_ab
  FROM bi a JOIN bi b ON a.ok = b.ok AND a.p < b.p
  GROUP BY 1, 2
),
sym AS (
  SELECT pa AS item, pb AS other, c_ab FROM pairs
  UNION ALL
  SELECT pb AS item, pa AS other, c_ab FROM pairs
),
j AS (
  SELECT s.item, s.other, s.c_ab, ci.c AS c_i, co.c AS c_o
  FROM sym s JOIN cnt ci ON ci.p = s.item JOIN cnt co ON co.p = s.other
)
SELECT item, other, c_ab, c_i, c_o, rn FROM (
  SELECT item, other, c_ab, c_i, c_o,
         CAST(row_number() OVER (
           PARTITION BY item
           ORDER BY CAST(c_ab * c_ab AS DOUBLE) / CAST(c_i * c_o AS DOUBLE)
                    DESC, other
         ) AS BIGINT) AS rn
  FROM j
) WHERE rn <= {_CF_TOPK}
"""


def test_p_item_cf_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r10:p_item_cf", fn=_item_cf_fn, oracle=_CF_SQL,
        category="pipeline",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_p_item_cf_rank_is_discriminative(spark, sf_oracle_dir):
    """The ranking must actually discriminate: some item's top
    neighbor list must contain differing scores (not all ties) —
    all-tied ranks would mean doc_id tiebreak decided everything and
    the similarity term is untested."""
    out = _item_cf_fn(spark, sf_oracle_dir)
    diverse = (
        out.withColumn(
            "s",
            (F.col("c_ab") * F.col("c_ab")).cast("double")
            / (F.col("c_i") * F.col("c_o")).cast("double"),
        )
        .groupBy("item")
        .agg(F.countDistinct("s").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert diverse > 0
