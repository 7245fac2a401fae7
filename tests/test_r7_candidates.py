"""Pre-registration oracle checks for the REMAINING candidate queries.

Round 7 registered fifteen of this module's nineteen candidates
(fn + oracle copied verbatim into the query modules; their compares now
run in tests/test_oracle.py like every registered query, and the
fixture-nontriviality guards moved to tests/test_registered_guards.py).
The four below stay pre-verified for the r8 window: each runs the EXACT
compare the registry queries get (tests/oracle_utils.compare_query,
tolerance 0) on an ad-hoc UNREGISTERED QuerySpec. See ROADMAP.md.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from x8313_etl_spark import audit
from x8313_etl_spark.io import load_table
from x8313_etl_spark.registry import QuerySpec

from .oracle_utils import compare_query


@pytest.fixture(autouse=True, scope="module")
def _scrub_ledger_keys():
    """These UNREGISTERED candidate fns route through audited_checkpoint
    with their own ledger keys (g8.edges_r7test, g8.capcheck.*, the a25
    rank key). The materialization-ledger gate audits REGISTERED
    queries only — forget every key this module introduced so a full
    suite run doesn't present the gate with unallowlisted keys (caught
    by the r6 full-suite run: test_ledger_has_no_unjustified_flags
    failed on g8's test keys while passing in isolation). Keys that
    already existed keep their first-write-wins record."""
    before = set(audit.ledger())
    yield
    for key in set(audit.ledger()) - before:
        audit.forget(key)



_NS_K, _NS_OVER, _NS_QMOD = 4, 2, 10


def _negsample_fn(spark, sf_dir):
    from x8313_etl_spark.operators.negsample import negative_samples

    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    q = orders.filter(F.col("o_orderkey") % _NS_QMOD == 0).select("o_orderkey")
    pos = li.select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_partkey").alias("p_partkey"),
    )
    return negative_samples(
        q, part.select("p_partkey"), pos, _NS_K,
        q_col="o_orderkey", cand_col="p_partkey",
        rank_key="negsample.r7test", over_factor=_NS_OVER,
    )


_NS_SQL = f"""
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM part),
c AS (SELECT p_partkey AS cand_id,
             row_number() OVER (ORDER BY p_partkey) - 1 AS idx
      FROM part),
q AS (SELECT o_orderkey AS qid FROM orders WHERE o_orderkey % {_NS_QMOD} = 0),
d AS (
  SELECT qid, i AS draw,
         (CAST(CONCAT('0x', substr(md5(CAST(qid AS VARCHAR) || ':' ||
                                        CAST(i AS VARCHAR)), 1, 15))
               AS BIGINT) % 2147483647) % (SELECT n FROM n) AS idx
  FROM q, unnest(generate_series(0, {_NS_OVER * _NS_K - 1})) AS t(i)
),
j AS (
  SELECT d.qid, c.cand_id, min(d.draw) AS first_draw
  FROM d JOIN c USING (idx)
  WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = d.qid AND l.l_partkey = c.cand_id)
  GROUP BY d.qid, c.cand_id
)
SELECT qid, cand_id,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY first_draw)
            AS BIGINT) AS draw_rank
FROM j
QUALIFY draw_rank <= {_NS_K}
"""


def test_negative_samples_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:p_negative_samples", fn=_negsample_fn, oracle=_NS_SQL,
        category="pipeline",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail



_RRF_SCALE, _RRF_C, _RRF_TOPK = 10**12, 60, 5


def _rrf_fn(spark, sf_dir):
    from pyspark.sql import Window

    from x8313_etl_spark.io import load_table as _lt
    from x8313_etl_spark.operators.annscan import cosine_probe_topk
    from x8313_etl_spark.queries.corpus_q import BM25_N_QUERIES, p_bm25_topk

    lex = p_bm25_topk(spark, sf_dir).select(
        "q_id", "doc_id", F.col("rn").alias("r")
    )
    e = _lt(spark, sf_dir, "embeddings")
    sem = cosine_probe_topk(
        e, e.filter(F.col("vec_id") < BM25_N_QUERIES), k=_RRF_TOPK
    ).select(
        F.col("probe_id").alias("q_id"),
        F.col("vec_id").alias("doc_id"),
        F.col("rn").cast("bigint").alias("r"),
    )
    contrib = F.expr(f"{_RRF_SCALE} div ({_RRF_C} + r)")
    u = lex.select("q_id", "doc_id", contrib.alias("c")).unionByName(
        sem.select("q_id", "doc_id", contrib.alias("c"))
    )
    f = u.groupBy("q_id", "doc_id").agg(
        F.sum("c").cast("bigint").alias("rrf_score"),
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("rrf_score").desc(), "doc_id")
    return (
        f.withColumn("fused_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("fused_rank") <= _RRF_TOPK)
        .select("q_id", "doc_id", "rrf_score", "n_lists", "fused_rank")
    )


def _rrf_sql():
    from x8313_etl_spark.functions.vector import sql_cosine
    from x8313_etl_spark.queries.corpus_q import BM25_N_QUERIES
    from x8313_etl_spark.registry import registry

    bm25 = registry()["p_bm25_topk"].oracle
    cos = sql_cosine("p.embedding", "x.embedding")
    return f"""
WITH lex AS MATERIALIZED ({bm25}),
sem AS MATERIALIZED (
  SELECT q_id, doc_id, r FROM (
    SELECT p.vec_id AS q_id, x.vec_id AS doc_id,
           row_number() OVER (PARTITION BY p.vec_id
                              ORDER BY {cos} DESC, x.vec_id) AS r
    FROM embeddings p, embeddings x
    WHERE p.vec_id < {BM25_N_QUERIES} AND x.vec_id != p.vec_id)
  WHERE r <= {_RRF_TOPK}),
u AS (
  SELECT q_id, doc_id, {_RRF_SCALE} // ({_RRF_C} + rn) AS c FROM lex
  UNION ALL
  SELECT q_id, doc_id, {_RRF_SCALE} // ({_RRF_C} + r) AS c FROM sem),
f AS (
  SELECT q_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_score,
         CAST(COUNT(*) AS BIGINT) AS n_lists
  FROM u GROUP BY q_id, doc_id)
SELECT q_id, doc_id, rrf_score, n_lists, fused_rank FROM (
  SELECT f.*, CAST(row_number() OVER (PARTITION BY q_id
                   ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS fused_rank
  FROM f)
WHERE fused_rank <= {_RRF_TOPK}
"""


def test_sim_hybrid_rrf_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:sim_hybrid_rrf", fn=_rrf_fn, oracle=_rrf_sql(),
        category="similarity",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail



def _g10_fn(spark, sf_dir):
    """G10 candidate: GraphSAGE-style neighbor feature aggregation —
    the sampling-free mean aggregator that turns a graph + node
    features into GNN training rows (Hamilton et al., public paper).
    Graph: the shared quantile-thresholded supplier co-supply edges
    (g3/g5/g7's `_cosupply_edges`). Features: integer supplier
    signals derived in-plan (acctbal cents, distinct parts supplied).
    Layer 1 = truncating integer mean of neighbor features; layer 2 =
    the same aggregator over layer-1 outputs (the stacked-layer form).
    Scale: per layer ONE edges-to-features equi-shuffle + a map-side-
    combined mean — linear in |E|, the g1 round discipline without
    iteration count concerns (2 fixed layers)."""
    import pyspark.sql.functions as F

    from x8313_etl_spark.queries.graph_q import _cosupply_edges

    e = _cosupply_edges(spark, sf_dir, "g10.edges_r7test")
    eu = e.select(F.col("s1").alias("src"), F.col("s2").alias("dst")).unionByName(
        e.select(F.col("s2").alias("src"), F.col("s1").alias("dst"))
    )
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    parts = li.groupBy("l_suppkey").agg(
        F.count_distinct("l_partkey").alias("n_parts")
    )
    feats = (
        s.join(parts, s.s_suppkey == parts.l_suppkey, "left")
        .select(
            F.col("s_suppkey").alias("node"),
            F.expr("cast(round(s_acctbal * 100) as bigint)").alias("f_bal"),
            F.coalesce("n_parts", F.lit(0)).cast("bigint").alias("f_parts"),
        )
    )
    h1 = (
        eu.join(feats, eu.dst == feats.node)
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("deg"),
            F.sum("f_bal").alias("sb"),
            F.sum("f_parts").alias("sp"),
        )
        .select(
            F.col("src").alias("node"),
            F.col("deg").cast("bigint").alias("degree"),
            F.expr("sb div deg").alias("h1_bal"),
            F.expr("sp div deg").alias("h1_parts"),
        )
    )
    h2 = (
        eu.join(
            h1.select("node", "h1_bal", "h1_parts"), eu.dst == F.col("node")
        )
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("deg"),
            F.sum("h1_bal").alias("sb"),
            F.sum("h1_parts").alias("sp"),
        )
        .select(
            F.col("src").alias("node"),
            F.expr("sb div deg").alias("h2_bal"),
            F.expr("sp div deg").alias("h2_parts"),
        )
    )
    return (
        h1.join(h2, "node")
        .select(
            F.col("node").cast("bigint").alias("s_suppkey"),
            "degree",
            "h1_bal",
            "h1_parts",
            "h2_bal",
            "h2_parts",
        )
    )


_G10_SQL = """
WITH pairs AS MATERIALIZED (
  SELECT s1, s2, count(DISTINCT ok) AS shared FROM (
    SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, a.l_orderkey AS ok
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  ) GROUP BY s1, s2
),
t AS (SELECT CEIL(quantile_cont(shared, 0.8)) AS thr FROM pairs),
eu AS MATERIALIZED (
  SELECT s1 AS src, s2 AS dst FROM pairs, t WHERE shared >= thr
  UNION ALL
  SELECT s2 AS src, s1 AS dst FROM pairs, t WHERE shared >= thr
),
feats AS MATERIALIZED (
  SELECT s.s_suppkey AS node,
         CAST(round(s.s_acctbal * 100) AS BIGINT) AS f_bal,
         CAST(coalesce(p.n_parts, 0) AS BIGINT) AS f_parts
  FROM supplier s LEFT JOIN (
    SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts
    FROM lineitem GROUP BY l_suppkey) p
  ON p.l_suppkey = s.s_suppkey
),
h1 AS MATERIALIZED (
  SELECT eu.src AS node, CAST(count(*) AS BIGINT) AS degree,
         CAST(SUM(f.f_bal) AS BIGINT) // CAST(count(*) AS BIGINT) AS h1_bal,
         CAST(SUM(f.f_parts) AS BIGINT) // CAST(count(*) AS BIGINT) AS h1_parts
  FROM eu JOIN feats f ON f.node = eu.dst
  GROUP BY eu.src
),
h2 AS (
  SELECT eu.src AS node,
         CAST(SUM(h.h1_bal) AS BIGINT) // CAST(count(*) AS BIGINT) AS h2_bal,
         CAST(SUM(h.h1_parts) AS BIGINT) // CAST(count(*) AS BIGINT) AS h2_parts
  FROM eu JOIN h1 h ON h.node = eu.dst
  GROUP BY eu.src
)
SELECT CAST(h1.node AS BIGINT) AS s_suppkey, h1.degree,
       h1.h1_bal, h1.h1_parts, h2.h2_bal, h2.h2_parts
FROM h1 JOIN h2 ON h2.node = h1.node
"""


def test_g10_neighbor_agg_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:g10_neighbor_agg", fn=_g10_fn, oracle=_G10_SQL,
        category="graph",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail



_ACF_LAGS = (1, 2, 3)


def _acf_fn(spark, sf_dir):
    """ts_acf candidate: per-series autocorrelation at fixed lags — the
    seasonality/persistence diagnostic a forecasting pipeline (ts_holt,
    ts_seasonal_decompose) reads first. Engine-exact by the CUSUM
    discipline: values quantized to integer cents, the per-series mean
    is the TRUNCATING division tot div n, and the ACF is returned as
    exact integer (numerator, denominator) pairs rather than a float
    ratio — num_l = sum (y_t - mu)(y_{t+l} - mu), den = sum (y_t - mu)²
    over the (ts, event_id)-ordered stream. One window pass per lag on
    the same series partitioning (a single shuffle, WindowExec reuses
    the sort); integer sums are order-free."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("user_id").cast("bigint").alias("series"),
        "ts",
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("yc"),
    )
    stats = base.groupBy("series").agg(
        F.sum("yc").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    d = base.join(stats, "series").select(
        "series", "ts", "event_id", "n",
        (F.col("yc") - F.expr("tot div n")).alias("dev"),
    )
    w = Window.partitionBy("series").orderBy("ts", "event_id")
    lagged = d.select(
        "series",
        "n",
        "dev",
        *[F.lead("dev", l).over(w).alias(f"dev_{l}") for l in _ACF_LAGS],
    )
    rows = []
    for l in _ACF_LAGS:
        rows.append(
            lagged.groupBy("series")
            .agg(
                F.first("n").alias("n"),
                F.sum(F.col("dev") * F.col(f"dev_{l}")).alias("num"),
                F.sum(F.col("dev") * F.col("dev")).alias("den"),
            )
            .select(
                "series",
                F.lit(l).cast("bigint").alias("lag"),
                F.col("n").cast("bigint").alias("n"),
                F.col("num").cast("bigint").alias("num"),
                F.col("den").cast("bigint").alias("den"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _acf_sql():
    lag_selects = []
    for l in _ACF_LAGS:
        lag_selects.append(f"""
  SELECT series, CAST({l} AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
         CAST(SUM(dev * dev_{l}) AS BIGINT) AS num,
         CAST(SUM(dev * dev) AS BIGINT) AS den
  FROM lagged GROUP BY series, n""")
    union = "\n  UNION ALL\n".join(lag_selects)
    leads = ", ".join(
        f"lead(dev, {l}) OVER (PARTITION BY series ORDER BY ts, event_id)"
        f" AS dev_{l}"
        for l in _ACF_LAGS
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT CAST(user_id AS BIGINT) AS series, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS yc
  FROM events),
stats AS (
  SELECT series, CAST(SUM(yc) AS BIGINT) AS tot,
         CAST(count(*) AS BIGINT) AS n
  FROM base GROUP BY series),
d AS (
  SELECT b.series, b.ts, b.event_id, s.n, b.yc - (s.tot // s.n) AS dev
  FROM base b JOIN stats s ON s.series = b.series),
lagged AS MATERIALIZED (
  SELECT series, n, dev, {leads} FROM d)
{union}
"""


def test_ts_acf_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:ts_acf", fn=_acf_fn, oracle=_acf_sql(),
        category="timeseries",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail
