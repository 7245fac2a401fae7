"""Pre-registration oracle checks — round-7 candidate batch B.

Same protocol as tests/test_r7_candidates.py (which see): each test
runs the EXACT driver compare (tests/oracle_utils.compare_query,
tolerance 0) on an UNREGISTERED QuerySpec, so next round's registration
is a verbatim fn+oracle copy while this round's driver verify window
keeps its 5-new+45-stalest composition. ROADMAP.md "Candidate surface"
carries the registration notes.
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
    """Forget ledger keys introduced by these unregistered candidate fns
    (same rationale as test_r7_candidates._scrub_ledger_keys: the
    materialization gate audits registered queries only)."""
    before = set(audit.ledger())
    yield
    for key in set(audit.ledger()) - before:
        audit.forget(key)


# ---------------------------------------------------------------------------
# p_incremental_dedup — delta batch vs corpus index (production ingest shape)
# ---------------------------------------------------------------------------

_DELTA_MOD = 5  # doc_id % 5 == 0 is the arriving batch; the rest is the index
_INC_TAU = 0.3


def _incremental_dedup_fn(spark, sf_dir):
    from x8313_etl_spark.operators.increment import incremental_near_dups

    d = load_table(spark, sf_dir, "documents")
    index = d.filter(F.col("doc_id") % _DELTA_MOD != 0)
    batch = d.filter(F.col("doc_id") % _DELTA_MOD == 0)
    return incremental_near_dups(index, batch, threshold=_INC_TAU)


def _incremental_dedup_sql():
    from x8313_etl_spark.queries.llm import _SQL_SHINGLE_CTES

    return f"""
WITH {_SQL_SHINGLE_CTES},
pairs AS (
  SELECT n.doc_id AS new_id, o.doc_id AS old_id,
         CAST(len(list_intersect(n.sh, o.sh)) AS DOUBLE)
           / len(list_distinct(n.sh || o.sh)) AS jaccard,
         len(list_filter(generate_series(0, 7), bi ->
             list_slice(n.sig, bi*4 + 1, bi*4 + 4)
               = list_slice(o.sig, bi*4 + 1, bi*4 + 4))) AS n_band_hits
  FROM sig n JOIN sig o
    ON n.doc_id % {_DELTA_MOD} = 0 AND o.doc_id % {_DELTA_MOD} <> 0
),
best AS (
  SELECT new_id, old_id, jaccard FROM (
    SELECT new_id, old_id, jaccard,
           row_number() OVER (
             PARTITION BY new_id ORDER BY jaccard DESC, old_id
           ) AS rn
    FROM pairs WHERE n_band_hits > 0 AND jaccard >= {_INC_TAU}
  ) WHERE rn = 1
)
SELECT d.doc_id,
       best.old_id IS NOT NULL AS is_dup,
       best.old_id AS dup_of,
       best.jaccard
FROM (SELECT doc_id FROM documents WHERE doc_id % {_DELTA_MOD} = 0) d
LEFT JOIN best ON best.new_id = d.doc_id
"""


def test_incremental_dedup_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:p_incremental_dedup",
        fn=_incremental_dedup_fn,
        oracle=_incremental_dedup_sql(),
        category="pipeline",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_incremental_dedup_nontrivial(spark, sf_oracle_dir):
    """The fixture corpus must exercise the dup path (some batch doc IS a
    near-dup of the index) — a verdict that is all-false would verify
    nothing about the band join."""
    out = _incremental_dedup_fn(spark, sf_oracle_dir)
    n_dup = out.filter(F.col("is_dup")).count()
    assert n_dup > 0


# ---------------------------------------------------------------------------
# p_er_golden_record — survivorship over ER match clusters (MDM golden record)
# ---------------------------------------------------------------------------


def _golden_fn(spark, sf_dir):
    from pyspark.sql import Window

    from x8313_etl_spark.operators.concomp import connected_components
    from x8313_etl_spark.queries.pipeline_q import p_er_blocked_match

    part = load_table(spark, sf_dir, "part")
    m = p_er_blocked_match(spark, sf_dir)
    edges = m.select(
        F.col("probe_id").alias("src"), F.col("cand_id").alias("dst")
    )
    labels = connected_components(
        part.select(F.col("p_partkey").alias("node")),
        edges,
        ledger_key="r7.p_er_golden.concomp",
    )
    mem = part.join(
        labels, part.p_partkey == labels.node
    ).drop("node")
    base = mem.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.max(F.round(F.col("p_retailprice") * 100).cast("bigint")).alias(
            "retail_cents_max"
        ),
        F.min("p_size").alias("size_min"),
    )
    gname = part.select(
        F.col("p_partkey").alias("component"),
        F.col("p_name").alias("golden_name"),
    )
    wb = Window.partitionBy("component").orderBy(
        F.col("cnt").desc(), F.col("p_brand")
    )
    bmode = (
        mem.groupBy("component", "p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("component", F.col("p_brand").alias("brand_mode"))
    )
    return (
        base.join(gname, "component")
        .join(bmode, "component")
        .select(
            F.col("component").alias("cluster_id"),
            "n_members",
            "golden_name",
            "brand_mode",
            "retail_cents_max",
            "size_min",
        )
    )


def _golden_sql():
    from x8313_etl_spark.registry import registry

    er = registry()["p_er_blocked_match"].oracle
    return f"""
WITH RECURSIVE m AS MATERIALIZED ({er}),
e AS (
  SELECT probe_id AS src, cand_id AS dst FROM m WHERE probe_id <> cand_id
  UNION
  SELECT cand_id AS src, probe_id AS dst FROM m WHERE probe_id <> cand_id
),
reach AS (
  SELECT p_partkey AS node, p_partkey AS label FROM part
  UNION
  SELECT e.dst AS node, reach.label FROM reach JOIN e ON e.src = reach.node
),
lab AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
mem AS (
  SELECT l.cluster_id, p.* FROM part p JOIN lab l ON l.node = p.p_partkey
),
base AS (
  SELECT cluster_id, count(*) AS n_members,
         max(CAST(round(p_retailprice * 100) AS BIGINT)) AS retail_cents_max,
         min(p_size) AS size_min
  FROM mem GROUP BY cluster_id
),
bmode AS (
  SELECT cluster_id, p_brand AS brand_mode FROM (
    SELECT cluster_id, p_brand,
           row_number() OVER (
             PARTITION BY cluster_id ORDER BY count(*) DESC, p_brand
           ) AS rn
    FROM mem GROUP BY cluster_id, p_brand
  ) WHERE rn = 1
)
SELECT b.cluster_id, b.n_members, g.p_name AS golden_name, bm.brand_mode,
       b.retail_cents_max, b.size_min
FROM base b
JOIN part g ON g.p_partkey = b.cluster_id
JOIN bmode bm ON bm.cluster_id = b.cluster_id
"""


def test_er_golden_record_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:p_er_golden_record",
        fn=_golden_fn,
        oracle=_golden_sql(),
        category="pipeline",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


# ---------------------------------------------------------------------------
# t18_stream_ingest_dedup — arrival-order dedup as a foreachBatch stream
# ---------------------------------------------------------------------------


def _t18_fn(spark, sf_dir):
    import os
    import shutil
    import time as _time
    import uuid as _uuid

    from x8313_etl_spark.operators.ingestdedup import IngestDedupSink
    from x8313_etl_spark.queries.sources_q import _tag, scratch

    d = load_table(spark, sf_dir, "documents")
    index = d.filter(F.col("doc_id") % _DELTA_MOD != 0)
    batch = d.filter(F.col("doc_id") % _DELTA_MOD == 0).select(
        "doc_id", "text"
    )

    family = scratch(f"t18_ingestdedup_{_tag(sf_dir)}")
    cutoff = _time.time() - 1800
    for sub in os.listdir(family) if os.path.isdir(family) else []:
        p = os.path.join(family, sub)
        try:
            if os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    work = os.path.join(family, _uuid.uuid4().hex[:12])
    src, ckpt = os.path.join(work, "src"), os.path.join(work, "ckpt")
    os.makedirs(src)

    # 4 id-RANGE files with increasing mtimes: the file source takes the
    # oldest first under maxFilesPerTrigger=1, so micro-batch boundaries
    # respect id order — the sink's "earlier document" feed contract
    ids = sorted(r["doc_id"] for r in batch.select("doc_id").collect())
    size = (len(ids) + 3) // 4
    t0 = _time.time() - 100
    for i in range(4):
        chunk = set(ids[i * size : (i + 1) * size])
        tmp = os.path.join(work, f"w{i}")
        batch.filter(F.col("doc_id").isin(chunk)).coalesce(1).write.parquet(tmp)
        part = next(
            f for f in os.listdir(tmp)
            if f.endswith(".parquet") and f.startswith("part-")
        )
        dst = os.path.join(src, f"b{i}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (t0 + 10 * i, t0 + 10 * i))

    sink = IngestDedupSink(os.path.join(work, "state"), threshold=_INC_TAU)
    sink.init_index(index)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sink.apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("t18 ingest-dedup stream did not finish in 180s")
    return sink.read_verdicts(spark)


def _t18_sql():
    """One-shot SQL over the whole feed: dup iff a band-colliding
    Jaccard ≥ τ partner exists among the index OR any smaller-id new
    doc — exactly the arrival-order semantics the sink accumulates."""
    from x8313_etl_spark.queries.llm import _SQL_SHINGLE_CTES

    return f"""
WITH {_SQL_SHINGLE_CTES},
pairs AS (
  SELECT n.doc_id AS new_id, o.doc_id AS old_id,
         CAST(len(list_intersect(n.sh, o.sh)) AS DOUBLE)
           / len(list_distinct(n.sh || o.sh)) AS jaccard,
         len(list_filter(generate_series(0, 7), bi ->
             list_slice(n.sig, bi*4 + 1, bi*4 + 4)
               = list_slice(o.sig, bi*4 + 1, bi*4 + 4))) AS n_band_hits
  FROM sig n JOIN sig o
    ON n.doc_id % {_DELTA_MOD} = 0
   AND (o.doc_id % {_DELTA_MOD} <> 0 OR o.doc_id < n.doc_id)
),
best AS (
  SELECT new_id, old_id, jaccard FROM (
    SELECT new_id, old_id, jaccard,
           row_number() OVER (
             PARTITION BY new_id ORDER BY jaccard DESC, old_id
           ) AS rn
    FROM pairs WHERE n_band_hits > 0 AND jaccard >= {_INC_TAU}
  ) WHERE rn = 1
)
SELECT d.doc_id,
       best.old_id IS NOT NULL AS is_dup,
       best.old_id AS dup_of,
       best.jaccard
FROM (SELECT doc_id FROM documents WHERE doc_id % {_DELTA_MOD} = 0) d
LEFT JOIN best ON best.new_id = d.doc_id
"""


def test_stream_ingest_dedup_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:t18_stream_ingest_dedup",
        fn=_t18_fn,
        oracle=_t18_sql(),
        category="streaming",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


# ---------------------------------------------------------------------------
# g11_knn_graph — mutual k-NN graph over IVF buckets (every vector a node)
# ---------------------------------------------------------------------------

_KNN_GRAPH_K = 5


def _knn_graph_fn(spark, sf_dir):
    """k-NN GRAPH construction: every vector (not a probe subset) gets
    its top-k within-bucket cosine neighbors, plus a mutual flag (dst
    also lists src) — the adjacency that SemDeDup clustering, GNN
    message passing (g10), and connectivity analyses consume. Reuses
    the pooled IVF assignment; the bucket self-join shuffles on
    cent_id, which has only K distinct keys — at scale the dial is the
    salted bucket join (operators/bandjoin.py salted_band_self_join /
    AQE skew join), documented rather than needed at fixture size.
    Candidate volume is Σ bucket², never corpus²."""
    from pyspark.sql import Window

    from x8313_etl_spark.functions.vector import dot
    from x8313_etl_spark.queries.similarity_q import _ivf_assign

    assign = _ivf_assign(spark, sf_dir)
    left = assign.select(
        "cent_id",
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("svec"),
        F.col("vnorm").alias("snorm"),
    )
    cos = dot(F.col("svec"), F.col("embedding")) / (
        F.col("snorm") * F.col("vnorm")
    )
    rn = Window.partitionBy("src").orderBy(
        F.col("cos_sim").desc(), F.col("dst")
    )
    edges = (
        assign.join(left, "cent_id")
        .filter(F.col("vec_id") != F.col("src"))
        .select("src", F.col("vec_id").alias("dst"), cos.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(rn))
        .filter(F.col("rn") <= _KNN_GRAPH_K)
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    ).withColumn("m", F.lit(1))
    return (
        edges.join(rev, ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            "cos_sim",
            F.col("rn").cast("int").alias("rn"),
            F.coalesce(F.col("m"), F.lit(0)).cast("int").alias("mutual"),
        )
    )


def _knn_graph_sql():
    from x8313_etl_spark.functions.vector import sql_cosine
    from x8313_etl_spark.queries.similarity_q import _K_CENTROIDS

    cos_pc = sql_cosine("p.embedding", "m.embedding")
    return f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
cent AS (SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
         WHERE vec_id < {_K_CENTROIDS}),
assign AS MATERIALIZED (
  SELECT vec_id, cent_id, embedding FROM (
    SELECT e.vec_id, cent.cent_id, e.embedding,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {sql_cosine('e.embedding', 'cent.cvec')} DESC,
                      cent.cent_id
           ) AS crn
    FROM e CROSS JOIN cent
  ) WHERE crn = 1
),
edges AS MATERIALIZED (
  SELECT src, dst, cos_sim, rn FROM (
    SELECT p.vec_id AS src, m.vec_id AS dst, {cos_pc} AS cos_sim,
           row_number() OVER (
             PARTITION BY p.vec_id
             ORDER BY {cos_pc} DESC, m.vec_id
           ) AS rn
    FROM assign p JOIN assign m
      ON p.cent_id = m.cent_id AND m.vec_id != p.vec_id
  ) WHERE rn <= {_KNN_GRAPH_K}
)
SELECT a.src, a.dst, a.cos_sim, CAST(a.rn AS INTEGER) AS rn,
       CAST(CASE WHEN b.src IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
         AS mutual
FROM edges a
LEFT JOIN (SELECT DISTINCT src, dst FROM edges) b
  ON b.src = a.dst AND b.dst = a.src
"""


def test_knn_graph_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:g11_knn_graph",
        fn=_knn_graph_fn,
        oracle=_knn_graph_sql(),
        category="graph",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_knn_graph_shape(spark, sf_oracle_dir):
    out = _knn_graph_fn(spark, sf_oracle_dir).persist()
    n_nodes = out.select("src").distinct().count()
    total = load_table(spark, sf_oracle_dir, "embeddings").count()
    assert n_nodes == total  # EVERY vector is a node (buckets have > k+1 members)
    mut = out.filter(F.col("mutual") == 1).count()
    assert 0 < mut < out.count()  # mutual flag non-trivially split
    out.unpersist()


# ---------------------------------------------------------------------------
# w17_last_touch_attribution — revenue attribution to the last touch event
# ---------------------------------------------------------------------------


def _attr_fn(spark, sf_dir):
    """Last-touch attribution: each purchase's value is credited to the
    most recent preceding non-purchase event of the same user (ties
    broken by event_id; no preceding touch → 'direct'), then revenue
    rolls up per touch channel. One window pass per user stream + one
    small aggregate — the shuffle is keyed by user, never global.
    Revenue is summed in integer cents (engine-exact)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        F.col("value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    purchases = (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(F.col("touch"), F.lit("direct")).alias("channel"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    return purchases.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("cents").alias("revenue_cents"),
    )


_ATTR_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS tus, value
  FROM events
),
tagged AS (
  SELECT *,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY tus, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS touch
  FROM ev
)
SELECT coalesce(touch, 'direct') AS channel,
       count(*) AS n_purchases,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM tagged WHERE event_type = 'purchase'
GROUP BY 1
"""


def test_last_touch_attribution_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:w17_last_touch_attribution",
        fn=_attr_fn,
        oracle=_ATTR_SQL,
        category="windows",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_attribution_covers_multiple_channels(spark, sf_oracle_dir):
    rows = {r["channel"]: r["n_purchases"] for r in _attr_fn(spark, sf_oracle_dir).collect()}
    assert len(rows) >= 3  # several touch channels actually credited


# ---------------------------------------------------------------------------
# m9_time_travel — snapshot history audit across commit/delete/append
# ---------------------------------------------------------------------------

_M9_INS_OFFSET = 10_000_000


def _m9_fn(spark, sf_dir):
    """Time travel over the snapshot chain: v0 = base commit (4 files),
    v1 = merge-on-read DELETE (positional tombstones — v0's files are
    untouched), v2 = APPEND (delta dir, parent tombstones stay live).
    The query reads EVERY version via read(version=...) and emits
    per-version row counts + balance cents — so the twin (which
    reconstructs each version's content declaratively from the fixture)
    verifies that history is actually immutable: a delete that rewrote
    v0, or an append that dropped the tombstones, hash-mismatches."""
    import shutil

    from x8313_etl_spark.operators.snapshots import SnapshotTable
    from x8313_etl_spark.queries.sources_q import _tag, scratch

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    path = scratch(f"m9_tt_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    tbl = SnapshotTable(path)
    tbl.commit(base.repartition(4))  # v0
    tbl.delete_where(spark, F.col("c_acctbal") < 0)  # v1
    ins = base.filter(F.col("c_custkey") % 7 == 0).select(
        (F.col("c_custkey") + _M9_INS_OFFSET).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
    )
    tbl.commit(ins, mode="append")  # v2

    out = None
    for v in (0, 1, 2):
        snap = tbl.read(spark, version=v).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.round(F.col("c_acctbal") * 100).cast("bigint")
            ).alias("bal_cents"),
        ).select(F.lit(v).alias("version"), "n_rows", "bal_cents")
        out = snap if out is None else out.unionByName(snap)
    return out


_M9_SQL = f"""
WITH v0 AS (SELECT c_custkey, c_acctbal FROM customer),
v1 AS (SELECT * FROM v0 WHERE NOT (c_acctbal < 0)),
v2 AS (
  SELECT * FROM v1
  UNION ALL
  SELECT c_custkey + {_M9_INS_OFFSET} AS c_custkey, 0.0 AS c_acctbal
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT 0 AS version, count(*) AS n_rows,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
FROM v0
UNION ALL
SELECT 1, count(*),
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) FROM v1
UNION ALL
SELECT 2, count(*),
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) FROM v2
"""


def test_time_travel_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:m9_time_travel",
        fn=_m9_fn,
        oracle=_M9_SQL,
        category="etl",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_time_travel_versions_differ(spark, sf_oracle_dir):
    rows = {r["version"]: r for r in _m9_fn(spark, sf_oracle_dir).collect()}
    assert rows[0]["n_rows"] > rows[1]["n_rows"]  # the delete bit
    assert rows[2]["n_rows"] > rows[1]["n_rows"]  # the append bit


# ---------------------------------------------------------------------------
# w16_funnel_conversion — ordered event funnel with per-step conversion
# ---------------------------------------------------------------------------

_FUNNEL = ("view", "click", "purchase")


def _funnel_fn(spark, sf_dir):
    """Windowed ordered funnel: step k counts users whose first step-k
    event lands within W after their first qualifying step-(k-1)
    event — the product-analytics conversion query. W is DATA-DERIVED
    (the lower-median view→click gap, ranked without an all-to-one
    stage via the two-phase global rank), so the window constraint
    bites non-trivially at every sf (the g3 quantile-threshold
    discipline: a constant W is either vacuous or empty when the
    fixture's time density changes). Each stage is one filtered
    aggregate + equi-join on user_id — shuffle bounded by the user
    set, never the event stream. conv_ppm is integer truncating div."""
    from x8313_etl_spark.operators.globalrank import with_global_rank

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    view = (
        ev.filter(F.col("event_type") == _FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("tus").alias("t"))
    )
    craw = (
        ev.filter(F.col("event_type") == _FUNNEL[1])
        .join(view.select("user_id", F.col("t").alias("tp")), "user_id")
        .filter(F.col("tus") > F.col("tp"))
        .groupBy("user_id")
        .agg((F.min("tus") - F.first("tp")).alias("gap"))
    )
    ranked = with_global_rank(
        craw.select("user_id", "gap"),
        [F.col("gap"), F.col("user_id")],
        partitions=8,
        key="r7.funnel.gaprank",
        count_col="n_gaps",
    )
    wnd = ranked.filter(
        F.col("rn") == F.expr("(n_gaps - 1) div 2")
    ).select(F.col("gap").alias("window_us"))

    stage, steps = view, [view]
    for name in _FUNNEL[1:]:
        stage = (
            ev.filter(F.col("event_type") == name)
            .join(stage.select("user_id", F.col("t").alias("tp")), "user_id")
            .crossJoin(F.broadcast(wnd))
            .filter(
                (F.col("tus") > F.col("tp"))
                & (F.col("tus") <= F.col("tp") + F.col("window_us"))
            )
            .groupBy("user_id")
            .agg(F.min("tus").alias("t"))
        )
        steps.append(stage)
    counts = None
    for i, s in enumerate(steps):
        c = s.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i + 1).alias("step"), "n_users"
        )
        counts = c if counts is None else counts.unionByName(c)
    prev = counts.select(
        (F.col("step") + 1).alias("step"), F.col("n_users").alias("n_prev")
    )
    return (
        counts.join(prev, "step", "left")
        .crossJoin(F.broadcast(wnd))
        .select(
            "step",
            "n_users",
            F.when(F.col("step") == 1, F.lit(1_000_000).cast("bigint"))
            .otherwise(F.expr("n_users * 1000000 div n_prev"))
            .alias("conv_ppm"),
            "window_us",
        )
    )


_FUNNEL_SQL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
),
v AS (
  SELECT user_id, min(tus) AS t1 FROM ev
  WHERE event_type = 'view' GROUP BY 1
),
craw AS (
  SELECT e.user_id, min(e.tus) - any_value(v.t1) AS gap
  FROM ev e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.tus > v.t1 GROUP BY 1
),
wnd AS (
  SELECT gap AS window_us FROM (
    SELECT gap,
           row_number() OVER (ORDER BY gap, user_id) AS rn,
           count(*) OVER () AS n_gaps
    FROM craw
  ) WHERE rn - 1 = (n_gaps - 1) // 2
),
c AS (
  SELECT e.user_id, min(e.tus) AS t2
  FROM ev e JOIN v ON v.user_id = e.user_id CROSS JOIN wnd w
  WHERE e.event_type = 'click'
    AND e.tus > v.t1 AND e.tus <= v.t1 + w.window_us
  GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.tus) AS t3
  FROM ev e JOIN c ON c.user_id = e.user_id CROSS JOIN wnd w
  WHERE e.event_type = 'purchase'
    AND e.tus > c.t2 AND e.tus <= c.t2 + w.window_us
  GROUP BY 1
),
s AS (
  SELECT 1 AS step, count(*) AS n_users FROM v
  UNION ALL SELECT 2, count(*) FROM c
  UNION ALL SELECT 3, count(*) FROM p
)
SELECT CAST(s.step AS INTEGER) AS step, s.n_users,
       CASE WHEN s.step = 1 THEN CAST(1000000 AS BIGINT)
            ELSE s.n_users * 1000000 // pr.n_users END AS conv_ppm,
       w.window_us
FROM s LEFT JOIN s pr ON pr.step = s.step - 1 CROSS JOIN wnd w
"""


def test_funnel_conversion_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:w16_funnel_conversion",
        fn=_funnel_fn,
        oracle=_FUNNEL_SQL,
        category="windows",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_funnel_actually_narrows(spark, sf_oracle_dir):
    rows = {r["step"]: r for r in _funnel_fn(spark, sf_oracle_dir).collect()}
    assert rows[1]["n_users"] >= rows[2]["n_users"] >= rows[3]["n_users"]
    assert rows[3]["n_users"] > 0  # every step exercised at this sf
    assert rows[2]["conv_ppm"] < 1_000_000  # the ordering constraint bites


# ---------------------------------------------------------------------------
# dq4_key_skew_profile — join-key heavy-hitter / skew profiler
# ---------------------------------------------------------------------------

_DQ4_TOP = 20


def _dq4_fn(spark, sf_dir):
    """The diagnostic behind every salting decision (operators/skew.py,
    bandjoin's hot-bucket caps): per-key frequencies of a join key,
    global top-N heavy hitters WITHOUT an all-to-one sort
    (operators/globalrank.py two-phase rank), and integer skew metrics
    — share in ppm and ratio-to-mean ×1000, both truncating div so the
    twin is engine-exact."""
    from x8313_etl_spark.operators.globalrank import with_global_rank

    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = per.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    ranked = with_global_rank(
        per,
        [F.col("cnt").desc(), F.col("key")],
        partitions=8,
        key="r7.dq4.rank",
    )
    return (
        ranked.filter(F.col("rn") < _DQ4_TOP)
        .crossJoin(F.broadcast(stats))
        .select(
            "key",
            "cnt",
            (F.col("rn") + 1).cast("int").alias("rnk"),
            F.expr("cnt * 1000000 div total").alias("share_ppm"),
            F.expr("cnt * 1000 * n_keys div total").alias("skew_x1000"),
        )
    )


_DQ4_SQL = f"""
WITH per AS MATERIALIZED (
  SELECT o_custkey AS key, count(*) AS cnt FROM orders GROUP BY 1
),
stats AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS n_keys FROM per
),
ranked AS (
  SELECT key, cnt, row_number() OVER (ORDER BY cnt DESC, key) AS rnk FROM per
)
SELECT r.key, r.cnt, CAST(r.rnk AS INTEGER) AS rnk,
       r.cnt * 1000000 // s.total AS share_ppm,
       r.cnt * 1000 * s.n_keys // s.total AS skew_x1000
FROM ranked r CROSS JOIN stats s WHERE r.rnk <= {_DQ4_TOP}
"""


def test_key_skew_profile_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:dq4_key_skew_profile",
        fn=_dq4_fn,
        oracle=_DQ4_SQL,
        category="quality",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_key_skew_profile_no_all_to_one(spark, sf_oracle_dir):
    plan = (
        _dq4_fn(spark, sf_oracle_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly two bounded single-partition stages are permissible: the
    # per-partition COUNT table inside with_global_rank (≤ partitions
    # rows) and the 1-row scalar stats reduce (map-side combined); the
    # per-key table itself must never funnel through one task
    assert plan.count("Exchange SinglePartition") <= 2, plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# sim_mmr_rerank — MMR diversity re-rank of exact-cosine candidates
# ---------------------------------------------------------------------------

_MMR_N = 10  # candidate budget per probe (the re-rank window)
_MMR_K = 5  # results selected per probe
_MMR_PROBE_MOD = 25  # l4's probe convention


def _mmr_fn(spark, sf_dir):
    from x8313_etl_spark.functions.vector import dot, norm
    from x8313_etl_spark.operators.annscan import cosine_probe_topk
    from x8313_etl_spark.operators.cachepool import swap_persist
    from x8313_etl_spark.operators.mmr import mmr_select

    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") % _MMR_PROBE_MOD == 0)
    # cand feeds both pairsim sides and every selection round — persist
    # so the corpus scan runs once
    cand = swap_persist(
        "r7.mmr.cand",
        cosine_probe_topk(e, probes, k=_MMR_N).select(
            "probe_id", "vec_id", F.col("cos_sim").alias("rel")
        ),
    )
    va = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    vb = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    sim = dot(F.col("ea"), F.col("eb")) / (
        norm(F.col("ea")) * norm(F.col("eb"))
    )
    ps = swap_persist(
        "r7.mmr.pairsim",
        cand.select("probe_id", F.col("vec_id").alias("a"))
        .join(cand.select("probe_id", F.col("vec_id").alias("b")), "probe_id")
        .filter(F.col("a") != F.col("b"))
        .join(va, "a")
        .join(vb, "b")
        .select("probe_id", "a", "b", sim.alias("sim")),
    )
    out = mmr_select(cand, ps, k=_MMR_K)
    return out.select(
        "probe_id",
        F.col("sel_rank").cast("int").alias("sel_rank"),
        "vec_id",
        "rel",
        "score",
    )


def _mmr_sql():
    from x8313_etl_spark.functions.vector import sql_cosine

    cos_ab = sql_cosine("a.embedding", "b.embedding")
    cos_pair = sql_cosine("ea.embedding", "eb.embedding")
    ctes = f"""
WITH cand AS MATERIALIZED (
  SELECT probe_id, vec_id, rel FROM (
    SELECT a.vec_id AS probe_id, b.vec_id AS vec_id, {cos_ab} AS rel,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY {cos_ab} DESC, b.vec_id) AS rn
    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    WHERE a.vec_id % {_MMR_PROBE_MOD} = 0
  ) WHERE rn <= {_MMR_N}
),
ps AS MATERIALIZED (
  SELECT x.probe_id, x.vec_id AS a, y.vec_id AS b, {cos_pair} AS sim
  FROM cand x
  JOIN cand y ON y.probe_id = x.probe_id AND y.vec_id <> x.vec_id
  JOIN embeddings ea ON ea.vec_id = x.vec_id
  JOIN embeddings eb ON eb.vec_id = y.vec_id
),
sel1 AS MATERIALIZED (
  SELECT probe_id, vec_id, rel, rel AS score, 1 AS sel_rank FROM (
    SELECT probe_id, vec_id, rel,
           row_number() OVER (PARTITION BY probe_id
             ORDER BY rel DESC, vec_id) AS rn
    FROM cand
  ) WHERE rn = 1
)"""
    for r in range(2, _MMR_K + 1):
        ctes += f""",
s{r} AS MATERIALIZED (
  SELECT probe_id, vec_id, rel, score, {r} AS sel_rank FROM (
    SELECT c.probe_id, c.vec_id, c.rel, c.rel - m.maxsim AS score,
           row_number() OVER (PARTITION BY c.probe_id
             ORDER BY c.rel - m.maxsim DESC, c.vec_id) AS rn
    FROM cand c
    JOIN (
      SELECT ps.probe_id, ps.a, max(ps.sim) AS maxsim
      FROM ps JOIN sel{r - 1} s
        ON s.probe_id = ps.probe_id AND s.vec_id = ps.b
      GROUP BY ps.probe_id, ps.a
    ) m ON m.probe_id = c.probe_id AND m.a = c.vec_id
    WHERE NOT EXISTS (
      SELECT 1 FROM sel{r - 1} s
      WHERE s.probe_id = c.probe_id AND s.vec_id = c.vec_id
    )
  ) WHERE rn = 1
),
sel{r} AS MATERIALIZED (
  SELECT * FROM sel{r - 1} UNION ALL SELECT * FROM s{r}
)"""
    return (
        ctes
        + f"""
SELECT probe_id, CAST(sel_rank AS INTEGER) AS sel_rank, vec_id, rel, score
FROM sel{_MMR_K}
"""
    )


def test_mmr_rerank_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:sim_mmr_rerank",
        fn=_mmr_fn,
        oracle=_mmr_sql(),
        category="similarity",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_mmr_rerank_diversifies(spark, sf_oracle_dir):
    """MMR must actually reorder something vs plain top-k: at least one
    probe's MMR selection differs from its top-5 by relevance (if the
    fixture never exercises the diversity term, the twin would verify a
    no-op)."""
    out = _mmr_fn(spark, sf_oracle_dir).collect()
    by_probe = {}
    for r in out:
        by_probe.setdefault(r["probe_id"], {})[r["sel_rank"]] = (
            r["vec_id"],
            r["rel"],
        )
    diverged = 0
    for sel in by_probe.values():
        by_rel = sorted(
            ((v[1], v[0]) for v in sel.values()), key=lambda t: (-t[0], t[1])
        )
        mmr_order = [sel[k][0] for k in sorted(sel)]
        if mmr_order != [i for _, i in by_rel]:
            diverged += 1
    assert diverged > 0


# ---------------------------------------------------------------------------
# p_rag_context_pack — greedy token-budget packing of ranked retrieval
# ---------------------------------------------------------------------------

_RAG_BUDGET = 160  # context-window tokens per query (fixture-scaled)


def _rag_pack_fn(spark, sf_dir):
    from pyspark.sql import Window

    from x8313_etl_spark.queries.corpus_q import p_bm25_topk

    ret = p_bm25_topk(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("q_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ret.join(toks, "doc_id")
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= _RAG_BUDGET)
        .select("q_id", "rn", "doc_id", "n_tokens", "cum_tokens")
    )


def _rag_pack_sql():
    from x8313_etl_spark.registry import registry

    bm25 = registry()["p_bm25_topk"].oracle
    return f"""
WITH ret AS MATERIALIZED ({bm25}),
toks AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT r.q_id, r.rn, r.doc_id, t.n_tokens,
         sum(t.n_tokens) OVER (
           PARTITION BY r.q_id ORDER BY r.rn
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_tokens
  FROM ret r JOIN toks t ON t.doc_id = r.doc_id
)
SELECT q_id, rn, doc_id, n_tokens, cum_tokens
FROM packed WHERE cum_tokens <= {_RAG_BUDGET}
"""


def test_rag_context_pack_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:p_rag_context_pack",
        fn=_rag_pack_fn,
        oracle=_rag_pack_sql(),
        category="pipeline",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_rag_context_pack_budget_is_exercised(spark, sf_oracle_dir):
    """The budget must actually truncate (some query keeps fewer than
    top-k) AND actually pack (some query keeps more than one doc) —
    otherwise the window/cumsum logic is untested at this sf."""
    out = _rag_pack_fn(spark, sf_oracle_dir)
    per_q = {
        r["q_id"]: r["kept"]
        for r in out.groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("kept"))
        .collect()
    }
    from x8313_etl_spark.queries.corpus_q import BM25_TOP_K

    assert any(k < BM25_TOP_K for k in per_q.values())
    assert any(k > 1 for k in per_q.values())


# ---------------------------------------------------------------------------
# a26_dim_covariance + sim_pca_power — feature covariance matrix and its
# dominant direction (integer-exact, fixed-round power iteration)
# ---------------------------------------------------------------------------

_COV_DIM = 64
_COV_Q = 1_000
_PCA_ROUNDS = 4
_PCA_SCALE = 1_000_000
_PCA_CDIV = 1_000

_COV_CTES = f"""
q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * {_COV_Q}) AS BIGINT)) AS q
  FROM embeddings
),
ex AS MATERIALIZED (
  SELECT vec_id, i, q[i] AS qi
  FROM q, unnest(generate_series(1, {_COV_DIM})) t(i)
),
cov AS MATERIALIZED (
  SELECT CAST(a.i AS INTEGER) AS i, CAST(b.i AS INTEGER) AS j,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) * CAST(sum(a.qi * b.qi) AS BIGINT)
              - CAST(sum(a.qi) AS BIGINT) * CAST(sum(b.qi) AS BIGINT)
              AS BIGINT) AS cov_num
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY a.i, b.i
)"""


def _cov_fn(spark, sf_dir):
    from x8313_etl_spark.operators.covariance import dim_comoment

    emb = load_table(spark, sf_dir, "embeddings")
    return dim_comoment(emb, dim=_COV_DIM, qscale=_COV_Q)


def test_dim_covariance_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:a26_dim_covariance",
        fn=_cov_fn,
        oracle=f"WITH {_COV_CTES}\nSELECT i, j, n, cov_num FROM cov",
        category="aggregates",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def _pca_fn(spark, sf_dir):
    from x8313_etl_spark.operators.covariance import (
        dim_comoment,
        full_matrix,
        pca_power_topvec,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    com = dim_comoment(emb, dim=_COV_DIM, qscale=_COV_Q)
    v = pca_power_topvec(
        full_matrix(com),
        _COV_DIM,
        rounds=_PCA_ROUNDS,
        scale=_PCA_SCALE,
        cdiv=_PCA_CDIV,
        ledger_key="r7.pca.power",
    )
    return v.select(F.col("i").cast("int").alias("i"), "v")


def _pca_sql():
    ctes = (
        f"WITH {_COV_CTES},\n"
        f"""cm AS MATERIALIZED (
  SELECT i, j, c // {_PCA_CDIV} AS c FROM (
    SELECT i, j, cov_num AS c FROM cov
    UNION ALL
    SELECT j AS i, i AS j, cov_num AS c FROM cov WHERE i <> j
  )
),
v0 AS (
  SELECT CAST(i AS INTEGER) AS i, CAST({_PCA_SCALE} AS BIGINT) AS v
  FROM (SELECT unnest(generate_series(1, {_COV_DIM})) AS i)
)"""
    )
    for r in range(1, _PCA_ROUNDS + 1):
        ctes += f""",
r{r} AS MATERIALIZED (
  SELECT c.i, CAST(sum(c.c * v.v) AS BIGINT) AS raw
  FROM cm c JOIN v{r - 1} v ON v.i = c.j GROUP BY c.i
),
v{r} AS MATERIALIZED (
  SELECT i,
         raw // ((SELECT max(abs(raw)) FROM r{r}) // {_PCA_SCALE} + 1) AS v
  FROM r{r}
)"""
    return ctes + f"\nSELECT i, CAST(v AS BIGINT) AS v FROM v{_PCA_ROUNDS}"


def test_pca_power_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r7:sim_pca_power",
        fn=_pca_fn,
        oracle=_pca_sql(),
        category="similarity",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_er_golden_record_has_multi_member_clusters(spark, sf_oracle_dir):
    """Survivorship must actually merge something: the matcher's
    min-partkey representative links same-name probes, so the fixture
    must produce at least one cluster with > 1 member."""
    out = _golden_fn(spark, sf_oracle_dir)
    assert out.filter(F.col("n_members") > 1).count() > 0
