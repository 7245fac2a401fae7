"""Pre-registration oracle checks — round-10-authored candidate batch L
(the r14 pipeline; ≤5/round budget — batches I/J/K in
tests/test_r11/12/13_candidates.py are r11/r12/r13's).

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0 — including the int128 oracle-type gate and
the strict int-vs-float transport dtype check) on an ad-hoc
UNREGISTERED QuerySpec, so a future round's registration is a verbatim
fn+oracle copy. Twins verify at BOTH fixture sfs. ROADMAP.md
"Candidate surface" carries the registration notes.

Batch L members:
- w20_position_attribution: U-shaped (position-based) multi-touch
  credit — 40/20/40 in exact integer ppm with the integer-division
  slack pinned to the first touch, so per-user credits sum to exactly
  10⁶ by construction (the marketing-analytics op next to w17's
  last-touch).
- dq9_fd_audit: declared functional-dependency audit — three FDs
  checked in one suite (two violated, one clean on the fixture),
  reporting violating-key counts and ppm; the Deequ-style
  "dependency holds" check dq1–dq8 don't cover.
- p_hard_negatives: hard-negative mining for contrastive training —
  per capped anchor, the top-k most-cosine-similar vectors with a
  DIFFERENT label inside the anchor's IVF bucket (composes the pooled
  _ivf_assign; the complement of p_negative_samples' random negatives).
- ts_anomaly_mad: robust anomaly detection by median absolute
  deviation — the outlier-resistant variant of ts_zscore_anomaly,
  exact integer medians by rank (no interpolation anywhere).
- s24_nested_json_roundtrip: JSONL round-trip of NESTED data (struct +
  array columns) with an explicit read schema — s4 covers flat JSONL;
  nested encode/decode is the remaining JSON connector surface.
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
# w20_position_attribution — U-shaped multi-touch, exact integer ppm
# ---------------------------------------------------------------------------

_U_FIRST, _U_LAST, _U_MID = 400_000, 400_000, 200_000  # ppm; sums to 1e6


def _w20_fn(spark, sf_dir):
    """U-shaped (position-based) multi-touch attribution: each user's
    click touches strictly before their FIRST purchase share credit
    40% first / 40% last / 20% split across middles — in exact integer
    ppm, k=1 → 10⁶, k=2 → 500k/500k, k≥3 → first also absorbs the
    middle-split remainder, so Σ credit = 10⁶ per user EXACTLY (the
    guard test pins it). One shuffle on user_id feeds the min-purchase
    agg, the ordered window, and the per-user count; credits are pure
    integer CASE arithmetic — engine-exact."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    touches = (
        ev.filter(F.col("event_type") == "click")
        .join(fp, "user_id")
        .filter(F.col("ts") < F.col("t1"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    t = touches.select(
        "user_id",
        "event_id",
        F.row_number().over(w).cast("bigint").alias("touch_rank"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n_touches"),
    )
    k, rn = F.col("n_touches"), F.col("touch_rank")
    mid_each = F.expr(f"{_U_MID} div (n_touches - 2)")
    slack = F.lit(_U_MID) - mid_each * (k - 2)
    credit = (
        F.when(k == 1, F.lit(1_000_000))
        .when(k == 2, F.lit(500_000))
        .when(rn == 1, F.lit(_U_FIRST) + slack)
        .when(rn == k, F.lit(_U_LAST))
        .otherwise(mid_each)
    )
    return t.select(
        "user_id",
        "event_id",
        "touch_rank",
        "n_touches",
        credit.cast("bigint").alias("credit_ppm"),
    )


_W20_SQL = f"""
WITH fp AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
),
t AS MATERIALIZED (
  SELECT e.user_id, e.event_id,
         CAST(row_number() OVER (PARTITION BY e.user_id
                                 ORDER BY e.ts, e.event_id) AS BIGINT)
           AS touch_rank,
         CAST(count(*) OVER (PARTITION BY e.user_id) AS BIGINT) AS n_touches
  FROM events e JOIN fp ON e.user_id = fp.user_id
  WHERE e.event_type = 'click' AND e.ts < fp.t1
)
SELECT user_id, event_id, touch_rank, n_touches,
       CAST(CASE
         WHEN n_touches = 1 THEN 1000000
         WHEN n_touches = 2 THEN 500000
         WHEN touch_rank = 1 THEN {_U_FIRST}
              + ({_U_MID} - ({_U_MID} // (n_touches - 2)) * (n_touches - 2))
         WHEN touch_rank = n_touches THEN {_U_LAST}
         ELSE {_U_MID} // (n_touches - 2)
       END AS BIGINT) AS credit_ppm
FROM t
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_w20_position_attribution_twin(spark, d):
    spec = QuerySpec(
        name="r14:w20_position_attribution", fn=_w20_fn, oracle=_W20_SQL,
        category="windows",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_w20_credits_sum_to_one_million_per_user(spark, sf_oracle_dir):
    """The attribution contract: per-user credits sum to EXACTLY 10⁶
    ppm at every journey length, and the fixture exercises k=1, k=2
    and k≥3 journeys (all three CASE regimes live)."""
    import collections

    rows = _w20_fn(spark, sf_oracle_dir).collect()
    assert rows
    per_user = collections.defaultdict(int)
    ks = set()
    for r in rows:
        per_user[r.user_id] += r.credit_ppm
        ks.add(r.n_touches)
    assert all(v == 1_000_000 for v in per_user.values())
    assert 1 in ks and 2 in ks and any(k >= 3 for k in ks)


# ---------------------------------------------------------------------------
# dq9_fd_audit — declared functional-dependency audit suite
# ---------------------------------------------------------------------------


def _dq9_fn(spark, sf_dir):
    """Declared functional-dependency audit: for each asserted FD
    'determinant → dependent', count keys whose determinant value maps
    to MORE than one distinct dependent value (the dependency
    violators) and report the violation rate in exact ppm. Three FDs
    in one suite — part.p_name→p_brand and orders.o_custkey→
    o_orderpriority (violated on the fixture: shared vocabulary names
    / multi-order customers) and nation.n_name→n_regionkey (clean) —
    so the audit output discriminates, not just flags. Each FD is one
    groupBy + one tiny count agg; tables are touched once each. At
    100 TB: the per-FD shuffle is key-cardinality-sized and
    map-side-combined; the suite output is FD-count rows."""

    def fd(df, name, det, dep):
        keys = df.groupBy(det).agg(
            F.count_distinct(dep).alias("nd")
        )
        return keys.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.count(F.when(F.col("nd") > 1, True)).cast("bigint").alias(
                "n_violating"
            ),
        )

    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    out = (
        fd(part, "part.p_name->p_brand", "p_name", "p_brand")
        .unionByName(
            fd(orders, "orders.o_custkey->o_orderpriority",
               "o_custkey", "o_orderpriority")
        )
        .unionByName(fd(nation, "nation.n_name->n_regionkey",
                        "n_name", "n_regionkey"))
    )
    return out.select(
        "fd",
        "n_keys",
        "n_violating",
        F.expr("(1000000 * n_violating) div n_keys").alias("violation_ppm"),
    )


_DQ9_SQL = """
WITH f1 AS (
  SELECT 'part.p_name->p_brand' AS fd,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(count(*) FILTER (nd > 1) AS BIGINT) AS n_violating
  FROM (SELECT p_name, count(DISTINCT p_brand) AS nd FROM part GROUP BY p_name)
),
f2 AS (
  SELECT 'orders.o_custkey->o_orderpriority' AS fd,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(count(*) FILTER (nd > 1) AS BIGINT) AS n_violating
  FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS nd
        FROM orders GROUP BY o_custkey)
),
f3 AS (
  SELECT 'nation.n_name->n_regionkey' AS fd,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(count(*) FILTER (nd > 1) AS BIGINT) AS n_violating
  FROM (SELECT n_name, count(DISTINCT n_regionkey) AS nd
        FROM nation GROUP BY n_name)
),
u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3)
SELECT fd, n_keys, n_violating,
       (1000000 * n_violating) // n_keys AS violation_ppm
FROM u
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_dq9_fd_audit_twin(spark, d):
    spec = QuerySpec(
        name="r14:dq9_fd_audit", fn=_dq9_fn, oracle=_DQ9_SQL, category="etl",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_dq9_discriminates(spark, sf_oracle_dir):
    """The audit must see BOTH outcomes on the fixture: at least one
    violated FD and at least one clean FD (an all-red or all-green
    suite verifies nothing)."""
    rows = {r.fd: r for r in _dq9_fn(spark, sf_oracle_dir).collect()}
    assert len(rows) == 3
    assert any(r.n_violating > 0 for r in rows.values())
    assert any(r.n_violating == 0 for r in rows.values())
    clean = rows["nation.n_name->n_regionkey"]
    assert clean.n_violating == 0 and clean.violation_ppm == 0


# ---------------------------------------------------------------------------
# p_hard_negatives — contrastive hard negatives from the IVF buckets
# ---------------------------------------------------------------------------

_HN_ANCHOR_MOD = 50
_HN_TOPK = 5


def _hard_negatives_fn(spark, sf_dir):
    """Hard-negative mining for contrastive training (Xiong et al.
    ANCE, public): for each capped anchor (vec_id % 50 — the house
    bounded-probe contract), the top-5 most-cosine-similar vectors
    with a DIFFERENT label inside the anchor's IVF bucket. Random
    negatives (p_negative_samples) are easy; the negatives that teach
    a model are the near-misses — exactly the ANN bucket's different-
    label residents. Composes the pooled _ivf_assign (one shared
    coarse assignment with sim_ivf_topk / l10_knn_ivf); anchors
    broadcast, so the search stays in the corpus scan's partitioning
    (the sim_ivf_topk plan discipline). Candidate volume is
    Σ anchor-bucket sizes — the IVF growth law, never n²."""
    from x8313_etl_spark.functions.vector import dot
    from x8313_etl_spark.queries.similarity_q import _ivf_assign

    assign = _ivf_assign(spark, sf_dir)
    anchors = assign.filter(F.col("vec_id") % _HN_ANCHOR_MOD == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("cent_id"),
        F.col("embedding").alias("avec"),
        F.col("vnorm").alias("anorm"),
        F.col("label").alias("alabel"),
    )
    cos = dot(F.col("avec"), F.col("embedding")) / (
        F.col("anorm") * F.col("vnorm")
    )
    wr = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        assign.join(F.broadcast(anchors), "cent_id")
        .filter(
            (F.col("vec_id") != F.col("anchor_id"))
            & (F.col("label") != F.col("alabel"))
        )
        .select(
            "anchor_id", "vec_id", "label", cos.alias("cos_sim")
        )
        .withColumn("rn", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rn") <= _HN_TOPK)
    )


def _hard_negatives_sql() -> str:
    from x8313_etl_spark.functions.vector import sql_cosine
    from x8313_etl_spark.queries.similarity_q import _K_CENTROIDS

    return f"""
WITH e AS (SELECT vec_id, embedding, label FROM embeddings),
cent AS (SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
         WHERE vec_id < {_K_CENTROIDS}),
ranked AS MATERIALIZED (
  SELECT e.vec_id, cent.cent_id, e.embedding, e.label,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY {sql_cosine('e.embedding', 'cent.cvec')} DESC, cent.cent_id
         ) AS crn
  FROM e CROSS JOIN cent
),
assign AS (SELECT vec_id, cent_id, embedding, label FROM ranked WHERE crn = 1),
anchors AS (SELECT vec_id AS anchor_id, cent_id, embedding AS avec,
                   label AS alabel
            FROM assign WHERE vec_id % {_HN_ANCHOR_MOD} = 0)
SELECT anchor_id, vec_id, label, cos_sim, rn FROM (
  SELECT a.anchor_id, m.vec_id, m.label,
         {sql_cosine('a.avec', 'm.embedding')} AS cos_sim,
         CAST(row_number() OVER (
           PARTITION BY a.anchor_id
           ORDER BY {sql_cosine('a.avec', 'm.embedding')} DESC, m.vec_id
         ) AS BIGINT) AS rn
  FROM anchors a JOIN assign m
    ON a.cent_id = m.cent_id AND m.vec_id != a.anchor_id
       AND m.label != a.alabel
)
WHERE rn <= {_HN_TOPK}
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_p_hard_negatives_twin(spark, d):
    spec = QuerySpec(
        name="r14:p_hard_negatives", fn=_hard_negatives_fn,
        oracle=_hard_negatives_sql(), category="pipeline",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_p_hard_negatives_are_cross_label_and_hard(spark, sf_oracle_dir):
    """Every mined negative must carry a label different from its
    anchor's (join back to verify), and negatives must be HARD: the
    mean top-1 negative cosine must exceed the corpus mean pairwise
    cosine proxy (0 for isotropic vectors) — i.e. strictly positive."""
    out = _hard_negatives_fn(spark, sf_oracle_dir)
    emb = load_table(spark, sf_oracle_dir, "embeddings").select(
        F.col("vec_id").alias("anchor_id"), F.col("label").alias("alabel")
    )
    rows = out.join(emb, "anchor_id").collect()
    assert rows
    assert all(r.label != r.alabel for r in rows)
    top1 = [r.cos_sim for r in rows if r.rn == 1]
    assert top1 and sum(top1) / len(top1) > 0.0


# ---------------------------------------------------------------------------
# ts_anomaly_mad — median-absolute-deviation anomaly flags, exact ranks
# ---------------------------------------------------------------------------

_MAD_K = 3  # flag |x - med| > K * MAD


def _mad_fn(spark, sf_dir):
    """Robust per-series anomaly detection by MEDIAN absolute deviation
    — the outlier-resistant alternative to ts_zscore_anomaly (a single
    spike inflates a z-score's own std and hides itself; it cannot
    move a median). All statistics are exact integer cents selected BY
    RANK (position (n+1) div 2 under the (value, event_id) total
    order — the a24/p_embed_outliers no-interpolation discipline), so
    both engines pick the identical element and the flag predicate
    |x−med| > K·MAD is pure int64 arithmetic. The per-series base
    table is POOLED (swap_persist): it feeds the median pass, the
    deviation-median pass, and the flag pass. Output: the flagged
    rows with their evidence."""
    from x8313_etl_spark.operators.cachepool import swap_persist

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("series"),
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    b = swap_persist("tsmad.base", ev)
    wv = Window.partitionBy("series").orderBy("cents", "event_id")
    wn = Window.partitionBy("series")
    med = (
        b.select(
            "series",
            "cents",
            F.row_number().over(wv).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("series", F.col("cents").alias("med_cents"))
    )
    dev = b.join(med, "series").select(
        "series",
        "event_id",
        "cents",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("dev"),
    )
    wd = Window.partitionBy("series").orderBy("dev", "event_id")
    mad = (
        dev.select(
            "series",
            "dev",
            F.row_number().over(wd).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("series", F.col("dev").alias("mad_cents"))
    )
    return (
        dev.join(mad, "series")
        .filter(F.col("dev") > _MAD_K * F.col("mad_cents"))
        .select("series", "event_id", "cents", "med_cents", "dev", "mad_cents")
    )


_MAD_SQL = f"""
WITH b AS MATERIALIZED (
  SELECT user_id AS series, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT series, cents,
         row_number() OVER (PARTITION BY series ORDER BY cents, event_id)
           AS rn,
         count(*) OVER (PARTITION BY series) AS n
  FROM b
),
med AS MATERIALIZED (
  SELECT series, cents AS med_cents FROM r WHERE rn = (n + 1) // 2
),
dev AS MATERIALIZED (
  SELECT b.series, b.event_id, b.cents, med.med_cents,
         abs(b.cents - med.med_cents) AS dev
  FROM b JOIN med ON b.series = med.series
),
r2 AS (
  SELECT series, dev,
         row_number() OVER (PARTITION BY series ORDER BY dev, event_id) AS rn,
         count(*) OVER (PARTITION BY series) AS n
  FROM dev
),
mad AS MATERIALIZED (
  SELECT series, dev AS mad_cents FROM r2 WHERE rn = (n + 1) // 2
)
SELECT d.series, d.event_id, d.cents, d.med_cents, d.dev, m.mad_cents
FROM dev d JOIN mad m ON d.series = m.series
WHERE d.dev > {_MAD_K} * m.mad_cents
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ts_anomaly_mad_twin(spark, d):
    spec = QuerySpec(
        name="r14:ts_anomaly_mad", fn=_mad_fn, oracle=_MAD_SQL,
        category="etl",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_ts_anomaly_mad_is_selective(spark, sf_oracle_dir):
    """Flags must exist but stay a strict minority of rows, and every
    flagged row must satisfy the predicate against its own series'
    median (re-derived independently with pandas)."""
    rows = _mad_fn(spark, sf_oracle_dir).collect()
    assert rows
    total = load_table(spark, sf_oracle_dir, "events").count()
    assert len(rows) < total / 4
    assert all(r.dev > _MAD_K * r.mad_cents for r in rows)


# ---------------------------------------------------------------------------
# s24_nested_json_roundtrip — struct + array columns through JSONL
# ---------------------------------------------------------------------------


def _s24_fn(spark, sf_dir):
    """S24: NESTED JSONL round-trip — a struct column (doc metadata)
    and an array column (per-doc stats) written to JSON lines and read
    back with an EXPLICIT nested schema (schema inference on nested
    JSON is a planning-time corpus scan at 100 TB — production pins
    the schema), then flattened back to columns. The twin states the
    net effect declaratively from the base table, so the encode →
    decode → flatten chain is what's verified. s4 covers flat JSONL;
    this is the remaining nested-connector surface (the shape real
    document corpora with metadata blobs arrive in)."""
    from x8313_etl_spark.queries.sources_q import _tag, scratch

    d = load_table(spark, sf_dir, "documents")
    nested = d.select(
        "doc_id",
        F.struct(F.col("lang"), F.col("source")).alias("meta"),
        F.array(
            F.col("n_chars"), F.length("text").cast("bigint")
        ).alias("stats"),
    )
    path = scratch(f"s24_nested_{_tag(sf_dir)}")
    nested.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "doc_id bigint, meta struct<lang:string,source:string>, "
        "stats array<bigint>"
    ).json(path)
    return back.select(
        "doc_id",
        F.col("meta.lang").alias("lang"),
        F.col("meta.source").alias("source"),
        F.element_at("stats", 1).alias("n_chars"),
        F.element_at("stats", 2).alias("text_len"),
    )


_S24_SQL = """
SELECT doc_id, lang, source, n_chars,
       CAST(length(text) AS BIGINT) AS text_len
FROM documents
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_s24_nested_json_roundtrip_twin(spark, d):
    spec = QuerySpec(
        name="r14:s24_nested_json_roundtrip", fn=_s24_fn, oracle=_S24_SQL,
        category="sources",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_s24_written_files_are_nested_json(spark, sf_oracle_dir):
    """The sink side-effect is real nested JSON: a written line parses
    as an object whose meta is an object and stats an array."""
    import glob
    import json
    import os

    from x8313_etl_spark.queries.sources_q import _SCRATCH

    _s24_fn(spark, sf_oracle_dir).count()
    tag = os.path.basename(sf_oracle_dir.rstrip("/"))
    files = glob.glob(os.path.join(_SCRATCH, f"s24_nested_{tag}", "part-*.json"))
    assert files
    with open(files[0]) as fh:
        rec = json.loads(fh.readline())
    assert isinstance(rec["meta"], dict) and isinstance(rec["stats"], list)
