"""Pre-registration oracle checks — round-9-authored candidate batch I
(the r11 pipeline; the ≤5/round budget resumes once r10 clears the
backlog, so this batch is sized to it).

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0) on an ad-hoc UNREGISTERED QuerySpec, so a
future round's registration is a verbatim fn+oracle copy. ROADMAP.md
"Candidate surface" carries the notes.

Batch I members:
- g13_local_clustering: per-node local clustering coefficient over the
  shared co-supply graph — the triangle-closure ratio as exact integer
  (2·tri, deg·(deg−1)) pairs plus a truncating ppm; the node-level
  refinement of g3's global triangle count.
- w18_event_paths: top-k frequent 3-step event-type paths per user
  stream — user-journey mining (the n-gram view of p_markov's
  transition matrix; Markov rows are pairwise, paths are ordered
  triples).
- p_query_expansion: RM3-style pseudo-relevance feedback over the
  registered BM25 ranking — top expansion terms per query from its
  top-k retrieved docs, weighted by tf·idf in the r9 floor-micro-unit
  discipline. Completes the retrieval stack's missing arrow
  (rank → EXPAND → fuse → rerank → pack).
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
# g13_local_clustering — per-node clustering coefficient, integer-exact
# ---------------------------------------------------------------------------


def _g13_fn(spark, sf_dir):
    """Local clustering coefficient per node (Watts–Strogatz 1998,
    public): lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) over the shared
    quantile-thresholded co-supply graph — the node-level refinement of
    g3's global triangle count (how clubby is THIS supplier's
    neighborhood). Emitted as exact integer (tri2 = 2·tri,
    wedges = deg·(deg−1)) pairs plus a truncating lcc_ppm, so the
    ratio never touches fp. Triangles come from the g3 wedge join
    (edges ⋈ edges on the shared endpoint, closed by a third edge
    lookup — Σ deg² candidate volume, the quantile threshold keeping
    the graph sparse); each triangle credits all three corners via one
    explode. Nodes with deg < 2 have no wedges and are excluded (lcc
    undefined)."""
    from x8313_etl_spark.queries.graph_q import _cosupply_edges

    e = _cosupply_edges(spark, sf_dir, "g13.edges_r11test")  # s1 < s2
    # wedges centered anywhere: join e(a,b) ⋈ e(b,c) with a<b<c, close
    # with e(a,c) — each triangle found exactly once as (a<b<c)
    e1 = e.select(F.col("s1").alias("a"), F.col("s2").alias("b"))
    e2 = e.select(F.col("s1").alias("b"), F.col("s2").alias("c"))
    e3 = e.select(F.col("s1").alias("a"), F.col("s2").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"])
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tri"))
    )
    deg = (
        e.select(F.col("s1").alias("node"))
        .unionByName(e.select(F.col("s2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    j = deg.filter(F.col("deg") >= 2).join(per_node, "node", "left").select(
        F.col("node").cast("bigint").alias("s_suppkey"),
        "deg",
        F.coalesce("tri", F.lit(0)).cast("bigint").alias("tri"),
    )
    wedges = F.col("deg") * (F.col("deg") - 1)
    return j.select(
        "s_suppkey",
        "deg",
        (2 * F.col("tri")).alias("tri2"),
        wedges.alias("wedges"),
        F.expr("(1000000 * 2 * tri) div (deg * (deg - 1))").alias("lcc_ppm"),
    )


def _g13_sql():
    from x8313_etl_spark.queries.graph_q import _TRI_QUANTILE

    return f"""
WITH pairs AS MATERIALIZED (
  SELECT s1, s2, count(DISTINCT ok) AS shared FROM (
    SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, a.l_orderkey AS ok
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  ) GROUP BY s1, s2
),
t AS (SELECT CEIL(quantile_cont(shared, {_TRI_QUANTILE})) AS thr FROM pairs),
e AS MATERIALIZED (SELECT s1, s2 FROM pairs, t WHERE shared >= thr),
tris AS MATERIALIZED (
  SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
  FROM e e1 JOIN e e2 ON e2.s1 = e1.s2
  JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
),
per_node AS (
  SELECT node, CAST(count(*) AS BIGINT) AS tri FROM (
    SELECT a AS node FROM tris
    UNION ALL SELECT b FROM tris
    UNION ALL SELECT c FROM tris
  ) GROUP BY node
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT s1 AS node FROM e UNION ALL SELECT s2 FROM e
  ) GROUP BY node
)
SELECT CAST(d.node AS BIGINT) AS s_suppkey, d.deg,
       2 * coalesce(p.tri, 0) AS tri2,
       d.deg * (d.deg - 1) AS wedges,
       (1000000 * 2 * coalesce(p.tri, 0)) // (d.deg * (d.deg - 1)) AS lcc_ppm
FROM deg d LEFT JOIN per_node p ON p.node = d.node
WHERE d.deg >= 2
"""


def test_g13_local_clustering_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r11:g13_local_clustering", fn=_g13_fn, oracle=_g13_sql(),
        category="graph",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_g13_lcc_spans_open_and_closed_neighborhoods(spark, sf_oracle_dir):
    """The fixture graph must exercise the ratio: some node with
    lcc < 1 (an open wedge) and some node with lcc > 0 (a closed
    triangle) — a graph that is one clique, or triangle-free, tests
    only a constant."""
    rows = _g13_fn(spark, sf_oracle_dir).collect()
    assert any(r["tri2"] > 0 for r in rows)
    assert any(r["tri2"] < r["wedges"] for r in rows)


# ---------------------------------------------------------------------------
# w18_event_paths — top-k frequent 3-step event-type paths
# ---------------------------------------------------------------------------

_W18_TOPK = 10


def _w18_fn(spark, sf_dir):
    """User-journey path mining: the top-{_W18_TOPK} most frequent
    3-step event-type paths across all user streams (each user's
    events ordered by (ts, event_id); every consecutive triple is a
    path occurrence). The n-gram refinement of p_markov_transitions'
    pairwise matrix — 'view>view>purchase vs view>purchase' is the
    distinction a funnel owner actually reads. One window pass per
    user (two leads share the sort), a path-keyed count, and a global
    top-k through one final rank on the tiny path-vocabulary table
    (|event_types|³ ≤ 125 rows — the single-partition window is
    vocabulary-bounded, never row-bounded)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    paths = (
        ev.select(
            "user_id",
            F.col("event_type").alias("t1"),
            F.lead("event_type", 1).over(w).alias("t2"),
            F.lead("event_type", 2).over(w).alias("t3"),
        )
        .filter(F.col("t3").isNotNull())
        .select(
            F.concat_ws(">", "t1", "t2", "t3").alias("path"),
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    rk = Window.orderBy(F.col("n").desc(), F.col("path"))
    return (
        paths.withColumn("rn", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rn") <= _W18_TOPK)
        .select("path", "n", "rn")
    )


_W18_SQL = f"""
WITH p AS (
  SELECT t1 || '>' || t2 || '>' || t3 AS path FROM (
    SELECT event_type AS t1,
           lead(event_type, 1) OVER w AS t2,
           lead(event_type, 2) OVER w AS t3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ) WHERE t3 IS NOT NULL
),
c AS (SELECT path, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY path)
SELECT path, n, rn FROM (
  SELECT path, n,
         CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rn
  FROM c
) WHERE rn <= {_W18_TOPK}
"""


def test_w18_event_paths_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r11:w18_event_paths", fn=_w18_fn, oracle=_W18_SQL,
        category="windows",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_w18_rank_actually_cuts(spark, sf_oracle_dir):
    """More distinct paths must exist than the top-k keeps, and counts
    must not be all-tied (otherwise the ordering is untested)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_oracle_dir, "events")
    n_paths = (
        ev.select(
            F.col("event_type").alias("t1"),
            F.lead("event_type", 1).over(w).alias("t2"),
            F.lead("event_type", 2).over(w).alias("t3"),
            "user_id", "ts", "event_id",
        )
        .filter(F.col("t3").isNotNull())
        .select(F.concat_ws(">", "t1", "t2", "t3").alias("path"))
        .distinct()
        .count()
    )
    assert n_paths > _W18_TOPK
    rows = _w18_fn(spark, sf_oracle_dir).collect()
    assert len({r["n"] for r in rows}) > 1


# ---------------------------------------------------------------------------
# p_query_expansion — RM3-style pseudo-relevance feedback over BM25
# ---------------------------------------------------------------------------

_QE_FB_DOCS = 5  # pseudo-relevant depth (BM25_TOP_K)
_QE_TERMS = 3  # expansion terms per query


def _qe_fn(spark, sf_dir):
    """Pseudo-relevance-feedback query expansion (RM3 family, public
    IR literature): for each BM25 query, take its top-{_QE_FB_DOCS}
    retrieved docs as pseudo-relevant, score every term of those docs
    by Σ tf·ln(N/df) over the feedback set, drop terms already in the
    query, and emit the top-{_QE_TERMS} expansion terms — the missing
    arrow of the retrieval stack (rank → EXPAND → fuse → rerank →
    pack). Weights follow the r9 floor-micro-unit discipline: each
    tf·idf contribution maps to FLOOR(t·1e6 + 0.5) BIGINT before the
    exact integer sum, so no cross-engine fp surface survives into the
    ranking. Scale: the feedback set is (queries × k) docs — their tf
    rows semi-join-prune the corpus tf table exactly like BM25's query
    terms; df/N are corpus aggregates shared with l6. Rank ties break
    on the term string."""
    from x8313_etl_spark.queries.corpus_q import BM25_N_QUERIES, p_bm25_topk

    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = t.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dfc = t.distinct().groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))

    fb = p_bm25_topk(spark, sf_dir).select("q_id", "doc_id")
    qterms = (
        t.filter(F.col("doc_id") < BM25_N_QUERIES)
        .select(F.col("doc_id").alias("q_id"), "term")
        .distinct()
    )
    contrib_u6 = F.floor(
        F.col("tf") * F.log(F.col("n_docs") / F.col("df")) * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("bigint")
    scored = (
        fb.join(tf, "doc_id")
        .join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(n))
        .groupBy("q_id", "term")
        .agg(F.sum(contrib_u6).cast("bigint").alias("weight_u6"))
        .join(qterms, ["q_id", "term"], "left_anti")
    )
    rk = Window.partitionBy("q_id").orderBy(
        F.col("weight_u6").desc(), F.col("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rn") <= _QE_TERMS)
        .select("q_id", "term", "weight_u6", "rn")
    )


def _qe_sql():
    from x8313_etl_spark.queries.corpus_q import _BM25_SQL, BM25_N_QUERIES

    return f"""
WITH ret AS MATERIALIZED ({_BM25_SQL}),
t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM t GROUP BY 1, 2),
dfc AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM t GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
qterms AS (
  SELECT DISTINCT doc_id AS q_id, term FROM t WHERE doc_id < {BM25_N_QUERIES}
),
scored AS (
  SELECT r.q_id, tf.term,
         CAST(SUM(CAST(FLOOR(tf.tf * ln(n.n_docs / dfc.df) * 1000000.0 + 0.5)
                       AS BIGINT)) AS BIGINT) AS weight_u6
  FROM ret r
  JOIN tf ON tf.doc_id = r.doc_id
  JOIN dfc ON dfc.term = tf.term
  CROSS JOIN n
  WHERE NOT EXISTS (SELECT 1 FROM qterms q
                    WHERE q.q_id = r.q_id AND q.term = tf.term)
  GROUP BY 1, 2
)
SELECT q_id, term, weight_u6, rn FROM (
  SELECT q_id, term, weight_u6,
         CAST(row_number() OVER (PARTITION BY q_id
                                 ORDER BY weight_u6 DESC, term)
              AS BIGINT) AS rn
  FROM scored
) WHERE rn <= {_QE_TERMS}
"""


def test_p_query_expansion_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r11:p_query_expansion", fn=_qe_fn, oracle=_qe_sql(),
        category="pipeline",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_p_query_expansion_terms_are_new(spark, sf_oracle_dir):
    """Every expansion term must be absent from its query's own term
    set (the anti-join contract), and every query must receive the
    full complement of expansion terms at this sf."""
    from x8313_etl_spark.queries.corpus_q import BM25_N_QUERIES

    out = _qe_fn(spark, sf_oracle_dir).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["q_id"], []).append(r["term"])
    assert len(per_q) == BM25_N_QUERIES
    assert all(len(v) == _QE_TERMS for v in per_q.values())
    d = load_table(spark, sf_oracle_dir, "documents")
    qtext = {
        r["doc_id"]: set(r["text"].split(" "))
        for r in d.filter(F.col("doc_id") < BM25_N_QUERIES).collect()
    }
    for q, terms in per_q.items():
        assert not (set(terms) & qtext[q])


# ---------------------------------------------------------------------------
# p_media_dedup — exact duplicate detection over binary media files
# ---------------------------------------------------------------------------

_MD_N_FILES = 32
_MD_DISTINCT = 20  # files 20..31 duplicate the contents of files 0..11


def _md_payload(i: int) -> bytes:
    """Deterministic pseudo-media bytes with PLANTED duplicate groups:
    content is keyed by i % _MD_DISTINCT, so files 20..31 are exact
    byte-for-byte copies of files 0..11 (the s22 generator never
    repeats a payload — dedup there would be vacuous, the g3 rule)."""
    import hashlib

    g = i % _MD_DISTINCT
    return hashlib.md5(f"md-{g}".encode()).digest() * (g % 5 + 1)


def _media_dedup_fn(spark, sf_dir):
    """Exact media dedup — the first pass of any image/audio corpus
    pipeline (byte-identical re-uploads, mirrored files): binaryFile
    scan → group by content digest → every file gets a verdict row
    (canonical = min filename in its group, is_dup for the rest) —
    the l1_exact_dedup shape applied to the s22 ingest path, closing
    ingest → dedup for the multimodal family. Scale: one shuffle keyed
    by the 128-bit digest; groups are duplicate-cluster sized; no
    byte-level comparison ever happens after the per-file md5 (which
    rides the scan). The twin regenerates the identical table from the
    same generator algebra (legitimate for file→row boundary checks —
    the s22 precedent)."""
    import os

    from x8313_etl_spark.queries.sources_q import _tag, scratch

    d = scratch(f"p_media_dedup_{_tag(sf_dir)}")
    if not os.path.isdir(d) or len(os.listdir(d)) != _MD_N_FILES:
        os.makedirs(d, exist_ok=True)
        for i in range(_MD_N_FILES):
            with open(os.path.join(d, f"f{i:03d}.bin"), "wb") as f:
                f.write(_md_payload(i))
    files = spark.read.format("binaryFile").load(d).select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("fname"),
        F.md5(F.col("content")).alias("content_md5"),
        F.col("length").cast("bigint").alias("n_bytes"),
    )
    w = Window.partitionBy("content_md5")
    return files.select(
        "fname",
        "content_md5",
        "n_bytes",
        F.min("fname").over(w).alias("canonical"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_copies"),
        (F.col("fname") != F.min("fname").over(w)).alias("is_dup"),
    )


def _media_dedup_sql():
    import hashlib
    from collections import defaultdict

    groups = defaultdict(list)
    meta = {}
    for i in range(_MD_N_FILES):
        p = _md_payload(i)
        h = hashlib.md5(p).hexdigest()
        groups[h].append(f"f{i:03d}.bin")
        meta[f"f{i:03d}.bin"] = (h, len(p))
    rows = []
    for fname, (h, nb) in sorted(meta.items()):
        fam = sorted(groups[h])
        rows.append(
            f"('{fname}', '{h}', {nb}, '{fam[0]}', {len(fam)}, "
            f"{str(fname != fam[0]).upper()})"
        )
    values = ",\n".join(rows)
    return f"""
SELECT * FROM (VALUES
{values}
) AS t(fname, content_md5, n_bytes, canonical, n_copies, is_dup)
"""


def test_p_media_dedup_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r11:p_media_dedup", fn=_media_dedup_fn,
        oracle=_media_dedup_sql(), category="pipeline",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_p_media_dedup_groups_are_nontrivial(spark, sf_oracle_dir):
    """Duplicate AND singleton groups must both exist (the planted
    structure), and dup verdicts must point at a different file."""
    rows = _media_dedup_fn(spark, sf_oracle_dir).collect()
    assert any(r["n_copies"] > 1 for r in rows)
    assert any(r["n_copies"] == 1 for r in rows)
    for r in rows:
        if r["is_dup"]:
            assert r["canonical"] != r["fname"]


# ---------------------------------------------------------------------------
# s23_csv_quoted_multiline — CSV round-trip with embedded delimiters,
# quotes, and newlines (the classic CSV-edge-case trap)
# ---------------------------------------------------------------------------


def _s23_fn(spark, sf_dir):
    """CSV round-trip under adversarial field content: document texts
    are decorated IN-PLAN with embedded commas, double quotes, and a
    literal newline, written as quoted CSV, and read back with
    multiLine=true + escape='\"' (RFC-4180 double-quote doubling — the
    mode real exports use). The aggregate digests text lengths and an
    md5 per doc_id band, so ANY quoting/newline corruption (the classic
    'row split at the embedded newline' failure) changes counts or
    hashes loudly. The twin computes the same digest from the ORIGINAL
    table — the compare proves the round-trip is lossless. Scale: CSV
    multiLine forces whole-file parsing per file (no intra-file
    splitting), which is exactly why the docstring-documented posture
    at 100 TB is many medium files; the write keeps Spark's default
    per-partition files so the read parallelizes per file."""
    import os
    import shutil
    import uuid as _uuid

    from x8313_etl_spark.queries.sources_q import _tag, scratch

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.concat(
            F.lit('pre,"fix"\n'),
            F.col("text"),
            F.lit(',"tail'),
        ).alias("text"),
    )
    family = scratch(f"s23_csvq_{_tag(sf_dir)}")
    # age-prune older sibling runs (t15 discipline) — the CURRENT run's
    # dir must outlive this fn: the returned frame reads it lazily
    import time as _time

    cutoff = _time.time() - 1800
    for sub in os.listdir(family) if os.path.isdir(family) else []:
        pth = os.path.join(family, sub)
        try:
            if os.path.getmtime(pth) < cutoff:
                shutil.rmtree(pth, ignore_errors=True)
        except OSError:
            pass
    work = os.path.join(family, _uuid.uuid4().hex[:12])
    shutil.rmtree(work, ignore_errors=True)
    (
        d.write.option("header", "true")
        .option("quoteAll", "true")
        .option("escape", '"')
        .csv(work)
    )
    back = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .schema("doc_id long, lang string, text string")
        .csv(work)
    )
    out = back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("chars_total"),
        F.md5(
            F.concat_ws(
                "|",
                F.sort_array(F.collect_list(F.concat_ws(":", F.col("doc_id").cast("string"), F.md5("text")))),
            )
        ).alias("content_digest"),
    )
    return out


_S23_SQL = r"""
WITH d AS (
  SELECT doc_id, lang,
         'pre,"fix"' || chr(10) || text || ',"tail' AS text
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS chars_total,
       md5(string_agg(CAST(doc_id AS VARCHAR) || ':' || md5(text), '|'
                      ORDER BY CAST(doc_id AS VARCHAR) || ':' || md5(text)))
         AS content_digest
FROM d GROUP BY lang
"""


def test_s23_csv_quoted_multiline_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r11:s23_csv_quoted_multiline", fn=_s23_fn, oracle=_S23_SQL,
        category="sources",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_s23_decoration_is_adversarial(spark, sf_oracle_dir):
    """The decorated text must actually contain the three hazards
    (comma, doubled-quote material, embedded newline) — otherwise the
    round-trip proves nothing about quoting."""
    d = load_table(spark, sf_oracle_dir, "documents").limit(1).collect()[0]
    decorated = 'pre,"fix"\n' + d["text"] + ',"tail'
    assert "," in decorated and '"' in decorated and "\n" in decorated
