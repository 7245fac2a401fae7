"""Pre-registration oracle checks — round-12-authored candidate batch T
(RANKING METRICS — the second spare-capacity batch alongside batch S's
classifier evals in tests/test_spare_candidates.py; same status:
substitution bench / post-r20 continuation, NOT in the r13–r20 budget
queue).

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0 — including the int128 oracle-type gate and
the strict int-vs-float transport dtype check) on an ad-hoc
UNREGISTERED QuerySpec, so a future round's registration is a verbatim
fn+oracle copy. Twins verify at BOTH fixture sfs.

Why this batch: batch S grades CLASSIFIERS; this batch grades the
RANKERS — the metrics a retrieval stack is actually tuned on. The gold
is the same conjunctive boolean-AND relevance as ev_pr_at_k_bm25 (a
doc is relevant to query q iff it contains EVERY term of q — the
boolean-retrieval reference needing no human labels), extended to
GRADED relevance for NDCG (gain = number of query terms the doc
contains — the natural graded form of the same gold). All outputs are
integer micro-units; NDCG's log2 discount table is precomputed in
PYTHON as integer constants (FLOOR(1e6/log2(r+1)+0.5) for r=1..k), so
neither engine evaluates a logarithm — the one fp surface of the
metric is eliminated at authoring time, not quantized at runtime.

Batch T members (four strong candidates, the batch-M/R precedent):
- ev_mrr_bm25: per-query reciprocal rank of the FIRST relevant
  retrieved doc (1e6 div rank; 0 when none of the k are relevant).
- ev_recall_at_k_bm25: per-query recall@k against the FULL corpus-wide
  relevant set (the conjunctive gold computed over every doc matching
  ≥1 query term — Σ df(query terms) candidate volume, the same
  posting-join law as BM25 scoring itself; set sizes 2..104 of 500
  docs at sf0.01 — query length drives sharpness, and the spread is
  itself what makes recall@k read differently per query).
- ev_ndcg_bm25: per-query NDCG@k under graded gain = matched query
  terms, integer discount table, ideal ordering via an in-query
  descending window over ≤k rows.
- ev_rank_overlap_rrf: per-query Jaccard overlap between the BM25
  top-k and the registered RRF-fused top-k — the dial that says how
  much the semantic leg actually changes the ranking.

10× authoring sweep (FK-consistent bench replica, 2026-08-16; cold
pool per member, so each number carries its own BM25 rebuild):
ev_mrr_bm25 14.9→24.7 s (1.7×), ev_recall_at_k_bm25 2.7→8.0 s (3.0× —
the BM25 corpus-explode law), ev_ndcg_bm25 5.9→34.8 s (5.9×) and
ev_rank_overlap_rrf 8.8→49.0 s (5.6×) — the two slower laws are
compositions of LINEAR terms, not pair terms: both re-run the full
corpus-distinct (doc_id, term) projection (a corpus-sized shuffle)
on top of the embedded BM25 3.4× law, and overlap embeds the ENTIRE
RRF stack (its cosine-probe leg is corpus-linear at fixed probes —
scripts/scale10x_r9.py's measured 3.4×). Outputs stay fixed at
|queries| rows and every metric join is (queries×k)-bounded; at
registration the corpus term projection should be POOLED with BM25's
own tokenize (swap_persist) rather than recomputed — noted as the one
plan lever for the registered form.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from x8313_etl_spark import audit
from x8313_etl_spark.io import load_table
from x8313_etl_spark.registry import QuerySpec, registry

from .oracle_utils import compare_query


@pytest.fixture(autouse=True, scope="module")
def _scrub_ledger_keys():
    before = set(audit.ledger())
    yield
    for key in set(audit.ledger()) - before:
        audit.forget(key)


def _oracle_of(name: str) -> str:
    """Verbatim reuse of a REGISTERED query's oracle SQL as a CTE body
    (the named-constant composition rule via the registry — batch S's
    _oracle_of)."""
    return registry()[name].oracle


# ---------------------------------------------------------------------------
# shared gold: conjunctive boolean-AND relevance + graded matched-term gain
# ---------------------------------------------------------------------------

#: SQL CTE suffix computing, for the retrieved (q_id, doc_id) pairs of
#: `ret`, the number of query terms each retrieved doc contains
#: (`found`) and each query's term count (`n_qterms`)
_GOLD_SQL = """
t AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
),
qt AS (SELECT doc_id AS q_id, term FROM t WHERE doc_id < {nq}),
nqt AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_qterms FROM qt GROUP BY 1),
found AS (
  SELECT r.q_id, r.doc_id, r.rn, CAST(count(t.term) AS BIGINT) AS found
  FROM ret r
  JOIN qt ON qt.q_id = r.q_id
  LEFT JOIN t ON t.doc_id = r.doc_id AND t.term = qt.term
  GROUP BY 1, 2, 3
)"""


def _retrieved_with_gold(spark, sf_dir):
    """(q_id, doc_id, rn, found, n_qterms) for every retrieved pair —
    the shared probe: BM25's top-k joined with the conjunctive gold.
    The corpus term table is semi-pruned to retrieved docs before the
    per-term join, so the probe is (queries × k × query-terms)-bounded;
    the only corpus passes are BM25's own (pooled there) and one
    distinct (doc_id, term) projection."""
    from x8313_etl_spark.queries.corpus_q import BM25_N_QUERIES, p_bm25_topk

    topk = p_bm25_topk(spark, sf_dir).select("q_id", "doc_id", "rn")
    t = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
    )
    qt = (
        t.filter(F.col("doc_id") < BM25_N_QUERIES)
        .select(F.col("doc_id").alias("q_id"), "term")
    )
    nq = qt.groupBy("q_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_qterms")
    )
    rt = t.join(F.broadcast(topk.select("doc_id").distinct()), "doc_id", "semi")
    found = (
        topk.join(qt, "q_id")
        .join(rt, ["doc_id", "term"], "semi")
        .groupBy("q_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("found"))
    )
    return (
        topk.join(found, ["q_id", "doc_id"], "left")
        .join(F.broadcast(nq), "q_id")
        .select(
            "q_id",
            "doc_id",
            "rn",
            F.coalesce(F.col("found"), F.lit(0)).cast("bigint").alias("found"),
            "n_qterms",
        )
    )


def _gold_sql_head() -> str:
    from x8313_etl_spark.queries.corpus_q import BM25_N_QUERIES

    return (
        f"WITH ret AS MATERIALIZED ({_oracle_of('p_bm25_topk')}),"
        + _GOLD_SQL.format(nq=BM25_N_QUERIES)
    )


# ---------------------------------------------------------------------------
# ev_mrr_bm25 — reciprocal rank of the first relevant retrieved doc
# ---------------------------------------------------------------------------


def _mrr_fn(spark, sf_dir):
    """Per-query reciprocal rank (public IR metric): 1e6 div (rank of
    the FIRST retrieved doc containing every query term), 0 when none
    of the k qualify. Integer floor division — ranks are 1..k so the
    micro-unit grid is exact and collision-free. Scale: the metric
    stage is (queries × k)-bounded on top of the shared gold probe."""
    g = _retrieved_with_gold(spark, sf_dir)
    per_q = (
        g.select(
            "q_id",
            F.when(
                F.col("found") == F.col("n_qterms"), F.col("rn")
            ).alias("rel_rn"),
        )
        .groupBy("q_id")
        .agg(F.min("rel_rn").alias("first_rel"))
    )
    return per_q.select(
        "q_id",
        F.coalesce(F.col("first_rel"), F.lit(0)).cast("bigint").alias(
            "first_rel_rn"
        ),
        F.coalesce(
            F.expr("1000000 div first_rel"), F.lit(0)
        ).cast("bigint").alias("rr_ppm"),
    )


def _mrr_sql() -> str:
    return f"""
{_gold_sql_head()},
per_q AS (
  SELECT f.q_id,
         min(CASE WHEN f.found = nqt.n_qterms THEN f.rn END) AS first_rel
  FROM found f JOIN nqt ON nqt.q_id = f.q_id
  GROUP BY 1
)
SELECT q_id,
       CAST(coalesce(first_rel, 0) AS BIGINT) AS first_rel_rn,
       CAST(coalesce(1000000 // first_rel, 0) AS BIGINT) AS rr_ppm
FROM per_q
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ev_mrr_bm25_twin(spark, d):
    spec = QuerySpec(
        name="rT:ev_mrr_bm25", fn=_mrr_fn, oracle=_mrr_sql(),
        category="pipeline",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_ev_mrr_self_doc_leads(spark, sf_oracle_dir):
    """Most queries retrieve their own document first (it contains all
    its terms with maximal tf), so MRR must be dominated by rank-1
    hits — and the metric must not be saturated (some query's first
    relevant doc sits deeper or is missed)."""
    rows = _mrr_fn(spark, sf_oracle_dir).collect()
    assert rows
    at1 = sum(1 for r in rows if r.first_rel_rn == 1)
    assert at1 * 2 > len(rows), rows
    assert any(r.first_rel_rn != 1 for r in rows) or len(rows) < 4, rows


# ---------------------------------------------------------------------------
# ev_recall_at_k_bm25 — recall@k against the corpus-wide conjunctive set
# ---------------------------------------------------------------------------


def _recall_fn(spark, sf_dir):
    """Per-query recall@k against the FULL relevant set: every corpus
    doc containing all query terms (computed corpus-wide — candidate
    volume Σ df(query terms), the registered BM25 posting-join law),
    vs how many of them the top-k actually retrieved. Scale: the
    corpus-side conjunctive probe semi-prunes the term table by the
    query vocabulary FIRST (the BM25 prune), then counts matches per
    (q, doc) — never an unpruned corpus product."""
    from x8313_etl_spark.queries.corpus_q import BM25_N_QUERIES, p_bm25_topk

    topk = p_bm25_topk(spark, sf_dir).select("q_id", "doc_id")
    t = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
    )
    qt = (
        t.filter(F.col("doc_id") < BM25_N_QUERIES)
        .select(F.col("doc_id").alias("q_id"), "term")
    )
    nq = qt.groupBy("q_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_qterms")
    )
    # corpus-wide conjunctive gold: prune the corpus postings by the
    # query vocabulary (broadcast — query-set-bounded), count matched
    # terms per (q, doc), keep full matches
    matched = (
        t.join(F.broadcast(qt), "term")
        .groupBy("q_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("found"))
    )
    rel = matched.join(F.broadcast(nq), "q_id").filter(
        F.col("found") == F.col("n_qterms")
    ).select("q_id", "doc_id")
    rel_tot = rel.groupBy("q_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("rel_total")
    )
    hits = (
        rel.join(topk, ["q_id", "doc_id"], "semi")
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
    )
    return (
        rel_tot.join(hits, "q_id", "left")
        .select(
            "q_id",
            "rel_total",
            F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("hits"),
        )
        .select(
            "q_id",
            "rel_total",
            "hits",
            F.expr("(hits * 1000000) div rel_total").alias("recall_ppm"),
        )
    )


def _recall_sql() -> str:
    from x8313_etl_spark.queries.corpus_q import BM25_N_QUERIES

    return f"""
WITH ret AS MATERIALIZED ({_oracle_of("p_bm25_topk")}),
t AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
),
qt AS (SELECT doc_id AS q_id, term FROM t WHERE doc_id < {BM25_N_QUERIES}),
nqt AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_qterms FROM qt GROUP BY 1),
matched AS (
  SELECT qt.q_id, t.doc_id, CAST(count(*) AS BIGINT) AS found
  FROM t JOIN qt ON qt.term = t.term
  GROUP BY 1, 2
),
rel AS (
  SELECT m.q_id, m.doc_id
  FROM matched m JOIN nqt ON nqt.q_id = m.q_id
  WHERE m.found = nqt.n_qterms
),
rel_tot AS (
  SELECT q_id, CAST(count(*) AS BIGINT) AS rel_total FROM rel GROUP BY 1
),
hits AS (
  SELECT rel.q_id, CAST(count(*) AS BIGINT) AS hits
  FROM rel SEMI JOIN ret ON ret.q_id = rel.q_id AND ret.doc_id = rel.doc_id
  GROUP BY 1
)
SELECT rt.q_id, rt.rel_total,
       CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       (CAST(coalesce(h.hits, 0) AS BIGINT) * 1000000) // rt.rel_total
         AS recall_ppm
FROM rel_tot rt LEFT JOIN hits h ON h.q_id = rt.q_id
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ev_recall_at_k_bm25_twin(spark, d):
    spec = QuerySpec(
        name="rT:ev_recall_at_k_bm25", fn=_recall_fn, oracle=_recall_sql(),
        category="pipeline",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_ev_recall_gold_is_nonempty_and_bounded(spark, sf_oracle_dir):
    """Every query has ≥1 relevant doc (its own), every relevant set
    is a strict MINORITY of the corpus (the conjunctive gold filters —
    measured spread at sf0.01: 2..104 of 500 docs, short common-word
    queries being the loose end), the sizes VARY across queries
    (query length drives sharpness — a constant-size gold would mean
    the derivation ignores the query), and the top-k hits somewhere."""
    rows = _recall_fn(spark, sf_oracle_dir).collect()
    assert rows
    assert all(r.rel_total >= 1 for r in rows)
    n_docs = load_table(spark, sf_oracle_dir, "documents").count()
    assert all(r.rel_total * 2 < n_docs for r in rows)
    sizes = [r.rel_total for r in rows]
    assert max(sizes) > min(sizes), sizes
    assert any(r.hits >= 1 for r in rows)


# ---------------------------------------------------------------------------
# ev_ndcg_bm25 — NDCG@k with a Python-precomputed integer discount table
# ---------------------------------------------------------------------------

import math as _math

from x8313_etl_spark.queries.corpus_q import BM25_TOP_K as _NDCG_K

#: FLOOR(1e6 / log2(r+1) + 0.5) for ranks 1..k — computed ONCE in
#: Python so neither engine evaluates a logarithm at query time; the
#: table is part of the operator's definition, like BM25's k1/b
_NDCG_DISC = {
    r: int(_math.floor(1_000_000 / _math.log2(r + 1) + 0.5))
    for r in range(1, _NDCG_K + 1)
}


def _ndcg_disc_case(col: str) -> str:
    return (
        "CASE "
        + " ".join(
            f"WHEN {col} = {r} THEN {w}" for r, w in _NDCG_DISC.items()
        )
        + " ELSE 0 END"
    )


def _ndcg_fn(spark, sf_dir):
    """Per-query NDCG@k (public IR metric) under GRADED gain = number
    of query terms the retrieved doc contains (the graded form of the
    conjunctive gold — needs no human labels). ENGINE-EXACT: the log2
    discount table is {_NDCG_K} integer constants precomputed in
    Python (module constant _NDCG_DISC), DCG is Σ gain·disc(rank) in
    int64, the IDEAL ordering re-ranks the same ≤k gains descending
    inside one per-query window, and ndcg_ppm is one floor division.
    Scale: (queries × k)-bounded on top of the shared gold probe."""
    g = _retrieved_with_gold(spark, sf_dir)
    disc = F.expr(_ndcg_disc_case("rn"))
    ideal_rank = Window.partitionBy("q_id").orderBy(
        F.col("found").desc(), F.col("rn")
    )
    scored = g.select(
        "q_id",
        (F.col("found") * disc).alias("dg"),
        F.row_number().over(ideal_rank).alias("irn"),
        "found",
    ).select(
        "q_id",
        "dg",
        (F.col("found") * F.expr(_ndcg_disc_case("irn"))).alias("idg"),
    )
    agg = scored.groupBy("q_id").agg(
        F.sum("dg").cast("bigint").alias("dcg_u"),
        F.sum("idg").cast("bigint").alias("idcg_u"),
    )
    return agg.select(
        "q_id",
        "dcg_u",
        "idcg_u",
        F.when(F.col("idcg_u") > 0, F.expr("(dcg_u * 1000000) div idcg_u"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("ndcg_ppm"),
    )


def _ndcg_sql() -> str:
    return f"""
{_gold_sql_head()},
ranked AS (
  SELECT q_id, rn, found,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY found DESC, rn) AS irn
  FROM found
),
agg AS (
  SELECT q_id,
         CAST(sum(found * {_ndcg_disc_case("rn")}) AS BIGINT) AS dcg_u,
         CAST(sum(found * {_ndcg_disc_case("irn")}) AS BIGINT) AS idcg_u
  FROM ranked
  GROUP BY 1
)
SELECT q_id, dcg_u, idcg_u,
       CASE WHEN idcg_u > 0 THEN (dcg_u * 1000000) // idcg_u
            ELSE 0 END AS ndcg_ppm
FROM agg
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ev_ndcg_bm25_twin(spark, d):
    spec = QuerySpec(
        name="rT:ev_ndcg_bm25", fn=_ndcg_fn, oracle=_ndcg_sql(),
        category="pipeline",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_ev_ndcg_is_high_but_reorderable(spark, sf_oracle_dir):
    """BM25 should rank higher-gain docs earlier (NDCG well above the
    floor) but not in perfect graded order for every query — some
    query must have dcg < idcg or the ideal re-ranking machinery is
    dead code."""
    rows = _ndcg_fn(spark, sf_oracle_dir).collect()
    assert rows
    assert all(r.dcg_u <= r.idcg_u for r in rows)
    assert any(r.dcg_u < r.idcg_u for r in rows), rows
    assert sum(r.ndcg_ppm for r in rows) > 800000 * len(rows), rows


def test_ev_ndcg_discount_table_is_the_log2_grid():
    """The precomputed table must be the canonical 1/log2(r+1) grid —
    pin the five constants so an accidental edit cannot silently
    redefine the metric."""
    assert _NDCG_DISC == {1: 1000000, 2: 630930, 3: 500000,
                          4: 430677, 5: 386853}


# ---------------------------------------------------------------------------
# ev_rank_overlap_rrf — Jaccard overlap of BM25 top-k vs RRF-fused top-k
# ---------------------------------------------------------------------------


def _overlap_fn(spark, sf_dir):
    """Per-query Jaccard overlap between the lexical (BM25) top-k and
    the registered hybrid RRF-fused top-k — the dial that says how much
    the semantic leg actually changes what a user sees (overlap 1 ⇒
    fusion is a no-op; 0 ⇒ the legs disagree entirely). Integer ppm
    over set sizes ≤ k. Scale: both inputs are (queries × k)-bounded
    rankings; the overlap join is keyed on (q_id, doc_id)."""
    from x8313_etl_spark.queries.corpus_q import p_bm25_topk
    from x8313_etl_spark.queries.similarity_q import sim_hybrid_rrf

    a = p_bm25_topk(spark, sf_dir).select("q_id", "doc_id")
    b = sim_hybrid_rrf(spark, sf_dir).select("q_id", "doc_id")
    na = a.groupBy("q_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_lex"))
    nb = b.groupBy("q_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_fused"))
    inter = (
        a.join(b, ["q_id", "doc_id"], "semi")
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    return (
        na.join(nb, "q_id")
        .join(inter, "q_id", "left")
        .select(
            "q_id",
            "n_lex",
            "n_fused",
            F.coalesce(F.col("n_inter"), F.lit(0)).cast("bigint").alias(
                "n_inter"
            ),
        )
        .select(
            "q_id",
            "n_lex",
            "n_fused",
            "n_inter",
            F.expr(
                "(n_inter * 1000000) div (n_lex + n_fused - n_inter)"
            ).alias("jaccard_ppm"),
        )
    )


def _overlap_sql() -> str:
    return f"""
WITH bm_top AS MATERIALIZED ({_oracle_of("p_bm25_topk")}),
rrf_top AS MATERIALIZED ({_oracle_of("sim_hybrid_rrf")}),
na AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_lex FROM bm_top GROUP BY 1),
nb AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_fused FROM rrf_top GROUP BY 1),
i AS (
  SELECT bm_top.q_id, CAST(count(*) AS BIGINT) AS n_inter
  FROM bm_top SEMI JOIN rrf_top
    ON rrf_top.q_id = bm_top.q_id AND rrf_top.doc_id = bm_top.doc_id
  GROUP BY 1
)
SELECT na.q_id, na.n_lex, nb.n_fused,
       CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
       (CAST(coalesce(i.n_inter, 0) AS BIGINT) * 1000000)
         // (na.n_lex + nb.n_fused - CAST(coalesce(i.n_inter, 0) AS BIGINT))
         AS jaccard_ppm
FROM na JOIN nb ON nb.q_id = na.q_id
LEFT JOIN i ON i.q_id = na.q_id
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ev_rank_overlap_rrf_twin(spark, d):
    spec = QuerySpec(
        name="rT:ev_rank_overlap_rrf", fn=_overlap_fn, oracle=_overlap_sql(),
        category="pipeline",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_ev_overlap_shows_fusion_matters(spark, sf_oracle_dir):
    """The semantic leg must move SOME query's list (overlap < 1
    somewhere) without obliterating the lexical ranking everywhere
    (overlap > 0 somewhere) — both regimes, or the dial reads
    nothing."""
    rows = _overlap_fn(spark, sf_oracle_dir).collect()
    assert rows
    assert any(r.jaccard_ppm < 1000000 for r in rows), rows
    assert any(r.jaccard_ppm > 0 for r in rows), rows
