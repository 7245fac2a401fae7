"""Pre-registration oracle checks for round-8 candidate queries
(batch D — authored round 7 after the 15 r7 registrations landed).

Protocol identical to tests/test_r7_candidates*.py: each candidate runs
the EXACT compare the registry queries get (oracle_utils.compare_query,
tolerance 0) on an ad-hoc UNREGISTERED QuerySpec, so a future round's
registration is copying fn + oracle into a query module. Ledger keys
introduced here are scrubbed so the materialization gate keeps auditing
registered queries only.
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
    before = set(audit.ledger())
    yield
    for key in set(audit.ledger()) - before:
        audit.forget(key)


# ---------------------------------------------------------------------------
# g12_node_jaccard: neighbor-set Jaccard node similarity (link
# prediction / missing-edge scoring — Liben-Nowell & Kleinberg, public).
# ---------------------------------------------------------------------------


_G12_TOPK = 5


def _g12_fn(spark, sf_dir):
    """TOP-K neighbor-set Jaccard per node: candidate pairs are WEDGES
    (two nodes sharing ≥1 neighbor) over the quantile-thresholded
    co-supply graph — the g3 wedge-join shape, Σ deg² volume bounded by
    the edge threshold — and each node keeps only its k=5 most similar
    peers ((jaccard DESC, peer) rank, WindowGroupLimit prunes below the
    shuffle). The first sweep of the ALL-pairs form measured the dense-
    graph trap this rank exists to avoid: every supplier pair was a
    wedge pair (499,500 rows = C(1000,2) at sf0.1 — n² OUTPUT), so the
    operator contract is top-k, the shape a link-prediction consumer
    reads anyway (is_edge=false rows = missing-edge suggestions).
    jaccard is ONE double division of exact integers (cross-engine
    exact). At 100 TB the wedge volume itself is the dial: the
    quantile threshold bounds degrees, and past that the MinHash
    machinery (l2) approximates adjacency-set similarity without
    enumerating wedges — documented, not implemented."""
    from pyspark.sql import Window

    from x8313_etl_spark.queries.graph_q import _cosupply_edges

    e = _cosupply_edges(spark, sf_dir, "g12.edges_r8test")
    adj = e.select(F.col("s1").alias("node"), F.col("s2").alias("nbr")).unionAll(
        e.select(F.col("s2").alias("node"), F.col("s1").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    a = adj.select(F.col("node").alias("na"), "nbr")
    b = adj.select(F.col("node").alias("nb"), "nbr")
    wedges = (
        a.join(b, "nbr")
        .filter(F.col("na") != F.col("nb"))
        .groupBy("na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    scored = (
        wedges.join(deg.select(F.col("node").alias("na"), F.col("deg").alias("da")), "na")
        .join(deg.select(F.col("node").alias("nb"), F.col("deg").alias("db")), "nb")
        .join(
            e.select(
                F.least("s1", "s2").alias("na"),
                F.greatest("s1", "s2").alias("nb"),
                F.lit(True).alias("is_edge"),
            ).unionAll(
                e.select(
                    F.greatest("s1", "s2").alias("na"),
                    F.least("s1", "s2").alias("nb"),
                    F.lit(True).alias("is_edge"),
                )
            ),
            ["na", "nb"],
            "left",
        )
    )
    uni = F.col("da") + F.col("db") - F.col("inter")
    w = Window.partitionBy("na").orderBy(
        (F.col("inter").cast("double") / uni).desc(), F.col("nb")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _G12_TOPK)
        .select(
            F.col("na").cast("bigint").alias("node"),
            F.col("nb").cast("bigint").alias("peer"),
            F.col("inter").cast("bigint").alias("inter"),
            uni.cast("bigint").alias("uni"),
            (F.col("inter").cast("double") / uni).alias("jaccard"),
            F.coalesce("is_edge", F.lit(False)).alias("is_edge"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def _g12_sql() -> str:
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
adj AS (SELECT s1 AS node, s2 AS nbr FROM e
        UNION ALL SELECT s2 AS node, s1 AS nbr FROM e),
deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY node),
w AS (
  SELECT a.node AS na, b.node AS nb, count(*) AS inter
  FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.node != b.node
  GROUP BY a.node, b.node
),
scored AS (
  SELECT w.na, w.nb, w.inter,
         da.deg + db.deg - w.inter AS uni,
         CAST(w.inter AS DOUBLE) / (da.deg + db.deg - w.inter) AS jaccard,
         e.s1 IS NOT NULL AS is_edge
  FROM w
  JOIN deg da ON da.node = w.na
  JOIN deg db ON db.node = w.nb
  LEFT JOIN e ON e.s1 = least(w.na, w.nb) AND e.s2 = greatest(w.na, w.nb)
)
SELECT CAST(na AS BIGINT) AS node, CAST(nb AS BIGINT) AS peer,
       CAST(inter AS BIGINT) AS inter, CAST(uni AS BIGINT) AS uni,
       jaccard, is_edge, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT scored.*,
         row_number() OVER (PARTITION BY na ORDER BY jaccard DESC, nb) AS rnk
  FROM scored
) WHERE rnk <= {_G12_TOPK}
"""


def test_g12_node_jaccard_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r8:g12_node_jaccard", fn=_g12_fn, oracle=_g12_sql(),
        category="graph",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_g12_scores_non_adjacent_pairs(spark, sf_dir, sf_oracle_dir):
    """The link-prediction consumer needs NON-edge wedge pairs to exist
    (and some edges too, so is_edge is exercised both ways) at every
    fixture sf."""
    for d in (sf_dir, sf_oracle_dir):
        rows = _g12_fn(spark, d).groupBy("is_edge").count().collect()
        got = {r["is_edge"]: r["count"] for r in rows}
        assert got.get(False, 0) > 0, d
        assert got.get(True, 0) > 0, d


# ---------------------------------------------------------------------------
# p_shingle_containment: asymmetric set containment (quote / subset
# detection — the near-dup family's missing asymmetric member;
# Broder's containment from the original resemblance paper, public).
# ---------------------------------------------------------------------------

_CONT_NUM, _CONT_DEN = 1, 2  # τ = 1/2 (integer cross-multiplication)


def _containment_fn(spark, sf_dir):
    """C(A→B) = |A∩B| / |A| over word-3-shingle SETS: doc_a is flagged
    when τ of its shingles appear in doc_b — catches a doc quoted or
    embedded inside a larger one, which symmetric Jaccard (l2/l11)
    misses when |B| >> |A|. Candidates from the inverted-index posting
    self-join (the l2c Σ df² shape; a df cap is the documented
    hot-shingle dial); verification is integer cross-multiplication —
    no fp threshold. Asymmetric: both (a,b) and (b,a) can appear.

    10× sweep (scripts/scale10x_r8cand.py, bench replica whose docs
    are NEAR-duplicated per copy): 6.4 s → 435 s is an OUTPUT-DENSITY
    artifact, not a law violation — qualifying pairs grew 979×
    (512 → 501,200: every 10-copy near-dup group mutually contains)
    while wall per output row IMPROVED 14× (12.5 ms → 0.87 ms); the
    same artifact, same magnitude class as sim_lsh_neardup's measured
    25×. Production dials when containment output is dense: the
    hot-shingle df cap, and the prefix-filter upgrade (setjoin's
    AllPairs machinery specialized to the asymmetric bound
    ⌊(1−τ)|A|⌋+1) — documented, not implemented."""
    return _containment_over(load_table(spark, sf_dir, "documents"))


def _containment_over(docs):
    from x8313_etl_spark.operators.minhash import shingle_table

    sh = shingle_table(docs, "doc_id", "text", 3).filter(F.size("sh") > 0)
    sizes = sh.select("doc_id", F.size("sh").alias("sz"))
    post = sh.select("doc_id", F.explode("sh").alias("shingle"))
    pairs = (
        post.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(post.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        pairs.join(sizes.select(F.col("doc_id").alias("doc_a"),
                                F.col("sz").alias("size_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("sz").alias("size_b")), "doc_b")
        .filter(F.col("inter") * _CONT_DEN >= F.col("size_a") * _CONT_NUM)
    )
    return out.select(
        "doc_a", "doc_b",
        F.col("inter").cast("bigint").alias("inter"),
        F.col("size_a").cast("bigint").alias("size_a"),
        F.col("size_b").cast("bigint").alias("size_b"),
        (F.col("inter").cast("double") / F.col("size_a")).alias("containment"),
    )


_CONTAINMENT_SQL = f"""
WITH s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 0)),
           i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS toks
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
),
f AS (SELECT doc_id, toks FROM s WHERE len(toks) > 0)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
       CAST(len(a.toks) AS BIGINT) AS size_a,
       CAST(len(b.toks) AS BIGINT) AS size_b,
       CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / len(a.toks)
         AS containment
FROM f a JOIN f b ON a.doc_id != b.doc_id
WHERE len(list_intersect(a.toks, b.toks)) * {_CONT_DEN}
      >= len(a.toks) * {_CONT_NUM}
"""


def test_p_shingle_containment_twin(spark, sf_oracle_dir):
    # The twin is DELIBERATELY brute-force all-pairs (the l11
    # precedent): the posting-join candidate generation must be
    # invisible in the answer.
    spec = QuerySpec(
        name="r8:p_shingle_containment", fn=_containment_fn,
        oracle=_CONTAINMENT_SQL, category="pipeline",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_containment_values_are_directional_on_fixture(spark, sf_dir, sf_oracle_dir):
    """The fixture's near-dup pairs are similar-length (measured: no
    pair crosses τ in only one direction at any τ ≥ 0.35), so the
    fixture guard pins what the data DOES exercise: non-empty output
    with directionally DIFFERENT containment values for some pair. The
    one-way subset semantics — the operator's reason to exist — is
    pinned by the crafted test below."""
    for d in (sf_dir, sf_oracle_dir):
        rows = _containment_fn(spark, d).collect()
        got = {(r["doc_a"], r["doc_b"]): r["containment"] for r in rows}
        assert got, d
        assert any(
            (b, a) in got and abs(got[(a, b)] - got[(b, a)]) > 0
            for a, b in got
        ), d


def test_containment_flags_subset_one_way(spark):
    """A doc that IS a contiguous slice of a larger doc must be flagged
    a→b (containment 1.0) while the larger doc stays below τ in the
    reverse direction — the quote/subset case symmetric Jaccard
    misses."""
    big_words = [f"w{i}" for i in range(40)]
    small_words = big_words[10:18]  # 8 words → 6 shingles, all in big
    docs = spark.createDataFrame(
        [(1, " ".join(big_words)), (2, " ".join(small_words))],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in _containment_over(docs).collect()
    }
    assert rows == {(2, 1): 1.0}


# ---------------------------------------------------------------------------
# p_embed_outliers: embedding-space outlier filter (distance-to-centroid
# quality gate — the kmeans composition SemDeDup's sibling curation step
# uses; cluster-based outlier scoring is standard public practice).
# ---------------------------------------------------------------------------

_EO_K, _EO_ROUNDS = 8, 3
_EO_PCT_NUM, _EO_PCT_DEN = 9, 10  # flag beyond the per-cluster p90


def _embed_outliers_fn(spark, sf_dir):
    """Integer d² of each vector to ITS final centroid (the
    sim_kmeans_lloyd loop — engine-exact), then a PER-CLUSTER exact
    rank threshold: the d² at ceil(0.9·n) in (d², vec_id) order; rows
    strictly above it are outliers. All integer (ceil as (9n+9) div 10
    — no float 0.9·n, whose representation error flips ceil at n=10).
    The curation consumer drops is_outlier rows before training —
    embeddings far from every cluster are mislabeled/noise candidates
    (the standard cluster-distance quality gate).

    Scale: one broadcast N×k assignment (k const), one map-only d²
    pass, one window keyed by cid (k partitions — bounded; for huge
    clusters the two-phase globalrank core swaps in, documented)."""
    from pyspark.sql import Window

    from x8313_etl_spark.operators.kmeans import lloyd_kmeans, quantize_vectors

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assign, cents = lloyd_kmeans(
        vecs, k=_EO_K, rounds=_EO_ROUNDS, ledger_key="embout.cand"
    )
    qv = quantize_vectors(vecs)
    d2 = (
        assign.join(qv, "vec_id")
        .join(cents, "cid")
        .select(
            "vec_id", "cid",
            F.aggregate(
                F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
    )
    w = Window.partitionBy("cid").orderBy("d2", "vec_id")
    ranked = d2.select(
        "vec_id", "cid", "d2",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("cid")).alias("n"),
    )
    thr = ranked.filter(
        F.col("rn")
        == F.expr(f"({_EO_PCT_NUM} * n + {_EO_PCT_DEN - 1}) div {_EO_PCT_DEN}")
    ).select("cid", F.col("d2").alias("thr"))
    return (
        ranked.join(thr, "cid")
        .select(
            "vec_id",
            F.col("cid").cast("bigint").alias("cid"),
            F.col("d2").cast("bigint").alias("d2"),
            (F.col("d2") > F.col("thr")).alias("is_outlier"),
        )
    )


def _embed_outliers_sql() -> str:
    from x8313_etl_spark.queries.similarity_q import _KMEANS_SQL, _KM_ROUNDS

    prefix = _KMEANS_SQL.split("mem AS (")[0].rstrip().rstrip(",")
    return f"""{prefix},
d AS MATERIALIZED (
  SELECT a.vec_id, a.cid, CAST(SUM((q.q - c.q) * (q.q - c.q)) AS BIGINT) AS d2
  FROM afin a JOIN q USING (vec_id)
  JOIN c{_KM_ROUNDS} c ON c.cid = a.cid AND c.idx = q.idx
  GROUP BY a.vec_id, a.cid),
r AS (
  SELECT vec_id, cid, d2,
         row_number() OVER (PARTITION BY cid ORDER BY d2, vec_id) AS rn,
         count(*) OVER (PARTITION BY cid) AS n
  FROM d),
thr AS (SELECT cid, d2 AS thr FROM r
        WHERE rn = ({_EO_PCT_NUM} * n + {_EO_PCT_DEN - 1}) // {_EO_PCT_DEN})
SELECT r.vec_id, CAST(r.cid AS BIGINT) AS cid, r.d2, r.d2 > t.thr AS is_outlier
FROM r JOIN thr t ON t.cid = r.cid
"""


def test_p_embed_outliers_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r8:p_embed_outliers", fn=_embed_outliers_fn,
        oracle=_embed_outliers_sql(), category="pipeline",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_embed_outliers_flags_a_minority(spark, sf_dir, sf_oracle_dir):
    """The p90 gate must flag SOME vectors but never a majority at any
    fixture sf (a degenerate threshold would pass the value compare
    while gating nothing / everything)."""
    for d in (sf_dir, sf_oracle_dir):
        rows = _embed_outliers_fn(spark, d).groupBy("is_outlier").count().collect()
        got = {r["is_outlier"]: r["count"] for r in rows}
        assert got.get(True, 0) > 0, d
        assert got.get(True, 0) * 2 < got.get(False, 0), d


# ---------------------------------------------------------------------------
# dq6_k_anonymity: re-identification (k-anonymity) audit — the privacy
# governance gate (Sweeney's k-anonymity, public) the dq family lacks:
# p_pii_redact scrubs direct identifiers, but quasi-identifier
# COMBINATIONS re-identify when their cohort is small.
# ---------------------------------------------------------------------------


def _dq6_fn(spark, sf_dir):
    """Cohort sizes per quasi-identifier combination (nation ×
    market segment on customer — the release-shaped columns), flagged
    against k. k is QUANTILE-DERIVED (floor of the 25th-percentile
    cohort size, violation = n ≤ k — the g3 non-constant-threshold
    rule, so the audit flags SOME but not ALL cohorts at every fixture
    sf including the one where the quartile equals the minimum;
    production passes the policy constant, classically n < 5). One
    single-row scalar broadcast (the h11 share-of-total idiom) — cells
    table is |nations|·|segments|-sized, never row-sized.

    Scale: ONE map-side-combined groupBy of the release table; the
    audit output is cohort-cardinality-sized. The production follow-up
    (generalization / suppression to repair violations) consumes
    exactly this table."""
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    k = cells.agg(
        F.floor(F.expr("percentile(n, 0.25)")).cast("bigint").alias("k")
    )
    return cells.crossJoin(F.broadcast(k)).select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n").cast("bigint").alias("n"),
        "k",
        (F.col("n") <= F.col("k")).alias("is_violation"),
    )


_DQ6_SQL = """
WITH cells AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS n
  FROM customer GROUP BY c_nationkey, c_mktsegment
),
t AS (SELECT CAST(FLOOR(quantile_cont(n, 0.25)) AS BIGINT) AS k FROM cells)
SELECT c_nationkey, c_mktsegment, CAST(n AS BIGINT) AS n, t.k,
       n <= t.k AS is_violation
FROM cells, t
"""


def test_dq6_k_anonymity_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r8:dq6_k_anonymity", fn=_dq6_fn, oracle=_DQ6_SQL,
        category="etl",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_dq6_flags_some_but_not_all(spark, sf_dir, sf_oracle_dir):
    """The quantile-derived k must leave BOTH violating and conforming
    cohorts at every fixture sf — a k above every cohort (or below all)
    would pass the value compare while auditing nothing."""
    for d in (sf_dir, sf_oracle_dir):
        rows = _dq6_fn(spark, d).groupBy("is_violation").count().collect()
        got = {r["is_violation"]: r["count"] for r in rows}
        assert got.get(True, 0) > 0, d
        assert got.get(False, 0) > 0, d
