"""Pre-registration oracle checks — round-12-authored candidate batch V
(the fourth spare-capacity batch; completes batch U's split-hygiene
arc. Two strong candidates, the batch-M precedent; substitution bench
/ post-r20 continuation, NOT in the r13–r20 budget queue).

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0) on an ad-hoc UNREGISTERED QuerySpec, so a
future round's registration is a verbatim fn+oracle copy. Twins verify
at BOTH fixture sfs.

Why this batch: batch U's ev_split_leakage MEASURED that both the
doc-keyed and the group-keyed splits leak near-duplicate pairs across
train/test (each wins in a different corpus regime). The definitive
fix it points at is CLUSTER-KEYED assignment — split by the dedup
cluster id, so every near-dup pair (being by definition within one
cluster) shares a split and leakage against that pair relation is ZERO
BY CONSTRUCTION, not by luck of the hash:
- p_cluster_split: 80/10/10 by md5 of the registered p_dedup_clusters
  cluster id (SimHash hamming≤3 components; singletons are their own
  cluster, so the balance converges to the doc-keyed split's as
  duplication → 0). The guard PROVES the construction: joining the
  registered p_simhash_pairs against the assignment finds exactly 0
  straddling pairs at every fixture sf.
- ev_dedup_stats: the dedup datasheet row — docs, clusters, docs in
  multi-doc clusters, duplication ppm, largest cluster — the numbers a
  curation run prints before deciding keep-one-per-cluster is worth a
  pass (and the denominator context for reading ev_split_leakage's
  ppm values).

10× authoring sweep (FK-consistent bench replica, 2026-08-16):
p_cluster_split 20.7→37.6 s (1.8×) and ev_dedup_stats 10.7→35.1 s
(3.3×) — both ride p_dedup_clusters' banded SimHash candidate law
plus concomp's fixed-round joins; the split/stat stages add one map
pass and one bounded aggregate. The zero-leakage theorem holds at
every measured scale: 0 of 311,610 hamming≤3 pairs straddle at sf0.1
and 0 of 12,032,727 at the 10× replica.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from x8313_etl_spark import audit
from x8313_etl_spark.registry import QuerySpec, registry

from .oracle_utils import compare_query


@pytest.fixture(autouse=True, scope="module")
def _scrub_ledger_keys():
    before = set(audit.ledger())
    yield
    for key in set(audit.ledger()) - before:
        audit.forget(key)


def _oracle_of(name: str) -> str:
    return registry()[name].oracle


# ---------------------------------------------------------------------------
# p_cluster_split — zero-leakage split by dedup cluster id
# ---------------------------------------------------------------------------

_CL_TRAIN, _CL_VAL = 80, 90


def _cluster_split_fn(spark, sf_dir):
    """Deterministic 80/10/10 split keyed on the DEDUP CLUSTER id (the
    registered p_dedup_clusters connected components over SimHash
    hamming≤3 pairs): every near-dup pair lives inside one cluster, so
    no pair of that relation can straddle a split boundary — leakage
    is zero BY CONSTRUCTION (proven against the registered
    p_simhash_pairs in the guard), which neither the doc-keyed nor the
    group-keyed split guarantees (batch U's measured finding: each of
    those leaks in a different corpus regime). Singleton docs are
    their own cluster, so balance converges to the doc-keyed split's
    as duplication → 0. Scale: one md5 projection on top of the
    cluster assignment (concomp's O(diameter) rounds — quasi-clique
    near-dup components settle in 2-3)."""
    from x8313_etl_spark.queries.corpus_q import _hash_bucket
    from x8313_etl_spark.queries.pipeline_q import p_dedup_clusters

    c = p_dedup_clusters(spark, sf_dir)
    bucket = _hash_bucket(F.col("cluster_id"), 100)
    split = (
        F.when(bucket < _CL_TRAIN, "train")
        .when(bucket < _CL_VAL, "val")
        .otherwise("test")
    )
    return c.select(
        "doc_id", "cluster_id", bucket.alias("bucket"), split.alias("split")
    )


def _cluster_split_sql() -> str:
    from x8313_etl_spark.queries.corpus_q import _sql_hash_bucket

    b = _sql_hash_bucket("cluster_id", 100)
    return f"""
WITH clusters AS MATERIALIZED ({_oracle_of("p_dedup_clusters")})
SELECT doc_id, cluster_id, {b} AS bucket,
       CASE WHEN {b} < {_CL_TRAIN} THEN 'train'
            WHEN {b} < {_CL_VAL} THEN 'val'
            ELSE 'test' END AS split
FROM clusters
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_p_cluster_split_twin(spark, d):
    spec = QuerySpec(
        name="rV:p_cluster_split", fn=_cluster_split_fn,
        oracle=_cluster_split_sql(), category="pipeline",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_cluster_split_has_zero_leakage_by_construction(spark, sf_dir, sf_oracle_dir):
    """The defining theorem, verified against the registered pair
    relation at every fixture sf: ZERO p_simhash_pairs straddle the
    cluster-keyed split (batch U measured 33-55% straddle rates for
    the doc- and group-keyed splits on the same corpus) — and all
    three splits still hold docs."""
    from x8313_etl_spark.queries.pipeline_q import p_simhash_pairs

    for d in (sf_dir, sf_oracle_dir):
        sp = _cluster_split_fn(spark, d).select("doc_id", "split")
        pairs = p_simhash_pairs(spark, d).select("doc_a", "doc_b")
        j = (
            pairs.join(
                sp.withColumnRenamed("doc_id", "doc_a")
                .withColumnRenamed("split", "sa"),
                "doc_a",
            ).join(
                sp.withColumnRenamed("doc_id", "doc_b")
                .withColumnRenamed("split", "sb"),
                "doc_b",
            )
        )
        n_pairs = j.count()
        assert n_pairs > 0, d  # the relation must be non-trivial to prove anything
        assert j.filter(F.col("sa") != F.col("sb")).count() == 0, d
        splits = {r["split"] for r in sp.select("split").distinct().collect()}
        assert splits == {"train", "val", "test"}, (d, splits)


# ---------------------------------------------------------------------------
# ev_dedup_stats — the dedup datasheet row
# ---------------------------------------------------------------------------


def _dedup_stats_fn(spark, sf_dir):
    """Corpus duplication datasheet (one row): total docs, dedup
    clusters, docs inside multi-doc clusters, duplication ppm (docs
    that keep-one-per-cluster would DROP, per million), and the
    largest cluster — the numbers a curation run prints before
    deciding a dedup pass is worth it, and the denominators for
    reading ev_split_leakage's rates. All exact integers off one
    cluster-keyed aggregate of the registered p_dedup_clusters."""
    from x8313_etl_spark.queries.pipeline_q import p_dedup_clusters

    c = p_dedup_clusters(spark, sf_dir)
    per = c.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    agg = per.agg(
        F.sum("sz").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum(F.when(F.col("sz") > 1, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("docs_in_dup_clusters"),
        F.max("sz").cast("bigint").alias("max_cluster"),
    )
    return agg.select(
        "n_docs",
        "n_clusters",
        "docs_in_dup_clusters",
        "max_cluster",
        F.expr("((n_docs - n_clusters) * 1000000) div n_docs").alias(
            "dup_drop_ppm"
        ),
    )


def _dedup_stats_sql() -> str:
    return f"""
WITH clusters AS MATERIALIZED ({_oracle_of("p_dedup_clusters")}),
per AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
  FROM clusters GROUP BY 1
),
agg AS (
  SELECT CAST(sum(sz) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_clusters,
         CAST(sum(CASE WHEN sz > 1 THEN sz ELSE 0 END) AS BIGINT)
           AS docs_in_dup_clusters,
         CAST(max(sz) AS BIGINT) AS max_cluster
  FROM per
)
SELECT n_docs, n_clusters, docs_in_dup_clusters, max_cluster,
       ((n_docs - n_clusters) * 1000000) // n_docs AS dup_drop_ppm
FROM agg
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ev_dedup_stats_twin(spark, d):
    spec = QuerySpec(
        name="rV:ev_dedup_stats", fn=_dedup_stats_fn,
        oracle=_dedup_stats_sql(), category="pipeline",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_ev_dedup_stats_sees_real_duplication(spark, sf_oracle_dir):
    """The fixture plants near-dups, so the datasheet must show them —
    including the measured GIANT COMPONENT (hamming≤3 transitive
    closure collapses 500 docs → 100 clusters with a 391-doc giant at
    sf0.01; drop rate 800,000 ppm): the guard pins that the instrument
    reports the over-merge rather than smoothing it away, while the
    closure stays short of one-single-cluster degeneracy."""
    row = _dedup_stats_fn(spark, sf_oracle_dir).collect()[0]
    assert row.docs_in_dup_clusters > 0, row
    assert row.max_cluster > 1, row
    assert row.max_cluster * 2 > row.n_docs, row  # the giant component IS the finding
    assert 0 < row.dup_drop_ppm < 1000000, row
    assert 1 < row.n_clusters < row.n_docs, row
