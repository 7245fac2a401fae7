"""Pre-registration oracle checks — round-12-authored candidate batch U
(SPLIT HYGIENE — the third spare-capacity batch, alongside batch S's
classifier evals and batch T's ranking metrics; same status:
substitution bench / post-r20 continuation, NOT in the r13–r20 budget
queue. Two strong candidates, the batch-M precedent).

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0) on an ad-hoc UNREGISTERED QuerySpec, so a
future round's registration is a verbatim fn+oracle copy. Twins verify
at BOTH fixture sfs.

Why this batch: the registered p_hash_split assigns splits by DOCUMENT
key, which is the textbook leakage trap — near-duplicate documents land
in different splits and the eval set rehearses the training set. The
standard fixes and checks:
- p_grouped_split: leakage-safe assignment by GROUP (source) key — all
  docs of a source share a split, so within-source near-dups (the
  re-crawled-site case, the dominant one in web corpora) can never
  straddle train/test. Same md5-bucket determinism as p_hash_split.
- ev_split_leakage: the audit that MEASURES leakage instead of
  assuming it: joins the registered verified near-dup pairs
  (l2_near_dup_pairs) against BOTH split assignments and reports, in
  one row, each scheme's straddling-pair count and ppm rate. Measured
  on the fixture at authoring (sf0.01): 25 verified near-dup pairs, 11
  straddle the doc-hash split (440,000 ppm — the trap is real), and
  24 of 25 pairs are CROSS-source, so the grouped split still leaks
  here — the honest finding that grouping only protects against
  WITHIN-group duplication; cross-group near-dups need dedup-before-
  split (p_dedup_clusters) or cluster-keyed assignment. The
  instrument's value is exactly that it tells you which regime your
  corpus is in.

Both queries are map-only or (pairs + two doc-sized joins); the one
expensive input (the near-dup pair table) is consumed ONCE — both
schemes' leak counts come from a single pass over pairs joined against
one combined per-doc split projection (no self-union over the
expensive subtree — p_item_cf's r10 lesson).

10× authoring sweep (FK-consistent bench replica, 2026-08-16):
p_grouped_split 4.5→0.2 s (map-only; the sf0.1 number is the cold-JVM
floor), ev_split_leakage 10.8→14.5 s (1.3× — l2_near_dup_pairs' own
banded-LSH law dominates; the leak stage adds two doc-sized joins).
And the sweep DEMONSTRATED the instrument's point: on the base
fixture the near-dups are cross-source, so the grouped split leaks
MORE than the doc-hash split (554,687 vs 332,031 ppm over 256 pairs
at sf0.1) — but on the 10× replica, whose near-dups are within-source
copies (the re-crawled-site regime real web corpora live in), the
grouped split leaks SIX TIMES LESS (56,502 vs 336,652 ppm over
250,359 pairs). One query, two corpora, opposite verdicts — which is
exactly what a leakage AUDIT is for: measure, don't assume.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

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
    return registry()[name].oracle


# ---------------------------------------------------------------------------
# p_grouped_split — leakage-safe split by source key
# ---------------------------------------------------------------------------

_GRP_TRAIN, _GRP_VAL = 80, 90  # md5 buckets: <80 train, <90 val, else test


def _grouped_split_fn(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment by hashing the
    GROUP key (source), not the document key: every doc of a source
    lands in the same split, so within-source near-duplicates (the
    re-crawled-site case) can never straddle train/test — the standard
    leakage-safe split for web corpora (grouped/stratified splitting,
    public ML practice). Proportions are honored in GROUPS, not docs
    (the guard pins all three splits non-empty at every fixture sf;
    a production corpus with many groups converges to 80/10/10 by the
    law of large numbers — with 20 fixture sources the doc shares are
    visibly lumpy, which is itself the honest property of grouped
    splits). Map-only; same md5-bucket determinism as p_hash_split."""
    from x8313_etl_spark.queries.corpus_q import _hash_bucket

    d = load_table(spark, sf_dir, "documents")
    bucket = _hash_bucket(F.col("source"), 100)
    split = (
        F.when(bucket < _GRP_TRAIN, "train")
        .when(bucket < _GRP_VAL, "val")
        .otherwise("test")
    )
    return d.select(
        "doc_id", "source", bucket.alias("bucket"), split.alias("split")
    )


def _grouped_split_sql() -> str:
    from x8313_etl_spark.queries.corpus_q import _sql_hash_bucket

    b = _sql_hash_bucket("source", 100)
    return f"""
SELECT doc_id, source, {b} AS bucket,
       CASE WHEN {b} < {_GRP_TRAIN} THEN 'train'
            WHEN {b} < {_GRP_VAL} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_p_grouped_split_twin(spark, d):
    spec = QuerySpec(
        name="rU:p_grouped_split", fn=_grouped_split_fn,
        oracle=_grouped_split_sql(), category="pipeline",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_grouped_split_is_leakage_safe_by_construction(spark, sf_dir, sf_oracle_dir):
    """Every source maps to exactly ONE split (the defining property),
    and all three splits hold at least one source at every fixture sf
    (12/3/5 measured — a split with zero groups would silently train
    on everything)."""
    for d in (sf_dir, sf_oracle_dir):
        out = _grouped_split_fn(spark, d)
        per_src = out.groupBy("source").agg(
            F.countDistinct("split").alias("nsp")
        )
        assert per_src.filter(F.col("nsp") > 1).count() == 0, d
        splits = {r["split"] for r in out.select("split").distinct().collect()}
        assert splits == {"train", "val", "test"}, (d, splits)


# ---------------------------------------------------------------------------
# ev_split_leakage — measured near-dup leakage under both split schemes
# ---------------------------------------------------------------------------


def _leakage_fn(spark, sf_dir):
    """Split-leakage audit: how many VERIFIED near-duplicate pairs
    (the registered l2_near_dup_pairs output — banded MinHash
    candidates, exact-Jaccard verified) straddle a split boundary,
    under (a) the registered doc-keyed hash split and (b) the grouped
    source-keyed split — in one row, so the two schemes are graded on
    the identical pair set. A straddling pair means the eval split
    rehearses training data; 0 ppm is the goal state after
    dedup-before-split. Scale: the pair table is consumed ONCE (both
    schemes' flags come from the same two joins against one combined
    per-doc split projection — no self-union over the expensive
    subtree); the per-doc projection is map-only over documents."""
    from x8313_etl_spark.queries.corpus_q import p_hash_split
    from x8313_etl_spark.queries.llm import l2_near_dup_pairs

    pairs = l2_near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    doc_split = p_hash_split(spark, sf_dir).select("doc_id", "split")
    grp_split = _grouped_split_fn(spark, sf_dir).select(
        "doc_id", F.col("split").alias("gsplit")
    )
    per_doc = doc_split.join(grp_split, "doc_id")
    a = per_doc.select(
        F.col("doc_id").alias("doc_a"),
        F.col("split").alias("sa"),
        F.col("gsplit").alias("ga"),
    )
    b = per_doc.select(
        F.col("doc_id").alias("doc_b"),
        F.col("split").alias("sb"),
        F.col("gsplit").alias("gb"),
    )
    j = pairs.join(a, "doc_a").join(b, "doc_b")
    agg = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum((F.col("sa") != F.col("sb")).cast("bigint"))
        .cast("bigint")
        .alias("dochash_leaky"),
        F.sum((F.col("ga") != F.col("gb")).cast("bigint"))
        .cast("bigint")
        .alias("grouped_leaky"),
    )
    return agg.select(
        "n_pairs",
        "dochash_leaky",
        F.expr("(dochash_leaky * 1000000) div n_pairs").alias(
            "dochash_leak_ppm"
        ),
        "grouped_leaky",
        F.expr("(grouped_leaky * 1000000) div n_pairs").alias(
            "grouped_leak_ppm"
        ),
    )


def _leakage_sql() -> str:
    from x8313_etl_spark.queries.corpus_q import _sql_hash_bucket

    bd = _sql_hash_bucket("doc_id", 100)
    bg = _sql_hash_bucket("source", 100)
    return f"""
WITH nd_pairs AS MATERIALIZED ({_oracle_of("l2_near_dup_pairs")}),
per_doc AS (
  SELECT doc_id,
         CASE WHEN {bd} < 80 THEN 'train'
              WHEN {bd} < 90 THEN 'val' ELSE 'test' END AS split,
         CASE WHEN {bg} < {_GRP_TRAIN} THEN 'train'
              WHEN {bg} < {_GRP_VAL} THEN 'val' ELSE 'test' END AS gsplit
  FROM documents
),
j AS (
  SELECT pa.split AS sa, pb.split AS sb, pa.gsplit AS ga, pb.gsplit AS gb
  FROM nd_pairs p
  JOIN per_doc pa ON pa.doc_id = p.doc_a
  JOIN per_doc pb ON pb.doc_id = p.doc_b
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN sa != sb THEN 1 ELSE 0 END) AS BIGINT)
           AS dochash_leaky,
         CAST(sum(CASE WHEN ga != gb THEN 1 ELSE 0 END) AS BIGINT)
           AS grouped_leaky
  FROM j
)
SELECT n_pairs, dochash_leaky,
       (dochash_leaky * 1000000) // n_pairs AS dochash_leak_ppm,
       grouped_leaky,
       (grouped_leaky * 1000000) // n_pairs AS grouped_leak_ppm
FROM agg
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ev_split_leakage_twin(spark, d):
    spec = QuerySpec(
        name="rU:ev_split_leakage", fn=_leakage_fn, oracle=_leakage_sql(),
        category="pipeline",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_ev_split_leakage_detects_the_trap(spark, sf_oracle_dir):
    """The audit must FIND leakage under the doc-keyed split (the trap
    is real on this corpus: 11 of 25 near-dup pairs straddle at
    sf0.01) and must show the grouped split leaks too on THIS corpus
    (its near-dups are cross-source by construction of the fixture) —
    the instrument distinguishes the regimes rather than flattering
    either scheme."""
    row = _leakage_fn(spark, sf_oracle_dir).collect()[0]
    assert row.n_pairs > 0
    assert row.dochash_leaky > 0, row
    assert row.dochash_leak_ppm < 1000000, row
    assert row.grouped_leaky > 0, row
