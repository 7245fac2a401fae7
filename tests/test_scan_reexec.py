"""Standing gate: no registered query may TRULY re-execute a table scan
3+ times per invocation unless adjudicated.

Round 10 measured (scripts/scan_triage.py) that Spark re-executes any
DataFrame referenced by several plan branches unless something
materializes it — ReusedExchange never fires across these shapes — and
fixed every offender worth fixing (pool/checkpoint the many-consumer
bounded intermediate, or explode instead of self-union). This test
turns that triage into a regression gate: it strips cached
(InMemoryRelation) subtrees from every registered query's executed
plan, counts the LIVE FileScans per source table, and fails on any
query scanning one table 3+ times that is not in the adjudicated
allowlist below.

The 2x tier is NOT gated: two live scans are usually the semantics
(self-joins, set operations, both sides of an interval/asof join,
fetch-text-after-ranking late materialization) and gating them would
churn correct plans. 3+ is where the r10 sweep found only either real
bugs or explicitly-argued designs.
"""

from __future__ import annotations

import os
import re
from collections import Counter

import pytest

from scripts.scan_triage import strip_cached
from x8313_etl_spark.operators.cachepool import clear_pool
from x8313_etl_spark.registry import registry

#: query -> why 3+ live scans of one table is the RIGHT plan at scale.
#: Every entry was adjudicated in the r10 triage (ROADMAP.md scan-sweep
#: section); new entries need the same written argument, not a bump.
ALLOWED_REEXEC = {
    # pruned seed/codebook scans (vec_id<16 / [16,32)) around the two
    # genuine corpus passes (encode + probe); caching 16-row reads
    # would cost more than the scans
    "sim_ivfpq_topk": "embeddings",
    # stage-2 exact rerank legitimately re-reads vectors (probes pruned
    # to the capped <2000 set; two of the scans read vec_id only)
    "sim_rerank_two_stage": "embeddings",
    # queries slice (doc_id<10) + one corpus tokenize + late text fetch
    # by doc_id after ranking — carrying text through the shuffles is
    # worse than a second pruned scan
    "p_rag_context_pack": "documents",
    # fixture-artifact: the CDC delta/change set derives from the base
    # table by row-local predicates; in production it is an external
    # delta-sized table and these collapse to one base scan each
    "m1_merge_upsert": "customer",
    "m3_incremental_refresh": "customer",
    "m11_incremental_view_maintenance": "lineitem",
    "dq3_constraint_audit": "orders",
    # deliberately row-level / brute-force baseline instruments
    "l10_knn_classify": "embeddings",
    # interned-name ER: the re-executed branches are narrow
    # (partkey, name) scans + a substr map; the distinct/groupBy
    # aggregations execute once — caching a full column of the fact
    # table to save a pruned re-scan is the wrong trade
    "p_er_blocked_match": "part",
    "p_er_golden_record": "part",
    # bench-slice tokenize + one corpus tokenize + doc_id-only join
    # back for zero-gram docs (reads no text)
    "p_decontaminate": "documents",
    "p_contamination_overlap_score": "documents",
    # the doubled corpus is the query's SEMANTICS (union with offset
    # copy exercises dedup); third scan is the doc_id-only reinstate
    "p_corpus_clean": "documents",
    # genuine two-pass algorithm: vocabulary train pass + encode pass,
    # plus a doc_id-only companion scan
    "p_unigram_encode": "documents",
    # two union+window asof passes over events per side — the no-join
    # asof construction; scans are narrow and the sweep measured it
    # sub-linear at 10x
    "j18_asof_nearest": "events",
}


def _cold(spark):
    """Cold-cache measurement context: empty the keyed pool AND the
    session CacheManager. The gate measures each query's own FIRST
    build (the audit semantics); after a long test session the
    CacheManager holds hundreds of ambient entries whose plan
    substitution interacts with the fns' internal persist() calls
    order-dependently (observed: l2_near_dup_pairs printed 16 bare
    scans mid-suite but is clean cold — its raw persists no-op'd
    against ambient equal-plan entries that were no longer
    substituted). A cold manager makes the count deterministic."""
    clear_pool(forget_ledger=False)
    spark.catalog.clearCache()


@pytest.mark.usefixtures("spark")
def test_no_unadjudicated_true_reexecution(spark, sf_dir):
    tag = os.path.basename(sf_dir.rstrip("/"))
    offenders = {}
    for name, spec in registry().items():
        if spec.category in ("streaming", "timeseries"):
            continue  # their fns execute real microbatch jobs
        _cold(spark)
        plan = (
            spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        live = strip_cached(plan)
        tabs = Counter(re.findall(rf"{re.escape(tag)}/(\w+)\.parquet", live))
        bad = {
            t: k
            for t, k in tabs.items()
            if k >= 3 and ALLOWED_REEXEC.get(name) != t
        }
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "TRUE re-execution (3+ live scans of one table, not in "
        f"ALLOWED_REEXEC): {offenders} — pool/checkpoint the "
        "many-consumer intermediate or explode instead of self-union "
        "(ROADMAP.md scan-sweep section), or adjudicate with a written "
        "argument."
    )


def test_allowlist_entries_still_reexecute(spark, sf_dir):
    """Keep ALLOWED_REEXEC honest: drop entries whose queries no longer
    re-scan 3+ times (a stale allowlist would mask a future regression
    on a since-fixed query)."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    stale = []
    for name, table in ALLOWED_REEXEC.items():
        spec = registry()[name]
        _cold(spark)
        plan = (
            spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        live = strip_cached(plan)
        n = len(re.findall(rf"{re.escape(tag)}/{table}\.parquet", live))
        if n < 3:
            stale.append((name, table, n))
    assert not stale, f"stale ALLOWED_REEXEC entries (live count < 3): {stale}"
