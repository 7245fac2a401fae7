"""Repo-wide shuffle audit as a regression gate.

Every batch query's physical plan is scanned for the three 100 TB
red-flag node types; each occurrence must be in the explicit allowlist
below WITH a justification, and allowlisted counts must not grow. A new
CartesianProduct / BroadcastNestedLoopJoin / Exchange SinglePartition
anywhere else fails this test — the o1 fix (an unpartitioned rank
window over every customer row, found by exactly this sweep) is why it
exists. scripts/gen_audit.py --write renders ALLOWED into AUDIT.md.

Streaming/timeseries queries are excluded here (their fns execute real
microbatch jobs); the full sweep including them is scripts/gen_audit.py,
whose only additional finding (ts_sliding_dau) is recorded in ALLOWED
for the artifact even though this test does not reach it.
"""

from __future__ import annotations

from x8313_etl_spark.registry import registry

FLAGS = ("CartesianProduct", "BroadcastNestedLoopJoin", "Exchange SinglePartition")

#: query -> (flag counts, justification). Counts are ceilings: fewer is
#: fine (a planner improvement), more fails.
ALLOWED: dict[str, tuple[dict[str, int], str]] = {
    "a2_global_agg": (
        {"Exchange SinglePartition": 1},
        "the operator IS a global aggregate — partial-agg'd, one row per partition crosses",
    ),
    "a13_hll_sketch_union": (
        {"Exchange SinglePartition": 1},
        "global HLL merge: fixed-size sketch partials cross, never rows",
    ),
    "a16_funnel_conversion": (
        {"Exchange SinglePartition": 3},
        "three global funnel-step counts — single-row aggregates",
    ),
    "a19_approx_top_k": (
        {"Exchange SinglePartition": 1},
        "heavy-hitter sketch merge: one sketch per task crosses, not rows",
    ),
    "dq_profile": (
        {"BroadcastNestedLoopJoin": 1, "Exchange SinglePartition": 2},
        "global metric rows (single-row aggs) + the broadcast RI anti-join check",
    ),
    "g1_pagerank": (
        {"BroadcastNestedLoopJoin": 6, "Exchange SinglePartition": 6},
        "per-iteration single-ROW node-count scalar crossed into the rank update (5 iterations + init) — documented 'no collect' alternative",
    ),
    "h6_forecast_revenue": (
        {"Exchange SinglePartition": 1},
        "the query returns ONE row (global revenue sum)",
    ),
    "h11_important_stock": (
        {"BroadcastNestedLoopJoin": 1, "Exchange SinglePartition": 1},
        "share-of-total threshold: single-row scalar agg broadcast against the grouped table",
    ),
    "h14_promo_effect": (
        {"Exchange SinglePartition": 1},
        "single-row conditional revenue share",
    ),
    "h15_top_supplier": (
        {"Exchange SinglePartition": 1},
        "scalar MAX subquery over the (supplier-sized) revenue aggregate",
    ),
    "h17_small_quantity_revenue": (
        {"Exchange SinglePartition": 1},
        "single-row result (avg-quantity-guarded revenue sum)",
    ),
    "h19_discounted_revenue": (
        {"Exchange SinglePartition": 1},
        "single-row result (OR-of-conjunctions revenue sum)",
    ),
    "h22_sales_opportunity": (
        {"BroadcastNestedLoopJoin": 1, "Exchange SinglePartition": 1},
        "scalar avg-acctbal subquery broadcast into the anti-join filter",
    ),
    "j6_cross_join": (
        {"BroadcastNestedLoopJoin": 1},
        "J6 IS the deliberate cartesian operator (5x5 dims)",
    ),
    "l3_cosine_pairs": (
        {"BroadcastNestedLoopJoin": 1},
        "bounded probe set broadcast with non-equi self-exclusion — map-only over the corpus",
    ),
    "l6_tfidf": (
        {"BroadcastNestedLoopJoin": 1, "Exchange SinglePartition": 1},
        "n_docs single-row scalar crossed into the idf expression",
    ),
    "o1_multikey_sort": (
        {"Exchange SinglePartition": 1},
        "two-phase global rank: the one single-partition window runs over the bounded per-PARTITION count table (operators/globalrank.py); fact rows are range-partitioned",
    ),
    "p_bm25_topk": (
        {"BroadcastNestedLoopJoin": 1, "Exchange SinglePartition": 1},
        "avg-doclen single-row scalar broadcast into the score expression",
    ),
    "p_vocab_encode": (
        {"Exchange SinglePartition": 1},
        "vocab rank assignment over the AGGREGATED term table — vocab-sized, not corpus-sized",
    ),
    "s12_zorder_layout": (
        {"BroadcastNestedLoopJoin": 1, "Exchange SinglePartition": 1},
        "global min/max bounds (single row) crossed in to normalize the Morton interleave",
    ),
    "sim_ivf_topk": (
        {"BroadcastNestedLoopJoin": 2},
        "broadcast centroid seeds + broadcast probe side (K=16 keys would collapse a shuffle join's parallelism — PERF.md)",
    ),
    "sim_neardup_exact": (
        {"BroadcastNestedLoopJoin": 1},
        "the deliberate O(n^2) correctness baseline for the bucketed variants",
    ),
    "ts_sliding_dau": (
        {"Exchange SinglePartition": 1},
        "day-grain sketch-merge window — table is days-sized (full-sweep-only entry; timeseries excluded from the pytest scan)",
    ),
}

#: categories whose fns execute streaming jobs — audited by
#: scripts/gen_audit.py instead (see module docstring)
_SKIP_CATEGORIES = ("streaming", "timeseries")


def test_no_unjustified_scale_red_flags(spark, sf_dir):
    failures = []
    for name, spec in registry().items():
        if spec.category in _SKIP_CATEGORIES:
            continue
        plan = (
            spec.fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        hits = {f: plan.count(f) for f in FLAGS if plan.count(f)}
        allowed = ALLOWED.get(name, ({}, ""))[0]
        for flag, n in hits.items():
            if n > allowed.get(flag, 0):
                failures.append((name, flag, n, allowed.get(flag, 0)))
    assert not failures, (
        "unjustified scale red flags (add to ALLOWED only with a real "
        f"justification): {failures}"
    )


def test_allowlist_has_no_stale_entries(spark, sf_dir):
    """Every allowlisted batch query must still exhibit its flags —
    a zero-hit entry means the plan improved and the ceiling should be
    deleted, not left masking a future regression."""
    stale = []
    for name, (flags, _why) in ALLOWED.items():
        spec = registry()[name]
        if spec.category in _SKIP_CATEGORIES:
            continue
        plan = (
            spec.fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if all(plan.count(f) == 0 for f in flags):
            stale.append(name)
    assert not stale, stale
