"""Plan-audit core: the red-flag scan definition + the materialization
ledger that closes the persist/checkpoint blind spot.

The repo-wide shuffle audit (tests/test_shuffle_audit.py +
scripts/gen_audit.py) scans the executedPlan STRING of every registered
query for the 100 TB red-flag node types. That scan sees through plain
``persist()`` — an InMemoryTableScan prints its cached subtree — but
NOT through ``localCheckpoint``: lineage is truncated to a
``Scan ExistingRDD``, so any plan materialized inside an iterative
operator (operators/concomp.py) vanishes from the returned DataFrame's
plan, together with everything upstream of it (verified live in the
round-4 judge pass: p_semantic_dedup's O(n²) BroadcastNestedLoopJoin
pair scan was invisible to the gate).

Fix: every house materialization point — ``swap_persist``
(operators/cachepool.py) and concomp's per-round checkpoints — records
``count_hits`` of the plan it is about to materialize into this
module-level LEDGER, keyed by its pool/operator key. The audit gate
asserts over the ledger with the same ceiling+staleness discipline as
the query-plan scan, so a hidden nested loop under a checkpoint now
fails pytest (tests/test_shuffle_audit.py has the crafted proof).

FLAGS / ``count_hits`` are the single scan definition — the pytest gate
and scripts/gen_audit.py import them from here, so the artifact and the
gate can never audit different node sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: plan-node substrings that are scale hazards unless justified
FLAGS = ("CartesianProduct", "BroadcastNestedLoopJoin", "Exchange SinglePartition")


def count_hits(plan: str) -> dict[str, int]:
    return {f: plan.count(f) for f in FLAGS if plan.count(f)}


#: materialization key -> flag counts of the plan materialized under it.
#: Keys with NO flags are recorded too (empty dict) so the staleness
#: check can tell "scanned, clean" from "never scanned".
_LEDGER: dict[str, dict[str, int]] = {}


def record_plan(key: str, df: DataFrame) -> None:
    """Scan ``df``'s physical plan and file the flag counts under
    ``key``. Called at every house materialization point BEFORE the
    persist/checkpoint truncates or hides the plan. Introspection
    failures are swallowed — auditing must never break the operator —
    but leave a sentinel so the gate surfaces the miss instead of
    silently passing.

    First write per key per session wins: when a query is re-invoked
    after its pooled tables are already cached, the REBUILT plan string
    re-expands cached subtrees once per InMemoryTableScan reference, so
    the same conceptual plan counts differently on later builds (found
    by the full-suite run: p_semantic_dedup's pair scan counted 1 on
    first build, 2 after caching). The first, cache-free build is the
    canonical auditable plan; concomp's per-round re-records share one
    shape anyway."""
    if key in _LEDGER:
        return
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        _LEDGER[key] = {"__plan_introspection_failed__": 1}
        return
    _LEDGER[key] = count_hits(plan)


def audited_checkpoint(key: str, df: DataFrame) -> DataFrame:
    """Record ``df``'s plan under ``key``, then eagerly
    ``localCheckpoint`` it. For bounded intermediates consumed by many
    downstream plan branches (g3's quantile-thresholded edge table): a
    plain persist leaves the upstream subtree re-printed once per
    InMemoryTableScan reference, inflating the plan-scan counts with
    copies of one node, while a checkpoint truncates to a clean Scan
    ExistingRDD — legitimate ONLY because the ledger keeps the
    truncated plan auditable. On a real cluster prefer a
    checkpoint-dir checkpoint for fault tolerance (same trade as
    operators/concomp.py)."""
    record_plan(key, df)
    return df.localCheckpoint(eager=True)


def ledger() -> dict[str, dict[str, int]]:
    """Snapshot of every recorded materialization this session."""
    return {k: dict(v) for k, v in _LEDGER.items()}


def forget(key: str) -> None:
    """Drop a ledger entry (test cleanup only)."""
    _LEDGER.pop(key, None)
