"""Keyed persist pool — bounds cached-table leaks in multi-query sweeps.

Several queries persist an intermediate table that feeds multiple plan
branches of the SAME invocation (sim_ivf_topk's centroid assignment,
p_simhash_pairs' sketch table). The persist cannot be released inside
the query function — the returned DataFrame's plan still references it,
and the caller (driver / oracle harness) collects later. Left alone,
every invocation leaks one cached RDD for the session lifetime
(spill-backed, so a slow-growth disk cost, not a correctness risk —
ADVICE r03).

``swap_persist`` bounds that: one live cached table per KEY. Persisting
a new table under a key unpersists the previous holder (non-blocking —
in-flight jobs still reading old blocks just recompute them, standard
Spark unpersist semantics). A 159-query sweep now holds at most
len(keys) cached tables instead of one per invocation.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_POOL: dict[str, DataFrame] = {}


def swap_persist(
    key: str,
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` under ``key``, releasing the key's previous table."""
    prev = _POOL.get(key)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing to release
    _POOL[key] = df.persist(level)
    return _POOL[key]
