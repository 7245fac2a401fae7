"""Deduplication operators (SURVEY.md §2 P8/P9/L1; near-dup lives in minhash.py).

Determinism policy: Spark's bare ``dropDuplicates(subset)`` keeps an
*arbitrary* row per key (whichever the scan produced first), which can
never hash-match an oracle. Every dedup here is therefore order-pinned:
the caller names a total order and we keep the first row under it —
implemented as a rank-1 window filter, which Spark ≥3.5 executes with
WindowGroupLimit pushdown (partial per-partition top-1 before the
shuffle, so the shuffle carries at most one row per key per input
partition — the same partial-agg shape a groupBy gets).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

_RN = "__x8313_rn"


def keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """First row per ``keys`` under the total order ``order_by``.

    ``order_by`` must be total within each key group (include a unique
    tiebreaker) or results are still nondeterministic.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def exact_dedup_normalized(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """L1 exact dedup: one row per normalized-text hash, keeping min id.

    Normalization: lower + trim + whitespace collapse; key is sha2-256 of
    that. Scales as a single hash-shuffle on the digest (no text
    comparison joins); digest collisions are cryptographically
    negligible.
    """
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    hashed = df.withColumn("text_sha", F.sha2(norm, 256))
    return keep_first(hashed, ["text_sha"], [F.col(id_col)])
