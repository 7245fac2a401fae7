"""Guarded LSH band-bucket self-join (shared by L2 MinHash, SimHash and
hyperplane-LSH near-dup — SURVEY.md §2.10/§2.12).

Every banded-LSH pipeline here ends the same way: an exploded
``(id, band, key)`` table self-joined on the bucket columns to produce
candidate pairs. A bucket holding B rows emits B² candidates, so one
degenerate bucket (boilerplate text hashing to a common band; a
zero-vector band) turns the O(candidates) design back into O(n²).

``guarded_band_self_join`` adds the ``max_bucket_size`` guard promised
in operators/minhash.py's scale notes: bucket sizes are counted with a
map-side-combining aggregation (skew-safe — partial counts merge before
the hot key concentrates anywhere), buckets above the cap are excluded
from pairing, and callers can surface exactly what was skipped.

Dropping a mega-bucket trades recall for a hard upper bound on shuffle
fan-out — the standard LSH-at-scale posture (a bucket shared by 10⁶
documents carries ~no signal; its 10¹² candidate pairs would stall any
cluster). The drop is opt-out (``max_bucket_size=None``) and observable
(``log_dropped`` / ``hot_buckets``), never silent-by-design.

The exclusion is a broadcast ANTI-join against the HOT bucket set only
— never a join against the full size table (which has ~one row per
distinct bucket and must not be assumed broadcastable). The hot set is
provably tiny by pigeonhole: every hot bucket holds > max_bucket_size
rows, so there are at most N / max_bucket_size of them no matter how
adversarial the corpus — the broadcast is safe at any scale, and the
banded table itself never takes an extra shuffle for the guard.
"""

from __future__ import annotations

import logging
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)

#: Default bucket cap. Big enough that honest near-dup clusters (even a
#: thousand-document template family) pair exhaustively; small enough
#: that one bucket can contribute at most ~25M candidate pairs.
DEFAULT_MAX_BUCKET_SIZE = 5_000

_SIZE_COL = "__x8313_bucket_size"


def hot_buckets(
    banded: DataFrame, bucket_cols: Sequence[str], max_bucket_size: int
) -> DataFrame:
    """Buckets exceeding the cap: (*bucket_cols, bucket_size). Lazy —
    callers decide whether inspecting it is worth a job."""
    return (
        banded.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
    )


def guarded_band_self_join(
    banded: DataFrame,
    id_col: str,
    bucket_cols: Sequence[str],
    *,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    carry: Sequence[str] = (),
    out_suffixes: tuple[str, str] = ("_a", "_b"),
    log_dropped: bool = False,
    log_label: str = "band-join",
) -> DataFrame:
    """Candidate pairs from a banded table, hot buckets excluded.

    ``banded``: one row per (row, band) with the bucket key in
    ``bucket_cols``. Returns distinct pairs ``(id<a>, id<b>, carry...)``
    with ``id<a> < id<b>``; each ``carry`` column rides along from its
    own side (it must be functionally dependent on ``id_col``).

    ``log_dropped=True`` eagerly counts the excluded buckets (one small
    job over the size aggregate — callers that persist the banded stage
    pay ~nothing) and WARNs with the worst offenders; default is lazy so
    registered queries stay pure plan builders.
    """
    if max_bucket_size is not None:
        hot = (
            banded.groupBy(*bucket_cols)
            .agg(F.count(F.lit(1)).alias(_SIZE_COL))
            .filter(F.col(_SIZE_COL) > max_bucket_size)
        )
        if log_dropped:
            top = hot.orderBy(F.col(_SIZE_COL).desc()).limit(5).collect()
            if top:
                logger.warning(
                    "%s: dropping buckets over max_bucket_size=%d "
                    "(worst: %s) — near-dup recall is reduced for rows "
                    "confined to these buckets",
                    log_label,
                    max_bucket_size,
                    [(tuple(r[c] for c in bucket_cols), r[_SIZE_COL]) for r in top],
                )
        # ≤ N/max_bucket_size rows by pigeonhole → always broadcastable
        banded = banded.join(
            F.broadcast(hot.select(*bucket_cols)), list(bucket_cols), "left_anti"
        )

    sa, sb = out_suffixes
    a, b = banded.alias("a"), banded.alias("b")
    pair_cols = [
        F.col(f"a.{id_col}").alias(f"{id_col[:-3] if id_col.endswith('_id') else id_col}{sa}"),
        F.col(f"b.{id_col}").alias(f"{id_col[:-3] if id_col.endswith('_id') else id_col}{sb}"),
        *[F.col(f"a.{c}").alias(f"{c}{sa}") for c in carry],
        *[F.col(f"b.{c}").alias(f"{c}{sb}") for c in carry],
    ]
    return (
        a.join(
            b,
            on=[
                *[F.col(f"a.{c}") == F.col(f"b.{c}") for c in bucket_cols],
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(*pair_cols)
        .distinct()
    )
