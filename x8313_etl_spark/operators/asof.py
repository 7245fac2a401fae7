"""As-of join (SURVEY.md §2.3 J9) — latest right row at-or-before each left row.

Implementation: the union+window formulation, not ``pd.merge_asof`` —
it is a single shuffle on the `by` keys followed by one ordered window
pass, it stays entirely in JVM whole-stage codegen, and it scales to
any per-key history length without collecting state (contrast a
Pandas-UDF merge_asof, which materializes each key group in Python
memory and pays Arrow transfer).

Mechanics: tag right rows 0 and left rows 1, union by name, then per
`by`-key run ``last(value, ignorenulls=True)`` over
(ts, tag) rows-unbounded-preceding — right rows sort before left rows
at equal ts, giving inclusive (<=) as-of semantics. Filter back to left
rows.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_TAG = "__x8313_is_left"
_TS = "__x8313_asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_on: str,
    right_on: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Left as-of join: for each left row, latest right row with
    ``right_on <= left_on`` within the same ``by`` group.

    ``value_cols`` are the right-side columns to carry; they must not
    collide with left column names (rename beforehand). Right rows with
    duplicate (by, right_on) must be pre-deduplicated by the caller if
    deterministic results are required.
    """
    value_cols = list(value_cols)
    lcols = left.columns
    l_tagged = left.withColumn(_TS, F.col(left_on)).withColumn(_TAG, F.lit(1))
    r_tagged = (
        right.select(*by, F.col(right_on).alias(_TS), *value_cols)
        .withColumn(_TAG, F.lit(0))
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(*[F.col(b) for b in by])
        .orderBy(F.col(_TS), F.col(_TAG))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = [
        F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in value_cols
    ]
    return (
        u.select(*lcols, F.col(_TAG), *filled)
        .filter(F.col(_TAG) == 1)
        .drop(_TAG)
    )
