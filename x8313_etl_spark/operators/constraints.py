"""Declarative data-quality constraint audit — the Deequ-style (public
AWS Labs project) check suite re-expressed as ONE Spark aggregation.

A constraint suite over a 100 TB table must not become one scan per
check. Every row-level check here (not-null, range, regex, set
membership, arbitrary boolean expression) compiles to a conditional
count inside a SINGLE ``agg`` over a single scan — map-side partial
aggregation reduces each executor's contribution to one row of
counters, and the final exchange carries one row total. Uniqueness
rides the same pass as ``count(col) - count(distinct col)``.
Referential-integrity checks are the one shape that genuinely needs a
second table: each compiles to a distinct-keys anti-join (distinct
BEFORE the join, so the probe side is the key cardinality, not the row
count; AQE broadcasts whichever side is small).

The audit returns one row per check — ``(check, kind, column,
violations, total, passed)`` — the shape a CI gate consumes. Unlike
dq_profile (per-column statistics, no pass/fail semantics) this is a
CONTRACT: the caller declares what must hold, the engine reports what
doesn't, and `passed` is never approximated.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

AUDIT_COLS = ("check", "kind", "column", "violations", "total", "passed")


@dataclass(frozen=True)
class Check:
    """One declared constraint. ``kind`` picks the compilation:

    - ``not_null``:   column IS NULL counts as a violation
    - ``unique``:     duplicated non-null values (count - distinct)
    - ``min``/``max``: non-null values outside the bound (params:
      ``value``)
    - ``in_set``:     non-null values outside ``values``
    - ``matches``:    non-null strings not fully matching ``pattern``
    - ``expr``:       rows where the SQL boolean ``predicate`` is not
      TRUE (null predicate = violation, the SQL-CHECK-constraint rule)
    - ``ref``:        values with no match in ``ref_df[ref_col]``
      (nulls pass, the FK convention)
    """

    name: str
    kind: str
    column: str = ""
    value: float | int | str | None = None
    values: tuple | None = None
    pattern: str | None = None
    predicate: str | None = None
    ref_df: DataFrame | None = None
    ref_col: str | None = None


def _violation_count(c: Check) -> Column:
    col = F.col(c.column) if c.column else None
    if c.kind == "not_null":
        cond = col.isNull()
    elif c.kind == "min":
        cond = col.isNotNull() & (col < F.lit(c.value))
    elif c.kind == "max":
        cond = col.isNotNull() & (col > F.lit(c.value))
    elif c.kind == "in_set":
        cond = col.isNotNull() & ~col.isin(*c.values)
    elif c.kind == "matches":
        # FULL-match semantics (the documented contract): rlike alone
        # is a substring SEARCH, which silently under-counts on
        # unanchored patterns and diverges from any oracle's
        # regexp_full_match.
        cond = col.isNotNull() & ~col.rlike(f"^(?:{c.pattern})$")
    elif c.kind == "expr":
        # SQL CHECK-constraint semantics: NULL predicate violates.
        cond = ~F.coalesce(F.expr(c.predicate), F.lit(False))
    else:
        raise ValueError(f"not a row-level check kind: {c.kind}")
    # coalesce: on an EMPTY table sum() is NULL, which would surface
    # as violations=None / passed=None — a CI gate must read 0 / True.
    return F.coalesce(F.sum(cond.cast("bigint")), F.lit(0)).alias(c.name)


def audit(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check; one row per check, ``AUDIT_COLS`` schema.

    Row-level checks and uniqueness share one scan/one aggregate; each
    ``ref`` check adds one distinct+anti-join pass over its two key
    columns only (column pruning reaches the scan). Check names must be
    unique — they become aggregate aliases."""
    import re

    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")
    for c in checks:
        # names/kinds/columns are interpolated into a selectExpr stack
        # string — reject anything that isn't a plain identifier (and
        # the internal _total alias) instead of failing later with an
        # opaque AnalysisException or a broken string literal.
        if not re.fullmatch(r"[A-Za-z][A-Za-z0-9_]*", c.name) or c.name == "_total":
            raise ValueError(f"check name must be a plain identifier: {c.name!r}")
        if c.column and not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", c.column):
            raise ValueError(f"column must be a plain identifier: {c.column!r}")

    row_checks = [c for c in checks if c.kind not in ("unique", "ref")]
    uniq_checks = [c for c in checks if c.kind == "unique"]
    ref_checks = [c for c in checks if c.kind == "ref"]

    aggs = [F.count(F.lit(1)).alias("_total")]
    aggs += [_violation_count(c) for c in row_checks]
    for c in uniq_checks:
        aggs.append(
            (F.count(c.column) - F.count_distinct(F.col(c.column))).alias(c.name)
        )
    one = df.agg(*aggs)

    # Transpose the single counter row to one row per check via stack —
    # still one job, no extra scan.
    pairs = ", ".join(
        f"'{c.name}', '{c.kind}', '{c.column}', {c.name}"
        for c in row_checks + uniq_checks
    )
    n = len(row_checks) + len(uniq_checks)
    out = one.selectExpr(
        f"stack({n}, {pairs}) AS (check, kind, column, violations)",
        "_total AS total",
    ) if n else None

    refs = None
    for c in ref_checks:
        # Pre-aggregate to (key, multiplicity) so the anti-join carries
        # distinct keys, not rows; violations stay row-level via the sum.
        keycnt = (
            df.filter(F.col(c.column).isNotNull())
            .groupBy(F.col(c.column).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        missing = (
            keycnt.join(
                c.ref_df.select(F.col(c.ref_col).alias("k")).distinct(),
                "k",
                "left_anti",
            )
            .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("violations"))
        )
        row = missing.select(
            F.lit(c.name).alias("check"),
            F.lit("ref").alias("kind"),
            F.lit(c.column).alias("column"),
            F.col("violations"),
        )
        refs = row if refs is None else refs.unionByName(row)
    if refs is not None:
        # ONE total-count scan for ALL ref checks (a per-check
        # crossJoin would re-scan df once per FK — review finding),
        # attached as a single-row scalar cross.
        refs = refs.crossJoin(df.agg(F.count(F.lit(1)).alias("total")))
        out = refs if out is None else out.unionByName(refs)

    if out is None:
        raise ValueError("no checks given")
    return out.select(
        "check",
        "kind",
        "column",
        "violations",
        "total",
        (F.col("violations") == F.lit(0)).alias("passed"),
    )
