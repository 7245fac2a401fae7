"""Pre-registration oracle checks — round-7 candidate batch C remainder.

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0) on an UNREGISTERED QuerySpec, so a future
round's registration is a verbatim fn+oracle copy. ROADMAP.md
"Candidate surface" carries the registration notes. (The sibling
candidate modules test_r7_candidates.py / test_r9_candidates*.py were
retired at the round-9 registration — their guards live on in
tests/test_registered_guards.py; dq5_distribution_drift moved out of
THIS module to etl_q.py the same round.)

Remaining batch C members: p_markov_transitions (per-user event-type
transition matrix in ppm) and ts_vwap_bars (volume-weighted hourly
bars).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from x8313_etl_spark import audit
from x8313_etl_spark.io import load_table
from x8313_etl_spark.registry import QuerySpec

from .oracle_utils import compare_query


@pytest.fixture(autouse=True, scope="module")
def _scrub_ledger_keys():
    """Forget ledger keys introduced by these unregistered candidate fns
    (the materialization gate audits registered queries only)."""
    before = set(audit.ledger())
    yield
    for key in set(audit.ledger()) - before:
        audit.forget(key)


# ---------------------------------------------------------------------------
# p_markov_transitions — per-user event-sequence transition matrix
# ---------------------------------------------------------------------------


def _markov_fn(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (session path analysis / next-event model). The lag
    window shuffles once on user_id — per-user state is bounded by
    that user's event count — and the transition aggregate is
    state-space sized (|event_type|^2 <= 25 here), so the output side
    is a broadcast-scale table at ANY corpus size. prob_ppm is integer
    floor division (Spark `div` == DuckDB `//`), so rows are
    engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    c = tr.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    tot = c.groupBy("prev_type").agg(F.sum("n_transitions").alias("row_total"))
    return (
        c.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n_transitions",
            F.expr("(1000000 * n_transitions) div row_total").alias("prob_ppm"),
        )
    )


_MARKOV_SQL = """
WITH tr AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
c AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
  FROM tr WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
t AS (SELECT prev_type, CAST(sum(n_transitions) AS BIGINT) AS row_total
      FROM c GROUP BY prev_type)
SELECT c.prev_type, c.next_type, c.n_transitions,
       CAST((1000000 * c.n_transitions) // t.row_total AS BIGINT) AS prob_ppm
FROM c JOIN t USING (prev_type)
"""

MARKOV_SPEC = QuerySpec(
    name="p_markov_transitions",
    fn=_markov_fn,
    oracle=_MARKOV_SQL,
    category="pipeline",
)


def test_markov_transitions_twin(spark, sf_oracle_dir):
    res = compare_query(spark, MARKOV_SPEC, sf_oracle_dir)
    assert res.ok, res.detail


def test_markov_transitions_nontrivial(spark, sf_oracle_dir):
    """The matrix must be a real matrix (every state reached from more
    than one predecessor) and rows must roughly normalize (sum of
    floor-divided ppm within |row| of 10^6)."""
    rows = _markov_fn(spark, sf_oracle_dir).collect()
    prevs = {r.prev_type for r in rows}
    nexts = {r.next_type for r in rows}
    assert len(prevs) >= 3 and len(nexts) >= 3
    from collections import defaultdict

    sums = defaultdict(int)
    widths = defaultdict(int)
    for r in rows:
        sums[r.prev_type] += r.prob_ppm
        widths[r.prev_type] += 1
    for p, s in sums.items():
        assert 10**6 - widths[p] <= s <= 10**6


# ---------------------------------------------------------------------------
# ts_vwap_bars — weekly volume-weighted average price in exact cents
# ---------------------------------------------------------------------------


def _vwap_fn(spark, sf_dir):
    """Weekly VWAP bars over lineitem: vwap = sum(price*qty)/sum(qty)
    in exact integer cents (floor division). Quantities in the TPC-H
    shape are integral doubles, so the bigint cast is exact; prices
    quantize via the ROUND(x*100) cents idiom (j15's). One map pass +
    one week-keyed aggregate — partial aggregation map-side, ~52
    groups/year at any scale. Int64 headroom: cents*qty <= ~5*10^8 per
    row, so a week's sum overflows only past ~2*10^10 rows/week; at
    that scale the sum would move to decimal(38,0) — documented, not
    needed at fixture sfs."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.date_trunc("week", "l_shipdate").cast("date").alias("week"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        .groupBy("week")
        .agg(
            F.sum("qty").alias("total_qty"),
            F.sum(F.col("cents") * F.col("qty")).alias("notional_cents"),
        )
        .select(
            "week",
            "total_qty",
            "notional_cents",
            F.expr("notional_cents div total_qty").alias("vwap_cents"),
        )
    )


_VWAP_SQL = """
WITH x AS (
  SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
)
SELECT week, CAST(sum(qty) AS BIGINT) AS total_qty,
       CAST(sum(cents * qty) AS BIGINT) AS notional_cents,
       CAST(sum(cents * qty) // sum(qty) AS BIGINT) AS vwap_cents
FROM x GROUP BY week
"""

VWAP_SPEC = QuerySpec(
    name="ts_vwap_bars",
    fn=_vwap_fn,
    oracle=_VWAP_SQL,
    category="timeseries",
)


def test_vwap_bars_twin(spark, sf_oracle_dir):
    res = compare_query(spark, VWAP_SPEC, sf_oracle_dir)
    assert res.ok, res.detail


def test_vwap_bars_nontrivial(spark, sf_oracle_dir):
    rows = _vwap_fn(spark, sf_oracle_dir).collect()
    assert len(rows) >= 10  # multiple weekly bars
    assert all(r.vwap_cents > 0 for r in rows)
