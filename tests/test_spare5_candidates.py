"""Pre-registration oracle checks — round-12-authored candidate batch W
(the fifth spare-capacity batch; one strong candidate completing the
model-family evaluation arc: batch S grades CLASSIFIERS, batch T
grades RANKERS, this grades the FORECASTER. Substitution bench /
post-r20 continuation, NOT in the r13–r20 budget queue).

The test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0) on an ad-hoc UNREGISTERED QuerySpec, so a
future round's registration is a verbatim fn+oracle copy. The twin
verifies at BOTH fixture sfs.

- ev_forecast_backtest: one-step holdout backtest of the registered
  Holt forecaster (ts_holt_forecast) — each series' LAST point is held
  out, Holt runs on the remaining n−1 points (the same
  integer-cents/truncating-division recurrence, so the twin replays it
  with the registered recursive-CTE pattern stopped one step early),
  and the per-series row reports the held-out actual, Holt's forecast,
  the NAIVE last-value forecast, both absolute errors, and who won —
  the skill-vs-naive comparison (the MASE idea, public) that is the
  first question anyone asks of a forecaster. Series shorter than 3
  points are excluded on both sides (Holt needs 2 training points).
  Measured at authoring: Holt beats naive on 59%% of series at
  sf0.01, 58%% at sf0.1 and at the 10× replica — the trend term has
  real but far-from-dominant skill on the fixture's noisy series, and
  BOTH regimes appearing is what the guard pins (an instrument whose
  baseline always wins, or always loses, grades nothing). A crafted
  leak-detector test pins that the held-out point is truly unseen (a
  flat prefix with a final jump must be predicted at the flat level).

10× authoring sweep (FK-consistent bench replica, 2026-08-16):
8.3→61.4 s for 1,500→15,000 series — series-count linear (the
per-series Arrow scan and the holdout windows are both linear; the
sf0.1 number still amortizes the session floor). No pair term.
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
    before = set(audit.ledger())
    yield
    for key in set(audit.ledger()) - before:
        audit.forget(key)


def _backtest_fn(spark, sf_dir):
    """One-step holdout backtest of the registered Holt forecaster:
    hold out each series' final point, forecast it from the rest, and
    grade against the NAIVE last-value forecast. ENGINE-EXACT: the
    held-out actual and the naive forecast are integer cents read off
    the ordered series; Holt's forecast is the registered operator's
    own integer recurrence over the training prefix (operators/
    holt.py — truncating division, rational smoothing weights), which
    the twin replays step-for-step with the recursion stopped at
    t = n−1 and the training join capped at idx ≤ n−2 so the held-out
    point is never consumed. Scale: one series-keyed shuffle for the
    holdout split + the operator's own per-series Arrow scan; all
    joins are series-keyed and series-count-sized."""
    from x8313_etl_spark.operators.holt import holt_forecast

    ev = load_table(spark, sf_dir, "events")
    wdesc = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    marked = ev.withColumn("rdesc", F.row_number().over(wdesc))
    train = marked.filter(F.col("rdesc") >= 2).drop("rdesc")
    actual = marked.filter(F.col("rdesc") == 1).select(
        F.col("user_id").cast("bigint").alias("series"),
        F.round(F.col("value") * 100).cast("bigint").alias("actual_cents"),
    )
    naive = marked.filter(F.col("rdesc") == 2).select(
        F.col("user_id").cast("bigint").alias("series"),
        F.round(F.col("value") * 100).cast("bigint").alias("naive_cents"),
    )
    fc = holt_forecast(
        train, series_col="user_id", order_cols=["ts", "event_id"],
        value_col="value",
    ).select(
        "series",
        (F.col("n_points") + 1).cast("bigint").alias("n_points"),
        F.col("forecast1_cents").cast("bigint").alias("holt_cents"),
    )
    j = fc.join(actual, "series").join(naive, "series")
    return j.select(
        "series",
        "n_points",
        "actual_cents",
        "holt_cents",
        "naive_cents",
        F.abs(F.col("holt_cents") - F.col("actual_cents"))
        .cast("bigint")
        .alias("holt_abs_err"),
        F.abs(F.col("naive_cents") - F.col("actual_cents"))
        .cast("bigint")
        .alias("naive_abs_err"),
        (
            F.abs(F.col("holt_cents") - F.col("actual_cents"))
            < F.abs(F.col("naive_cents") - F.col("actual_cents"))
        ).alias("holt_wins"),
    )


_BACKTEST_SQL = """
WITH RECURSIVE seq AS MATERIALIZED (
  SELECT CAST(user_id AS BIGINT) AS series,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS idx,
         CAST(round(value * 100) AS BIGINT) AS yc,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
  FROM events
),
r AS (
  SELECT s0.series, CAST(1 AS BIGINT) AS t,
         s0.yc AS l, s1.yc - s0.yc AS b, s0.n AS n
  FROM seq s0 JOIN seq s1 ON s1.series = s0.series AND s1.idx = 1
  WHERE s0.idx = 0 AND s0.n >= 3
  UNION ALL
  SELECT r.series, r.t + 1,
         (1 * s.yc + 4 * (r.l + r.b)) // 5 AS l,
         (1 * ((1 * s.yc + 4 * (r.l + r.b)) // 5 - r.l) + 9 * r.b) // 10 AS b,
         r.n
  FROM r JOIN seq s ON s.series = r.series AND s.idx = r.t
  WHERE s.idx <= r.n - 2
),
pred AS (
  SELECT series, n, l + b AS holt_cents FROM r WHERE t = n - 1
),
act AS (SELECT series, yc AS actual_cents FROM seq WHERE idx = n - 1),
nai AS (SELECT series, yc AS naive_cents FROM seq WHERE idx = n - 2)
SELECT p.series, p.n AS n_points, a.actual_cents,
       CAST(p.holt_cents AS BIGINT) AS holt_cents, v.naive_cents,
       CAST(abs(p.holt_cents - a.actual_cents) AS BIGINT) AS holt_abs_err,
       CAST(abs(v.naive_cents - a.actual_cents) AS BIGINT) AS naive_abs_err,
       abs(p.holt_cents - a.actual_cents)
         < abs(v.naive_cents - a.actual_cents) AS holt_wins
FROM pred p
JOIN act a ON a.series = p.series
JOIN nai v ON v.series = p.series
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ev_forecast_backtest_twin(spark, d):
    spec = QuerySpec(
        name="rW:ev_forecast_backtest", fn=_backtest_fn,
        oracle=_BACKTEST_SQL, category="timeseries",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_ev_backtest_has_both_regimes(spark, sf_oracle_dir):
    """Holt must beat the naive baseline on SOME series and lose on
    others — an instrument whose baseline always wins (or always
    loses) grades nothing — and errors must be non-degenerate (some
    nonzero on both sides)."""
    rows = _backtest_fn(spark, sf_oracle_dir).collect()
    assert rows
    wins = sum(1 for r in rows if r.holt_wins)
    assert 0 < wins < len(rows), (wins, len(rows))
    assert any(r.holt_abs_err > 0 for r in rows)
    assert any(r.naive_abs_err > 0 for r in rows)


def test_ev_backtest_holdout_is_real(spark, sf_oracle_dir):
    """The forecast must be computed WITHOUT the held-out point: a
    series whose training prefix is flat but whose last point jumps
    must be predicted at the flat level, not the jump (leak detector —
    if the operator saw the last point, the level would chase it)."""
    import pandas as pd

    rows = [(1, i, i, 100.0) for i in range(1, 11)] + [(1, 11, 11, 900.0)]
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "tick", "value"])
    df["ts"] = pd.to_datetime(df["tick"], unit="s")
    sdf = spark.createDataFrame(df[["user_id", "ts", "event_id", "value"]])
    sdf.createOrReplaceTempView("__bt_crafted")
    from x8313_etl_spark.operators.holt import holt_forecast
    import pyspark.sql.functions as F2
    from pyspark.sql import Window as W2

    wdesc = W2.partitionBy("user_id").orderBy(
        F2.desc("ts"), F2.desc("event_id")
    )
    marked = sdf.withColumn("rdesc", F2.row_number().over(wdesc))
    train = marked.filter(F2.col("rdesc") >= 2).drop("rdesc")
    fc = holt_forecast(
        train, series_col="user_id", order_cols=["ts", "event_id"],
        value_col="value",
    ).collect()[0]
    # flat 100.00 training → forecast ~10000 cents; the 900.00 jump
    # must NOT have been seen
    assert abs(fc.forecast1_cents - 10000) < 100, fc
