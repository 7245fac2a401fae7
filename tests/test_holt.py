"""Tests for operators/holt.py: the distributed per-series fit must
match the driver-side integer recurrence exactly, tdiv must agree with
DuckDB's truncating // on negatives, and crafted series pin the model's
basic behavior (flat -> zero trend, ramp -> slope recovery)."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st

from x8313_etl_spark.operators.holt import holt_forecast, holt_state, tdiv

_SETTINGS = dict(max_examples=8, deadline=None)

_series = st.lists(
    st.integers(min_value=-10_000, max_value=10_000), min_size=2, max_size=12
)


def test_tdiv_matches_duckdb_truncation():
    con = duckdb.connect()
    for a in (-7, -5, -1, 0, 1, 5, 7, -123456, 999999):
        for b in (2, 5, 10):
            got = con.execute(
                f"SELECT CAST({a} AS BIGINT) // CAST({b} AS BIGINT)"
            ).fetchone()[0]
            assert tdiv(a, b) == got, (a, b)


@settings(**_SETTINGS)
@given(data=st.data())
def test_distributed_fit_matches_driver_recurrence(spark, data):
    n_series = data.draw(st.integers(1, 3))
    series = {s: data.draw(_series, label=f"ys{s}") for s in range(n_series)}
    rows = [
        (s, i, 0, yc / 100.0)
        for s, ys in series.items()
        for i, yc in enumerate(ys)
    ]
    df = spark.createDataFrame(rows, "uid bigint, t int, tie int, v double")
    got = {
        r.series: (r.n_points, r.level_cents, r.trend_cents, r.forecast1_cents)
        for r in holt_forecast(
            df, series_col="uid", order_cols=["t", "tie"], value_col="v"
        ).collect()
    }
    for s, ys in series.items():
        level, trend = holt_state(ys)
        assert got[s] == (len(ys), level, trend, level + trend), s


def test_flat_series_has_zero_trend_and_self_forecast():
    level, trend = holt_state([500] * 10)
    assert (level, trend) == (500, 0)


def test_ramp_recovers_slope_sign_and_scale():
    # y_t = 100·t cents: the trend state must converge near the true
    # slope (integer truncation keeps it within a few cents).
    level, trend = holt_state([100 * t for t in range(40)])
    assert 80 <= trend <= 100
    assert level <= 100 * 39


def test_short_series_are_dropped(spark):
    df = spark.createDataFrame(
        [(1, 0, 1.0), (2, 0, 1.0), (2, 1, 2.0)],
        "uid bigint, t int, v double",
    )
    got = holt_forecast(
        df, series_col="uid", order_cols=["t"], value_col="v"
    ).collect()
    assert [r.series for r in got] == [2]
