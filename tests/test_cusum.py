"""Tests for operators/cusum.py: distributed scan vs the driver
reference on random series, plus crafted drift/no-drift behavior."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from x8313_etl_spark.operators.cusum import cusum_alarms, cusum_alarms_ref

_SETTINGS = dict(max_examples=8, deadline=None)
_series = st.lists(
    st.integers(min_value=-5000, max_value=5000), min_size=1, max_size=15
)
SLACK, H = 50, 500


@settings(**_SETTINGS)
@given(data=st.data())
def test_distributed_scan_matches_reference(spark, data):
    series = {s: data.draw(_series, label=f"ys{s}") for s in range(3)}
    rows = [
        (s, i, yc / 100.0) for s, ys in series.items() for i, yc in enumerate(ys)
    ]
    df = spark.createDataFrame(rows, "uid bigint, t int, v double")
    got = {}
    for r in cusum_alarms(
        df, series_col="uid", order_cols=["t"], value_col="v",
        slack_cents=SLACK, h_cents=H,
    ).collect():
        got.setdefault(r.series, []).append((r.idx, r.s_cents))
    for s, ys in series.items():
        assert sorted(got.get(s, [])) == cusum_alarms_ref(ys, SLACK, H), s


def test_flat_series_never_alarms():
    assert cusum_alarms_ref([1000] * 50, SLACK, H) == []


def test_step_shift_alarms_and_point_spike_does_not():
    # A single sub-threshold spike decays back to zero; a sustained
    # +$2 level shift accumulates +50/step past h and alarms.
    spike = [1000] * 30 + [1400] + [1000] * 30
    assert cusum_alarms_ref(spike, SLACK, H) == []
    shifted = [1000] * 30 + [1200] * 30
    alarms = cusum_alarms_ref(shifted, SLACK, H)
    assert alarms and all(i >= 30 for i, _ in alarms)
