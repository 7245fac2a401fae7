"""Holt linear-trend forecasting (double exponential smoothing) — the
time-series family's missing FORECASTING operator (Holt 1957 / the
standard ETS(A,A,N) model, public textbook material; ts_ewma covers
level-only smoothing, ts_seasonal_decompose is retrospective).

The recurrence

    l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

is inherently sequential per series — no window or closed form once a
trend term exists (EWMA's geometric closed form does not survive the
coupled recursion). Two consequences drive the design:

1. PER-SERIES Pandas UDF (applyInPandas, the x4/sessionize precedent):
   the corpus shuffles ONCE on the series key; each group's recurrence
   is a tight integer loop over its own rows. At 100 TB the cost model
   is exactly sessionization's — groups are independent, skew is the
   series-length distribution, and nothing is driver-side.
2. INTEGER FIXED-POINT, rational smoothing constants: values are
   exact cents, α = A_NUM/A_DEN, β = B_NUM/B_DEN, every step one
   TRUNCATING integer division (``//`` truncates in DuckDB; Python's
   ``//`` floors — the tdiv helper makes both engines agree on
   negative trends). Iterated floating point cannot be oracled
   (verify-discipline rule); this recurrence replays bit-identically
   in a recursive SQL CTE, so the operator is exactly twin-able.

Initialization: the standard l_0 = y_0, b_0 = y_1 − y_0; series with
fewer than two points are dropped (no trend is estimable — documented
contract). Ties in the time order are pinned by (ts, event_id)-style
tiebreak columns supplied by the caller.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

A_NUM, A_DEN = 1, 5  # α = 0.2
B_NUM, B_DEN = 1, 10  # β = 0.1

OUT_SCHEMA = (
    "series bigint, n_points bigint, level_cents bigint, "
    "trend_cents bigint, forecast1_cents bigint"
)


def tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (DuckDB ``//`` semantics;
    Python's ``//`` floors, which differs on negative trends)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def holt_state(ys: list[int]) -> tuple[int, int]:
    """(level, trend) in cents after consuming the series — the exact
    integer recurrence both engines replay."""
    level, trend = ys[0], ys[1] - ys[0]
    for y in ys[1:]:
        new_level = tdiv(A_NUM * y + (A_DEN - A_NUM) * (level + trend), A_DEN)
        trend = tdiv(
            B_NUM * (new_level - level) + (B_DEN - B_NUM) * trend, B_DEN
        )
        level = new_level
    return level, trend


def holt_forecast(
    df: DataFrame,
    *,
    series_col: str,
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """One row per series (≥ 2 points): final (level, trend) state in
    cents plus the one-step-ahead forecast level + trend. The value
    column is quantized to exact cents before any arithmetic."""
    src = df.select(
        F.col(series_col).cast("bigint").alias("series"),
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        F.round(F.col(value_col) * 100).cast("bigint").alias("yc"),
    )
    ocols = [f"__o{i}" for i in range(len(order_cols))]

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ocols, kind="mergesort")
        ys = [int(v) for v in pdf["yc"]]
        if len(ys) < 2:
            return pd.DataFrame(
                columns=[
                    "series", "n_points", "level_cents", "trend_cents",
                    "forecast1_cents",
                ]
            )
        level, trend = holt_state(ys)
        return pd.DataFrame(
            {
                "series": [int(pdf["series"].iloc[0])],
                "n_points": [len(ys)],
                "level_cents": [level],
                "trend_cents": [trend],
                "forecast1_cents": [level + trend],
            }
        )

    return src.groupBy("series").applyInPandas(fit, schema=OUT_SCHEMA)
