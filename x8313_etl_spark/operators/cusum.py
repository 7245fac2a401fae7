"""One-sided CUSUM change detection (Page 1954, public textbook SPC
material) — sustained-upward-drift alarms over per-series metric
streams; the monitoring op a data pipeline points at its own quality
scores (dq2 flags POINT anomalies via 3σ residuals; CUSUM accumulates
SMALL persistent shifts those residuals never trip).

    s_0 = 0
    s_t = max(0, s_{t-1} + (y_t − μ − slack))      # integer cents
    alarm at t where s_t > h

μ is the series' truncating integer mean (sum div n — one aggregate
pre-pass), ``slack`` the allowance, ``h`` the decision threshold, all
in cents. Same execution/exactness discipline as operators/holt.py:
the recurrence is inherently sequential per series, so it runs as an
Arrow-batched per-series integer loop (applyInPandas, one shuffle on
the series key), every operation is integer (max, add, truncating
division via tdiv), and a recursive SQL CTE replays it bit for bit —
the operator is exactly twin-able despite being iterative.

Output: one row per ALARM (series, idx, s_cents) — idx is the 0-based
position in (order_cols) order. A series with no sustained drift emits
nothing; emitting alarms rather than final state keeps the output
informative AND bounded by the alarm count.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .holt import tdiv

OUT_SCHEMA = "series bigint, idx bigint, s_cents bigint"


def cusum_alarms_ref(ys: list[int], slack: int, h: int) -> list[tuple[int, int]]:
    """Driver-side reference: [(idx, s)] alarms for one series."""
    mu = tdiv(sum(ys), len(ys))
    s, out = 0, []
    for i, y in enumerate(ys):
        s = max(0, s + (y - mu - slack))
        if s > h:
            out.append((i, s))
    return out


def cusum_alarms(
    df: DataFrame,
    *,
    series_col: str,
    order_cols: list[str],
    value_col: str,
    slack_cents: int,
    h_cents: int,
) -> DataFrame:
    """(series, idx, s_cents) for every position whose CUSUM statistic
    exceeds h. Values quantized to exact cents before any arithmetic."""
    src = df.select(
        F.col(series_col).cast("bigint").alias("series"),
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        F.round(F.col(value_col) * 100).cast("bigint").alias("yc"),
    )
    ocols = [f"__o{i}" for i in range(len(order_cols))]

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ocols, kind="mergesort")
        ys = [int(v) for v in pdf["yc"]]
        alarms = cusum_alarms_ref(ys, slack_cents, h_cents)
        return pd.DataFrame(
            {
                "series": [int(pdf["series"].iloc[0])] * len(alarms),
                "idx": [i for i, _ in alarms],
                "s_cents": [s for _, s in alarms],
            }
        )

    return src.groupBy("series").applyInPandas(scan, schema=OUT_SCHEMA)
