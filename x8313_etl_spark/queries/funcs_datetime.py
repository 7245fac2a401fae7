"""Date/time function families (SURVEY.md §2.8 F4-F5).

Cross-engine pins (probed against DuckDB 1.0): DuckDB dayofweek is
0=Sunday while Spark is 1=Sunday (aligned by subtracting 1 on the Spark
side); weekofyear/dayofyear/quarter agree; add-months end-of-month
clamping agrees.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register


@register(
    "f4_datetime_extract",
    category="functions",
    oracle="""
SELECT event_id,
       CAST(year(ts) AS INTEGER) AS yr,
       CAST(month(ts) AS INTEGER) AS mo,
       CAST(day(ts) AS INTEGER) AS dy,
       CAST(hour(ts) AS INTEGER) AS hr,
       CAST(minute(ts) AS INTEGER) AS mi,
       CAST(second(ts) AS INTEGER) AS sec,
       CAST(dayofweek(ts) AS INTEGER) AS dow,
       CAST(dayofyear(ts) AS INTEGER) AS doy,
       CAST(weekofyear(ts) AS INTEGER) AS woy,
       CAST(quarter(ts) AS INTEGER) AS qtr
FROM events
""",
)
def f4_datetime_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: calendar field extraction on microsecond event timestamps."""
    ev = load_table(spark, sf_dir, "events")
    t = F.col("ts")
    return ev.select(
        "event_id",
        F.year(t).alias("yr"),
        F.month(t).alias("mo"),
        F.dayofmonth(t).alias("dy"),
        F.hour(t).alias("hr"),
        F.minute(t).alias("mi"),
        F.second(t).alias("sec"),
        (F.dayofweek(t) - 1).alias("dow"),
        F.dayofyear(t).alias("doy"),
        F.weekofyear(t).alias("woy"),
        F.quarter(t).alias("qtr"),
    )


@register(
    "f5_datetime_arith",
    category="functions",
    oracle="""
SELECT o_orderkey,
       date_trunc('month', o_orderdate) AS order_month,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS review_date,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
       make_date(2000, 1, CAST((o_orderkey % 28) + 1 AS INTEGER)) AS synth_date
FROM orders
""",
)
def f5_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: date_trunc / date_add / add_months / datediff / epoch seconds /
    make_date."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).alias("order_month"),
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.add_months(d.cast("date"), 3).alias("review_date"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        d.cast("timestamp").cast("long").alias("epoch_s"),
        F.make_date(
            F.lit(2000), F.lit(1), (F.col("o_orderkey") % 28 + 1).cast("int")
        ).alias("synth_date"),
    )
