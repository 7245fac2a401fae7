"""Pre-registration oracle checks — round-8-authored candidate batch E.

Same protocol as the retired tests/test_r7_candidates_b.py (whose 12
candidates registered in round 8): each test runs the EXACT driver
compare (tests/oracle_utils.compare_query, tolerance 0) on an ad-hoc
UNREGISTERED QuerySpec, so a future round's registration is a verbatim
fn+oracle copy. ROADMAP.md "Candidate surface" carries the notes.

Batch E closes surface gaps the r8 self-review identified:
- t19: the stream-stream join family (t10/t12/t13 inner/louter/fouter)
  lacks the SEMI form — the "which impressions converted" shape that
  wants existence, not pair fan-out.
- s21: the Python DataSource API is batch-only in the repo (s17);
  Spark 4's DataSourceStreamReader (partition-planned, executor-side
  reads) is the STREAMING extension point.
- ts_twa: time-weighted averages over irregular series — the standard
  "don't let sampling density bias the mean" timeseries op (every
  monitoring/quant store ships it); integer cents × µs in decimal so
  the irregular-weight sum is engine-exact.
- j18: as-of NEAREST with tolerance (pandas merge_asof
  direction='nearest') — j9 covers backward only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from x8313_etl_spark import audit
from x8313_etl_spark.io import load_table, stream_events
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
# t19_stream_semi_join — stream-stream LEFT SEMI join (existence, not pairs)
# ---------------------------------------------------------------------------


def _t19_fn(spark, sf_dir):
    """Stream-stream LEFT SEMI join: each view is emitted AT MOST ONCE —
    iff some click by the same user lands in (view_ts, view_ts+60min] —
    and unmatched views are dropped at state eviction instead of
    null-padded (t12's louter form). This is the 'which impressions
    converted' shape: an inner join fans out per matching click and
    then needs a distinct; the semi join keeps state bounded the same
    way (two-sided watermark + time-range bound) but emits existence.
    The final availableNow sink state equals batch EXISTS semantics —
    the twin — independent of micro-batch splits."""
    from x8313_etl_spark.streaming import run_to_memory

    views = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").cast("timestamp").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").cast("timestamp").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    joined = views.join(
        clicks,
        on=[
            F.col("user_id") == F.col("c_user_id"),
            F.col("click_ts") > F.col("view_ts"),
            F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 60 MINUTES"),
        ],
        how="left_semi",
    )
    return run_to_memory(spark, joined, "t19_semi_join", "append")


_T19_SQL = """
SELECT e.user_id, e.event_id AS view_id, CAST(e.ts AS TIMESTAMP) AS view_ts
FROM events e
WHERE e.event_type = 'view'
  AND EXISTS (
    SELECT 1 FROM events c
    WHERE c.event_type = 'click' AND c.user_id = e.user_id
      AND c.ts > e.ts AND c.ts <= e.ts + INTERVAL 60 MINUTE
  )
"""


def test_stream_semi_join_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r9:t19_stream_semi_join",
        fn=_t19_fn,
        oracle=_T19_SQL,
        category="streaming",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_stream_semi_join_is_proper_subset(spark, sf_oracle_dir):
    """The semi join must actually filter (some views lack a click in
    the hour) and actually match (some have one) at this sf."""
    out = _t19_fn(spark, sf_oracle_dir)
    n_semi = out.count()
    n_views = (
        load_table(spark, sf_oracle_dir, "events")
        .filter(F.col("event_type") == "view")
        .count()
    )
    assert 0 < n_semi < n_views


# ---------------------------------------------------------------------------
# s21_python_stream_source — Spark 4 streaming Python DataSource
# ---------------------------------------------------------------------------


def _s21_fn(spark, sf_dir):
    """A custom STREAMING source through the Spark 4 Python DataSource
    API (DataSourceStreamReader — the partition-planned form whose
    read() runs executor-side; SimpleDataSourceStreamReader is the
    documented driver-side lightweight variant, deliberately not used).
    The source serves STREAM_TICKS deterministic micro-batches of
    md5-derived sensor readings and then holds its offset, so the
    stream goes idle exactly like a caught-up queue; the query polls
    the memory sink to the known row count and stops. The aggregate on
    top proves streamed rows flow through the normal relational
    pipeline; the twin regenerates the identical table from
    generate_series + the same md5 algebra."""
    import time as _time
    import uuid as _uuid

    from x8313_etl_spark.functions.numeric import dsum
    from x8313_etl_spark.python_ds import (
        STREAM_ROWS_PER_TICK,
        STREAM_TICKS,
        SensorStreamDataSource,
    )

    import os
    import tempfile

    try:
        spark.dataSource.register(SensorStreamDataSource)
    except Exception:
        pass  # already registered in this session — idempotent use
    run_id = _uuid.uuid4().hex[:8]
    sink = f"s21_sink_{run_id}"
    # per-run durable offset sidecar: the reader's served-tick
    # high-water survives a checkpoint restart (see SensorStreamReader's
    # restart-safety note) — a fresh file per run restarts the feed
    progress = os.path.join(tempfile.gettempdir(), f"s21_progress_{run_id}")
    df = (
        spark.readStream.format("x8313_sensor_stream")
        .option("progressDir", progress)
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .trigger(processingTime="0 seconds")
        .start()
    )
    want = STREAM_TICKS * STREAM_ROWS_PER_TICK
    try:
        deadline = _time.time() + 180
        while _time.time() < deadline:
            if spark.table(sink).count() >= want:
                break
            _time.sleep(0.5)
        else:
            raise TimeoutError("s21 stream did not serve all ticks in 180s")
    finally:
        q.stop()
    got = spark.table(sink)
    return got.groupBy("sensor_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("seq").alias("seq_min"),
        F.max("seq").alias("seq_max"),
        dsum("reading").alias("total"),
    )


def _s21_sql():
    from x8313_etl_spark.functions.numeric import sql_dsum
    from x8313_etl_spark.python_ds import (
        N_SENSORS,
        STREAM_ROWS_PER_TICK,
        STREAM_TICKS,
    )

    total_rows = STREAM_TICKS * STREAM_ROWS_PER_TICK
    reading = (
        "round((CAST(CONCAT('0x', substr(md5('s21-' || CAST(seq AS VARCHAR)), 1, 8)) "
        "AS BIGINT) % 1000000) / 1000000.0, 6)"
    )
    return f"""
WITH g AS (SELECT unnest(generate_series(0, {total_rows - 1})) AS seq),
r AS (
  SELECT CAST(seq % {N_SENSORS} AS INTEGER) AS sensor_id, seq,
         {reading} AS reading
  FROM g
)
SELECT sensor_id,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(seq) AS INTEGER) AS seq_min,
       CAST(max(seq) AS INTEGER) AS seq_max,
       {sql_dsum('reading')} AS total
FROM r GROUP BY sensor_id
"""


def test_python_stream_source_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r9:s21_python_stream_source",
        fn=_s21_fn,
        oracle=_s21_sql(),
        category="streaming",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


# ---------------------------------------------------------------------------
# ts_twa — time-weighted average over irregular series
# ---------------------------------------------------------------------------


def _twa_fn(spark, sf_dir):
    """Time-weighted average per series (left-constant / previous-tick
    weighting over [t0, tN]): TWA = Σ value_i·(t_{i+1}−t_i) / (tN−t0) —
    the irregular-sampling mean every monitoring and market-data store
    ships (a burst of readings must not out-vote a quiet hour, which is
    exactly what the row-mean a1 computes). Duplicate timestamps are
    deduped per (series, ts) keeping the max event_id row (the j9
    keep_first convention). Exactness: cents(int) × dt_µs(int) summed
    in DECIMAL(38,0) — an integer grid, so the irregular-weight sum is
    order-free and engine-exact; the output TWA is a truncating integer
    division back to cents. One window shuffle keyed by series."""
    from pyspark.sql import Window

    from x8313_etl_spark.operators.dedup import keep_first

    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("series"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        "event_id",
    )
    ev = keep_first(
        ev, ["series", "tus"], [F.col("event_id").desc()]
    ).drop("event_id")
    w = Window.partitionBy("series").orderBy("tus")
    seg = ev.withColumn("t_next", F.lead("tus").over(w)).filter(
        F.col("t_next").isNotNull()
    )
    wsum = F.sum(
        (F.col("cents") * (F.col("t_next") - F.col("tus"))).cast("decimal(38,0)")
    )
    return (
        seg.groupBy("series")
        .agg(
            wsum.alias("wsum"),
            F.sum(F.col("t_next") - F.col("tus")).alias("span_us"),
            (F.count(F.lit(1)) + 1).alias("n_obs"),
        )
        .select(
            "series",
            # `div`, not `/`+CAST: decimal `/` rounds HALF_UP at result
            # scale BEFORE a cast could truncate, so a ratio just under
            # an integer boundary would round up where DuckDB's `//`
            # floors — `div` is the integral division both engines agree on
            F.expr("CAST(wsum div span_us AS BIGINT)").alias("twa_cents"),
            F.col("span_us").cast("bigint").alias("span_us"),
            F.col("n_obs").cast("bigint").alias("n_obs"),
        )
    )


_TWA_SQL = """
WITH dd AS (
  SELECT series, tus, cents FROM (
    SELECT event_type AS series, epoch_us(ts) AS tus,
           CAST(round(value * 100) AS BIGINT) AS cents,
           row_number() OVER (
             PARTITION BY event_type, epoch_us(ts) ORDER BY event_id DESC
           ) AS rn
    FROM events
  ) WHERE rn = 1
),
seg AS (
  SELECT series, cents, tus,
         lead(tus) OVER (PARTITION BY series ORDER BY tus) AS t_next
  FROM dd
)
SELECT series,
       CAST(sum(CAST(cents * (t_next - tus) AS HUGEINT))
            // CAST(sum(t_next - tus) AS HUGEINT) AS BIGINT) AS twa_cents,
       CAST(sum(t_next - tus) AS BIGINT) AS span_us,
       CAST(count(*) + 1 AS BIGINT) AS n_obs
FROM seg WHERE t_next IS NOT NULL
GROUP BY series
"""


def test_ts_twa_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r9:ts_twa",
        fn=_twa_fn,
        oracle=_TWA_SQL,
        category="timeseries",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_ts_twa_differs_from_row_mean(spark, sf_oracle_dir):
    """TWA must differ from the unweighted row mean on the fixture —
    if sampling were perfectly regular the operator would be untested."""
    twa = {r["series"]: r["twa_cents"] for r in _twa_fn(spark, sf_oracle_dir).collect()}
    mean = {
        r["series"]: r["m"]
        for r in load_table(spark, sf_oracle_dir, "events")
        .groupBy(F.col("event_type").alias("series"))
        .agg(F.expr("CAST(avg(round(value * 100)) AS BIGINT)").alias("m"))
        .collect()
    }
    assert any(abs(twa[s] - mean[s]) > 0 for s in twa)


# ---------------------------------------------------------------------------
# j18_asof_nearest — as-of join, direction=nearest with tolerance
# ---------------------------------------------------------------------------

_J18_TOL_US = 90 * 60 * 1_000_000  # ±90 min


def _j18_fn(spark, sf_dir):
    """As-of NEAREST with tolerance (pandas merge_asof
    direction='nearest'): each purchase pairs with the view whose
    timestamp is closest within ±90 min — ties prefer the BACKWARD
    (at-or-before) side, the market-data convention. Composed from two
    passes of the verified backward asof operator (operators/asof.py):
    the forward direction is the same union+window pass on NEGATED
    timestamps (latest −v_ts ≤ −p_ts ⇔ earliest v_ts ≥ p_ts) — still
    one shuffle per pass, keyed by user, no join fan-out anywhere.
    Views are deduped per (user, ts) keeping max view_id (j9's
    convention) so both engines pick identical representatives."""
    from x8313_etl_spark.operators.asof import asof_join
    from x8313_etl_spark.operators.dedup import keep_first

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("p_tus"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("v_tus"),
        F.col("event_id").alias("view_id"),
    )
    v = keep_first(v, ["user_id", "v_tus"], [F.col("view_id").desc()])

    back = asof_join(
        p, v.select("user_id", "v_tus", F.col("view_id").alias("b_view_id"),
                    F.col("v_tus").alias("b_tus")),
        by=["user_id"], left_on="p_tus", right_on="v_tus",
        value_cols=["b_view_id", "b_tus"],
    )
    # forward = backward on negated time axes
    fwd = asof_join(
        p.select("purchase_id", "user_id", (-F.col("p_tus")).alias("n_p")),
        v.select("user_id", (-F.col("v_tus")).alias("n_v"),
                 F.col("view_id").alias("f_view_id"),
                 F.col("v_tus").alias("f_tus")),
        by=["user_id"], left_on="n_p", right_on="n_v",
        value_cols=["f_view_id", "f_tus"],
    ).select("purchase_id", "f_view_id", "f_tus")

    both = back.join(fwd, "purchase_id", "left")
    b_d = F.col("p_tus") - F.col("b_tus")
    f_d = F.col("f_tus") - F.col("p_tus")
    b_ok = F.col("b_tus").isNotNull() & (b_d <= F.lit(_J18_TOL_US))
    f_ok = F.col("f_tus").isNotNull() & (f_d <= F.lit(_J18_TOL_US))
    pick_back = b_ok & (~f_ok | (b_d <= f_d))  # tie → backward
    pick_fwd = f_ok & ~pick_back
    return both.select(
        "purchase_id",
        "user_id",
        F.when(pick_back, F.col("b_view_id"))
        .when(pick_fwd, F.col("f_view_id"))
        .alias("view_id"),
        F.when(pick_back, b_d).when(pick_fwd, f_d).alias("dist_us"),
        F.when(pick_back, F.lit("backward"))
        .when(pick_fwd, F.lit("forward"))
        .otherwise(F.lit("none"))
        .alias("direction"),
    )


_J18_SQL = f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_tus
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, v_tus, view_id FROM (
    SELECT user_id, epoch_us(ts) AS v_tus, event_id AS view_id,
           row_number() OVER (
             PARTITION BY user_id, epoch_us(ts) ORDER BY event_id DESC
           ) AS rn
    FROM events WHERE event_type = 'view'
  ) WHERE rn = 1
),
ranked AS (
  SELECT p.purchase_id, p.user_id, v.view_id,
         abs(p.p_tus - v.v_tus) AS dist_us,
         CASE WHEN v.v_tus <= p.p_tus THEN 'backward' ELSE 'forward' END
           AS direction,
         row_number() OVER (
           PARTITION BY p.purchase_id
           ORDER BY abs(p.p_tus - v.v_tus),
                    CASE WHEN v.v_tus <= p.p_tus THEN 0 ELSE 1 END
         ) AS rn
  FROM p JOIN v ON v.user_id = p.user_id
   AND abs(p.p_tus - v.v_tus) <= {_J18_TOL_US}
)
SELECT p.purchase_id, p.user_id, r.view_id, r.dist_us,
       coalesce(r.direction, 'none') AS direction
FROM p LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
  ON r.purchase_id = p.purchase_id
"""


def test_j18_asof_nearest_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r9:j18_asof_nearest",
        fn=_j18_fn,
        oracle=_J18_SQL,
        category="joins",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_j18_exercises_both_directions_and_tolerance(spark, sf_oracle_dir):
    """The fixture must produce backward picks, forward picks, AND
    tolerance misses — otherwise nearest ≡ backward and the direction
    logic is untested."""
    dirs = {
        r["direction"]: r["n"]
        for r in _j18_fn(spark, sf_oracle_dir)
        .groupBy("direction")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert dirs.get("backward", 0) > 0
    assert dirs.get("forward", 0) > 0
    assert dirs.get("none", 0) > 0


def test_s21_reader_offset_survives_restart(tmp_path):
    """A reader rebuilt from a checkpoint (fresh instance, same sidecar)
    must not regress below the served high-water — the in-memory-counter
    failure mode the sidecar exists to prevent (r8 review finding)."""
    from x8313_etl_spark.python_ds import STREAM_TICKS, SensorStreamReader

    p = str(tmp_path / "progress")
    r1 = SensorStreamReader(p)
    for _ in range(STREAM_TICKS + 2):
        last = r1.latestOffset()
    assert last == {"tick": STREAM_TICKS}  # holds at the cap
    r2 = SensorStreamReader(p)  # "restart": new instance, same sidecar
    assert r2.latestOffset() == {"tick": STREAM_TICKS}  # no regression
    r3 = SensorStreamReader(None)  # no sidecar: process-local counter
    assert r3.latestOffset() == {"tick": 1}


def test_j18_tie_prefers_backward(spark, tmp_path):
    """Crafted exact tie: one view d µs BEFORE the purchase and one d µs
    AFTER — nearest must pick the BACKWARD view (the market-data
    convention the docstring claims and the twin's ORDER BY encodes)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00:00", "2024-01-01 10:20:00",
                 "2024-01-01 10:10:00"]
            ),
            "user_id": [7, 7, 7],
            "event_type": ["view", "view", "purchase"],
            "value": [0.0, 0.0, 5.0],
            "props": ["", "", ""],
        }
    )
    d = str(tmp_path / "crafted")
    os.makedirs(d)
    tbl = pa.Table.from_pandas(ev).set_column(
        1, "ts", pa.Table.from_pandas(ev)["ts"].cast(pa.timestamp("us"))
    )
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    rows = _j18_fn(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["view_id"] == 1 and r["direction"] == "backward"
    assert r["dist_us"] == 10 * 60 * 1_000_000
