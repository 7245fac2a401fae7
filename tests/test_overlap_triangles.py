"""Crafted-fixture pins for the round-4 tail queries:

- j14_interval_overlap_join: closed-interval edge cases the sf fixture
  cannot guarantee to exercise — touching endpoints (overlap 0), a
  same-hour-block DISJOINT pair (the block join must filter it), a
  multi-block session emitted exactly once, and the pinned midnight
  split of the day-partitioned incident sessionization.
- g3_triangle_count: a hand-built graph with one triangle above the
  shared-order threshold and one corner held below it.

Each test also replays the query's DuckDB twin on the same crafted
parquet, so the pins cover BOTH engines, not just Spark.
"""

from __future__ import annotations

import tempfile

import duckdb
import pyspark.sql.functions as F

from x8313_etl_spark.registry import registry


def _events_dir():
    """Micro events.parquet (full pinned schema, epoch-µs timestamps).

    Sessions (30-min gap, per user):
      u1: clicks 10:00, 10:10          → S1 [10:00, 10:10]
      u2: click  10:20:00.000001       → S2 point (between I1 and u1)
      u3: views 09:30..12:30 every 20m → S3 [09:30, 12:30] (4 hour blocks)
      u5: clicks 23:50 Jan1, 00:10 Jan2 → S5 spans midnight
      u99 (the error emitter): errors at 10:10, 10:15 / 12:00 /
          23:58 Jan1, 00:05 Jan2 → sessions [10:10,10:15], [12:00],
          [23:58, 00:05 Jan2] (user sessions do NOT split at midnight)
    Incidents (error events, 10-min gap, windows partitioned BY DAY):
      I1 [10:10, 10:15], I2 [12:00], I3 [23:58 Jan1] + I4 [00:05 Jan2]
      — the 7-min gap across midnight is split by the day partition.

    Expected pairs (closed-interval overlap), 9 total:
      S1×I1 (touching at 10:10 → overlap_us = 0)     u2×I1: DISJOINT,
      S3×I1, S3×I2,                                   same hour block
      u99[10:10,10:15]×I1, u99[12:00]×I2,
      S5×I3, S5×I4, u99[23:58,00:05]×I3, u99[23:58,00:05]×I4
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="x8313-j14-fix-")
    base = 1704067200_000_000  # 2024-01-01T00:00:00 epoch µs
    us = lambda h, m, s=0, u=0: ((h * 60 + m) * 60 + s) * 1_000_000 + u
    day = 86_400_000_000
    rows = [
        (1, us(10, 0), "click"),
        (1, us(10, 10), "click"),
        (2, us(10, 20, 0, 1), "click"),
        *[(3, us(9, 30) + i * us(0, 20), "view") for i in range(10)],  # → 12:30
        (5, us(23, 50), "click"),
        (5, day + us(0, 10), "click"),
        (99, us(10, 10), "error"),
        (99, us(10, 15), "error"),
        (99, us(12, 0), "error"),
        (99, us(23, 58), "error"),
        (99, day + us(0, 5), "error"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([base + r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")
    return d


def test_j14_crafted_edge_cases(spark):
    spec = registry()["j14_interval_overlap_join"]
    d = _events_dir()
    got = sorted(
        (r.user_id, str(r.s_start), str(r.i_start), r.overlap_us)
        for r in spec.fn(spark, d).collect()
    )
    assert len(got) == len(set(got)) == 9, got
    # touching endpoints → emitted with overlap 0
    assert (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 0) in got
    # disjoint same-block pair must NOT appear
    assert not any(u == 2 for u, *_ in got), got
    # the 4-block session emits exactly once per incident
    assert sum(1 for u, *_ in got if u == 3) == 2, got
    # midnight: day-partitioned incidents split, user sessions don't
    assert sum(1 for u, s, *_ in got if u == 5) == 2
    assert (
        sum(1 for u, s, *_ in got if u == 99 and s == "2024-01-01 23:58:00") == 2
    ), got
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        oracle = sorted(
            (int(u), str(ss), str(i0), int(o))
            for u, ss, _se, i0, _ie, o in con.execute(spec.oracle).fetchall()
        )
    finally:
        con.close()
    assert oracle == got


def _lineitem_dir():
    """lineitem.parquet with only the two columns g3 reads (the pinned
    scan null-fills the rest): suppliers 1,2,3 co-supply orders 1-30
    (≥ threshold 26 → triangle), supplier 4 joins only orders 1-10
    (below threshold → no edges)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="x8313-g3-fix-")
    ok, sk = [], []
    for o in range(1, 31):
        for s in (1, 2, 3):
            ok.append(o)
            sk.append(s)
        if o <= 10:
            ok.append(o)
            sk.append(4)
    tbl = pa.table(
        {
            "l_orderkey": pa.array(ok, pa.int64()),
            "l_suppkey": pa.array(sk, pa.int64()),
        }
    )
    pq.write_table(tbl, f"{d}/lineitem.parquet")
    return d


def test_g3_crafted_triangle(spark):
    spec = registry()["g3_triangle_count"]
    d = _lineitem_dir()
    got = sorted((r.s_suppkey, r.tri_cnt) for r in spec.fn(spark, d).collect())
    assert got == [(1, 1), (2, 1), (3, 1)], got
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')"
        )
        oracle = sorted(
            (int(s), int(c)) for s, c in con.execute(spec.oracle).fetchall()
        )
    finally:
        con.close()
    assert oracle == got


def _plan(spark, name: str, sf_dir: str) -> str:
    return (
        registry()[name]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_j14_plans_no_nested_loop(spark, sf_dir):
    """The blocking formulation must plan as an EQUI join on blk — a
    CartesianProduct/BroadcastNestedLoopJoin here means the interval
    predicate leaked into the join condition and the |A|×|B| trap is
    back."""
    plan = _plan(spark, "j14_interval_overlap_join", sf_dir)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_g3_plans_no_nested_loop(spark, sf_dir):
    """Pairing, wedge, and closure stages are all equi joins; the rank
    inequality must stay a post-join filter."""
    plan = _plan(spark, "g3_triangle_count", sf_dir)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_l10_one_prediction_per_probe(spark, sf_dir):
    """Exactly one winner row per probe; votes within [1, k]."""
    from x8313_etl_spark.queries.similarity_q import _KNN_K

    df = registry()["l10_knn_classify"].fn(spark, sf_dir)
    rows = df.collect()
    probes = [r.probe_id for r in rows]
    assert len(probes) == len(set(probes)) > 0
    assert all(1 <= r.votes <= _KNN_K for r in rows)
    assert all(r.correct in (0, 1) for r in rows)


def test_g3_quantile_threshold_is_sf_adaptive(spark):
    """The r4 verdict: a constant threshold (26) made the edge set EMPTY
    at sf0.1 by design, so the operator only ever exercised triangles at
    sf0.01. The P80 quantile threshold must yield non-empty edges at
    sf0.1 and non-empty triangle output at sf0.01 — both scales, same
    code path."""
    import pyspark.sql.functions as F

    from x8313_etl_spark.io import load_table
    from x8313_etl_spark.queries.graph_q import _TRI_QUANTILE

    li = load_table(spark, "/root/testdata/sf0.1", "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s1"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s2"))
    e0 = (
        a.join(b, ["ok"])
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count_distinct("ok").alias("shared"))
    )
    thr = e0.agg(
        F.ceil(F.expr(f"percentile(shared, {_TRI_QUANTILE})")).alias("thr")
    )
    n_edges = (
        e0.crossJoin(F.broadcast(thr))
        .filter(F.col("shared") >= F.col("thr"))
        .count()
    )
    assert n_edges > 0, "sf0.1 edge set is empty — threshold regressed to constant-like"

    corners = registry()["g3_triangle_count"].fn(spark, "/root/testdata/sf0.01")
    assert corners.count() > 0, "no triangle corners at sf0.01"
