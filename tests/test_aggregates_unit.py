"""Unit sanity checks for ops whose outputs have no exact oracle."""

from __future__ import annotations

import pyspark.sql.functions as F

from x8313_etl_spark.registry import registry


def test_approx_count_distinct_sanity_bound(spark, sf_oracle_dir):
    """A4: the HLL estimate must sit within a guard band of the exact
    count it is computed alongside (rows-only in the driver check;
    bounded here). rsd=0.02 → 10-sigma band at 20%."""
    spec = registry()["a4_approx_count_distinct"]
    rows = spec.fn(spark, sf_oracle_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_parts - r.exact_parts) <= max(5, 0.2 * r.exact_parts), (
            r.l_returnflag,
            r.approx_parts,
            r.exact_parts,
        )


def test_approx_percentile_error_bound(spark, sf_oracle_dir):
    """A9b: the KLL-style sketch at accuracy 10000 must land within 1% of
    the exact percentile (a9) per group — far looser than the sketch's
    0.01% rank-error guarantee, but enough to catch a wrong column or a
    broken accuracy parameter. a9 rounds to 6dp; irrelevant at this
    tolerance."""
    reg = registry()
    exact = {
        r.l_returnflag: r for r in reg["a9_percentiles"].fn(spark, sf_oracle_dir).collect()
    }
    approx = reg["a9b_approx_percentiles"].fn(spark, sf_oracle_dir).collect()
    assert len(approx) == len(exact) > 0
    for r in approx:
        e = exact[r.l_returnflag]
        for col in ("p50_price", "p95_price", "p25_qty"):
            a, x = getattr(r, col), getattr(e, col)
            assert abs(a - x) <= max(1e-6, 0.01 * abs(x)), (r.l_returnflag, col, a, x)


def test_hll_sketch_union_bound(spark, sf_oracle_dir):
    """A13: per-type sketch estimates must sit within a guard band of
    the exact per-type distinct user count, and the 'ALL' row — built by
    MERGING the five per-type sketch binaries, not by rescanning — must
    agree with the exact global distinct to the same band. This pins the
    mergeability property, which is the operator's whole point."""
    import pyspark.sql.functions as F

    from x8313_etl_spark.io import load_table

    spec = registry()["a13_hll_sketch_union"]
    got = {r.event_type: r.approx_users for r in spec.fn(spark, sf_oracle_dir).collect()}
    ev = load_table(spark, sf_oracle_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    exact["ALL"] = ev.select(F.countDistinct("user_id")).first()[0]
    assert set(got) == set(exact)
    for k, e in exact.items():
        assert abs(got[k] - e) <= max(3, 0.1 * e), (k, got[k], e)


def test_mergeable_moments_rollup_equals_rescan(spark, sf_oracle_dir):
    """A17's whole claim: merging (flag, status) partials up to flag
    gives BIT-IDENTICAL variance to computing per-flag from scratch
    (a8's var_qty over the same column). Exact ==, no tolerance —
    compared at a17's registered 6dp output quantization (added for
    driver-hash canonicalization in r4), applied to the rescan side by
    Spark's own round() so the quantizer itself is identical too."""
    reg = registry()
    rolled = {
        r.l_returnflag: r.var_qty
        for r in reg["a17_mergeable_moments"].fn(spark, sf_oracle_dir).collect()
    }
    direct = {
        r.l_returnflag: r.var_qty
        for r in reg["a8_statistical_aggs"]
        .fn(spark, sf_oracle_dir)
        .select("l_returnflag", F.round("var_qty", 6).alias("var_qty"))
        .collect()
    }
    assert set(rolled) == set(direct)
    for k in direct:
        assert rolled[k] == direct[k], (k, rolled[k], direct[k])


def test_sliding_dau_bound(spark, sf_oracle_dir):
    """ts_sliding_dau: every windowed HLL estimate must sit within a
    guard band of the exact trailing-7-day distinct count (computed here
    by brute force per day — fine at test scale, the thing the sketch
    exists to avoid at real scale)."""
    import pyspark.sql.functions as F

    from x8313_etl_spark.io import load_table

    got = {
        r.day_s: r.dau7
        for r in registry()["ts_sliding_dau"].fn(spark, sf_oracle_dir).collect()
    }
    ev = (
        load_table(spark, sf_oracle_dir, "events")
        .select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .collect()
    )
    import collections, datetime

    by_day = collections.defaultdict(set)
    for r in ev:
        by_day[r.day.date()].add(r.user_id)
    for day_s, est in got.items():
        d = datetime.date.fromisoformat(day_s)
        exact = len(
            set().union(
                *[by_day.get(d - datetime.timedelta(days=k), set()) for k in range(7)]
            )
        )
        assert abs(est - exact) <= max(3, 0.1 * exact), (day_s, est, exact)


def test_global_median_twophase_bracketing(spark, tmp_path):
    """a24's rank-position bracketing on literals: odd n (both positions
    coincide), even n (interpolated midpoint), including a half-cent
    midpoint — the case the cent-integer arithmetic exists for."""
    import pyspark.sql.functions as F

    from x8313_etl_spark.queries.aggregates import a24_global_median_twophase

    def run(vals):
        # io.load_table expects <dir>/lineitem.parquet as a single FILE
        # (it sniffs the footer for timestamp units) — write via pyarrow
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as papq

        p = tmp_path / f"li{len(vals)}_{abs(hash(tuple(vals))) % 10**6}"
        p.mkdir(exist_ok=True)
        tbl = pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "l_extendedprice": [float(v) for v in vals],
                    "l_orderkey": list(range(1, len(vals) + 1)),
                    "l_linenumber": list(range(1, len(vals) + 1)),
                }
            ),
            schema=pa.schema(
                [
                    ("l_extendedprice", pa.float64()),
                    ("l_orderkey", pa.int64()),
                    ("l_linenumber", pa.int32()),  # fixture width (schemas.py)
                ]
            ),
        )
        papq.write_table(tbl, str(p / "lineitem.parquet"))
        r = a24_global_median_twophase(spark, str(p)).collect()[0]
        return r.n_rows, r.median_lo, r.median_hi, r.median

    assert run([3.0, 1.0, 2.0]) == (3, 2.0, 2.0, 2.0)  # odd n
    assert run([4.0, 1.0, 2.0, 3.0]) == (4, 2.0, 3.0, 2.5)  # even n
    # half-cent midpoint: (2.01 + 2.02) / 2 = 2.015 via exact cents
    n, lo, hi, med = run([2.02, 1.0, 9.0, 2.01])
    assert (n, lo, hi) == (4, 2.01, 2.02)
    assert med == (201 + 202) / 200.0
