"""Unit sanity checks for ops whose outputs have no exact oracle."""

from __future__ import annotations

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
