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
