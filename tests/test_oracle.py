"""Driver-t2 mirror: every registered query vs its DuckDB twin at sf0.01."""

from __future__ import annotations

import pytest

from x8313_etl_spark.registry import registry

from .oracle_utils import compare_query

_SPECS = registry()


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_oracle(spark, sf_oracle_dir, name):
    res = compare_query(spark, _SPECS[name], sf_oracle_dir)
    assert res.ok, f"{name}: {res.detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) == 10


def test_contract_shapes():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in os_.values())
