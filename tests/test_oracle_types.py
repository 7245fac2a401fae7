"""Registry-wide oracle result-TYPE gate (r9 verdict item 2).

The r9 driver's only two red rows (p_rag_context_pack,
dq5_distribution_drift) shared one oracle-side bug: an uncast DuckDB
``sum()`` column, which returns HUGEINT (int128). Every result
transport renders int128 as a non-int64 value class (``fetchdf`` ->
float64 ``160.0``, arrow -> decimal128), so the driver's type-aware
value-hash flips while rows and schema match — and the local
``compare_query`` canonicalizer (int == float) was blind to it by
design. This module closes the class two ways:

1. A registry-wide sweep that PLANS every registered oracle in DuckDB
   (``con.sql(...)`` — no execution, seconds for the whole registry)
   and fails on any HUGEINT/UHUGEINT output column.
2. A demonstration that the gate would have caught dq5: the pre-fix
   oracle (casts reverted) is flagged, the registered one is clean.

``compare_query`` itself now runs the same gate per-query plus a
strict int-vs-float dtype check (tests/oracle_utils.py), so
pre-verification of future candidates hits it before the driver can.
"""

from __future__ import annotations

import pytest

from x8313_etl_spark.registry import registry

from .oracle_utils import duckdb_connect, oracle_int128_columns

_SPECS = registry()
_ORACLED = sorted(n for n, s in _SPECS.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def con(sf_oracle_dir):
    c = duckdb_connect(sf_oracle_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _ORACLED)
def test_no_int128_oracle_columns(con, name):
    bad = oracle_int128_columns(con.sql(_SPECS[name].oracle))
    assert not bad, (
        f"{name}: oracle output column(s) {bad} are int128 — DuckDB "
        "sum() over integers returns HUGEINT, whose transports "
        "(float64 / decimal128) flip the driver value-hash vs Spark's "
        "int64. CAST(... AS BIGINT) in the oracle SQL."
    )


def test_gate_catches_the_r9_bug(con):
    """Reverting dq5's casts must trip the gate (proves the sweep would
    have caught the r9 red row at authoring time)."""
    from x8313_etl_spark.queries.etl_q import _DRIFT_SQL

    assert not oracle_int128_columns(con.sql(_DRIFT_SQL))
    pre_fix = (
        _DRIFT_SQL.replace(
            "CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)",
            "sum(CASE WHEN is_ref THEN 1 ELSE 0 END)",
        )
        .replace(
            "CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)",
            "sum(CASE WHEN is_ref THEN 0 ELSE 1 END)",
        )
    )
    assert pre_fix != _DRIFT_SQL
    bad = oracle_int128_columns(con.sql(pre_fix))
    assert bad, "gate failed to flag the reverted (pre-fix) dq5 oracle"
    assert any(c in ("ref_cnt", "cur_cnt") for c, _ in bad)


def test_rag_pack_oracle_clean(con):
    from x8313_etl_spark.queries.corpus_q import _RAG_PACK_SQL

    assert not oracle_int128_columns(con.sql(_RAG_PACK_SQL))
