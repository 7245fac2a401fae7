"""Tests for operators/constraints.py: every check kind against a
hand-computable frame, plus a property test of the row-level kinds
against a Python reference on random data."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from x8313_etl_spark.operators.constraints import Check, audit

_SETTINGS = dict(max_examples=8, deadline=None)


def _by_check(rows):
    return {r.check: r for r in rows}


def test_all_kinds_on_a_known_frame(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "aa", "x"),
            (2, -5, "bb", "y"),
            (2, 300, None, "z"),
            (None, 50, "c3", "x"),
        ],
        "id int, v int, s string, tag string",
    )
    ref = spark.createDataFrame([("x",), ("y",)], "tag string")
    got = _by_check(
        audit(
            df,
            [
                Check("id_not_null", "not_null", "id"),
                Check("id_unique", "unique", "id"),
                Check("v_min", "min", "v", value=0),
                Check("v_max", "max", "v", value=100),
                Check("s_matches", "matches", "s", pattern="^[a-z]{2}$"),
                Check("tag_in", "in_set", "tag", values=("x", "y")),
                Check("v_lt_id100", "expr", predicate="v < id * 100"),
                Check("tag_fk", "ref", "tag", ref_df=ref, ref_col="tag"),
            ],
        ).collect()
    )
    assert all(r.total == 4 for r in got.values())
    assert got["id_not_null"].violations == 1
    assert got["id_unique"].violations == 1  # id=2 twice
    assert got["v_min"].violations == 1  # -5
    assert got["v_max"].violations == 1  # 300
    assert got["s_matches"].violations == 1  # "c3" (null s passes)
    assert got["tag_in"].violations == 1  # "z"
    # v < id*100: (10<100 ok, -5<200 ok, 300<200 VIOL, null id -> null
    # predicate -> VIOL)
    assert got["v_lt_id100"].violations == 2
    assert got["tag_fk"].violations == 1  # "z" row; nulls would pass
    assert got["id_not_null"].passed is False
    assert _by_check(
        audit(df, [Check("v_min0", "min", "v", value=-100)]).collect()
    )["v_min0"].passed is True


def test_duplicate_names_and_empty_suite_raise(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError):
        audit(df, [Check("a", "not_null", "id"), Check("a", "min", "id", value=0)])
    with pytest.raises(ValueError):
        audit(df, [])


_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-20, max_value=20)),
        st.sampled_from(["aa", "bb", "zz9"]),
    ),
    min_size=1,
    max_size=15,
)


@settings(**_SETTINGS)
@given(rows=_rows, lo=st.integers(min_value=-10, max_value=10))
def test_row_checks_match_python_reference(spark, rows, lo):
    df = spark.createDataFrame(rows, "v int, s string")
    got = _by_check(
        audit(
            df,
            [
                Check("nn", "not_null", "v"),
                Check("uq", "unique", "v"),
                Check("mn", "min", "v", value=lo),
                Check("rx", "matches", "s", pattern="^[a-z]+$"),
            ],
        ).collect()
    )
    vs = [v for v, _ in rows]
    nonnull = [v for v in vs if v is not None]
    assert got["nn"].violations == sum(v is None for v in vs)
    assert got["uq"].violations == len(nonnull) - len(set(nonnull))
    assert got["mn"].violations == sum(v < lo for v in nonnull)
    assert got["rx"].violations == sum(not s.isalpha() for _, s in rows)
    assert all(r.total == len(rows) for r in got.values())


def test_ref_check_with_no_violations_reports_zero(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "k int")
    ref = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    r = audit(df, [Check("fk", "ref", "k", ref_df=ref, ref_col="k")]).collect()[0]
    assert (r.violations, r.total, r.passed) == (0, 3, True)


def test_empty_table_reports_zero_violations_and_passes(spark):
    df = spark.createDataFrame([], "id int, s string")
    got = _by_check(
        audit(
            df,
            [
                Check("nn", "not_null", "id"),
                Check("uq", "unique", "id"),
                Check("rx", "matches", "s", pattern="[a-z]+"),
            ],
        ).collect()
    )
    for r in got.values():
        assert (r.violations, r.total, r.passed) == (0, 0, True), r


def test_matches_is_full_match_not_substring_search(spark):
    # '[0-9]{3}' unanchored: 'ab123cd' CONTAINS a match but is not a
    # full match — the documented contract counts it as a violation.
    df = spark.createDataFrame([("ab123cd",), ("123",)], "s string")
    r = audit(df, [Check("fmt", "matches", "s", pattern="[0-9]{3}")]).collect()[0]
    assert r.violations == 1


def test_non_identifier_names_are_rejected(spark):
    df = spark.createDataFrame([(1,)], "id int")
    for bad in ("o'brien", "has space", "_total", "1num"):
        with pytest.raises(ValueError):
            audit(df, [Check(bad, "not_null", "id")])
