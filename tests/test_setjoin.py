"""Tests for operators/setjoin.py: the prefix-filtered exact similarity
join must equal brute-force all-pairs Jaccard (property test on random
corpora), the prefix filter must be sound AND strictly prune, and the
fixture run pins a real pruning ratio."""

from __future__ import annotations

from fractions import Fraction

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from x8313_etl_spark.operators.setjoin import (
    prefix_candidates,
    similarity_join,
    token_sets,
)

_SETTINGS = dict(max_examples=8, deadline=None)

_doc = st.lists(st.sampled_from(list("abcdefgh")), min_size=1, max_size=8)
_corpus = st.lists(_doc, min_size=2, max_size=8)
_T = (7, 10)


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id bigint, text string",
    )


def _brute(docs, t_num, t_den):
    out = []
    sets = [set(d) for d in docs]
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            i = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if u and Fraction(i, u) >= Fraction(t_num, t_den):
                out.append((a, b, i, u))
    return sorted(out)


@settings(**_SETTINGS)
@given(docs=_corpus)
def test_join_matches_bruteforce(spark, docs):
    got = sorted(
        (r.doc_a, r.doc_b, r.inter, r.uni)
        for r in similarity_join(_df(spark, docs), *_T).collect()
    )
    assert got == _brute(docs, *_T)


@settings(**_SETTINGS)
@given(docs=_corpus)
def test_prefix_filter_is_sound(spark, docs):
    # Every true pair must appear among the candidates (the theorem);
    # never test the reverse — candidates MAY exceed the answer.
    sets = token_sets(_df(spark, docs))
    cand = {
        (r.doc_a, r.doc_b) for r in prefix_candidates(sets, *_T).collect()
    }
    for a, b, _, _ in _brute(docs, *_T):
        assert (a, b) in cand, (a, b, docs)


def test_prefix_filter_prunes_the_stopword_quadratic(spark):
    # 30 docs all sharing one stopword, otherwise disjoint: the naive
    # inverted index generates all 435 pairs off the stopword; the
    # rarest-first prefix keeps the stopword OUT of every prefix (each
    # doc has rarer tokens to spend its prefix on), so candidates and
    # answer are both empty.
    docs = [["the", f"u{i}", f"v{i}", f"w{i}", f"x{i}"] for i in range(30)]
    sets = token_sets(_df(spark, docs))
    assert prefix_candidates(sets, *_T).count() == 0
    assert similarity_join(_df(spark, docs), *_T).count() == 0


def test_fixture_run_finds_pairs_and_prunes(spark, sf_dir):
    # 3-shingle universe (the registered-query posture: word sets
    # saturate on the small-vocab corpus — see token_sets docstring).
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sets = token_sets(docs, shingle_k=3).persist()
    n_docs = sets.count()
    cand = prefix_candidates(sets, 1, 2).count()  # t = 0.5
    pairs = similarity_join(docs, 1, 2, shingle_k=3)
    n_pairs = pairs.count()
    all_pairs = n_docs * (n_docs - 1) // 2
    # The planted near-dups must surface, the candidates must strictly
    # prune the quadratic, and the verified answer is a subset.
    assert 0 < n_pairs <= cand < all_pairs, (n_pairs, cand, all_pairs)
    sets.unpersist()


def test_out_of_range_thresholds_are_rejected(spark):
    import pytest

    df = _df(spark, [["a", "b"]])
    with pytest.raises(ValueError):
        similarity_join(df, 0, 1)  # t=0: prefix theorem vacuous
    with pytest.raises(ValueError):
        similarity_join(df, 2, 1)  # t>1: negative prefix length
