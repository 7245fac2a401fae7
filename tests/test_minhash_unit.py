"""Unit semantics for the MinHash LSH pipeline on crafted corpora
(the fixture-level behavior is oracle-checked; these pin the edge
semantics)."""

from __future__ import annotations

from x8313_etl_spark.operators.minhash import near_dup_pairs


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_duplicates_found_with_jaccard_one(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(spark, [base, base, "one two three four five six seven"])
    got = {(r.doc_a, r.doc_b): r.jaccard for r in near_dup_pairs(docs, cache=False).collect()}
    assert got == {(0, 1): 1.0}


def test_near_duplicate_found_disjoint_not(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = a + " lambda"  # one appended word → high shingle overlap
    c = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    got = {(r.doc_a, r.doc_b) for r in near_dup_pairs(_docs(spark, [a, b, c]), cache=False).collect()}
    assert (0, 1) in got
    assert all(2 not in pair for pair in got)


def test_short_docs_yield_no_pairs(spark):
    # < 3 words → empty shingle set → null signature → never a candidate
    docs = _docs(spark, ["one two", "one two", "x y"])
    assert near_dup_pairs(docs, cache=False).count() == 0
