"""Tests for operators/negsample.py: the distributed sampler must match
a driver-side mirror of the identical md5 arithmetic, never emit a
positive, stay within k per query, and be deterministic."""

from __future__ import annotations

import hashlib

from x8313_etl_spark.operators.negsample import FP_MOD, negative_samples

K = 3
OVER = 2


def _ref(query_ids, cand_ids, pos, k=K, over=OVER):
    cands = sorted(cand_ids)
    n = len(cands)
    out = {}
    for q in query_ids:
        first = {}
        for i in range(over * k):
            h = int(hashlib.md5(f"{q}:{i}".encode()).hexdigest()[:15], 16) % FP_MOD
            c = cands[h % n]
            if (q, c) in pos:
                continue
            first.setdefault(c, i)
        ranked = sorted(first.items(), key=lambda t: t[1])[:k]
        out[q] = [(c, r + 1) for r, (c, _) in enumerate(ranked)]
    return out


def _run(spark, query_ids, cand_ids, pos, key):
    q = spark.createDataFrame([(x,) for x in query_ids], "qid bigint")
    c = spark.createDataFrame([(x,) for x in cand_ids], "cid bigint")
    p = spark.createDataFrame(
        list(pos) or [(-1, -1)], "qid bigint, cid bigint"
    )
    got = {}
    for r in negative_samples(
        q, c, p, K, q_col="qid", cand_col="cid", rank_key=key, over_factor=OVER
    ).collect():
        got.setdefault(r.qid, []).append((r.cand_id, r.draw_rank))
    return {k2: sorted(v, key=lambda t: t[1]) for k2, v in got.items()}


def test_matches_driver_mirror_and_excludes_positives(spark):
    query_ids = [100, 200, 300]
    cand_ids = list(range(10, 30))
    # make every query's first natural draw a positive, forcing skips
    natural = _ref(query_ids, cand_ids, set())
    pos = {(q, natural[q][0][0]) for q in query_ids}
    got = _run(spark, query_ids, cand_ids, pos, "negsample.test1")
    ref = _ref(query_ids, cand_ids, pos)
    assert got == {q: v for q, v in ref.items() if v}
    for q, pairs in got.items():
        assert len(pairs) <= K
        assert all((q, c) not in pos for c, _ in pairs)


def test_deterministic_across_runs(spark):
    query_ids = list(range(5))
    cand_ids = list(range(50, 90))
    a = _run(spark, query_ids, cand_ids, set(), "negsample.test2a")
    b = _run(spark, query_ids, cand_ids, set(), "negsample.test2b")
    assert a == b
