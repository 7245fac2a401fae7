"""Lloyd k-means (operators/kmeans.py): exact-bound tests against a
pure-Python integer mirror implementing the identical arithmetic
(fixed-grid floor quantization, smallest-vec_id seeding, (d², cid)
argmin tie-break, truncate-toward-zero mean, empty-cluster carry), so
the distributed loop is pinned round for round — the holt/g1
exact-mirror discipline."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings, strategies as st

from x8313_etl_spark.operators.kmeans import (
    lloyd_kmeans,
    quantize_vectors,
)


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _mirror(rows, k, rounds, scale):
    """(assign dict, centroids dict) — reference Lloyd loop on exact
    Python ints, identical conventions to the operator."""
    q = {
        vid: [math.floor(float(x) * float(scale) + 0.5) for x in vec]
        for vid, vec in rows
    }
    seeds = sorted(q)[:k]
    cents = {cid: list(q[vid]) for cid, vid in enumerate(seeds)}

    def assign_all():
        out = {}
        for vid, vec in q.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(vec, c)), cid)
                for cid, c in cents.items()
            )
            out[vid] = best[1]
        return out

    for _ in range(rounds):
        a = assign_all()
        new = {}
        for cid, c in cents.items():
            members = [q[v] for v, ci in a.items() if ci == cid]
            if not members:
                new[cid] = list(c)
            else:
                new[cid] = [
                    _tdiv(sum(col), len(members)) for col in zip(*members)
                ]
        cents = new
    return assign_all(), cents


def _df(spark, rows):
    return spark.createDataFrame(
        [(vid, [float(x) for x in vec]) for vid, vec in rows],
        "vec_id long, embedding array<float>",
    )


#: 3-d points in the fixture value range, three natural blobs plus
#: off-blob noise; negative coordinates exercise the truncating mean.
ROWS = [
    (1, (-0.40, -0.41, -0.39)),
    (2, (-0.38, -0.42, -0.40)),
    (3, (0.05, 0.04, 0.06)),
    (4, (0.06, 0.05, 0.03)),
    (5, (0.44, 0.43, 0.45)),
    (6, (0.45, 0.46, 0.44)),
    (7, (-0.10, 0.30, -0.20)),
    (8, (0.21, -0.33, 0.12)),
]


@pytest.mark.parametrize("k,rounds", [(2, 1), (3, 2), (4, 3)])
def test_matches_integer_mirror(spark, k, rounds):
    assign, cents = lloyd_kmeans(_df(spark, ROWS), k=k, rounds=rounds)
    ma, mc = _mirror(ROWS, k, rounds, 10**6)
    got_a = {r.vec_id: r.cid for r in assign.collect()}
    assert got_a == ma
    got_c = {r.cid: list(r.cv) for r in cents.collect()}
    assert got_c == mc


def test_quantization_is_floor_half_up(spark):
    df = _df(spark, [(1, (0.4583735167980194, -0.5252062082290649, 0.0))])
    got = quantize_vectors(df).collect()[0].qv
    f = [0.4583735167980194, -0.5252062082290649, 0.0]
    # float32 storage round-trips through the parquet float path
    import struct

    f32 = [struct.unpack("f", struct.pack("f", x))[0] for x in f]
    assert list(got) == [math.floor(x * 1e6 + 0.5) for x in f32]


def test_tie_breaks_to_smallest_cid(spark):
    # seeds are vec_ids 1 and 2 at -1e-3 and +1e-3; vec 3 at exactly 0
    # is equidistant on the integer grid -> must go to cid 0
    rows = [(1, (-0.001,)), (2, (0.001,)), (3, (0.0,))]
    assign, _ = lloyd_kmeans(_df(spark, rows), k=2, rounds=0)
    got = {r.vec_id: r.cid for r in assign.collect()}
    assert got[3] == 0


def test_empty_cluster_keeps_previous_centroid(spark):
    # both points collapse onto seed 0 after round 1; seed 1's centroid
    # must survive verbatim (the Lloyd carry convention)
    rows = [(1, (0.10, 0.10)), (2, (0.10, 0.10)), (3, (0.11, 0.11))]
    # k=3 seeds are all three vectors; after one round vec 3 joins the
    # 0.10 blob only if nearest -- craft instead an explicit carry:
    assign, cents = lloyd_kmeans(_df(spark, rows), k=3, rounds=2)
    ma, mc = _mirror(rows, 3, 2, 10**6)
    assert {r.cid: list(r.cv) for r in cents.collect()} == mc
    assert {r.vec_id: r.cid for r in assign.collect()} == ma


def test_deterministic_across_runs(spark):
    df = _df(spark, ROWS).repartition(5)
    a1, c1 = lloyd_kmeans(df, k=3, rounds=2)
    a2, c2 = lloyd_kmeans(df, k=3, rounds=2)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    assert {r.cid: list(r.cv) for r in c1.collect()} == {
        r.cid: list(r.cv) for r in c2.collect()
    }


def test_fixture_clusters_nontrivial(spark, sf_oracle_dir):
    from x8313_etl_spark.io import load_table

    vecs = load_table(spark, sf_oracle_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    assign, cents = lloyd_kmeans(vecs, k=8, rounds=2)
    sizes = [r.n for r in assign.groupBy("cid").agg(F.count("*").alias("n")).collect()]
    assert len(sizes) >= 2, "fixture must split into multiple clusters"
    assert sum(sizes) == vecs.count()


_coord = st.integers(min_value=-520000, max_value=460000).map(lambda q: q / 1e6)
_vec = st.tuples(_coord, _coord, _coord)


@given(
    vecs=st.lists(_vec, min_size=3, max_size=12, unique=True),
    k=st.integers(min_value=2, max_value=4),
    rounds=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=8, deadline=None)
def test_property_matches_mirror(spark, vecs, k, rounds):
    rows = [(i + 1, v) for i, v in enumerate(vecs)]
    assign, cents = lloyd_kmeans(_df(spark, rows), k=min(k, len(rows)), rounds=rounds)
    ma, mc = _mirror(rows, min(k, len(rows)), rounds, 10**6)
    assert {r.vec_id: r.cid for r in assign.collect()} == ma
    assert {r.cid: list(r.cv) for r in cents.collect()} == mc
