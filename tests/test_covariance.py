"""Unit tests for operators/covariance.py against exact numpy mirrors."""

from __future__ import annotations

import numpy as np

from x8313_etl_spark.io import load_table
from x8313_etl_spark.operators.covariance import (
    DEFAULT_QSCALE,
    dim_comoment,
    full_matrix,
    pca_power_topvec,
)

DIM = 64


def _qmat(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    mat = np.vstack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in rows]
    )
    return np.floor(mat * DEFAULT_QSCALE).astype(object)  # python ints: no wrap


def _ref_comoment(q):
    n = len(q)
    out = {}
    s = q.sum(axis=0)
    for i in range(DIM):
        for j in range(i, DIM):
            sxy = int((q[:, i] * q[:, j]).sum())
            out[(i + 1, j + 1)] = (n, n * sxy - int(s[i]) * int(s[j]))
    return out


def _tdiv(a, b):
    qq = abs(a) // abs(b)
    return qq if (a >= 0) == (b >= 0) else -qq


def test_dim_comoment_matches_numpy_exactly(spark, sf_dir):
    q = _qmat(spark, sf_dir)
    ref = _ref_comoment(q)
    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        (r["i"], r["j"]): (r["n"], r["cov_num"])
        for r in dim_comoment(emb, dim=DIM).collect()
    }
    assert got == ref


def _ref_power(ref_com, rounds=4, scale=10**6, cdiv=10**3):
    c = np.zeros((DIM, DIM), dtype=object)
    for (i, j), (_, num) in ref_com.items():
        c[i - 1, j - 1] = _tdiv(num, cdiv)
        c[j - 1, i - 1] = _tdiv(num, cdiv)
    v = [scale] * DIM
    for _ in range(rounds):
        raw = [sum(int(c[i, j]) * v[j] for j in range(DIM)) for i in range(DIM)]
        m = max(abs(x) for x in raw)
        v = [_tdiv(x, _tdiv(m, scale) + 1) for x in raw]
    return v


def test_power_iteration_matches_integer_mirror(spark, sf_dir):
    q = _qmat(spark, sf_dir)
    ref_com = _ref_comoment(q)
    ref_v = _ref_power(ref_com)
    emb = load_table(spark, sf_dir, "embeddings")
    com = dim_comoment(emb, dim=DIM)
    got = {
        r["i"]: r["v"]
        for r in pca_power_topvec(
            full_matrix(com), DIM, ledger_key="test.cov.power"
        ).collect()
    }
    assert [got[i + 1] for i in range(DIM)] == ref_v
    # int64 headroom: the matvec terms must sit far from overflow
    max_c = max(abs(_tdiv(num, 10**3)) for _, num in ref_com.values())
    assert DIM * max_c * (10**6 + 1) < 2**62


def test_integer_rounds_track_float_power_iteration(spark, sf_dir):
    """The truncating-integer iterate must stay aligned with the FLOAT
    power iterate after the same number of rounds — quantized division
    may not derail the direction. (Alignment with the true eigenvector
    is spectrum-dependent and near-flat on the isotropic fixture —
    λ₂/λ₁ ≈ 1 — so convergence SPEED is deliberately not asserted; the
    operator contract is the exact fixed-round schedule.)"""
    q = _qmat(spark, sf_dir)
    ref_com = _ref_comoment(q)
    c = np.zeros((DIM, DIM))
    for (i, j), (_, num) in ref_com.items():
        c[i - 1, j - 1] = c[j - 1, i - 1] = float(_tdiv(num, 10**3))
    vf = np.ones(DIM)
    for _ in range(4):
        vf = c @ vf
        vf = vf / np.abs(vf).max()
    vi = np.array([float(x) for x in _ref_power(ref_com)])
    cos = abs(vi @ vf) / (np.linalg.norm(vi) * np.linalg.norm(vf))
    assert cos > 0.999, cos


def test_comoment_int64_guard_raises_on_overflow_risk(spark):
    """cov_num = n·Σqq − Σqi·Σqj grows ~n²·(max|q|)² (ADVICE r6): past
    the documented 2·n²·max|qi|·max|qj| ≤ 2⁶² headroom the operator
    must RAISE in-plan, never wrap silently."""
    import pytest

    emb = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    out = dim_comoment(emb, dim=2, qscale=10**9)
    with pytest.raises(Exception, match="overflow"):
        out.collect()


def test_comoment_guard_passes_within_headroom(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["i"], r["j"]): (r["n"], r["cov_num"])
        for r in dim_comoment(emb, dim=2, qscale=1000).collect()
    }
    # exact mirror: q = [[1000,2000],[3000,4000]]
    assert got[(1, 1)] == (2, 2 * (1000 * 1000 + 3000 * 3000) - 4000 * 4000)
    assert got[(1, 2)] == (2, 2 * (1000 * 2000 + 3000 * 4000) - 4000 * 6000)
    assert got[(2, 2)] == (2, 2 * (2000 * 2000 + 4000 * 4000) - 6000 * 6000)
