"""Relating the bucketed semantic-dedup primary to its exact baseline.

p_semantic_dedup_lsh's own correctness gate is its band-aware DuckDB
twin (transitive closure over banded edges). These tests pin the
STRUCTURAL facts that make the bucketed form a sound substitute for the
exact one, so a future banding change that silently destroys them fails
here rather than shipping as "still matches its own twin":

1. precision 1.0 — every LSH-candidate pair that survives the exact
   cosine verify is a true near-dup pair (subset of the exact graph);
2. refinement — LSH edges being a subset of exact edges, every LSH
   cluster must sit INSIDE one exact cluster (banding can split a
   cluster by missing a bridge pair, never merge two);
3. recall at the DESIGN POINT — on constructed true near-dups
   (cos ≥ 0.95, the regime semantic dedup exists for) the 4×8 banding
   must recover ≥ 85% of planted pairs. The fixture's own τ=0.4 pairs
   are isotropic vectors at θ ≈ 60°+, where the LSH collision law
   p_pair = 1-(1-p^8)^L with p = 1-θ/π puts EVERY sub-quadratic
   candidate generator near zero recall (measured here: 2×8 banding
   0.07, IVF nprobe=1 0.19 at sf0.01) — that regime is the exact
   baseline's job and is asserted only as a non-zero tripwire.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from x8313_etl_spark.queries.similarity_q import (
    _DEDUP_BANDS,
    _NEARDUP_TAU,
    HYPERPLANES32,
    _lsh_verified_pairs,
    banded_verified_pairs,
)
from x8313_etl_spark.registry import registry


def _fixture_lsh_pairs(spark, sf_dir):
    return _lsh_verified_pairs(
        spark,
        sf_dir,
        _NEARDUP_TAU,
        planes=HYPERPLANES32,
        n_bands=_DEDUP_BANDS,
        pool_key="similarity.lsh32_sketch",
    ).select("vec_a", "vec_b")


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    reg = registry()
    exact_pairs = (
        reg["sim_neardup_exact"].fn(spark, sf_dir).select("vec_a", "vec_b")
    )
    lsh_pairs = _fixture_lsh_pairs(spark, sf_dir)
    exact_clusters = reg["p_semantic_dedup"].fn(spark, sf_dir)
    lsh_clusters = reg["p_semantic_dedup_lsh"].fn(spark, sf_dir)
    return exact_pairs, lsh_pairs, exact_clusters, lsh_clusters


def test_lsh_pairs_subset_of_exact(frames):
    exact_pairs, lsh_pairs, _, _ = frames
    # sim_neardup_exact uses the same tau (0.4 == _NEARDUP_TAU) — the
    # verify stage makes precision exactly 1.0 by construction
    extra = lsh_pairs.join(exact_pairs, ["vec_a", "vec_b"], "left_anti").count()
    assert extra == 0, f"{extra} LSH pairs not in the exact graph"


def _hash_unit(tag: str, i: int, dim: int = 64) -> list[float]:
    """Deterministic pseudo-random vector component-wise from md5."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{tag}-{i}-{d}".encode()).hexdigest()
        out.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    return out


def test_lsh_recall_at_design_point(spark):
    """Planted near-dups at cos ≈ 0.99 (base + 0.15·noise): the 32-plane
    4×8 banding must recover ≥ 85% of the planted pairs through the
    full candidate+verify core, amid 2× random distractors. Collision
    law predicts ~0.99 here."""
    n_dups, n_noise, eps = 60, 120, 0.15
    rows = []
    for i in range(n_dups):
        base = _hash_unit("sd-base", i)
        noise = _hash_unit("sd-noise", i)
        dup = [b + eps * g for b, g in zip(base, noise)]
        rows.append((i, base))
        rows.append((i + 1000, dup))
    for i in range(n_noise):
        rows.append((i + 5000, _hash_unit("sd-distract", i)))
    raw = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    found = (
        banded_verified_pairs(
            raw,
            0.9,
            planes=HYPERPLANES32,
            n_bands=_DEDUP_BANDS,
            pool_key="test.semdedup_recall",
        )
        .filter((F.col("vec_a") < 1000) & (F.col("vec_b") == F.col("vec_a") + 1000))
        .count()
    )
    recall = found / n_dups
    assert recall >= 0.85, f"design-point recall collapsed: {found}/{n_dups}"


def test_lsh_recall_fixture_tripwire(frames):
    """τ=0.4 isotropic pairs: low recall is the math, zero recall is a
    broken sketch/band join — assert the machinery still finds some."""
    exact_pairs, lsh_pairs, _, _ = frames
    n_exact = exact_pairs.count()
    n_lsh = lsh_pairs.count()
    assert n_exact > 0, "fixture has no near-dup pairs — test is vacuous"
    assert n_lsh > 0, "banded candidate+verify found NOTHING — machinery broken"


def test_lsh_clusters_refine_exact_clusters(frames):
    _, _, exact_clusters, lsh_clusters = frames
    joined = (
        lsh_clusters.select("vec_id", F.col("cluster_id").alias("lsh_c"))
        .join(
            exact_clusters.select("vec_id", F.col("cluster_id").alias("ex_c")),
            "vec_id",
        )
    )
    # every LSH cluster maps into exactly one exact cluster
    split = (
        joined.groupBy("lsh_c")
        .agg(F.count_distinct("ex_c").alias("n_exact"))
        .filter(F.col("n_exact") > 1)
        .count()
    )
    assert split == 0, f"{split} LSH clusters span multiple exact clusters"
