"""Fixture-nontriviality guards for round-7 registered queries.

The oracle compare (tests/test_oracle.py) proves VALUE equality; these
pin that the fixtures actually EXERCISE the interesting regime — the
g3/g5 lesson that a threshold can silently trivialize an operator when
the fixture regenerates at a different sf.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from x8313_etl_spark import audit


@pytest.fixture(autouse=True, scope="module")
def _scrub_ledger_keys():
    """The cap-sufficiency replay routes delta_stepping merges through
    its own test-only ledger keys; forget everything this module
    introduced so the materialization gate still audits registered
    queries only (the test_r7_candidates.py protocol)."""
    before = set(audit.ledger())
    yield
    for key in set(audit.ledger()) - before:
        audit.forget(key)


def test_g8_light_round_cap_suffices_on_fixtures(spark, sf_dir, sf_oracle_dir):
    """g8's fixed light-round cap=2 must reach the same settled set as
    the full Δ fixpoint schedule at every fixture sf (the
    cap-sufficiency verification the operator docstring demands; the
    registered twin unrolls exactly the capped schedule, so this is
    what keeps capped-schedule == true-distances)."""
    from x8313_etl_spark.operators.sssp import delta_stepping
    from x8313_etl_spark.queries.graph_q import (
        _G8_BUCKETS,
        _G8_LIGHT_ROUNDS,
        _SSSP_SEED_MOD,
        _g8_edges,
    )

    for d in (sf_dir, sf_oracle_dir):
        eu = _g8_edges(spark, d, f"g8.capcheck.{d}").persist()
        delta = int(
            eu.agg(F.ceil(F.expr("percentile(w, 0.5)")).alias("d")).first()["d"]
        )
        seeds = (
            eu.select(F.col("src").alias("node"))
            .distinct()
            .filter(F.col("node") % _SSSP_SEED_MOD == 0)
        )
        capped = sorted(
            map(tuple, delta_stepping(
                eu, seeds, delta, _G8_BUCKETS, light_rounds=_G8_LIGHT_ROUNDS
            ).collect())
        )
        full = sorted(
            map(tuple, delta_stepping(eu, seeds, delta, _G8_BUCKETS).collect())
        )
        assert capped == full, d
        eu.unpersist()


def test_p_semdedup_prune_actually_prunes(spark, sf_oracle_dir):
    """τ=0.30 must drop at least one within-cluster near-duplicate on
    the oracle fixture — a τ above every within-cluster cosine would
    pass the value compare while testing nothing."""
    from x8313_etl_spark.queries.similarity_q import p_semdedup_prune

    sdf = p_semdedup_prune(spark, sf_oracle_dir).toPandas()
    assert sdf.n_dropped.sum() > 0, "tau too high: nothing pruned"


def test_p_substr_dedup_spans_nontrivial(spark, sf_oracle_dir):
    """k=8 must flag a non-trivial share of duplicated positions on the
    fixture (measured ~10% at every sf when registered)."""
    from x8313_etl_spark.queries.pipeline_q import p_substr_dedup_spans

    sdf = p_substr_dedup_spans(spark, sf_oracle_dir).toPandas()
    assert len(sdf) > 0 and sdf.n_dup_grams.sum() > 0


def test_p_er_blocked_multikey_band_alone_is_incomplete(spark, sf_oracle_dir):
    """The band family ALONE must miss matches on the live fixture (the
    2-char truncations fall outside the +1 length band) — the reason
    the multikey union exists. The q-gram family is measured COMPLETE
    on this truncation model (pinned below so a fixture regen that
    breaks it is loud); its own failure modes are crafted cases in
    tests/test_blocking.py."""
    from x8313_etl_spark.operators.blocking import (
        band_block_pairs,
        best_match,
        qgram_block_pairs,
    )
    from x8313_etl_spark.io import load_table
    from x8313_etl_spark.queries.pipeline_q import p_er_blocked_multikey

    part = load_table(spark, sf_oracle_dir, "part")
    dirty = part.filter(F.col("p_partkey") % 10 == 0).select(
        F.col("p_partkey").alias("probe_id"),
        F.expr(
            "substr(p_name, 1, length(p_name) - "
            "(CASE WHEN p_partkey % 20 = 0 THEN 1 ELSE 2 END))"
        ).alias("dirty_name"),
    )
    dnames = dirty.select("dirty_name").distinct()
    cnames = part.groupBy("p_name").agg(F.min("p_partkey").alias("cand_id"))
    full = p_er_blocked_multikey(spark, sf_oracle_dir).count()
    band_only = dirty.join(
        best_match(band_block_pairs(dnames, cnames), max_score=3), "dirty_name"
    ).count()
    qgram_only = dirty.join(
        best_match(qgram_block_pairs(dnames, cnames), max_score=3), "dirty_name"
    ).count()
    assert full > 0
    assert full > band_only, "band blocker alone already complete"
    # measured property of the truncation model (sf0.001/0.01/0.1):
    # padded q-grams alone recover every match — if a fixture regen
    # breaks this, the union still covers, but the docstring's recall
    # story must be re-measured (loud, not silent)
    assert qgram_only == full, (qgram_only, full)
