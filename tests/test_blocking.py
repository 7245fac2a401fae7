"""Multi-key ER blocking (operators/blocking.py): the q-gram key
recovers corruption modes the length-band key misses, the union is
deduped, and on the registered query's own corruption model the
multi-key result equals the single-key result."""

from __future__ import annotations

import pyspark.sql.functions as F

from x8313_etl_spark.operators.blocking import (
    band_block_pairs,
    best_match,
    multikey_candidates,
    qgram_block_pairs,
)

CATALOG = [
    ("small ring", 1), ("small gear", 2), ("red widget", 3),
    ("red washer", 4), ("blue bolt", 5), ("small ring", 6),  # dup name
]


def _cnames(spark):
    return (
        spark.createDataFrame(CATALOG, "p_name string, k long")
        .groupBy("p_name")
        .agg(F.min("k").alias("cand_id"))
    )


def _dnames(spark, names):
    return spark.createDataFrame([(n,) for n in names], "dirty_name string")


def test_qgram_key_recovers_what_the_band_key_misses(spark):
    # "small ri" dropped TWO chars: the +1 length band misses it,
    # shared 3-grams ("sma", "rin"... ) still propose the right name
    dn = _dnames(spark, ["small ri"])
    cn = _cnames(spark)
    band = band_block_pairs(dn, cn)
    assert band.count() == 0, "precondition: band key must miss a 2-drop"
    multi = multikey_candidates(band, qgram_block_pairs(dn, cn))
    got = best_match(multi).collect()
    assert len(got) == 1
    assert got[0].matched_name == "small ring"
    assert got[0].cand_id == 1, "min-key representative of the dup name"


def test_multikey_equals_single_key_on_its_own_corruption_model(spark):
    # standard 1-char drop: band key already proposes the true name;
    # adding the q-gram key must not change any best match (it can only
    # add WORSE-scoring candidates, and the dedup keeps pairs unique)
    dirty = [n[:-1] for n, _ in CATALOG]
    dn = _dnames(spark, sorted(set(dirty)))
    cn = _cnames(spark)
    single = {
        r.dirty_name: (r.cand_id, r.matched_name, r.score)
        for r in best_match(band_block_pairs(dn, cn)).collect()
    }
    multi = {
        r.dirty_name: (r.cand_id, r.matched_name, r.score)
        for r in best_match(
            multikey_candidates(
                band_block_pairs(dn, cn), qgram_block_pairs(dn, cn)
            )
        ).collect()
    }
    assert single == multi
    assert len(single) == len(set(dirty))


def test_max_score_threshold_drops_unmatchable(spark):
    dn = _dnames(spark, ["zzzz qqqq"])  # nothing remotely close
    cn = _cnames(spark)
    multi = multikey_candidates(
        band_block_pairs(dn, cn), qgram_block_pairs(dn, cn)
    )
    assert best_match(multi, max_score=2).count() == 0


def test_qgram_padding_rescues_sub_q_remnants(spark):
    """A dirty remnant SHORTER than q must still find its source via the
    padded edge grams (unpadded q-grams would yield zero candidates for
    exactly the most-corrupted probes)."""
    dn = _dnames(spark, ["sm ring"])  # 'small' truncated below q=3
    cn = _cnames(spark)
    pairs = qgram_block_pairs(dn, cn)
    assert pairs.filter(F.col("p_name") == "small ring").count() == 1
    got = best_match(pairs).collect()
    assert got and got[0].matched_name == "small ring"
