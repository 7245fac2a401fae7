"""Unit tests for operators/ingestdedup.py (streaming ingest dedup)."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
import pytest

from x8313_etl_spark.io import load_table
from x8313_etl_spark.operators.ingestdedup import IngestDedupSink

_MOD = 5


@pytest.fixture()
def split(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") % _MOD != 0),
        d.filter(F.col("doc_id") % _MOD == 0).select("doc_id", "text"),
    )


@pytest.fixture()
def state_dir(tmp_path):
    p = str(tmp_path / "state")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _verdicts(sink, spark):
    return {
        r["doc_id"]: (r["is_dup"], r["dup_of"], r["jaccard"])
        for r in sink.read_verdicts(spark).collect()
    }


def _id_ranges(batch, n):
    ids = sorted(r["doc_id"] for r in batch.select("doc_id").collect())
    size = (len(ids) + n - 1) // n
    return [set(ids[i * size : (i + 1) * size]) for i in range(n)]


def test_batch_split_invariance(spark, sf_dir, split, tmp_path):
    """Verdicts must not depend on micro-batch granularity (given
    id-ordered batch boundaries): one batch of everything == four
    id-range batches — the m3/m8 incremental-vs-full discipline."""
    index, batch = split
    one = IngestDedupSink(str(tmp_path / "one"))
    one.init_index(index)
    one.apply_batch(batch, 0)

    four = IngestDedupSink(str(tmp_path / "four"))
    four.init_index(index)
    for i, ids in enumerate(_id_ranges(batch, 4)):
        four.apply_batch(batch.filter(F.col("doc_id").isin(ids)), i)

    va, vb = _verdicts(one, spark), _verdicts(four, spark)
    assert va == vb
    assert any(v[0] for v in va.values())  # dup path exercised


def test_replay_is_idempotent(spark, split, state_dir):
    index, batch = split
    sink = IngestDedupSink(state_dir)
    sink.init_index(index)
    halves = _id_ranges(batch, 2)
    b0 = batch.filter(F.col("doc_id").isin(halves[0]))
    sink.apply_batch(b0, 0)
    before = _verdicts(sink, spark)
    cur = sink.current
    sink.apply_batch(b0, 0)  # replayed epoch: must be a no-op
    assert sink.current == cur
    assert _verdicts(sink, spark) == before
    sink.apply_batch(batch.filter(F.col("doc_id").isin(halves[1])), 1)
    assert len(_verdicts(sink, spark)) == len(before) + len(halves[1])


def test_within_batch_earlier_id_wins(spark, state_dir):
    """A doc is judged against smaller-id docs in its OWN batch: two
    identical texts in one batch → the larger id is the dup."""
    index = spark.createDataFrame(
        [(1, "totally unrelated index document text here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (20, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    sink = IngestDedupSink(state_dir)
    sink.init_index(index)
    sink.apply_batch(batch, 0)
    v = _verdicts(sink, spark)
    assert v[10][0] is False
    assert v[20] == (True, 10, 1.0)


def test_within_batch_hot_bucket_cap_bounds_self_join(spark, state_dir):
    """The hot-bucket cap applies to the WITHIN-batch self-join too
    (ADVICE r6): a band key shared by >cap docs inside one micro-batch
    must not pair quadratically — the candidate-supplying side drops
    the bucket, same posture as the accumulated-index guard."""
    batch = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in (1, 2, 3)],
        "doc_id long, text string",
    )
    index = spark.createDataFrame(
        [(0, "totally unrelated index document text here")],
        "doc_id long, text string",
    )
    capped = IngestDedupSink(state_dir + "_cap", max_bucket_size=1)
    capped.init_index(index)
    capped.apply_batch(batch, 0)
    v = _verdicts(capped, spark)
    assert all(not is_dup for is_dup, _, _ in v.values()), v

    # contrast: the default cap leaves exact within-batch dups intact
    free = IngestDedupSink(state_dir + "_free")
    free.init_index(index)
    free.apply_batch(batch, 0)
    v2 = _verdicts(free, spark)
    assert v2[1][0] is False and v2[2] == (True, 1, 1.0) and v2[3] == (True, 1, 1.0)
