"""Pre-registration oracle checks — round-8-authored candidate batch F.

Same protocol as batch E (tests/test_r9_candidates.py): exact driver
compare on ad-hoc UNREGISTERED QuerySpecs; registration is a verbatim
fn+oracle copy. Batch F completes the Spark 4 Python DataSource story
(s17 batch read + s21-candidate stream read + x13 stream WRITE) and
the pandas-UDF surface (x14: the SCALAR_ITER variant, whose point is
amortized per-partition init).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pytest

from x8313_etl_spark import audit
from x8313_etl_spark.io import load_table, stream_events
from x8313_etl_spark.registry import QuerySpec

from .oracle_utils import compare_query


@pytest.fixture(autouse=True, scope="module")
def _scrub_ledger_keys():
    before = set(audit.ledger())
    yield
    for key in set(audit.ledger()) - before:
        audit.forget(key)


# ---------------------------------------------------------------------------
# x13_python_stream_sink — Spark 4 streaming Python DataSource WRITER
# ---------------------------------------------------------------------------


def _x13_fn(spark, sf_dir):
    """A custom streaming SINK through the Spark 4 Python DataSource
    API (DataSourceStreamWriter): executor-side ``write(iterator)``
    stages one JSON-lines file per task; driver-side
    ``commit(messages, batchId)`` publishes the batch ATOMICALLY by
    renaming the staged files into a ``v{batchId}`` dir, and a replayed
    batchId is an idempotent no-op — the upsert_sink/verdir per-epoch
    commit contract expressed through the extension point instead of
    foreachBatch (t15's sibling). The purchases stream is written
    through the sink, read back from the committed version dirs, and
    aggregated per user — so the twin (batch SQL over events) verifies
    the full write→publish→read-back loop including that every batch
    committed exactly once."""
    import glob
    import os
    import shutil
    import uuid as _uuid

    from x8313_etl_spark.python_ds import JsonDirStreamDataSource
    from x8313_etl_spark.queries.sources_q import _tag, scratch

    try:
        spark.dataSource.register(JsonDirStreamDataSource)
    except Exception:
        pass  # idempotent re-register within a session
    family = scratch(f"x13_jsonsink_{_tag(sf_dir)}")
    work = os.path.join(family, _uuid.uuid4().hex[:12])
    out, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")
    shutil.rmtree(work, ignore_errors=True)

    s = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    q = (
        s.writeStream.format("x8313_jsondir_sink")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("x13 sink stream did not finish in 180s")
    files = glob.glob(os.path.join(out, "v*", "part-*.jsonl"))
    back = spark.read.schema("event_id long, user_id long, cents long").json(
        files
    )
    return back.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("cents").alias("cents_total"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


_X13_SQL = """
SELECT user_id,
       count(*) AS n_purchases,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents_total,
       min(event_id) AS first_event,
       max(event_id) AS last_event
FROM events WHERE event_type = 'purchase'
GROUP BY user_id
"""


def test_python_stream_sink_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r9:x13_python_stream_sink",
        fn=_x13_fn,
        oracle=_X13_SQL,
        category="streaming",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_x13_sink_commit_is_idempotent(tmp_path):
    """Replaying a committed batchId must be a no-op (retry semantics):
    the version dir survives unchanged and the replay's staged files
    are dropped, not double-published."""
    import os

    from x8313_etl_spark.python_ds import JsonDirStreamWriter, _FileCommit

    base = str(tmp_path / "sink")
    os.makedirs(os.path.join(base, "_staging"))
    w = JsonDirStreamWriter(base)

    def staged(name, content):
        p = os.path.join(base, "_staging", name)
        with open(p, "w") as f:
            f.write(content)
        return _FileCommit(p)

    w.commit([staged("a.jsonl", '{"x": 1}\n')], batchId=0)
    v0 = os.path.join(base, "v0")
    assert sorted(os.listdir(v0)) == ["part-00000.jsonl"]
    # replay with DIFFERENT staged content: must not replace v0
    w.commit([staged("b.jsonl", '{"x": 2}\n')], batchId=0)
    assert sorted(os.listdir(v0)) == ["part-00000.jsonl"]
    assert open(os.path.join(v0, "part-00000.jsonl")).read() == '{"x": 1}\n'
    assert os.listdir(os.path.join(base, "_staging")) == []  # replay cleaned

    # abort drops staged files without publishing
    m = staged("c.jsonl", '{"x": 3}\n')
    w.abort([m], batchId=1)
    assert not os.path.exists(os.path.join(base, "v1"))
    assert os.listdir(os.path.join(base, "_staging")) == []


# ---------------------------------------------------------------------------
# x14_scalar_iter_udf — the SCALAR_ITER pandas UDF variant
# ---------------------------------------------------------------------------

_X14_SALTS = 256


def _x14_fn(spark, sf_dir):
    """The ITERATOR-of-series pandas UDF (SCALAR_ITER): same row
    semantics as x2's scalar pandas UDF, but the function receives the
    whole partition as an iterator of Arrow batches, so EXPENSIVE
    ONE-TIME INIT (a model, a codec table) runs once per partition
    instead of once per batch — the standard pattern for UDF-side model
    scoring. Here the 'model' is a 256-entry md5-derived salt table
    built once per partition; every batch then does vectorized integer
    arithmetic only. Output stays on the exact integer grid
    (salt + cents·10⁴ in micro-units), so the twin replays the identical
    algebra from the same md5 bytes."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    # NOTE: Iterator/pd live at MODULE level — pyspark resolves the
    # (stringified, PEP 563) type hints in the function's globals, so
    # function-local imports break SCALAR_ITER signature detection
    @pandas_udf("long")
    def enrich(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time per-partition init — the SCALAR_ITER point
        salts = [
            int(hashlib.md5(f"x14-{b}".encode()).hexdigest()[:8], 16)
            % 1_000_000
            for b in range(_X14_SALTS)
        ]
        for cents in batches:
            yield (cents % _X14_SALTS).map(lambda b: salts[int(b)]) + cents * 10_000

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return ev.select(
        "event_id", enrich(F.col("cents")).alias("enriched_micro")
    )


_X14_SQL = f"""
SELECT event_id,
       (CAST(CONCAT('0x', substr(md5('x14-' ||
            CAST(CAST(round(value * 100) AS BIGINT) % {_X14_SALTS} AS VARCHAR)
        ), 1, 8)) AS BIGINT) % 1000000)
       + CAST(round(value * 100) AS BIGINT) * 10000 AS enriched_micro
FROM events
"""


def test_scalar_iter_udf_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r9:x14_scalar_iter_udf",
        fn=_x14_fn,
        oracle=_X14_SQL,
        category="udf",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_s21_source_resumes_from_real_checkpoint(spark, tmp_path):
    """LIVE restart drill for the streaming Python source: run the feed
    with a durable checkpoint, stop the query partway, restart it with
    the SAME checkpoint + progress sidecar, and assert the final sink
    holds every row exactly once — the end-to-end form of the
    unit-level offset-regression pin (an invocation-counter offset
    would serve nothing, or re-serve rows, after the restart)."""
    import os
    import time as _time

    from x8313_etl_spark.python_ds import (
        STREAM_ROWS_PER_TICK,
        STREAM_TICKS,
        SensorStreamDataSource,
    )

    try:
        spark.dataSource.register(SensorStreamDataSource)
    except Exception:
        pass
    ckpt = str(tmp_path / "ckpt")
    progress = str(tmp_path / "progress")
    out = str(tmp_path / "out")
    want = STREAM_TICKS * STREAM_ROWS_PER_TICK

    def start():
        return (
            spark.readStream.format("x8313_sensor_stream")
            .option("progressDir", progress)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    def rows():
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0  # sink dir not created yet

    q = start()
    deadline = _time.time() + 120
    while _time.time() < deadline and rows() < STREAM_ROWS_PER_TICK:
        _time.sleep(0.3)
    q.stop()  # stop partway through the feed
    n_mid = rows()
    assert 0 < n_mid, "no batch committed before the stop"

    q = start()  # RESTART from the same checkpoint + sidecar
    deadline = _time.time() + 120
    while _time.time() < deadline and rows() < want:
        _time.sleep(0.5)
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == want  # nothing lost...
    assert got.select("seq").distinct().count() == want  # ...nothing doubled


# ---------------------------------------------------------------------------
# j19_scd2_lookup — temporal dimension lookup against SCD2 intervals
# ---------------------------------------------------------------------------


def _j19_fn(spark, sf_dir):
    """SCD2 temporal dimension LOOKUP — the classic warehouse temporal
    join w9 builds the dimension for: each fact (purchase) joins the
    dimension version whose [valid_from, valid_to) interval contains
    its timestamp, answering 'what state was this user in when the
    purchase happened'. Every purchase lands in EXACTLY one version
    (w9's intervals partition each user's timeline from their first
    event, and the first event is always a change row), so the output
    is fact-sized — the join is an equi-join on the dimension key with
    a bounded per-key interval predicate, never a blow-up; at scale
    both sides shuffle once on user_id (or the dim broadcasts: SCD2
    dimensions are versions-per-entity small)."""
    from x8313_etl_spark.queries.windows import w9_scd2_intervals

    dim = w9_scd2_intervals(spark, sf_dir).select(
        F.col("user_id").alias("d_user_id"),
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
    )
    facts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    return facts.join(
        dim,
        (F.col("user_id") == F.col("d_user_id"))
        & (F.col("valid_from") <= F.col("p_ts"))
        & (F.col("valid_to").isNull() | (F.col("p_ts") < F.col("valid_to"))),
    ).select(
        "purchase_id",
        "user_id",
        "cents",
        "state",
        F.col("valid_from").alias("version_from"),
    )


def _j19_sql():
    from x8313_etl_spark.queries.windows import _W9_SQL

    return f"""
WITH dim AS MATERIALIZED ({_W9_SQL})
SELECT f.event_id AS purchase_id, f.user_id,
       CAST(round(f.value * 100) AS BIGINT) AS cents,
       d.event_type AS state,
       d.valid_from AS version_from
FROM events f
JOIN dim d ON d.user_id = f.user_id
  AND d.valid_from <= f.ts
  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
WHERE f.event_type = 'purchase'
"""


def test_j19_scd2_lookup_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r9:j19_scd2_lookup",
        fn=_j19_fn,
        oracle=_j19_sql(),
        category="joins",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_j19_lookup_is_fact_sized_and_versioned(spark, sf_oracle_dir):
    """Exactly one dimension version per fact (the SCD2 contract), and
    the fixture must exercise MULTIPLE versions per user (a single-
    version dim would make the interval predicate vacuous)."""
    out = _j19_fn(spark, sf_oracle_dir).persist()
    n_facts = (
        load_table(spark, sf_oracle_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert out.count() == n_facts
    assert out.select("purchase_id").distinct().count() == n_facts
    multi = (
        out.groupBy("user_id")
        .agg(F.countDistinct("version_from").alias("nv"))
        .filter(F.col("nv") > 1)
        .count()
    )
    assert multi > 0
    out.unpersist()


# ---------------------------------------------------------------------------
# m10_snapshot_diff — semantic diff between two table versions
# ---------------------------------------------------------------------------

_M10_UPD_MOD = 11
_M10_INS_OFFSET = 20_000_000


def _m10_fn(spark, sf_dir):
    """Semantic DIFF between two snapshot versions — the lakehouse
    debugging/audit tool ('what changed between Monday's and today's
    table'): v0 = base commit, v1 = CDC MERGE (deletes negative
    balances, updates every key % 11 to a stamped balance, inserts
    shifted keys). The diff full-outer-joins read(version=0) against
    read(version=1) on the key and classifies added / deleted /
    changed / unchanged, emitting per-class counts + balance-cents
    movement — so the twin (which reconstructs both versions
    declaratively) verifies version isolation AND the merge semantics
    at once. Scale: one keyed full-outer join between two
    manifest-pruned scans; the class aggregate map-side-combines to 4
    rows."""
    import shutil

    from x8313_etl_spark.operators.snapshots import SnapshotTable
    from x8313_etl_spark.queries.sources_q import _tag, scratch

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    path = scratch(f"m10_diff_{_tag(sf_dir)}")
    shutil.rmtree(path, ignore_errors=True)
    tbl = SnapshotTable(path)
    tbl.commit(base.repartition(4))  # v0
    upd = base.filter(F.col("c_custkey") % _M10_UPD_MOD == 0).select(
        "c_custkey",
        (F.col("c_custkey") % 1000 / 100).alias("c_acctbal"),
        F.lit("U").alias("cdc_op"),
    )
    dels = base.filter(
        (F.col("c_acctbal") < 0) & (F.col("c_custkey") % _M10_UPD_MOD != 0)
    ).select("c_custkey", F.lit(None).cast("double").alias("c_acctbal"),
             F.lit("D").alias("cdc_op"))
    ins = base.filter(F.col("c_custkey") % 7 == 0).select(
        (F.col("c_custkey") + _M10_INS_OFFSET).alias("c_custkey"),
        F.lit(1.5).alias("c_acctbal"),
        F.lit("U").alias("cdc_op"),
    )
    tbl.apply_cdc(spark, upd.unionByName(dels).unionByName(ins), on="c_custkey")  # v1

    a = tbl.read(spark, version=0).select(
        F.col("c_custkey").alias("k"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("a_cents"),
    )
    b = tbl.read(spark, version=1).select(
        F.col("c_custkey").alias("k"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("b_cents"),
    )
    j = a.join(b, "k", "full_outer")
    cls = (
        F.when(F.col("a_cents").isNull(), "added")
        .when(F.col("b_cents").isNull(), "deleted")
        .when(F.col("a_cents") != F.col("b_cents"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(cls.alias("diff_class"),
                 F.coalesce("a_cents", F.lit(0)).alias("a_cents"),
                 F.coalesce("b_cents", F.lit(0)).alias("b_cents"))
        .groupBy("diff_class")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("b_cents") - F.col("a_cents")).alias("cents_delta"),
        )
    )


_M10_SQL = f"""
WITH v0 AS (SELECT c_custkey, c_acctbal FROM customer),
v1 AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % {_M10_UPD_MOD} = 0
              THEN (c_custkey % 1000) / 100.0 ELSE c_acctbal END AS c_acctbal
  FROM v0
  WHERE NOT (c_acctbal < 0 AND c_custkey % {_M10_UPD_MOD} <> 0)
  UNION ALL
  SELECT c_custkey + {_M10_INS_OFFSET}, 1.5 FROM customer WHERE c_custkey % 7 = 0
),
a AS (SELECT c_custkey AS k, CAST(round(c_acctbal * 100) AS BIGINT) AS a_cents FROM v0),
b AS (SELECT c_custkey AS k, CAST(round(c_acctbal * 100) AS BIGINT) AS b_cents FROM v1),
j AS (
  SELECT coalesce(a.k, b.k) AS k, a.a_cents, b.b_cents
  FROM a FULL OUTER JOIN b ON a.k = b.k
)
SELECT CASE WHEN a_cents IS NULL THEN 'added'
            WHEN b_cents IS NULL THEN 'deleted'
            WHEN a_cents <> b_cents THEN 'changed'
            ELSE 'unchanged' END AS diff_class,
       count(*) AS n_rows,
       CAST(sum(coalesce(b_cents, 0) - coalesce(a_cents, 0)) AS BIGINT)
         AS cents_delta
FROM j GROUP BY 1
"""


def test_m10_snapshot_diff_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r9:m10_snapshot_diff",
        fn=_m10_fn,
        oracle=_M10_SQL,
        category="etl",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_m10_all_four_classes_present(spark, sf_oracle_dir):
    """The fixture must exercise every diff class — a diff that never
    sees an add/delete/change verifies nothing about the classifier."""
    classes = {
        r["diff_class"] for r in _m10_fn(spark, sf_oracle_dir).collect()
    }
    assert classes == {"added", "deleted", "changed", "unchanged"}


# ---------------------------------------------------------------------------
# p_docstats_profile — per-slice corpus datasheet
# ---------------------------------------------------------------------------


def _docstats_fn(spark, sf_dir):
    """Corpus DATASHEET: per (source, lang) slice — doc counts, token
    totals, and the exact token-count five-number-ish summary
    (min/p50/max) every dataset card reports (datasheets for datasets;
    the first table a curation run prints). Token counts are exact
    integers; the in-group median interpolates two integers, which is
    exact in binary on both engines (no decimal trick needed — the
    a24 lesson applies only to SUMS of many doubles). One groupBy
    shuffle keyed by the slice; percentile is an in-group aggregate,
    never a global sort."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_total"),
        F.min("n_tokens").alias("tokens_min"),
        F.expr("percentile(n_tokens, 0.5)").alias("tokens_p50"),
        F.max("n_tokens").alias("tokens_max"),
        F.sum("n_chars").alias("chars_total"),
    )


_DOCSTATS_SQL = """
WITH d AS (
  SELECT source, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT source, lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
       min(n_tokens) AS tokens_min,
       CAST(median(n_tokens) AS DOUBLE) AS tokens_p50,
       max(n_tokens) AS tokens_max,
       CAST(sum(n_chars) AS BIGINT) AS chars_total
FROM d GROUP BY 1, 2
"""


def test_docstats_profile_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r9:p_docstats_profile",
        fn=_docstats_fn,
        oracle=_DOCSTATS_SQL,
        category="pipeline",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_docstats_covers_multiple_slices(spark, sf_oracle_dir):
    out = _docstats_fn(spark, sf_oracle_dir)
    assert out.count() >= 4  # several (source, lang) slices exercised


# ---------------------------------------------------------------------------
# s22_binaryfile_scan — Spark's binaryFile source (multimodal file ingest)
# ---------------------------------------------------------------------------

_S22_N_FILES = 24


def _s22_payload(i: int) -> bytes:
    """Deterministic pseudo-media payload: i's md5 digest repeated
    (i % 7 + 1) times — variable lengths, exact bytes both engines can
    regenerate."""
    import hashlib

    return hashlib.md5(f"s22-{i}".encode()).digest() * (i % 7 + 1)


def _s22_fn(spark, sf_dir):
    """The ``binaryFile`` source — Spark's ingestion path for media
    FILES (images/audio dropped in object storage), the front door of
    the multimodal pipeline whose column-side plumbing x7–x9 cover:
    each file becomes (path, modificationTime, length, content:binary).
    A deterministic corpus of pseudo-media files is written once per
    fixture dir, scanned via format('binaryFile'), and digested
    JVM-side (length + md5 of content + first byte) — so the twin
    regenerates the identical table from the same md5 algebra and the
    compare proves bytes survived the file→row boundary intact.
    Scale: one file = one row; the scan parallelizes per file exactly
    like any file source, and pushing length/path filters down
    (pathGlobFilter, the documented knob) prunes before content IO."""
    import os

    from x8313_etl_spark.queries.sources_q import _tag, scratch

    d = scratch(f"s22_binfiles_{_tag(sf_dir)}")
    if not os.path.isdir(d) or len(os.listdir(d)) != _S22_N_FILES:
        os.makedirs(d, exist_ok=True)
        for i in range(_S22_N_FILES):
            with open(os.path.join(d, f"m{i:03d}.bin"), "wb") as f:
                f.write(_s22_payload(i))
    df = spark.read.format("binaryFile").load(d)
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("fname"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
        # first BYTE as hex text (binary has no element access; a
        # string cast would mangle non-UTF8 media bytes)
        F.hex(F.expr("substring(content, 1, 1)")).alias("first_byte_hex"),
    )


def _s22_sql():
    import hashlib

    rows = []
    for i in range(_S22_N_FILES):
        p = _s22_payload(i)
        rows.append(
            f"('m{i:03d}.bin', {len(p)}, '{hashlib.md5(p).hexdigest()}', "
            f"'{p[0]:02X}')"
        )
    values = ",\n".join(rows)
    return f"""
SELECT * FROM (VALUES
{values}
) AS t(fname, n_bytes, content_md5, first_byte_hex)
"""


def test_binaryfile_scan_twin(spark, sf_oracle_dir):
    """The oracle is driver-computed VALUES from the same generator —
    legitimate here because the thing under test is Spark's file→row
    boundary (did the bytes survive?), not a relational computation."""
    spec = QuerySpec(
        name="r9:s22_binaryfile_scan",
        fn=_s22_fn,
        oracle=_s22_sql(),
        category="sources",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail
