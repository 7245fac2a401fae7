"""Corpus-management ops for training-data pipelines (task-brief §2.12
additions, round 2): deterministic train/val/test splits, per-stratum
sampling, and overlapping text chunking.

All three are MAP-ONLY or WindowGroupLimit-bounded — no unbounded
shuffle anywhere — and all hashing goes through the repo's cross-engine
md5→bigint derivation (functions/text.py rationale: xxhash64 is cheaper
at scale but has no DuckDB twin; swap in production) so every query has
an exact-compare oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from ..io import load_table
from ..registry import register

#: chunking geometry: 80-char chunks every 60 chars → 20-char overlap,
#: the standard "context continuity" shape for training-window packing
CHUNK_CHARS = 80
CHUNK_STRIDE = 60

#: split fractions in bucket space (out of 100)
TRAIN_BUCKETS = 80
VAL_BUCKETS = 10

SAMPLE_PER_STRATUM = 20


def _hash_bucket(c: Column, mod: int) -> Column:
    """Deterministic bucket in [0, mod): first 15 md5 hex digits of the
    string form → bigint → pmod. Identical in DuckDB as
    CAST(CONCAT('0x', substr(md5(x),1,15)) AS BIGINT) % mod."""
    return F.pmod(
        F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint"),
        F.lit(mod),
    )


def _sql_hash_bucket(expr: str, mod: int) -> str:
    return (
        f"CAST(CONCAT('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {mod}"
    )


@register(
    "p_hash_split",
    category="pipeline",
    oracle=f"""
SELECT doc_id,
       {_sql_hash_bucket('doc_id', 100)} AS bucket,
       CASE WHEN {_sql_hash_bucket('doc_id', 100)} < {TRAIN_BUCKETS} THEN 'train'
            WHEN {_sql_hash_bucket('doc_id', 100)} < {TRAIN_BUCKETS + VAL_BUCKETS} THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
)
def p_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by hashing the
    document KEY (not a random() roll): the same doc lands in the same
    split on every run, on any cluster, after any repartition — the
    property that keeps eval sets uncontaminated as a corpus grows.
    Map-only; the hash is a pure projection that pipelines into the
    parquet scan."""
    d = load_table(spark, sf_dir, "documents")
    bucket = _hash_bucket(F.col("doc_id"), 100)
    split = (
        F.when(bucket < TRAIN_BUCKETS, "train")
        .when(bucket < TRAIN_BUCKETS + VAL_BUCKETS, "val")
        .otherwise("test")
    )
    return d.select("doc_id", bucket.alias("bucket"), split.alias("split"))


@register(
    "p_sample_stratified",
    category="pipeline",
    oracle=f"""
SELECT doc_id, lang,
       CAST(ROW_NUMBER() OVER (PARTITION BY lang
                               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
            AS BIGINT) AS sample_rank
FROM documents
QUALIFY sample_rank <= {SAMPLE_PER_STRATUM}
""",
)
def p_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: k docs per language, chosen by
    md5 rank of the key — reproducible across runs/engines, unlike
    `TABLESAMPLE` / `df.sample` whose row picks depend on partition
    layout. The rank filter compiles to WindowGroupLimit (same shape as
    w7): each map partition keeps only its local top-k per stratum
    BEFORE the shuffle, so the exchange carries O(k · strata ·
    partitions) rows no matter the corpus size."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        d.select(
            "doc_id",
            "lang",
            F.row_number().over(w).cast("bigint").alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= SAMPLE_PER_STRATUM)
    )


@register(
    "p_chunk_text",
    category="pipeline",
    oracle=f"""
WITH b AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text), 1), {CHUNK_STRIDE})) AS s
  FROM documents
)
SELECT doc_id,
       CAST((s - 1) // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
       CAST(s AS INTEGER) AS chunk_start,
       substr(text, CAST(s AS INTEGER), {CHUNK_CHARS}) AS chunk,
       CAST(length(substr(text, CAST(s AS INTEGER), {CHUNK_CHARS})) AS INTEGER)
         AS chunk_len
FROM b
""",
)
def p_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width chunking (80-char windows, stride 60):
    the document → training-window explosion step. Start offsets come
    from `sequence`, the chunk from `substr` — pure JVM expressions, so
    the explode is map-only (plan-asserted: no Exchange) and chunking
    pipelines into the scan; at 100 TB the output just streams through
    to the sink with no shuffle at all. A short doc still yields exactly
    one chunk (greatest(len, 1) guard), so no document is silently
    dropped."""
    d = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    b = d.select(
        "doc_id",
        "text",
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
    )
    chunk = F.col("text").substr(F.col("chunk_start"), F.lit(CHUNK_CHARS))
    return b.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("chunk_start").cast("int").alias("chunk_start"),
        chunk.alias("chunk"),
        F.length(chunk).cast("int").alias("chunk_len"),
    )
