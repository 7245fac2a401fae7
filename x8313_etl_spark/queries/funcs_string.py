"""Scalar string/hash/conditional/math families (SURVEY.md §2.8 F1-F3, F6-F8).

All expressions are built-in pyspark.sql.functions — JVM codegen, no
Python. Oracle twins pin the cross-engine quirks discovered by probing
DuckDB 1.0 (regexp_replace needs the 'g' flag to match Spark's
replace-all; instr/strpos are 1-based in both; round is
half-away-from-zero in both).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register


@register(
    "f1_string_basics",
    category="functions",
    oracle="""
SELECT doc_id,
       lower(lang) AS lang_lc,
       upper(source) AS source_uc,
       CAST(length(text) AS BIGINT) AS text_len,
       substr(text, 1, 20) AS head,
       trim(substr(text, 1, 20)) AS head_trim,
       lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_tag,
       concat_ws('|', lang, source) AS lang_src,
       CAST(instr(text, 'table') AS BIGINT) AS table_pos,
       starts_with(text, 'key') AS starts_key
FROM documents
""",
)
def f1_string_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: lower/upper/length/substr/trim/lpad/concat_ws/instr/startswith."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lower("lang").alias("lang_lc"),
        F.upper("source").alias("source_uc"),
        F.length("text").cast("bigint").alias("text_len"),
        F.substring("text", 1, 20).alias("head"),
        F.trim(F.substring("text", 1, 20)).alias("head_trim"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("doc_tag"),
        F.concat_ws("|", "lang", "source").alias("lang_src"),
        F.instr("text", "table").cast("bigint").alias("table_pos"),
        F.startswith("text", F.lit("key")).alias("starts_key"),
    )


@register(
    "f2_string_regex",
    category="functions",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '^(\\w+)\\s+(\\w+)$', 1) AS first_word,
       regexp_extract(p_name, '^(\\w+)\\s+(\\w+)$', 2) AS second_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       array_to_string(string_split_regex(p_name, '\\s+'), '|') AS words,
       CAST(len(string_split_regex(p_name, '\\s+')) AS INTEGER) AS n_words
FROM part
""",
)
def f2_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: regexp_extract (group refs), replace-all, regex split.
    DuckDB quirk pinned here: its regexp_replace is first-match unless
    given the 'g' flag; Spark's is always replace-all. The split result
    is '|'-joined — array result columns crash the grading harness."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)\s+(\w+)$", 1).alias("first_word"),
        F.regexp_extract("p_name", r"^(\w+)\s+(\w+)$", 2).alias("second_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.concat_ws("|", F.split("p_name", r"\s+")).alias("words"),
        F.size(F.split("p_name", r"\s+")).alias("n_words"),
    )


@register(
    "f3_string_distance",
    category="functions",
    oracle="""
SELECT p_partkey,
       p_name,
       CAST(levenshtein(p_name, 'red widget') AS INTEGER) AS dist_to_probe
FROM part
WHERE levenshtein(p_name, 'red widget') <= 6
""",
)
def f3_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: levenshtein distance as a near-dup/fuzzy-match scorer."""
    p = load_table(spark, sf_dir, "part")
    d = F.levenshtein("p_name", F.lit("red widget"))
    return p.select(
        "p_partkey", "p_name", d.cast("int").alias("dist_to_probe")
    ).filter(d <= 6)


@register(
    "f6_math",
    category="functions",
    oracle="""
SELECT o_orderkey,
       round(o_totalprice / 7, 2) AS sev,
       abs(o_totalprice - 250000.0) AS dist_mid,
       CAST(ceil(o_totalprice / 1000) AS BIGINT) AS ceil_k,
       CAST(floor(o_totalprice / 1000) AS BIGINT) AS floor_k,
       sqrt(o_totalprice) AS root,
       round(ln(o_totalprice), 9) AS log_nat,
       round(pow(o_totalprice / 100000, 2), 9) AS pw,
       ((o_orderkey % 7) + 7) % 7 AS pmod7,
       CAST(sign(o_totalprice - 250000.0) AS DOUBLE) AS side
FROM orders
""",
)
def f6_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: round/abs/ceil/floor/sqrt/ln/pow/pmod/sign. round(x/7, 2) is
    half-boundary-free (x/7 can't be a terminating decimal), so both
    engines' away-from-zero tie rules never fire. ln/pow are libm
    transcendentals with no IEEE-mandated rounding — last-ulp differences
    between engines are expected, so both sides round to 9dp; sqrt is
    IEEE-correctly-rounded and stays raw."""
    o = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(tp / 7, 2).alias("sev"),
        F.abs(tp - 250000.0).alias("dist_mid"),
        F.ceil(tp / 1000).cast("bigint").alias("ceil_k"),
        F.floor(tp / 1000).cast("bigint").alias("floor_k"),
        F.sqrt(tp).alias("root"),
        F.round(F.log(tp), 9).alias("log_nat"),
        F.round(F.pow(tp / 100000, 2), 9).alias("pw"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).alias("pmod7"),
        F.signum(tp - 250000.0).cast("double").alias("side"),
    )


@register(
    "f7_conditional",
    category="functions",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'large'
            WHEN o_totalprice > 100000 THEN 'medium'
            ELSE 'small' END AS size_band,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
       GREATEST(o_totalprice, 50000.0) AS floor_price,
       LEAST(o_totalprice, 400000.0) AS cap_price
FROM orders
""",
)
def f7_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: when/otherwise chains, coalesce+nullif, greatest/least."""
    o = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp > 300000, "large")
        .when(tp > 100000, "medium")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.greatest(tp, F.lit(50000.0)).alias("floor_price"),
        F.least(tp, F.lit(400000.0)).alias("cap_price"),
    )


@register(
    "f8_hashing",
    category="functions",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256
FROM customer
""",
)
def f8_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: md5 / sha2-256 content hashes (exact-dedup keys). xxhash64 —
    the cheap partition-friendly hash used by the MinHash operators —
    has no DuckDB twin and is pinned by unit tests instead."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
    )


@register(
    "f16_url_parse",
    category="functions",
    oracle="""
SELECT doc_id,
       source || '.example.com' AS host,
       '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS path,
       CAST(n_chars AS VARCHAR) AS q_param,
       'frag' AS fragment,
       source AS domain_label
FROM documents
""",
)
def f16_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16: URL parsing — host / path / query-param / fragment
    extraction via ``parse_url``, the building block behind per-domain
    corpus accounting (p_domain_mix's upstream in a real crawl
    pipeline, where the domain arrives inside a raw URL, not as a
    column). The URL is constructed in-plan from typed columns, so the
    oracle can state every expected component exactly without needing
    a URL parser of its own (same technique as f15's nested VARIANT
    paths); the Spark side must then round-trip the construction
    through a genuine parse. ``domain_label`` re-derives the source
    label from the parsed host (split on '.'), closing the loop
    parse(build(x)) == x. All JVM expressions, map-only, pipelines
    into the scan at any scale."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?q="),
        F.col("n_chars").cast("string"),
        F.lit("#frag"),
    )
    host = F.parse_url(url, F.lit("HOST"))
    return d.select(
        "doc_id",
        host.alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("q")).alias("q_param"),
        F.parse_url(url, F.lit("REF")).alias("fragment"),
        F.split(host, "\\.").getItem(0).alias("domain_label"),
    )
