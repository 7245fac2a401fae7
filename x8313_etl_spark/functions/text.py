"""Text-analysis expression helpers (SURVEY.md §2.10 L1/L5-L7 + pipeline ops).

All Column expressions (no UDFs): tokenization, shingling, normalization,
quality metrics, a marker-word language-ID score, and a rolling-hash
fingerprint. Each has a documented DuckDB-SQL twin shape used by the
oracle queries in queries/llm.py / queries/pipeline_q.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: tiny per-language marker vocabularies for the heuristic language ID.
#: (Fixture texts share one vocabulary, so on fixtures this exercises the
#: machinery, not real discrimination — by design the operator is the
#: same one you'd run with real marker lists.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "fast", "slow", "key"),
    "de": ("der", "und", "table", "hash"),
    "es": ("el", "los", "data", "row"),
    "fr": ("le", "les", "query", "merge"),
    "zh": ("de5", "shi4", "spark", "batch"),
}


def normalize_text(c: Column) -> Column:
    """lower + trim + whitespace-collapse (exact-dedup normalization).

    SQL twin: regexp_replace(trim(lower(x)), '\\s+', ' ', 'g')
    """
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def tokens(c: Column) -> Column:
    """Whitespace tokens. SQL twin: string_split(x, ' ') (fixture texts
    are single-spaced; use string_split_regex for general input)."""
    return F.split(c, " ")


def shingles(c: Column, k: int = 3) -> Column:
    """Distinct k-gram word shingles as an array<string>.

    Docs shorter than k words yield an empty array.
    SQL twin: generate_series + list indexing (queries/llm.py).

    PERF: pass a *materialized* words column via ``shingles_from_words``
    when composing with further per-shingle work — Catalyst inlines
    expression trees into lambdas, so referencing ``split(text)`` here
    re-evaluates the split per element_at call (O(words²) per doc).
    """
    return shingles_from_words(tokens(c), k)


def shingles_from_words(w: Column, k: int = 3) -> Column:
    """k-gram shingles from an already-computed array<string> column."""
    n = F.size(w)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(k)]),
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def word_count(c: Column) -> Column:
    return F.size(tokens(c))


def char_ratio(c: Column, pattern: str) -> Column:
    """Fraction of characters matching regex class ``pattern``."""
    stripped = F.regexp_replace(c, pattern, "")
    return (F.length(c) - F.length(stripped)).cast("double") / F.length(c)


def mean_word_len(c: Column) -> Column:
    t = tokens(c)
    total = F.aggregate(
        t, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    return total.cast("double") / F.size(t)


def stopword_ratio(c: Column, stopwords: tuple[str, ...]) -> Column:
    t = tokens(c)
    hits = F.size(F.filter(t, lambda w: w.isin(*stopwords)))
    return hits.cast("double") / F.size(t)


def marker_hits(c: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens are in the marker list (language-ID score)."""
    return F.size(F.filter(tokens(c), lambda w: w.isin(*markers)))


_FP_MOD = 2_147_483_647  # 2^31 - 1; keeps acc*31 + h < 2^36 (ANSI-safe)
_FP_BASE = 31


def fingerprint(c: Column) -> Column:
    """Order-sensitive rolling hash over tokens: fold of
    acc = (acc*31 + md5_word_hash) mod (2^31-1).

    Word hash = first 15 hex digits of md5 → bigint, mod 2^31-1 — chosen
    because both engines can derive the identical integer (Spark conv();
    DuckDB '0x'||hex cast). xxhash64 would be cheaper at scale but has
    no DuckDB twin; swap in production.
    SQL twin: list_reduce over the same per-word hashes.
    """
    t = tokens(c)
    h = F.transform(
        t,
        lambda w: F.pmod(
            F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("bigint"),
            F.lit(_FP_MOD),
        ),
    )
    return F.aggregate(
        h,
        F.lit(0).cast("bigint"),
        lambda acc, x: F.pmod(acc * _FP_BASE + x, F.lit(_FP_MOD)),
    )


SQL_FINGERPRINT = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({col}, ' '), "
    "w -> CAST(CONCAT('0x', substr(md5(w), 1, 15)) AS BIGINT) % 2147483647)), "
    "(acc, x) -> (acc * 31 + x) % 2147483647)"
)


def sql_fingerprint(col: str) -> str:
    """DuckDB twin of ``fingerprint`` (seeded with 0 via list_prepend
    because list_reduce has no init parameter)."""
    return SQL_FINGERPRINT.format(col=col)
