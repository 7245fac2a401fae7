"""Pre-registration oracle checks — round-13-authored candidate batch X
(spare capacity: the r14–r17 budget queue is stocked by batches M–R;
these five extend the bank past them — at the raised ≤10/round budget
the pre-verified bank would otherwise drain around r17).

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0 — including the int128 oracle-type gate and
the strict int-vs-float transport dtype check) on an ad-hoc
UNREGISTERED QuerySpec, so a future round's registration is a verbatim
fn+oracle copy. Twins verify at BOTH fixture sfs. ROADMAP.md
"Candidate surface" carries the registration notes.

Batch X members (robust statistics + corpus-quality instruments):
- a28_trimmed_mean: exact 10%-trimmed mean per group — the tails are
  DROPPED by rank (vs p_winsorize, which CLAMPS them); computed over
  the distinct-value count table (the a27 weighted-median discipline),
  so the per-group windows are distinct-value-sized and the kept mass
  per value is pure integer overlap arithmetic; ONE IEEE division at
  the end.
- ts_bollinger_bands: rolling-window mean±k·σ breach flags (Bollinger,
  public technical-analysis standard) where the breach predicate
  (W·x − S₁)² > k²·(W·S₂ − S₁²) is EXACT int64 arithmetic — no σ is
  ever materialized, so there is no sqrt and no fp divergence anywhere.
- o5_percentile_rank: every row's exact global percentile rank in ppm
  through the two-phase global rank (operators/globalrank.py) — the
  row-level complement of a24/a25's scalar selections.
- p_oov_rate: per-doc out-of-vocabulary rate in ppm against the top-K
  corpus vocabulary (count DESC, term ASC — reproducible) — the
  unk-rate curation metric consulted before committing a tokenizer
  vocabulary size. K=16 is the fixture-calibrated dial (31-word corpus
  vocabulary); production K is 10⁵–10⁶ and the vocab stays the
  bounded broadcast side either way.
- p_word_entropy: per-doc Shannon word entropy in exact 1e-6-nat
  units via the p_perplexity_filter floor-quantization discipline
  (each ln(n/c) term → FLOOR(t·1e8 + 0.5) int64; per-doc sum exact;
  final value one truncating integer division) — the entropy-based
  gibberish/repetition quality signal next to p_quality_score.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from x8313_etl_spark import audit
from x8313_etl_spark.io import load_table
from x8313_etl_spark.registry import QuerySpec

from .oracle_utils import compare_query


@pytest.fixture(autouse=True, scope="module")
def _scrub_ledger_keys():
    before = set(audit.ledger())
    yield
    for key in set(audit.ledger()) - before:
        audit.forget(key)


# ---------------------------------------------------------------------------
# a28_trimmed_mean — exact rank-trimmed mean over the count table
# ---------------------------------------------------------------------------

_TRIM_DIV = 10  # drop n div 10 rows from EACH tail


def _trimmed_fn(spark, sf_dir):
    """Exact 10%-trimmed mean of l_extendedprice cents per returnflag.
    The trim is BY RANK (drop the t = n div 10 smallest and largest
    rows), but no row-level rank is ever computed: the (flag, cents)
    count table is distinct-value-sized, its cumulative window gives
    each value's rank interval [prev+1, cum], and the kept mass per
    value is the integer overlap of that interval with (t, n−t] —
    GREATEST(0, LEAST(cum, n−t) − GREATEST(prev, t)). Σ cents·kept is
    an exact int64; the mean is ONE IEEE division at the end. At
    100 TB the only data-sized stage is the map-side-combined count
    aggregate; the windows run over distinct price values (bounded
    domain — a27's argument)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    pv = li.groupBy("flag", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.partitionBy("flag").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pv = pv.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "prev", F.col("cum") - F.col("cnt")
    )
    ntab = li.groupBy("flag").agg(F.count(F.lit(1)).alias("n"))
    t = F.expr(f"n div {_TRIM_DIV}")
    kept = F.greatest(
        F.lit(0),
        F.least(F.col("cum"), F.col("n") - t) - F.greatest(F.col("prev"), t),
    )
    return (
        pv.join(F.broadcast(ntab), "flag")
        .select("flag", "cents", "n", kept.alias("kept"))
        .groupBy("flag")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.sum(F.col("cents") * F.col("kept")).cast("bigint").alias(
                "trimmed_sum_cents"
            ),
            F.sum("kept").cast("bigint").alias("trimmed_n"),
        )
        .select(
            "flag",
            "n",
            F.expr(f"n div {_TRIM_DIV}").cast("bigint").alias("t"),
            "trimmed_n",
            "trimmed_sum_cents",
            (
                F.col("trimmed_sum_cents").cast("double")
                / F.col("trimmed_n").cast("double")
            ).alias("trimmed_mean_cents"),
        )
    )


_TRIMMED_SQL = f"""
WITH li AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
pv AS MATERIALIZED (
  SELECT flag, cents, CAST(count(*) AS BIGINT) AS cnt
  FROM li GROUP BY flag, cents
),
cumt AS (
  SELECT flag, cents, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY flag ORDER BY cents) AS BIGINT)
           AS cum
  FROM pv
),
ntab AS (SELECT flag, CAST(SUM(cnt) AS BIGINT) AS n FROM pv GROUP BY flag)
SELECT c.flag,
       CAST(max(n.n) AS BIGINT) AS n,
       CAST(max(n.n) // {_TRIM_DIV} AS BIGINT) AS t,
       CAST(SUM(GREATEST(0, LEAST(c.cum, n.n - n.n // {_TRIM_DIV})
                            - GREATEST(c.cum - c.cnt, n.n // {_TRIM_DIV})))
         AS BIGINT) AS trimmed_n,
       CAST(SUM(c.cents * GREATEST(0, LEAST(c.cum, n.n - n.n // {_TRIM_DIV})
                            - GREATEST(c.cum - c.cnt, n.n // {_TRIM_DIV})))
         AS BIGINT) AS trimmed_sum_cents,
       CAST(SUM(c.cents * GREATEST(0, LEAST(c.cum, n.n - n.n // {_TRIM_DIV})
                            - GREATEST(c.cum - c.cnt, n.n // {_TRIM_DIV})))
         AS DOUBLE)
         / CAST(SUM(GREATEST(0, LEAST(c.cum, n.n - n.n // {_TRIM_DIV})
                            - GREATEST(c.cum - c.cnt, n.n // {_TRIM_DIV})))
             AS DOUBLE) AS trimmed_mean_cents
FROM cumt c JOIN ntab n ON c.flag = n.flag
GROUP BY c.flag
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_a28_trimmed_mean_twin(spark, d):
    spec = QuerySpec(
        name="rX:a28_trimmed_mean", fn=_trimmed_fn, oracle=_TRIMMED_SQL,
        category="aggregates",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_a28_trim_actually_trims_and_differs_from_plain_mean(
    spark, sf_oracle_dir
):
    """trimmed_n must equal n − 2·(n div 10) exactly (the overlap
    algebra conserves mass), and the trimmed mean must differ from the
    untrimmed mean on at least one group (the tails carry signal)."""
    rows = _trimmed_fn(spark, sf_oracle_dir).collect()
    assert rows
    li = load_table(spark, sf_oracle_dir, "lineitem")
    plain = {
        r.flag: r.mean
        for r in li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.avg(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "mean"
            )
        )
        .collect()
    }
    assert any(abs(r.trimmed_mean_cents - plain[r.flag]) > 1e-9 for r in rows)
    for r in rows:
        assert r.trimmed_n == r.n - 2 * (r.n // _TRIM_DIV)
        assert r.t == r.n // _TRIM_DIV


# ---------------------------------------------------------------------------
# ts_bollinger_bands — exact-int64 rolling band breach flags
# ---------------------------------------------------------------------------

_BOLL_W = 8  # rolling window length (rows)
_BOLL_K = 2  # band width in sigmas


def _boll_fn(spark, sf_dir):
    """Bollinger band breaches per series: over the trailing _BOLL_W
    events (ordered by ts, event_id — a unique total order), flag rows
    with |x − μ| > k·σ. No mean, σ, or sqrt is ever materialized: the
    predicate is squared into (W·x − S₁)² > k²·(W·S₂ − S₁²) with
    S₁ = Σ cents, S₂ = Σ cents² over the window — pure int64 (cents ≤
    ~10⁶ keeps every term under 2⁶³). Only full windows flag (the
    first W−1 rows of a series emit breach=false, stated identically
    in the twin). One series-keyed window pass — linear at any
    scale."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("series"),
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("series").orderBy("ts", "event_id").rowsBetween(
        -(_BOLL_W - 1), 0
    )
    s1 = F.sum("cents").over(w)
    s2 = F.sum(F.col("cents") * F.col("cents")).over(w)
    cw = F.count(F.lit(1)).over(w)
    lhs = (F.lit(_BOLL_W) * F.col("cents") - F.col("s1")) * (
        F.lit(_BOLL_W) * F.col("cents") - F.col("s1")
    )
    rhs = F.lit(_BOLL_K * _BOLL_K) * (
        F.lit(_BOLL_W) * F.col("s2") - F.col("s1") * F.col("s1")
    )
    return (
        ev.select(
            "series",
            "event_id",
            "cents",
            s1.cast("bigint").alias("s1"),
            s2.cast("bigint").alias("s2"),
            cw.cast("bigint").alias("w_rows"),
        )
        .select(
            "series",
            "event_id",
            "cents",
            "s1",
            "s2",
            "w_rows",
            ((F.col("w_rows") == _BOLL_W) & (lhs > rhs)).alias("breach"),
        )
    )


_BOLL_SQL = f"""
WITH ev AS (
  SELECT user_id AS series, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
win AS (
  SELECT series, event_id, cents,
         CAST(SUM(cents) OVER (
           PARTITION BY series ORDER BY ts, event_id
           ROWS BETWEEN {_BOLL_W - 1} PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS s1,
         CAST(SUM(cents * cents) OVER (
           PARTITION BY series ORDER BY ts, event_id
           ROWS BETWEEN {_BOLL_W - 1} PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS s2,
         CAST(COUNT(*) OVER (
           PARTITION BY series ORDER BY ts, event_id
           ROWS BETWEEN {_BOLL_W - 1} PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS w_rows
  FROM ev
)
SELECT series, event_id, cents, s1, s2, w_rows,
       w_rows = {_BOLL_W}
       AND ({_BOLL_W} * cents - s1) * ({_BOLL_W} * cents - s1)
           > {_BOLL_K * _BOLL_K} * ({_BOLL_W} * s2 - s1 * s1) AS breach
FROM win
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ts_bollinger_bands_twin(spark, d):
    spec = QuerySpec(
        name="rX:ts_bollinger_bands", fn=_boll_fn, oracle=_BOLL_SQL,
        category="timeseries",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_ts_bollinger_breaches_are_selective_and_verified(spark, sf_oracle_dir):
    """Breaches exist, stay a minority, never fire on partial windows,
    and every flag satisfies the squared predicate re-derived in
    Python."""
    rows = _boll_fn(spark, sf_oracle_dir).collect()
    br = [r for r in rows if r.breach]
    assert br and len(br) < len(rows) / 4
    for r in br:
        assert r.w_rows == _BOLL_W
        lhs = (_BOLL_W * r.cents - r.s1) ** 2
        rhs = (_BOLL_K**2) * (_BOLL_W * r.s2 - r.s1**2)
        assert lhs > rhs


# ---------------------------------------------------------------------------
# o5_percentile_rank — exact global percentile rank per row, two-phase
# ---------------------------------------------------------------------------


def _o5_fn(spark, sf_dir):
    """Every lineitem row's EXACT global percentile rank in ppm:
    pct_ppm = rn·10⁶ div n under the (cents, l_orderkey,
    l_linenumber) total order, with the 0-based rn from the two-phase
    global rank (operators/globalrank.py — range-partition, per-
    partition local ranks, one bounded count-table window; no
    all-to-one exchange). The row-level complement of a24/a25's scalar
    selections — 'which percentile is THIS transaction in'."""
    from x8313_etl_spark.operators.globalrank import with_global_rank

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    r = with_global_rank(
        li,
        [
            F.col("cents").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        ],
        32,
        "o5.rank",
        rank_col="rn",
        count_col="n",
    )
    return r.select(
        "l_orderkey",
        "l_linenumber",
        "cents",
        F.col("rn").cast("bigint").alias("rn"),
        F.expr("(rn * 1000000) div n").cast("bigint").alias("pct_ppm"),
    )


_O5_SQL = """
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, cents,
       CAST(row_number() OVER (ORDER BY cents, l_orderkey, l_linenumber) - 1
         AS BIGINT) AS rn,
       CAST((CAST(row_number() OVER (ORDER BY cents, l_orderkey,
                                     l_linenumber) - 1 AS BIGINT) * 1000000)
            // CAST(count(*) OVER () AS BIGINT) AS BIGINT) AS pct_ppm
FROM li
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_o5_percentile_rank_twin(spark, d):
    spec = QuerySpec(
        name="rX:o5_percentile_rank", fn=_o5_fn, oracle=_O5_SQL,
        category="order",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_o5_percentiles_are_dense_and_monotone(spark, sf_oracle_dir):
    """rn must be a 0..n−1 permutation, pct_ppm monotone in rank and
    spanning [0, ~10⁶)."""
    rows = _o5_fn(spark, sf_oracle_dir).collect()
    n = len(rows)
    rns = sorted(r.rn for r in rows)
    assert rns == list(range(n))
    by_rn = sorted(rows, key=lambda r: r.rn)
    assert by_rn[0].pct_ppm == 0
    assert by_rn[-1].pct_ppm == (n - 1) * 1_000_000 // n
    assert all(
        a.pct_ppm <= b.pct_ppm and a.cents <= b.cents
        for a, b in zip(by_rn, by_rn[1:])
    )


# ---------------------------------------------------------------------------
# p_oov_rate — per-doc OOV ppm against the top-K corpus vocabulary
# ---------------------------------------------------------------------------

_OOV_K = 16  # fixture-calibrated (31-word corpus vocab); production 1e5-1e6


def _oov_fn(spark, sf_dir):
    """Per-doc out-of-vocabulary rate against the top-_OOV_K corpus
    vocabulary (count DESC, term ASC — reproducible): the unk-rate
    metric a tokenizer/vocabulary decision is checked against. The
    vocab is vocabulary-sized (its ranking window runs over the
    bounded distinct-term table — the dq4 shape) and broadcasts into
    one corpus pass; per-doc counts are one map-side-combined doc_id
    aggregate. oov_ppm is exact integer arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "vrank",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("term"))
            ),
        )
        .filter(F.col("vrank") <= _OOV_K)
        .select("term", F.lit(True).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), True))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.expr("(1000000 * n_oov) div n_tokens").alias("oov_ppm"),
        )
    )


_OOV_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
vocab AS MATERIALIZED (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY count(*) DESC, term) AS vrank
    FROM tok GROUP BY term
  ) WHERE vrank <= {_OOV_K}
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (v.term IS NULL) AS BIGINT) AS n_oov,
       (1000000 * CAST(count(*) FILTER (v.term IS NULL) AS BIGINT))
         // CAST(count(*) AS BIGINT) AS oov_ppm
FROM tok t LEFT JOIN vocab v ON t.term = v.term
GROUP BY t.doc_id
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_p_oov_rate_twin(spark, d):
    spec = QuerySpec(
        name="rX:p_oov_rate", fn=_oov_fn, oracle=_OOV_SQL,
        category="pipeline",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_p_oov_rate_is_informative(spark, sf_oracle_dir):
    """With K=16 against a 31-word corpus vocabulary the metric must
    discriminate: OOV tokens exist, no doc is all-OOV, and rates vary
    across docs."""
    rows = _oov_fn(spark, sf_oracle_dir).collect()
    assert rows
    assert all(0 <= r.oov_ppm < 1_000_000 for r in rows)
    assert any(r.n_oov > 0 for r in rows)
    assert len({r.oov_ppm for r in rows}) > 1


# ---------------------------------------------------------------------------
# p_word_entropy — per-doc Shannon entropy, floor-quantized ln terms
# ---------------------------------------------------------------------------


def _entropy_fn(spark, sf_dir):
    """Per-doc Shannon word entropy H = Σ (c/n)·ln(n/c) in exact
    1e-6-nat units: each ln(n/c) term is floor-quantized to int64
    1e-8 units (FLOOR(t·1e8 + 0.5) — IEEE-identical across engines
    for an identical double, the p_perplexity_filter discipline), the
    per-doc Σ c·term is an exact BIGINT, and the final H is one
    truncating integer division. Low entropy = repetitive/degenerate
    text — the gibberish signal next to p_quality_score's length/
    punctuation ratios. One doc-keyed aggregate; the (doc, term)
    count table shares the explode."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    c = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    ntab = c.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    term_u8 = F.floor(
        F.log(F.col("n").cast("double") / F.col("c").cast("double"))
        * F.lit(100000000.0)
        + F.lit(0.5)
    ).cast("bigint")
    return (
        c.join(F.broadcast(ntab), "doc_id")
        .select("doc_id", "n", (F.col("c") * term_u8).alias("cu8"))
        .groupBy("doc_id")
        .agg(
            F.max("n").alias("n_tokens"),
            F.sum("cu8").cast("bigint").alias("sum_u8"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr("sum_u8 div (100 * n_tokens)").cast("bigint").alias(
                "entropy_u6"
            ),
        )
    )


_ENTROPY_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
c AS MATERIALIZED (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY doc_id, term
),
ntab AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY doc_id)
SELECT c.doc_id,
       CAST(max(ntab.n) AS BIGINT) AS n_tokens,
       CAST(SUM(c.c * CAST(FLOOR(ln(CAST(ntab.n AS DOUBLE)
                                    / CAST(c.c AS DOUBLE))
                                 * 100000000.0 + 0.5) AS BIGINT)) AS BIGINT)
         // (100 * CAST(max(ntab.n) AS BIGINT)) AS entropy_u6
FROM c JOIN ntab ON c.doc_id = ntab.doc_id
GROUP BY c.doc_id
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_p_word_entropy_twin(spark, d):
    spec = QuerySpec(
        name="rX:p_word_entropy", fn=_entropy_fn, oracle=_ENTROPY_SQL,
        category="pipeline",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_p_word_entropy_is_bounded_and_varies(spark, sf_oracle_dir):
    """Entropy must land in (0, ln(vocab_size)] for every doc (the
    fixture corpus has a 31-word vocabulary → ceiling ln(31) ≈ 3.434
    nats) and must VARY across docs — a constant score can't filter
    anything."""
    import math

    rows = _entropy_fn(spark, sf_oracle_dir).collect()
    assert rows
    ceil_u6 = int(math.log(31) * 1e6) + 1
    for r in rows:
        assert 0 < r.entropy_u6 <= ceil_u6, (r.doc_id, r.entropy_u6)
    assert len({r.entropy_u6 for r in rows}) > 1
