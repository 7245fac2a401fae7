"""Pre-registration oracle checks — round-11-authored candidate batch N
(the r16 pipeline; batches J/K/L/M cover r12–r15).

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0) on an ad-hoc UNREGISTERED QuerySpec, so a
future round's registration is a verbatim fn+oracle copy. ROADMAP.md
"Candidate surface" carries the notes.

Batch N members (all integer-evidence / single-IEEE-division exact):
- a28_group_trend_ols: per-supplier OLS slope of monthly shipment
  volume — the closed-form least-squares slope as an exact integer
  (numerator, denominator) pair + one IEEE division.
- a29_gini_concentration: per-nation Gini coefficient of supplier
  shipment concentration via the rank formula — exact integer
  numerator/denominator, one division.
- ts_ewma_dyadic: exponentially weighted moving average with a DYADIC
  decay (α = 1/2, 8-tap window) — every weight is a power of two, so
  the weighted sum is exact integer arithmetic ×256 and the emitted
  double is one exact power-of-two division. The engine-exact EWMA.
- g15_harmonic_centrality: landmark-bounded harmonic centrality
  (Σ 1/d to a landmark subset, d ≤ 4 BFS rounds) over the
  quantile-thresholded co-supply graph — floor-micro-unit integer
  contributions (1000000 // d), no fp anywhere.
- p_ngram_novelty: train/test memorization metric — the fraction of a
  held-out doc's distinct word-3-grams unseen in the train split
  (novelty_ppm, truncating integer division), the generalization twin
  of p_decontaminate's contamination direction.
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
    """Forget ledger keys introduced by these unregistered candidate fns
    (the materialization gate audits registered queries only)."""
    before = set(audit.ledger())
    yield
    for key in set(audit.ledger()) - before:
        audit.forget(key)


# ---------------------------------------------------------------------------
# a28_group_trend_ols — exact integer least-squares slope per group
# ---------------------------------------------------------------------------


def _a28_fn(spark, sf_dir):
    """Per-supplier OLS trend of monthly shipment volume: y = lineitem
    count per (supplier, ship-month), x = months-since-epoch
    (year·12 + month — a dense integer), slope over the months the
    supplier actually shipped in. The closed form
    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) is computed entirely in
    exact int64 sums (max |term| ≈ 12·24000² ≈ 7e9 — far inside
    int64), emitted as the integer (num, den) evidence pair plus ONE
    IEEE division — engines given identical integers produce the
    identical double. Suppliers with < 2 distinct months are excluded
    (den = 0, slope undefined). Scale: one (supplier, month) partial
    aggregate (map-side combined) then a supplier-keyed agg — no join
    term at all."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("x"),
    )
    m = li.groupBy("l_suppkey", "x").agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    g = m.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        g.filter(F.col("n") >= 2)
        .select(
            F.col("l_suppkey").cast("bigint").alias("s_suppkey"),
            "n",
            num.cast("bigint").alias("slope_num"),
            den.cast("bigint").alias("slope_den"),
            (num.cast("double") / den.cast("double")).alias("slope"),
        )
    )


_A28_SQL = """
WITH m AS (
  SELECT l_suppkey,
         date_part('year', l_shipdate) * 12 + date_part('month', l_shipdate) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM lineitem GROUP BY 1, 2
),
g AS (
  SELECT l_suppkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM m GROUP BY 1
)
SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
         AS slope
FROM g WHERE n >= 2
"""


def test_a28_group_trend_ols_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r16:a28_group_trend_ols", fn=_a28_fn, oracle=_A28_SQL,
        category="aggregates",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_a28_slopes_span_signs(spark, sf_oracle_dir):
    """The fixture must exercise the statistic: positive AND negative
    trends present, and no denominator may be ≤ 0 (n ≥ 2 distinct
    x-values makes the variance term strictly positive)."""
    rows = _a28_fn(spark, sf_oracle_dir).collect()
    assert any(r["slope_num"] > 0 for r in rows)
    assert any(r["slope_num"] < 0 for r in rows)
    assert all(r["slope_den"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# a29_gini_concentration — exact integer Gini per nation
# ---------------------------------------------------------------------------


def _a29_fn(spark, sf_dir):
    """Per-nation Gini coefficient of supplier shipment concentration
    (how unequal is the lineitem volume across a nation's suppliers) —
    the rank formula over y sorted ascending with i = 1..n:
    G = (2Σ i·y_i − (n+1)Σy) / (nΣy). Both terms are exact int64
    (emitted as the gini_num/gini_den evidence pair), the double is
    ONE IEEE division. The within-nation rank breaks ties on suppkey —
    Gini's value is tie-order-invariant (equal y swap i's without
    changing Σi·y within the tie block), but the twin mirrors the same
    ORDER BY so even intermediate ranks agree. Scale: one
    supplier-keyed count, a nation-keyed rank window, a nation-keyed
    agg — the window is nation-bounded, never global."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    y = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    j = (
        y.join(s, y.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("n_name", "s_suppkey", "y")
    )
    w = Window.partitionBy("n_name").orderBy("y", "s_suppkey")
    r = j.withColumn("i", F.row_number().over(w).cast("bigint"))
    g = r.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("i") * F.col("y")).cast("bigint").alias("siy"),
    )
    num = 2 * F.col("siy") - (F.col("n") + 1) * F.col("sy")
    den = F.col("n") * F.col("sy")
    return g.select(
        "n_name",
        "n",
        num.cast("bigint").alias("gini_num"),
        den.cast("bigint").alias("gini_den"),
        (num.cast("double") / den.cast("double")).alias("gini"),
    )


_A29_SQL = """
WITH y AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS y FROM lineitem GROUP BY 1
),
r AS (
  SELECT n.n_name, s.s_suppkey, y.y,
         CAST(row_number() OVER (PARTITION BY n.n_name
                                 ORDER BY y.y, s.s_suppkey) AS BIGINT) AS i
  FROM y JOIN supplier s ON y.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
),
g AS (
  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(i * y) AS BIGINT) AS siy
  FROM r GROUP BY 1
)
SELECT n_name, n,
       CAST(2 * siy - (n + 1) * sy AS BIGINT) AS gini_num,
       CAST(n * sy AS BIGINT) AS gini_den,
       CAST(2 * siy - (n + 1) * sy AS DOUBLE) / CAST(n * sy AS DOUBLE) AS gini
FROM g
"""


def test_a29_gini_concentration_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r16:a29_gini_concentration", fn=_a29_fn, oracle=_A29_SQL,
        category="aggregates",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_a29_gini_in_range_and_nontrivial(spark, sf_oracle_dir):
    """Gini must land strictly inside (0, 1) somewhere (perfect
    equality everywhere — or a degenerate single-supplier nation
    everywhere — would pass the value compare while testing nothing)
    and never leave [0, 1)."""
    rows = _a29_fn(spark, sf_oracle_dir).collect()
    assert all(0 <= r["gini"] < 1 for r in rows)
    assert any(r["gini"] > 0 for r in rows)
    assert any(r["n"] > 1 for r in rows)


# ---------------------------------------------------------------------------
# ts_ewma_dyadic — engine-exact EWMA (all weights are powers of two)
# ---------------------------------------------------------------------------

#: ×256 tap weights for α = 1/2 over the last 8 OBSERVED hourly buckets
#: (lag 0 → 128/256, …, lag 6 → 2/256, lag-7 tail → 2/256; Σ = 256 so
#: the weights sum to exactly 1)
_EWMA_TAPS = (128, 64, 32, 16, 8, 4, 2, 2)


def _ewma_fn(spark, sf_dir):
    """Exponentially weighted moving average of hourly event counts per
    event_type with a DYADIC decay: α = 1/2 truncated at 8 taps, the
    tail mass folded into the last tap so weights sum to exactly 1.
    Every weight is a power of two, so ewma_x256 = Σ tap_k · c_{t−k}
    is EXACT int64 arithmetic and the emitted double is one division
    by 256 (exact — a power-of-two scale). This is the engine-exact
    form of the EWMA no float recursion can give: the recursive
    definition accumulates rounding differently per engine, the dyadic
    window form cannot. Gaps: the average runs over the OBSERVED
    bucket sequence (documented skip-gap semantics — ts_gap_fill is
    the densifier when calendar spacing matters); rows before the 8th
    observed bucket have no full window and are excluded. Scale: one
    (type, hour) partial aggregate then a type-keyed lag window — no
    join term."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    )
    c = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = c.select(
        "event_type",
        "h",
        *[
            F.lag("c", k).over(w).alias(f"c{k}")
            for k in range(len(_EWMA_TAPS))
        ],
    ).filter(F.col(f"c{len(_EWMA_TAPS) - 1}").isNotNull())
    x256 = sum(
        F.lit(tap) * F.col(f"c{k}") for k, tap in enumerate(_EWMA_TAPS)
    )
    return lagged.select(
        "event_type",
        "h",
        F.col("c0").alias("c"),
        x256.cast("bigint").alias("ewma_x256"),
        (x256.cast("double") / F.lit(256.0)).alias("ewma"),
    )


def _ewma_sql():
    taps = ", ".join(
        f"lag(c, {k}) OVER w AS c{k}" for k in range(len(_EWMA_TAPS))
    )
    x256 = " + ".join(f"{tap} * c{k}" for k, tap in enumerate(_EWMA_TAPS))
    return f"""
WITH c AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
l AS (
  SELECT event_type, h, c, {taps}
  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY h)
)
SELECT event_type, h, c0 AS c,
       CAST({x256} AS BIGINT) AS ewma_x256,
       CAST({x256} AS DOUBLE) / 256.0 AS ewma
FROM l WHERE c{len(_EWMA_TAPS) - 1} IS NOT NULL
"""


def test_ts_ewma_dyadic_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r16:ts_ewma_dyadic", fn=_ewma_fn, oracle=_ewma_sql(),
        category="timeseries",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_ts_ewma_tracks_and_smooths(spark, sf_oracle_dir):
    """The EWMA must actually smooth: its variance over each series is
    below the raw count's variance, and ewma_x256/256 reproduces the
    double exactly (the dyadic-exactness claim)."""
    import statistics

    rows = _ewma_fn(spark, sf_oracle_dir).collect()
    assert rows
    by_type = {}
    for r in rows:
        assert r["ewma"] == r["ewma_x256"] / 256.0
        by_type.setdefault(r["event_type"], []).append((r["c"], r["ewma"]))
    smoother = 0
    for series in by_type.values():
        if len(series) < 3:
            continue
        raw = statistics.pvariance([c for c, _ in series])
        sm = statistics.pvariance([e for _, e in series])
        smoother += sm < raw
    assert smoother > 0


# ---------------------------------------------------------------------------
# g15_harmonic_centrality — landmark-bounded, floor-micro-unit exact
# ---------------------------------------------------------------------------

_G15_LANDMARKS = 25  # FIXED landmark budget (the 25 lowest node ids)
_G15_ROUNDS = 4  # BFS depth bound


def _g15_fn(spark, sf_dir):
    """Landmark-bounded harmonic centrality (Boldi–Vigna's axioms;
    landmark sampling is the public scalable estimator family —
    HyperANF's exact small-graph cousin): for each node of the
    quantile-thresholded co-supply graph, Σ over reachable landmarks
    within {_G15_ROUNDS} hops of FLOOR(1000000 / d) — integer
    micro-units, integer division, no fp anywhere (1/3 has no exact
    double; the floor unit does). Fixed round count on both sides, so
    no convergence detection. The landmark set is a FIXED BUDGET (the
    {_G15_LANDMARKS} lowest node ids — deterministic in both
    engines), NOT a fixed fraction: the first authoring sweep used
    node % 4 == 0 and measured 67 → 786 s at 10× because |L| grew
    with the graph, making BFS state |V|·|L| quadratic-ish in graph
    size — with |L| pinned, state is |V|·k and per-round work is one
    |E|⋈frontier shuffle keyed on node (the g2 frontier pattern with
    a bounded landmark dimension along for the ride; re-swept FLAT,
    20→23 s at 10×); estimator accuracy then scales by CHOICE of k,
    not accidentally with data. Placement is md5-rank (the
    p_sample_stratified discipline) rather than lowest-id, so the
    budget SPREADS across components — lowest-id landmarks all landed
    in one replica component on the 10× fixture and left every other
    component uncovered."""
    from x8313_etl_spark.audit import audited_checkpoint
    from x8313_etl_spark.queries.graph_q import _cosupply_edges

    e = _cosupply_edges(spark, sf_dir, "g15.edges")
    ed = audited_checkpoint(
        "g15.sym",
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("s1").alias("src"), F.col("s2").alias("dst")),
                    F.struct(F.col("s2").alias("src"), F.col("s1").alias("dst")),
                )
            ).alias("p")
        ).select("p.src", "p.dst"),
    )
    nodes = ed.select(F.col("src").alias("node")).distinct()
    lm = (
        nodes.orderBy(F.md5(F.col("node").cast("string")), "node")
        .limit(_G15_LANDMARKS)
        .select(F.col("node").alias("lm"))
    )
    labels = lm.select(F.col("lm").alias("node"), "lm", F.lit(0).alias("hop"))
    for _ in range(_G15_ROUNDS):
        expanded = ed.join(labels, ed.src == labels.node).select(
            F.col("dst").alias("node"), "lm", (F.col("hop") + 1).alias("hop")
        )
        labels = audited_checkpoint(
            "g15.round",
            labels.unionByName(expanded)
            .groupBy("node", "lm")
            .agg(F.min("hop").alias("hop")),
        )
    return (
        labels.filter(F.col("hop") > 0)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_landmarks"),
            F.sum(F.floor(F.lit(1000000) / F.col("hop")).cast("bigint"))
            .cast("bigint")
            .alias("harmonic_u6"),
        )
        .select(
            F.col("node").cast("bigint").alias("s_suppkey"),
            "n_landmarks",
            "harmonic_u6",
        )
    )


def _g15_sql():
    from x8313_etl_spark.queries.graph_q import _TRI_QUANTILE

    rounds = []
    prev = "h0"
    for i in range(_G15_ROUNDS):
        rounds.append(
            f"h{i + 1} AS MATERIALIZED (\n"
            f"  SELECT node, lm, MIN(hop) AS hop FROM (\n"
            f"    SELECT node, lm, hop FROM {prev}\n"
            f"    UNION ALL\n"
            f"    SELECT e.dst AS node, p.lm, p.hop + 1 AS hop\n"
            f"    FROM ed e JOIN {prev} p ON e.src = p.node\n"
            f"  ) GROUP BY 1, 2\n"
            f")"
        )
        prev = f"h{i + 1}"
    chain = ",\n".join(rounds)
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT s1, s2, count(DISTINCT ok) AS shared FROM (
    SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, a.l_orderkey AS ok
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  ) GROUP BY s1, s2
),
t AS (SELECT CEIL(quantile_cont(shared, {_TRI_QUANTILE})) AS thr FROM pairs),
e AS MATERIALIZED (SELECT s1, s2 FROM pairs, t WHERE shared >= thr),
ed AS MATERIALIZED (
  SELECT s1 AS src, s2 AS dst FROM e UNION ALL SELECT s2, s1 FROM e
),
lm AS (SELECT lm FROM (SELECT DISTINCT src AS lm FROM ed)
       ORDER BY md5(CAST(lm AS VARCHAR)), lm LIMIT {_G15_LANDMARKS}),
h0 AS (SELECT lm AS node, lm, 0 AS hop FROM lm),
{chain}
SELECT CAST(node AS BIGINT) AS s_suppkey,
       CAST(count(*) AS BIGINT) AS n_landmarks,
       CAST(sum(1000000 // hop) AS BIGINT) AS harmonic_u6
FROM {prev} WHERE hop > 0 GROUP BY 1
"""


def test_g15_harmonic_centrality_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r16:g15_harmonic_centrality", fn=_g15_fn, oracle=_g15_sql(),
        category="graph",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_g15_multi_hop_paths_exist(spark, sf_oracle_dir):
    """The graph must exercise the 1/d weighting: some node must reach
    a landmark at hop ≥ 2 (harmonic_u6 not a multiple of 1000000 —
    i.e. NOT every reachable landmark adjacent), and non-landmark
    nodes must appear (the BFS actually expands past the seed set)."""
    rows = _g15_fn(spark, sf_oracle_dir).collect()
    assert rows
    assert any(r["harmonic_u6"] % 1000000 != 0 for r in rows)
    assert len(rows) > _G15_LANDMARKS


# ---------------------------------------------------------------------------
# p_ngram_novelty — train/test memorization metric
# ---------------------------------------------------------------------------

_NOV_TEST_MOD, _NOV_TEST_MIN = 10, 8  # doc_id % 10 ∈ {8, 9} → held out


def _novelty_fn(spark, sf_dir):
    """Held-out n-gram novelty — the memorization/generalization
    counterpart of p_decontaminate's contamination direction (public
    framing: Carlini et al.'s memorization metrics): split documents
    deterministically (doc_id % {_NOV_TEST_MOD} ≥ {_NOV_TEST_MIN} →
    held out), and for each held-out doc report the fraction of its
    DISTINCT word-3-grams that never occur in any train doc —
    novelty_ppm = 1000000·novel // total, truncating integer division.
    A low-novelty held-out doc is (near-)memorized from train; the
    metric is what a dedup/decontamination pipeline's acceptance test
    reads. Scale: the train gram vocabulary is a distinct posting
    table; held-out grams LEFT ANTI join it keyed by gram — the
    decontaminate shape, no corpus self-join. Docs too short for one
    3-gram are excluded (novelty undefined on an empty set)."""
    from x8313_etl_spark.operators.minhash import shingle_table

    d = load_table(spark, sf_dir, "documents")
    sh = shingle_table(d, "doc_id", "text", 3)
    is_test = F.col("doc_id") % _NOV_TEST_MOD >= _NOV_TEST_MIN
    train_grams = (
        sh.filter(~is_test)
        .select(F.explode("sh").alias("gram"))
        .distinct()
    )
    test = sh.filter(is_test).select(
        "doc_id", F.size("sh").cast("bigint").alias("total"), "sh"
    )
    novel = (
        test.select("doc_id", F.explode("sh").alias("gram"))
        .join(train_grams, "gram", "left_anti")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("novel"))
    )
    out = (
        test.select("doc_id", "total")
        .join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "total",
            F.coalesce("novel", F.lit(0)).cast("bigint").alias("novel"),
        )
    )
    # `div`, not `/`: exact int64 division mirroring DuckDB's `//` —
    # a double divide + cast truncates the ROUNDED quotient, which can
    # land one off the exact floor at a representability boundary
    return out.withColumn(
        "novelty_ppm", F.expr("(1000000 * novel) div total").cast("bigint")
    )


_NOVELTY_SQL = f"""
WITH s AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 0)),
           i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS toks
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
),
f AS (SELECT doc_id, toks FROM s WHERE len(toks) > 0),
train_grams AS (
  SELECT DISTINCT unnest(toks) AS gram FROM f
  WHERE doc_id % {_NOV_TEST_MOD} < {_NOV_TEST_MIN}
),
test AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS total, toks FROM f
  WHERE doc_id % {_NOV_TEST_MOD} >= {_NOV_TEST_MIN}
),
novel AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS novel
  FROM (SELECT doc_id, unnest(toks) AS gram FROM test) t
  ANTI JOIN train_grams g ON t.gram = g.gram
  GROUP BY 1
)
SELECT test.doc_id, test.total,
       CAST(coalesce(novel.novel, 0) AS BIGINT) AS novel,
       1000000 * coalesce(novel.novel, 0) // test.total AS novelty_ppm
FROM test LEFT JOIN novel ON test.doc_id = novel.doc_id
"""


def test_p_ngram_novelty_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r16:p_ngram_novelty", fn=_novelty_fn, oracle=_NOVELTY_SQL,
        category="pipeline",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_p_ngram_novelty_discriminates(spark, sf_oracle_dir):
    """The fixture's near-dup structure must make the metric
    informative: both low-novelty (train-overlapping) and high-novelty
    held-out docs exist, and ppm stays in [0, 1000000]."""
    rows = _novelty_fn(spark, sf_oracle_dir).collect()
    assert rows
    assert all(0 <= r["novelty_ppm"] <= 1000000 for r in rows)
    assert any(r["novelty_ppm"] < 500000 for r in rows)
    assert any(r["novelty_ppm"] > 500000 for r in rows)
