"""Pre-registration oracle checks — round-10-authored candidate batch K
(the r13 pipeline; ≤5/round budget — batch I in
tests/test_r11_candidates.py is r11's, batch J in
tests/test_r12_candidates.py is r12's).

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0 — including the int128 oracle-type gate and
the strict int-vs-float transport dtype check) on an ad-hoc
UNREGISTERED QuerySpec, so a future round's registration is a verbatim
fn+oracle copy. Twins verify at BOTH fixture sfs. ROADMAP.md
"Candidate surface" carries the registration notes.

Batch K members:
- g14_label_propagation: fixed-round synchronous label propagation
  (Raghavan et al. 2007, public) over the supplier↔customer graph —
  the community-detection primitive next to concomp/pagerank; integer
  neighbor-label counts, (count DESC, label ASC) tie-break, so both
  engines agree bit-for-bit with no fixed-point trick needed.
- w19_rfm_cells: RFM (recency/frequency/monetary) quartile cells per
  customer — the classic segmentation analytics op; quartiles are
  rank-derived integers through the two-phase global rank (no
  all-to-one exchange), never value-interpolated.
- p_span_corruption: T5-style span-corruption schedule (Raffel et al.
  2020, public) — deterministic hash-positioned 3-token mask spans,
  one per n//20 tokens, non-overlapping by strided construction;
  map-only explode, the schedule a denoising-objective data loader
  consumes.
- m12_dynamic_partition_overwrite: INSERT OVERWRITE of only the
  partitions present in the incoming batch (Spark's native
  partitionOverwriteMode=dynamic write option) — the daily idempotent
  re-run primitive the m-family's MERGE variants don't cover.
- p_budget_allocation: exact largest-remainder (Hamilton) allocation
  of a global document budget across sources, then the top-quota docs
  per source by (n_chars DESC, doc_id) — token/doc-budgeted curation
  with integer-exact quotas that sum to the budget by construction.
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
# g14_label_propagation — fixed-round synchronous LPA, integer counts
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _lpa_fn(spark, sf_dir):
    """Synchronous label propagation, _LPA_ROUNDS rounds, over the same
    symmetric supplier↔customer graph as g1/g2 (edge built once through
    the audited checkpoint, both orientations by map-side explode — the
    g2 discipline). Every node starts as its own label; each round a
    node takes the MODE of its neighbors' previous-round labels, ties
    to the smaller label string. Counts are exact integers and the
    tie-break is a total order, so the round-R labeling is engine-exact
    with no fixed-point machinery (unlike pagerank's mass division).
    Per round: one edge⋈labels shuffle on src (same key every round),
    one (dst, lab) count agg, one map-side WindowGroupLimit argmax —
    |E|-linear, the Pregel cost model; per-round audited checkpoints
    keep lineage flat (keys g14.*)."""
    from x8313_etl_spark.audit import audited_checkpoint

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    ed = audited_checkpoint(
        "g14.edges",
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
                )
            ).alias("p")
        ).select("p.src", "p.dst"),
    )
    labels = audited_checkpoint(
        "g14.l0",
        ed.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lab")),
    )
    wbest = Window.partitionBy("dst").orderBy(F.col("c").desc(), F.col("lab"))
    for _ in range(_LPA_ROUNDS):
        cnt = (
            ed.join(labels, ed.src == labels.node)
            .groupBy(ed.dst, F.col("lab"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = audited_checkpoint(
            "g14.round",
            cnt.withColumn("rn", F.row_number().over(wbest))
            .filter(F.col("rn") == 1)
            .select(F.col("dst").alias("node"), "lab"),
        )
    return labels.select("node", F.col("lab").alias("label"))


def _lpa_sql(rounds: int = _LPA_ROUNDS) -> str:
    ctes = [
        """e AS MATERIALIZED (
  SELECT DISTINCT 'S' || CAST(l.l_suppkey AS VARCHAR) AS src,
                  'C' || CAST(o.o_custkey AS VARCHAR) AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)""",
        "ed AS MATERIALIZED (SELECT src, dst FROM e "
        "UNION ALL SELECT dst AS src, src AS dst FROM e)",
        "l0 AS MATERIALIZED (SELECT node, node AS lab FROM "
        "(SELECT DISTINCT src AS node FROM ed))",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""c{r} AS MATERIALIZED (
  SELECT ed.dst AS node, p.lab, CAST(count(*) AS BIGINT) AS c
  FROM ed JOIN l{r - 1} p ON ed.src = p.node
  GROUP BY ed.dst, p.lab
),
l{r} AS MATERIALIZED (
  SELECT node, lab FROM (
    SELECT node, lab,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
    FROM c{r}
  ) WHERE rn = 1
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, lab AS label FROM l{rounds}"
    )


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_g14_label_propagation_twin(spark, d):
    spec = QuerySpec(
        name="r13:g14_label_propagation", fn=_lpa_fn, oracle=_lpa_sql(),
        category="graph",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_g14_labels_coarsen_but_not_collapse(spark, sf_oracle_dir):
    """LPA must actually propagate: strictly fewer distinct labels than
    nodes (communities formed), but more than one (no total collapse),
    and some node must carry a label from the OTHER side of the
    bipartition (evidence labels crossed an edge)."""
    rows = _lpa_fn(spark, sf_oracle_dir).collect()
    n_nodes = len(rows)
    labs = {r.label for r in rows}
    assert 1 < len(labs) < n_nodes
    assert any(r.node[0] != r.label[0] for r in rows)


# ---------------------------------------------------------------------------
# w19_rfm_cells — rank-derived RFM quartiles, two-phase global rank
# ---------------------------------------------------------------------------


def _rfm_fn(spark, sf_dir):
    """RFM quartile cells per customer. Recency/frequency/monetary are
    one groupBy over orders (cents as exact int64); each dimension's
    quartile is RANK-derived — q = rank*4 div n + 1 over the total
    order (value ASC, c_custkey) — through the two-phase global rank
    (operators/globalrank.py), so no value interpolation, no
    all-to-one exchange, and both engines agree exactly. q=4 is 'best'
    on every axis (most recent / most frequent / highest spend). The
    base table is pooled: it feeds three rank passes (keys w19.*)."""
    from x8313_etl_spark.operators.cachepool import swap_persist
    from x8313_etl_spark.operators.globalrank import with_global_rank

    o = load_table(spark, sf_dir, "orders")
    base = swap_persist(
        "w19.base",
        o.groupBy("o_custkey").agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
                "monetary_cents"
            ),
        ).select(
            F.col("o_custkey").alias("c_custkey"),
            "last_day",
            "frequency",
            "monetary_cents",
        ),
    )
    r = with_global_rank(
        base,
        [F.col("last_day").asc(), F.col("c_custkey").asc()],
        32,
        "w19.rank_r",
        rank_col="r_rn",
        count_col="n",
    )
    r = with_global_rank(
        r,
        [F.col("frequency").asc(), F.col("c_custkey").asc()],
        32,
        "w19.rank_f",
        rank_col="f_rn",
    )
    r = with_global_rank(
        r,
        [F.col("monetary_cents").asc(), F.col("c_custkey").asc()],
        32,
        "w19.rank_m",
        rank_col="m_rn",
    )
    q = lambda rn: F.expr(f"({rn} * 4) div n") + 1
    return r.select(
        "c_custkey",
        "last_day",
        F.col("frequency").cast("bigint").alias("frequency"),
        "monetary_cents",
        q("r_rn").cast("int").alias("r_q"),
        q("f_rn").cast("int").alias("f_q"),
        q("m_rn").cast("int").alias("m_q"),
        F.concat(
            q("r_rn").cast("string"), q("f_rn").cast("string"), q("m_rn").cast("string")
        ).alias("rfm_cell"),
    )


_RFM_SQL = """
WITH base AS MATERIALIZED (
  SELECT o_custkey AS c_custkey,
         CAST(max(CAST(o_orderdate AS DATE)) AS DATE) AS last_day,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY o_custkey
),
r AS MATERIALIZED (
  SELECT *,
         row_number() OVER (ORDER BY last_day, c_custkey) - 1 AS r_rn,
         row_number() OVER (ORDER BY frequency, c_custkey) - 1 AS f_rn,
         row_number() OVER (ORDER BY monetary_cents, c_custkey) - 1 AS m_rn,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM base
)
SELECT c_custkey, last_day, frequency, monetary_cents,
       CAST(r_rn * 4 // n + 1 AS INTEGER) AS r_q,
       CAST(f_rn * 4 // n + 1 AS INTEGER) AS f_q,
       CAST(m_rn * 4 // n + 1 AS INTEGER) AS m_q,
       CAST(r_rn * 4 // n + 1 AS VARCHAR)
         || CAST(f_rn * 4 // n + 1 AS VARCHAR)
         || CAST(m_rn * 4 // n + 1 AS VARCHAR) AS rfm_cell
FROM r
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_w19_rfm_cells_twin(spark, d):
    spec = QuerySpec(
        name="r13:w19_rfm_cells", fn=_rfm_fn, oracle=_RFM_SQL,
        category="windows",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_w19_quartiles_are_balanced_and_full(spark, sf_oracle_dir):
    """Every quartile 1..4 must be populated on every axis with near-n/4
    counts (rank-derived buckets can differ by at most the remainder),
    and more than one distinct cell must exist."""
    import collections

    rows = _rfm_fn(spark, sf_oracle_dir).collect()
    n = len(rows)
    for axis in ("r_q", "f_q", "m_q"):
        cnt = collections.Counter(getattr(r, axis) for r in rows)
        assert set(cnt) == {1, 2, 3, 4}, (axis, dict(cnt))
        assert max(cnt.values()) - min(cnt.values()) <= 1 + n % 4
    assert len({r.rfm_cell for r in rows}) > 1


# ---------------------------------------------------------------------------
# p_span_corruption — deterministic strided mask-span schedule
# ---------------------------------------------------------------------------

_SPAN_LEN = 3
_SPAN_EVERY = 20  # one span per 20 tokens (≈15% corruption at len 3)
_SPAN_MIN_N = 8


def _span_fn(spark, sf_dir):
    """T5-style span-corruption schedule: documents with ≥ _SPAN_MIN_N
    whitespace tokens get n//_SPAN_EVERY (min 1) mask spans of
    _SPAN_LEN tokens. Spans are NON-OVERLAPPING by construction: the
    token axis is cut into n_spans equal strides and span i starts at
    i*stride + H(doc_id-i) % (stride-2) (md5 bucket — the house
    deterministic-hash rule), so every span fits inside its own stride.
    Map-only: one scan, one explode of a per-doc integer sequence — no
    shuffle at any scale; deterministic, repartition-stable, resumable
    (the reasons an RNG can't do this job). Output is the (doc, span,
    start, masked-text) schedule a denoising-objective loader consumes."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    t = d.select(
        "doc_id", toks.alias("toks"), F.size(toks).cast("bigint").alias("n")
    ).filter(F.col("n") >= _SPAN_MIN_N)
    t = t.withColumn(
        "n_spans", F.greatest(F.lit(1), F.expr(f"n div {_SPAN_EVERY}"))
    ).withColumn("stride", F.expr("n div n_spans"))
    s = t.select(
        "doc_id",
        "toks",
        "stride",
        F.explode(F.sequence(F.lit(0), F.col("n_spans") - 1)).alias("span_id"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("-"),
                    F.col("span_id").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    start = F.col("span_id") * F.col("stride") + F.pmod(
        h, F.col("stride") - F.lit(_SPAN_LEN - 1)
    )
    return s.select(
        "doc_id",
        F.col("span_id").cast("bigint").alias("span_id"),
        start.cast("bigint").alias("start"),
        F.concat_ws(
            " ", F.slice(F.col("toks"), start.cast("int") + 1, _SPAN_LEN)
        ).alias("masked"),
    )


_SPAN_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
),
d AS MATERIALIZED (
  SELECT doc_id, toks, n,
         greatest(1, n // {_SPAN_EVERY}) AS n_spans,
         n // greatest(1, n // {_SPAN_EVERY}) AS stride
  FROM t WHERE n >= {_SPAN_MIN_N}
),
s AS (
  SELECT doc_id, toks,
         CAST(g.i AS BIGINT) AS span_id,
         CAST(g.i * stride
              + (CAST(CONCAT('0x', substr(md5(
                   CAST(doc_id AS VARCHAR) || '-' || CAST(g.i AS VARCHAR)
                 ), 1, 15)) AS BIGINT) % (stride - {_SPAN_LEN - 1}))
           AS BIGINT) AS start
  FROM d, unnest(generate_series(0, n_spans - 1)) AS g(i)
)
SELECT doc_id, span_id, start,
       array_to_string(list_slice(toks, start + 1, start + {_SPAN_LEN}), ' ')
         AS masked
FROM s
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_p_span_corruption_twin(spark, d):
    spec = QuerySpec(
        name="r13:p_span_corruption", fn=_span_fn, oracle=_SPAN_SQL,
        category="pipeline",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_p_span_corruption_spans_disjoint_and_in_bounds(spark, sf_oracle_dir):
    """The structural contract: per doc, spans are non-overlapping,
    inside the token range, every masked string holds exactly
    _SPAN_LEN tokens, and multi-span docs exist (the explode is
    non-trivially exercised)."""
    import collections

    rows = _span_fn(spark, sf_oracle_dir).collect()
    assert rows
    per_doc = collections.defaultdict(list)
    for r in rows:
        per_doc[r.doc_id].append(r)
        assert len(r.masked.split(" ")) == _SPAN_LEN
    assert any(len(v) > 1 for v in per_doc.values())
    for spans in per_doc.values():
        spans.sort(key=lambda r: r.start)
        for a, b in zip(spans, spans[1:]):
            assert a.start + _SPAN_LEN <= b.start


# ---------------------------------------------------------------------------
# m12_dynamic_partition_overwrite — native dynamic INSERT OVERWRITE
# ---------------------------------------------------------------------------


def _m12_fn(spark, sf_dir):
    """Dynamic partition overwrite — Spark's native
    ``partitionOverwriteMode=dynamic`` write option: the second write
    replaces ONLY the partitions present in the incoming batch
    (nations 0–2, and only their even keys survive, proving whole-
    partition REPLACEMENT, not row merge), while every other partition
    keeps its original files untouched. This is the idempotent daily
    re-run primitive (recompute one day/region, overwrite just it)
    that the m-family's MERGE/snapshot variants don't cover. At 100 TB
    the cost is the delta's partitions only — the base table is never
    rewritten or even read by the write path."""
    from x8313_etl_spark.queries.sources_q import _tag, scratch

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    path = scratch(f"m12_dynp_{_tag(sf_dir)}")
    c.write.mode("overwrite").partitionBy("c_nationkey").parquet(path)
    delta = c.filter(
        (F.col("c_nationkey") < 3) & (F.col("c_custkey") % 2 == 0)
    ).select(
        "c_custkey",
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        "c_nationkey",
    )
    delta.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("c_nationkey").parquet(path)
    back = spark.read.parquet(path)
    return back.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
    )


_M12_SQL = """
SELECT c_custkey, c_acctbal + 1000.0 AS acctbal,
       CAST(c_nationkey AS INTEGER) AS c_nationkey
FROM customer WHERE c_nationkey < 3 AND c_custkey % 2 = 0
UNION ALL
SELECT c_custkey, c_acctbal AS acctbal,
       CAST(c_nationkey AS INTEGER) AS c_nationkey
FROM customer WHERE c_nationkey >= 3
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_m12_dynamic_partition_overwrite_twin(spark, d):
    spec = QuerySpec(
        name="r13:m12_dynamic_partition_overwrite", fn=_m12_fn,
        oracle=_M12_SQL, category="etl",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_m12_untouched_partitions_keep_odd_keys(spark, sf_oracle_dir):
    """The discriminating facts: overwritten partitions (<3) lost their
    odd keys (whole-partition replacement) while untouched partitions
    kept them, and both partition groups are non-empty."""
    rows = _m12_fn(spark, sf_oracle_dir).collect()
    low = [r for r in rows if r.c_nationkey < 3]
    high = [r for r in rows if r.c_nationkey >= 3]
    assert low and high
    assert all(r.c_custkey % 2 == 0 for r in low)
    assert any(r.c_custkey % 2 == 1 for r in high)


# ---------------------------------------------------------------------------
# p_budget_allocation — largest-remainder quota + per-source top picks
# ---------------------------------------------------------------------------

_BUDGET_N = 200


def _budget_fn(spark, sf_dir):
    """Largest-remainder (Hamilton) allocation of a _BUDGET_N-document
    budget across sources, then each source's top-quota docs by
    (n_chars DESC, doc_id) — the budgeted-curation op behind "give me
    exactly N docs, proportional to source sizes, best-first". Quotas
    are exact integers that sum to the budget by construction: base
    share (N·cnt) div total per source, the remainder ranked (rem DESC,
    source) and the leftover distributed +1 down that ranking. The
    allocation table is SOURCE-sized (bounded: ~10 rows), so its
    single-partition windows are over a bounded table (the dq4/dq8
    shape) and it broadcasts into the one corpus-wide pass; the only
    full shuffle is the per-source top-quota rank."""
    from x8313_etl_spark.operators.cachepool import swap_persist

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    per_src = swap_persist(
        "pba.src",
        d.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")),
    )
    wall = Window.partitionBy()
    a = per_src.select(
        "source",
        "cnt",
        F.sum("cnt").over(wall).alias("t"),
    ).select(
        "source",
        "cnt",
        F.expr(f"({_BUDGET_N} * cnt) div t").alias("base"),
        ((F.lit(_BUDGET_N) * F.col("cnt")) % F.col("t")).alias("rem"),
    )
    a = a.select(
        "source",
        "cnt",
        "base",
        "rem",
        (F.lit(_BUDGET_N) - F.sum("base").over(wall)).alias("leftover"),
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), F.col("source")))
        .alias("rrank"),
    )
    alloc = a.select(
        "source",
        (
            F.col("base")
            + F.when(F.col("rrank") <= F.col("leftover"), 1).otherwise(0)
        ).cast("bigint").alias("quota"),
    )
    wpick = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.join(F.broadcast(alloc), "source")
        .withColumn("pick_rank", F.row_number().over(wpick))
        .filter(F.col("pick_rank") <= F.col("quota"))
        .select(
            "doc_id",
            "source",
            F.col("pick_rank").cast("bigint").alias("pick_rank"),
            "quota",
        )
    )


_BUDGET_SQL = f"""
WITH per_src AS MATERIALIZED (
  SELECT source, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY source
),
a AS MATERIALIZED (
  SELECT source, cnt,
         ({_BUDGET_N} * cnt) // CAST(SUM(cnt) OVER () AS BIGINT) AS base,
         ({_BUDGET_N} * cnt) % CAST(SUM(cnt) OVER () AS BIGINT) AS rem
  FROM per_src
),
alloc AS MATERIALIZED (
  SELECT source,
         CAST(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                            <= {_BUDGET_N} - CAST(SUM(base) OVER () AS BIGINT)
                     THEN 1 ELSE 0 END AS BIGINT) AS quota
  FROM a
)
SELECT doc_id, source, pick_rank, quota FROM (
  SELECT d.doc_id, d.source,
         CAST(row_number() OVER (PARTITION BY d.source
                                 ORDER BY d.n_chars DESC, d.doc_id)
           AS BIGINT) AS pick_rank,
         alloc.quota
  FROM documents d JOIN alloc ON d.source = alloc.source
) WHERE pick_rank <= quota
"""


@pytest.mark.parametrize("d", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_p_budget_allocation_twin(spark, d):
    spec = QuerySpec(
        name="r13:p_budget_allocation", fn=_budget_fn, oracle=_BUDGET_SQL,
        category="pipeline",
    )
    res = compare_query(spark, spec, d)
    assert res.ok, res.detail


def test_p_budget_allocation_sums_to_budget_and_is_proportional(
    spark, sf_oracle_dir
):
    """The Hamilton contract: selected rows number EXACTLY the budget,
    every source's pick count equals its quota, and each quota is
    within 1 of the exact proportional share."""
    import collections

    rows = _budget_fn(spark, sf_oracle_dir).collect()
    assert len(rows) == _BUDGET_N
    picks = collections.Counter(r.source for r in rows)
    quotas = {r.source: r.quota for r in rows}
    assert picks == collections.Counter(quotas)  # count per source == quota
    corpus = collections.Counter(
        r.source
        for r in load_table(spark, sf_oracle_dir, "documents")
        .select("source")
        .collect()
    )
    total = sum(corpus.values())
    for src, q in quotas.items():
        exact = _BUDGET_N * corpus[src] / total
        assert abs(q - exact) < 1.0, (src, q, exact)
