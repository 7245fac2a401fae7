"""Pre-registration oracle checks — round-11-authored candidate batch Q
(the r19 pipeline; batches J–P cover r12–r18).

Each test runs the EXACT driver compare (tests/oracle_utils
.compare_query, tolerance 0) on an ad-hoc UNREGISTERED QuerySpec, so a
future round's registration is a verbatim fn+oracle copy. ROADMAP.md
"Candidate surface" carries the notes.

Batch Q members:
- g17_ktruss: k-truss decomposition (Cohen 2008, public) of the
  co-supply graph — the EDGE sibling of g5's k-core: iteratively peel
  edges whose triangle support is below k−2, fixed peel rounds with a
  cap-sufficiency guard (the g8 discipline).
- a33_theil_sen: robust per-supplier trend — the Theil–Sen median
  slope over all month-pair slopes, each slope an exact integer
  (dy, dx) fraction ordered by its one-IEEE-division double; the
  robust sibling of a28's OLS.
- f17_codec_roundtrip: base64 and hex encode→decode round-trips over
  document text with per-lang digests — pins both losslessness AND
  that the encoded FORMS agree across engines (alphabet/padding/
  wrapping conventions).
- s26_path_options: recursiveFileLookup + pathGlobFilter discovery
  over a nested directory tree salted with decoy files the glob must
  exclude — the data-lake layout knobs, digest-verified.
- p_fim_transform: deterministic fill-in-the-middle training
  transform (Bavarian et al. 2022, public) — hash-derived split
  points, PSM reordering, per-doc digest evidence.
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
# g17_ktruss — edge-support peeling (the k-core's edge sibling)
# ---------------------------------------------------------------------------

_G17_K = 3  # keep edges with support ≥ k−2 = 1 (in ≥1 triangle)
_G17_ROUNDS = 3  # fixed peel rounds; cap-sufficiency pinned below


def _g17_support(e):
    """Triangle support per surviving edge (a<b): count triangles via
    the oriented wedge join, credit all three edges of each triangle."""
    e1 = e.select(F.col("s1").alias("a"), F.col("s2").alias("b"))
    e2 = e.select(F.col("s1").alias("b"), F.col("s2").alias("c"))
    e3 = e.select(F.col("s1").alias("a"), F.col("s2").alias("c"))
    tris = e1.join(e2, "b").join(e3, ["a", "c"])
    edges3 = tris.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("s1"), F.col("b").alias("s2")),
                F.struct(F.col("b").alias("s1"), F.col("c").alias("s2")),
                F.struct(F.col("a").alias("s1"), F.col("c").alias("s2")),
            )
        ).alias("p")
    ).select("p.s1", "p.s2")
    return edges3.groupBy("s1", "s2").agg(
        F.count(F.lit(1)).cast("bigint").alias("support")
    )


def _g17_fn(spark, sf_dir):
    """K-truss decomposition (k={_G17_K}) of the quantile-thresholded
    co-supply graph — the edge-level cohesion sibling of g5's k-core
    (Cohen 2008): iteratively drop every edge in fewer than k−2
    triangles; what survives is the densely-knit commerce backbone.
    Per round: one oriented wedge join among SURVIVING edges (Σ deg²
    candidate volume — the g3/g13 term, shrinking per round), a
    3-edge credit explode, and an anti-drop; {_G17_ROUNDS} fixed
    rounds on both sides (cap-sufficiency — peeling reaches its
    fixpoint within the cap on every fixture sf — is pinned by the
    guard below, the g8 discipline), each round checkpointed through
    the audited ledger. Output: surviving edges with their final
    support."""
    from x8313_etl_spark.audit import audited_checkpoint
    from x8313_etl_spark.queries.graph_q import _cosupply_edges

    e = _cosupply_edges(spark, sf_dir, "g17.edges")  # s1 < s2
    for _ in range(_G17_ROUNDS):
        sup = _g17_support(e)
        e = audited_checkpoint(
            "g17.round",
            e.join(sup, ["s1", "s2"], "inner").filter(
                F.col("support") >= _G17_K - 2
            ).select("s1", "s2"),
        )
    out = e.join(_g17_support(e), ["s1", "s2"], "inner")
    return out.select(
        F.col("s1").cast("bigint").alias("s1"),
        F.col("s2").cast("bigint").alias("s2"),
        "support",
    )


def _g17_sql():
    from x8313_etl_spark.queries.graph_q import _TRI_QUANTILE

    def support(src):
        return f"""(
  SELECT s1, s2, CAST(count(*) AS BIGINT) AS support FROM (
    SELECT e1.s1, e1.s2 FROM {src} e1
      JOIN {src} e2 ON e2.s1 = e1.s2
      JOIN {src} e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
    UNION ALL
    SELECT e1.s2, e2.s2 FROM {src} e1
      JOIN {src} e2 ON e2.s1 = e1.s2
      JOIN {src} e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
    UNION ALL
    SELECT e1.s1, e2.s2 FROM {src} e1
      JOIN {src} e2 ON e2.s1 = e1.s2
      JOIN {src} e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
  ) GROUP BY 1, 2
)"""

    rounds = []
    prev = "e0"
    for i in range(_G17_ROUNDS):
        rounds.append(
            f"e{i + 1} AS MATERIALIZED (\n"
            f"  SELECT e.s1, e.s2 FROM {prev} e\n"
            f"  JOIN {support(prev)} s ON s.s1 = e.s1 AND s.s2 = e.s2\n"
            f"  WHERE s.support >= {_G17_K - 2}\n"
            f")"
        )
        prev = f"e{i + 1}"
    chain = ",\n".join(rounds)
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT s1, s2, count(DISTINCT ok) AS shared FROM (
    SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, a.l_orderkey AS ok
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  ) GROUP BY 1, 2
),
t AS (SELECT CEIL(quantile_cont(shared, {_TRI_QUANTILE})) AS thr FROM pairs),
e0 AS MATERIALIZED (SELECT s1, s2 FROM pairs, t WHERE shared >= thr),
{chain}
SELECT CAST(e.s1 AS BIGINT) AS s1, CAST(e.s2 AS BIGINT) AS s2, s.support
FROM {prev} e JOIN {support(prev)} s ON s.s1 = e.s1 AND s.s2 = e.s2
"""


def test_g17_ktruss_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r19:g17_ktruss", fn=_g17_fn, oracle=_g17_sql(),
        category="graph",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_g17_peels_and_converges_within_cap(spark, sf_oracle_dir):
    """The peel must actually DROP edges on the fixture (else the
    operator tests nothing), keep a non-empty truss, and reach its
    fixpoint within the fixed round cap (one more round changes
    nothing — the g8 cap-sufficiency discipline)."""
    from x8313_etl_spark.queries.graph_q import _cosupply_edges

    e0 = _cosupply_edges(spark, sf_oracle_dir, "g17.captest")
    n0 = e0.count()
    out = _g17_fn(spark, sf_oracle_dir)
    survivors = out.count()
    assert 0 < survivors < n0
    assert out.filter(F.col("support") < _G17_K - 2).count() == 0
    # one extra peel round must be a no-op
    sup = _g17_support(out.select("s1", "s2"))
    again = (
        out.select("s1", "s2")
        .join(sup, ["s1", "s2"])
        .filter(F.col("support") >= _G17_K - 2)
        .count()
    )
    assert again == survivors, "peel not converged within the round cap"


# ---------------------------------------------------------------------------
# a33_theil_sen — robust median slope, exact fraction evidence
# ---------------------------------------------------------------------------


def _a33_fn(spark, sf_dir):
    """Theil–Sen robust trend per supplier (public estimator: the
    median of all pairwise slopes — up to a third of the points can be
    outliers without moving it; a28's OLS is the fragile sibling):
    points are (month-index, shipment count) — both exact integers —
    so every pairwise slope is the exact fraction (dy, dx) with
    dx > 0. The MEDIAN pick orders slopes by their dy/dx double (ONE
    IEEE division of exact int64s per pair — engines given identical
    integers produce identical doubles, so the order and therefore the
    lower-median pick are engine-exact; ties break on (dy, dx)) and
    emits the chosen fraction as evidence + its double. Scale: the
    pair term is per-supplier month-pairs — months are calendar-
    bounded (the fixture's ship dates span ~84 months → ≤ C(84,2) =
    3486 pairs per supplier), so the 'quadratic' is a calendar-squared
    constant per group, never corpus-sized."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("x"),
    )
    m = li.groupBy("l_suppkey", "x").agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    a = m.select("l_suppkey", F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = m.select("l_suppkey", F.col("x").alias("xj"), F.col("y").alias("yj"))
    pairs = (
        a.join(b, "l_suppkey")
        .filter(F.col("xi") < F.col("xj"))
        .select(
            "l_suppkey",
            (F.col("yj") - F.col("yi")).cast("bigint").alias("dy"),
            (F.col("xj") - F.col("xi")).cast("bigint").alias("dx"),
        )
        .withColumn(
            "slope", F.col("dy").cast("double") / F.col("dx").cast("double")
        )
    )
    w = Window.partitionBy("l_suppkey").orderBy("slope", "dy", "dx")
    cnt = Window.partitionBy("l_suppkey")
    ranked = pairs.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_pairs", F.count(F.lit(1)).over(cnt).cast("bigint")
    )
    # `div`, not `/`: (n+1)/2 is a DOUBLE in Spark, so rn == x.5 never
    # matches and every even-pair-count supplier silently vanishes
    # (caught at sf0.001 — sf0.01's suppliers all had odd counts)
    return (
        ranked.filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        .select(
            F.col("l_suppkey").cast("bigint").alias("s_suppkey"),
            "n_pairs",
            "dy",
            "dx",
            "slope",
        )
    )


_A33_SQL = """
WITH m AS (
  SELECT l_suppkey,
         date_part('year', l_shipdate) * 12 + date_part('month', l_shipdate) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM lineitem GROUP BY 1, 2
),
pairs AS (
  SELECT a.l_suppkey,
         CAST(b.y - a.y AS BIGINT) AS dy,
         CAST(b.x - a.x AS BIGINT) AS dx,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
  FROM m a JOIN m b ON a.l_suppkey = b.l_suppkey AND a.x < b.x
),
ranked AS (
  SELECT l_suppkey, dy, dx, slope,
         row_number() OVER (PARTITION BY l_suppkey
                            ORDER BY slope, dy, dx) AS rn,
         CAST(count(*) OVER (PARTITION BY l_suppkey) AS BIGINT) AS n_pairs
  FROM pairs
)
SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey, n_pairs, dy, dx, slope
FROM ranked WHERE rn = (n_pairs + 1) // 2
"""


def test_a33_theil_sen_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r19:a33_theil_sen", fn=_a33_fn, oracle=_A33_SQL,
        category="aggregates",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_a33_slopes_span_signs_and_pairs_bounded(spark, sf_oracle_dir):
    """Trends must span signs on the fixture, dx must be positive
    everywhere, and the per-supplier pair count must stay within the
    calendar bound."""
    rows = _a33_fn(spark, sf_oracle_dir).collect()
    assert rows
    assert any(r["slope"] > 0 for r in rows)
    assert any(r["slope"] < 0 for r in rows)
    assert all(r["dx"] > 0 for r in rows)
    assert all(r["n_pairs"] <= 3486 for r in rows)  # C(84, 2): calendar bound


# ---------------------------------------------------------------------------
# f17_codec_roundtrip — base64 / hex encode-decode, format-pinned
# ---------------------------------------------------------------------------


def _f17_fn(spark, sf_dir):
    """Binary-codec round-trips over document text: base64 and hex
    encode → decode, digested per lang. TWO things are pinned: the
    round-trip is lossless (decoded md5 equals the original's), and
    the encoded FORMS themselves hash equal across engines. The
    second pin surfaced a REAL convention split (measured at
    authoring): Spark's ``base64`` emits MIME folding — a ``\\r\\n``
    every 76 chars — while DuckDB's ``to_base64`` is unwrapped
    RFC-4648, so the operator canonicalizes to the unwrapped form
    (strip the fold) before digesting; the round-trip decodes the RAW
    chunked string (``unbase64`` accepts MIME), so losslessness is
    proven on the native form and format agreement on the canonical
    one. Map-only; digests are the s23 order-insensitive
    sorted-concat discipline."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    enc = d.select(
        "doc_id",
        "lang",
        F.base64(F.col("text").cast("binary")).alias("b64"),
        F.hex(F.col("text").cast("binary")).alias("hx"),
    ).withColumn(
        "b64_canonical", F.regexp_replace(F.col("b64"), "\r\n", "")
    )
    back = enc.select(
        "doc_id",
        "lang",
        "b64_canonical",
        "hx",
        F.unbase64("b64").cast("string").alias("from_b64"),
        F.unhex("hx").cast("string").alias("from_hex"),
    )

    def digest(col):
        return F.md5(
            F.concat_ws(
                "|",
                F.sort_array(
                    F.collect_list(
                        F.concat_ws(
                            ":", F.col("doc_id").cast("string"), F.md5(col)
                        )
                    )
                ),
            )
        )

    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        digest(F.col("b64_canonical")).alias("b64_digest"),
        digest(F.col("hx")).alias("hex_digest"),
        digest(F.col("from_b64")).alias("b64_roundtrip_digest"),
        digest(F.col("from_hex")).alias("hex_roundtrip_digest"),
    )


_F17_SQL = """
WITH enc AS (
  SELECT doc_id, lang,
         to_base64(encode(text)) AS b64,
         upper(hex(encode(text))) AS hx,
         text
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       md5(string_agg(CAST(doc_id AS VARCHAR) || ':' || md5(b64), '|'
           ORDER BY CAST(doc_id AS VARCHAR) || ':' || md5(b64)))
         AS b64_digest,
       md5(string_agg(CAST(doc_id AS VARCHAR) || ':' || md5(hx), '|'
           ORDER BY CAST(doc_id AS VARCHAR) || ':' || md5(hx)))
         AS hex_digest,
       md5(string_agg(CAST(doc_id AS VARCHAR) || ':' || md5(text), '|'
           ORDER BY CAST(doc_id AS VARCHAR) || ':' || md5(text)))
         AS b64_roundtrip_digest,
       md5(string_agg(CAST(doc_id AS VARCHAR) || ':' || md5(text), '|'
           ORDER BY CAST(doc_id AS VARCHAR) || ':' || md5(text)))
         AS hex_roundtrip_digest
FROM enc GROUP BY lang
"""


def test_f17_codec_roundtrip_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r19:f17_codec_roundtrip", fn=_f17_fn, oracle=_F17_SQL,
        category="functions",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_f17_roundtrip_equals_original(spark, sf_oracle_dir):
    """The decoded digests must equal a digest of the ORIGINAL text
    computed independently — losslessness, not just self-consistency."""
    rows = {r["lang"]: r for r in _f17_fn(spark, sf_oracle_dir).collect()}
    d = load_table(spark, sf_oracle_dir, "documents")
    orig = d.groupBy("lang").agg(
        F.md5(
            F.concat_ws(
                "|",
                F.sort_array(
                    F.collect_list(
                        F.concat_ws(
                            ":", F.col("doc_id").cast("string"), F.md5("text")
                        )
                    )
                ),
            )
        ).alias("dig")
    )
    for r in orig.collect():
        assert rows[r["lang"]]["b64_roundtrip_digest"] == r["dig"]
        assert rows[r["lang"]]["hex_roundtrip_digest"] == r["dig"]


# ---------------------------------------------------------------------------
# s26_path_options — recursive discovery + glob pruning, decoy-proofed
# ---------------------------------------------------------------------------


def _s26_fn(spark, sf_dir):
    """Data-lake directory discovery knobs: documents are written as
    parquet into a TWO-LEVEL nested tree (lang=<lang>/depth2/part
    files), the tree is salted with decoy files (.txt junk at both
    levels) that a plain parquet read would trip over or silently
    mis-включе, and the read uses recursiveFileLookup=true +
    pathGlobFilter='*.parquet' to discover exactly the real files.
    The per-lang digest proves the roundtrip — any decoy leaking in,
    any nested file missed, changes counts or hashes loudly. Scale:
    discovery is a driver-side listing (the knob real lakes use when
    partition dirs are irregular); the files themselves parallelize
    per split as usual."""
    import os
    import shutil
    import time as _time
    import uuid as _uuid

    from x8313_etl_spark.queries.sources_q import _tag, scratch

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    family = scratch(f"s26_paths_{_tag(sf_dir)}")
    cutoff = _time.time() - 1800
    for sub in os.listdir(family) if os.path.isdir(family) else []:
        pth = os.path.join(family, sub)
        try:
            if os.path.getmtime(pth) < cutoff:
                shutil.rmtree(pth, ignore_errors=True)
        except OSError:
            pass
    work = os.path.join(family, _uuid.uuid4().hex[:12])
    shutil.rmtree(work, ignore_errors=True)
    for lang_row in d.select("lang").distinct().collect():
        lang = lang_row["lang"]
        sub = os.path.join(work, f"lang={lang}", "depth2")
        (
            d.filter(F.col("lang") == lang)
            .write.mode("overwrite")
            .parquet(sub)
        )
        # decoys at both levels — the glob must exclude them
        with open(os.path.join(work, f"lang={lang}", "decoy.txt"), "w") as f:
            f.write("not parquet\n")
        with open(os.path.join(sub, "decoy2.txt"), "w") as f:
            f.write("also not parquet\n")
    back = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(work)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.md5(
            F.concat_ws(
                "|",
                F.sort_array(
                    F.collect_list(
                        F.concat_ws(
                            ":", F.col("doc_id").cast("string"), F.md5("text")
                        )
                    )
                ),
            )
        ).alias("content_digest"),
    )


_S26_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       md5(string_agg(CAST(doc_id AS VARCHAR) || ':' || md5(text), '|'
                      ORDER BY CAST(doc_id AS VARCHAR) || ':' || md5(text)))
         AS content_digest
FROM documents GROUP BY lang
"""


def test_s26_path_options_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r19:s26_path_options", fn=_s26_fn, oracle=_S26_SQL,
        category="sources",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_s26_decoys_actually_poison_a_naive_read(spark, sf_oracle_dir):
    """Reading the same tree WITHOUT the glob filter must fail or
    differ — otherwise the decoys prove nothing about the knobs."""
    import os

    from x8313_etl_spark.queries.sources_q import _tag, scratch

    family = scratch(f"s26_paths_{_tag(sf_oracle_dir)}")
    runs = sorted(
        (os.path.join(family, s) for s in os.listdir(family)),
        key=os.path.getmtime,
    )
    assert runs, "run dir missing — twin test must run first"
    work = runs[-1]
    try:
        n = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(work)
            .count()
        )
    except Exception:
        return  # naive read trips over the decoys — the knob is load-bearing
    total = load_table(spark, sf_oracle_dir, "documents").count()
    assert n != total, "decoys silently ignored: glob filter proves nothing"


# ---------------------------------------------------------------------------
# p_fim_transform — deterministic fill-in-the-middle split
# ---------------------------------------------------------------------------

_FIM_MIN_CHARS = 30
_FIM_LO_PPM, _FIM_SPAN_PPM = 200_000, 400_000  # split-point hash dials


def _fim_fn(spark, sf_dir):
    """Fill-in-the-middle training transform (Bavarian et al. 2022,
    public): split each document into (prefix, middle, suffix) at two
    DETERMINISTIC points — p1 at {_FIM_LO_PPM}–{_FIM_LO_PPM +
    _FIM_SPAN_PPM} ppm of the length and p2 likewise beyond p1, both
    derived from independent md5 buckets of the doc key (the
    p_hash_split discipline: same doc, same split, any engine, any
    partitioning) — and emit the PSM reordering (prefix, suffix,
    middle concatenated with sentinels) as a digest plus the integer
    split evidence. Docs under {_FIM_MIN_CHARS} chars are excluded
    (no meaningful middle). Map-only: the transform pipelines into
    the scan; at 100 TB it is a pure narrow stage."""
    from x8313_etl_spark.queries.corpus_q import _hash_bucket

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = d.filter(F.length("text") >= _FIM_MIN_CHARS)
    h1 = _hash_bucket(F.concat(F.col("doc_id").cast("string"), F.lit(":p1")), 1_000_000)
    h2 = _hash_bucket(F.concat(F.col("doc_id").cast("string"), F.lit(":p2")), 1_000_000)
    n = F.length("text").cast("bigint")
    # exact integer split points: p1 in [lo, lo+span) ppm of n, p2 beyond
    s = d.select(
        "doc_id",
        "text",
        n.alias("n_chars"),
        F.floor((n * (F.lit(_FIM_LO_PPM) + (h1 % _FIM_SPAN_PPM))) / 1_000_000)
        .cast("bigint")
        .alias("c1"),
        F.floor((n * (F.lit(_FIM_LO_PPM) + (h2 % _FIM_SPAN_PPM))) / 1_000_000)
        .cast("bigint")
        .alias("gap"),
    )
    s = s.select(
        "doc_id",
        "text",
        "n_chars",
        F.greatest(F.col("c1"), F.lit(1)).alias("p1"),
        F.least(
            F.col("c1") + F.greatest(F.col("gap"), F.lit(1)),
            F.col("n_chars") - 1,
        ).alias("p2"),
    ).filter(F.col("p1") < F.col("p2"))
    prefix = F.expr("substring(text, 1, CAST(p1 AS INT))")
    middle = F.expr("substring(text, CAST(p1 + 1 AS INT), CAST(p2 - p1 AS INT))")
    suffix = F.expr("substring(text, CAST(p2 + 1 AS INT), CAST(n_chars AS INT))")
    psm = F.concat(
        F.lit("<PRE>"), prefix, F.lit("<SUF>"), suffix, F.lit("<MID>"), middle
    )
    return s.select(
        "doc_id",
        "n_chars",
        "p1",
        "p2",
        F.md5(psm).alias("psm_md5"),
    )


def _fim_sql():
    from x8313_etl_spark.queries.corpus_q import _sql_hash_bucket

    h1 = _sql_hash_bucket("CAST(doc_id AS VARCHAR) || ':p1'", 1_000_000)
    h2 = _sql_hash_bucket("CAST(doc_id AS VARCHAR) || ':p2'", 1_000_000)
    return f"""
WITH d AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars
  FROM documents WHERE length(text) >= {_FIM_MIN_CHARS}
),
c AS (
  SELECT doc_id, text, n_chars,
         CAST(FLOOR((n_chars * ({_FIM_LO_PPM} + (({h1}) % {_FIM_SPAN_PPM})))
                    / 1000000.0) AS BIGINT) AS c1,
         CAST(FLOOR((n_chars * ({_FIM_LO_PPM} + (({h2}) % {_FIM_SPAN_PPM})))
                    / 1000000.0) AS BIGINT) AS gap
  FROM d
),
s AS (
  SELECT doc_id, text, n_chars,
         greatest(c1, 1) AS p1,
         least(c1 + greatest(gap, 1), n_chars - 1) AS p2
  FROM c
)
SELECT doc_id, n_chars, p1, p2,
       md5('<PRE>' || substr(text, 1, CAST(p1 AS INTEGER))
           || '<SUF>' || substr(text, CAST(p2 + 1 AS INTEGER))
           || '<MID>' || substr(text, CAST(p1 + 1 AS INTEGER),
                                 CAST(p2 - p1 AS INTEGER))) AS psm_md5
FROM s WHERE p1 < p2
"""


def test_p_fim_transform_twin(spark, sf_oracle_dir):
    spec = QuerySpec(
        name="r19:p_fim_transform", fn=_fim_fn, oracle=_fim_sql(),
        category="pipeline",
    )
    res = compare_query(spark, spec, sf_oracle_dir)
    assert res.ok, res.detail


def test_p_fim_parts_partition_the_doc(spark, sf_oracle_dir):
    """Split points must be strictly interior and ordered (a prefix,
    middle, AND suffix all non-empty), and the split fractions must
    vary across docs (hash-derived, not constant)."""
    rows = _fim_fn(spark, sf_oracle_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["p1"] < r["p2"] <= r["n_chars"] - 1
    fracs = {round(r["p1"] / r["n_chars"], 2) for r in rows}
    assert len(fracs) > 3
