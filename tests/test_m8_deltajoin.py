"""m8 delta-join view maintenance: the Z-set algebra on crafted rows.

The registered query's gate is the full-recompute twin on fixture data;
these tests pin the four-term cancellation cases individually and the
sequential-batch composition law on literals small enough to audit by
hand.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from x8313_etl_spark.queries.etl_q import m8_delta_join_maintain

A_SCHEMA = "c_custkey long, c_nationkey int, bal double"
B_SCHEMA = "o_orderkey long, o_custkey long, price double"


def _a(spark, rows):
    return spark.createDataFrame(rows, A_SCHEMA)


def _b(spark, rows):
    return spark.createDataFrame(rows, B_SCHEMA)


def _za(spark, rows):
    return spark.createDataFrame(rows, A_SCHEMA + ", am int")


def _zb(spark, rows):
    return spark.createDataFrame(rows, B_SCHEMA + ", bm int")


def _view(a, b):
    return b.join(a, b.o_custkey == a.c_custkey).select(
        "o_orderkey", "c_custkey", "c_nationkey", "bal", "price"
    )


def _apply(df, zset):
    """Consolidate a base relation with a Z-set delta (m>0 survives)."""
    cols = df.columns
    return (
        df.withColumn("m", F.lit(1))
        .unionByName(zset.withColumnRenamed(zset.columns[-1], "m"))
        .groupBy(*cols)
        .agg(F.sum("m").alias("m"))
        .filter(F.col("m") > 0)
        .select(*cols)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_same_batch_interactions_cancel_exactly(spark):
    # customers: 1 updated, 2 deleted, 3 untouched; customer 9 inserted
    a0 = _a(spark, [(1, 10, 100.0), (2, 20, 200.0), (3, 30, 300.0)])
    da = _za(spark, [
        (1, 10, 100.0, -1), (1, 10, 150.0, 1),   # update 1: 100 -> 150
        (2, 20, 200.0, -1),                       # delete 2
        (9, 90, 0.0, 1),                          # insert 9 (no orders)
    ])
    # orders: o11→c1 updated, o12→c1 deleted, o21→c2 untouched (but its
    # customer dies), o31→c3 untouched, o22→c2 INSERTED same batch as
    # c2's delete (must net to zero), o13→c1 inserted (joins new c1)
    b0 = _b(spark, [(11, 1, 1.0), (12, 1, 2.0), (21, 2, 3.0), (31, 3, 4.0)])
    db = _zb(spark, [
        (11, 1, 1.0, -1), (11, 1, 1.5, 1),        # update o11
        (12, 1, 2.0, -1),                          # delete o12
        (22, 2, 9.0, 1),                           # insert → deleted cust
        (13, 1, 7.0, 1),                           # insert → updated cust
    ])
    got = m8_delta_join_maintain(_view(a0, b0), a0, b0, da, db)
    a1 = _apply(a0, da)
    b1 = _apply(b0, db)
    want = _view(a1, b1)
    assert _rows(got) == _rows(want)
    # the audit-by-hand expectations, explicitly:
    assert _rows(got) == [
        (11, 1, 10, 150.0, 1.5),   # update×update → exactly (new, new)
        (13, 1, 10, 150.0, 7.0),   # insert joins the UPDATED customer
        (31, 3, 30, 300.0, 4.0),   # untouched
    ]  # o12 deleted; o21 lost its customer; o22 netted to zero; c9 joins nothing


def test_sequential_batches_compose(spark):
    a0 = _a(spark, [(1, 10, 100.0), (2, 20, 200.0)])
    b0 = _b(spark, [(11, 1, 1.0), (21, 2, 3.0)])
    da1 = _za(spark, [(1, 10, 100.0, -1), (1, 10, 111.0, 1)])
    db1 = _zb(spark, [(12, 1, 5.0, 1)])
    da2 = _za(spark, [(2, 20, 200.0, -1)])
    db2 = _zb(spark, [(12, 1, 5.0, -1), (12, 1, 6.0, 1), (22, 2, 9.0, 1)])

    v1 = m8_delta_join_maintain(_view(a0, b0), a0, b0, da1, db1)
    a1, b1 = _apply(a0, da1), _apply(b0, db1)
    v2_seq = m8_delta_join_maintain(v1, a1, b1, da2, db2)

    a2, b2 = _apply(a1, da2), _apply(b1, db2)
    assert _rows(v2_seq) == _rows(_view(a2, b2))
