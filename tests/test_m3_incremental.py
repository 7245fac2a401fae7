"""m3_incremental_refresh: batch-split invariance (the t15 discipline).

The registered query's own gate proves incremental == full recompute.
This test pins the property that makes the merge a real streaming/CDC
maintenance operator: applying the delta as ONE batch, as TWO key-split
batches, or in the opposite order, all land on the identical view —
i.e. m3_merge is the combine step of a distributed aggregate
(commutative + associative over disjoint key batches).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from x8313_etl_spark.queries.etl_q import (
    _m3_base,
    m3_delta,
    m3_materialize,
    m3_merge,
)


def _rows(df):
    return sorted(
        (r.c_nationkey, r.cnt, str(r.total_dec)) for r in df.collect()
    )


def test_m3_batch_split_invariance(spark, sf_dir):
    base = _m3_base(spark, sf_dir)
    mv = m3_materialize(base)
    delta = m3_delta(base).withColumn(
        "__h", F.abs(F.hash("c_nationkey", "dn", "ds")) % 2
    )
    d0 = delta.filter(F.col("__h") == 0).drop("__h")
    d1 = delta.filter(F.col("__h") == 1).drop("__h")

    one_shot = _rows(m3_merge(mv, delta.drop("__h")))
    split = _rows(m3_merge(m3_merge(mv, d0), d1))
    split_rev = _rows(m3_merge(m3_merge(mv, d1), d0))

    assert one_shot == split
    assert one_shot == split_rev
