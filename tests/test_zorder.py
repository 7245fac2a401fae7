"""Z-order layout (s12): prove the clustering property on a real
written layout — matching rows for a 2-D box concentrate in few files
under z-sort, versus scattering everywhere under hash layout. This is
the file-skipping mechanism at scale: tight per-file min/max intervals
on BOTH filter columns mean the parquet reader can drop whole files."""

from __future__ import annotations

import pyspark.sql.functions as F

from x8313_etl_spark.io import load_table
from x8313_etl_spark.queries.sources_q import scratch
from x8313_etl_spark.registry import registry

N_FILES = 8


def _box():
    return (F.col("o_custkey").between(100, 199)) & (
        F.col("o_totalprice").between(100_000, 150_000)
    )


def _files_touched(df):
    return (
        df.filter(_box())
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )


def test_zorder_concentrates_box_queries(spark, sf_oracle_dir):
    z = registry()["s12_zorder_layout"].fn(spark, sf_oracle_dir)
    orders = load_table(spark, sf_oracle_dir, "orders")
    clustered = orders.join(z.select("o_orderkey", "z"), "o_orderkey")

    zpath = scratch("zorder_layout_test")
    (
        clustered.repartitionByRange(N_FILES, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(zpath)
    )
    hpath = scratch("hash_layout_test")
    clustered.repartition(N_FILES).write.mode("overwrite").parquet(hpath)

    z_files = _files_touched(spark.read.parquet(zpath))
    h_files = _files_touched(spark.read.parquet(hpath))

    # identical rows either way — layout must never change results
    n_direct = orders.filter(_box()).count()
    assert spark.read.parquet(zpath).filter(_box()).count() == n_direct
    assert n_direct > 0

    # hash spreads matches over ~every file; z-order confines them
    assert h_files >= N_FILES - 1, (z_files, h_files)
    assert z_files <= N_FILES // 2, (z_files, h_files)
