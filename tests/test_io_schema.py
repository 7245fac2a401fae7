"""S2 schema enforcement: pinned schemas match the real fixtures, and
drift (including silently-nullable missing columns) raises."""

from __future__ import annotations

import pytest

from x8313_etl_spark.io import SchemaDriftError, validate_table_schema
from x8313_etl_spark.schemas import TABLE_NAMES


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_pinned_schemas_match_fixtures(spark, sf_dir, name):
    validate_table_schema(spark, sf_dir, name)


def test_missing_column_raises(spark, sf_dir, monkeypatch):
    from pyspark.sql.types import StringType, StructField, StructType

    import x8313_etl_spark.io as io_mod

    bad = StructType(
        [StructField("r_regionkey", StringType()), StructField("ghost", StringType())]
    )
    monkeypatch.setitem(io_mod.SCHEMAS, "region", bad)
    with pytest.raises(SchemaDriftError) as ei:
        validate_table_schema(spark, sf_dir, "region")
    msg = str(ei.value)
    assert "ghost" in msg and "r_name" in msg and "r_regionkey" in msg


def test_embedding_dim_matches_pin(spark, sf_dir):
    """The hyperplane-LSH sign matrix, IVF cosine folds, and int8
    quantizer are all generated for EMBEDDING_DIM-length vectors; a
    fixture regeneration with a different dim would zip_with-truncate
    silently instead of failing. Pin it."""
    import pyspark.sql.functions as F

    from x8313_etl_spark.io import load_table
    from x8313_etl_spark.schemas import EMBEDDING_DIM

    stats = (
        load_table(spark, sf_dir, "embeddings")
        .agg(
            F.min(F.size("embedding")).alias("lo"),
            F.max(F.size("embedding")).alias("hi"),
        )
        .first()
    )
    assert (stats.lo, stats.hi) == (EMBEDDING_DIM, EMBEDDING_DIM), stats
