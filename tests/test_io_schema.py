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
