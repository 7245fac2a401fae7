"""SURVEY.md §3 entry-point 2: the same queries through spark.sql()
must equal the DataFrame-API form (shared Catalyst pipeline)."""

from __future__ import annotations

import pyspark.sql.functions as F

from x8313_etl_spark.io import register_temp_views
from x8313_etl_spark.registry import registry

from .oracle_utils import canonical_rows


def _df_equal(a, b) -> bool:
    pa_, pb = a.toPandas(), b.toPandas()
    return canonical_rows(pa_) == canonical_rows(pb)


def test_q1_sql_form_matches_dataframe_form(spark, sf_oracle_dir):
    register_temp_views(spark, sf_oracle_dir)
    df_form = registry()["q1_pricing_summary"].fn(spark, sf_oracle_dir)
    # the DuckDB oracle string is ANSI enough to be the Spark SQL form too
    sql_form = spark.sql(registry()["q1_pricing_summary"].oracle)
    assert _df_equal(df_form, sql_form)


def test_join_sql_form_matches_dataframe_form(spark, sf_oracle_dir):
    register_temp_views(spark, sf_oracle_dir)
    df_form = registry()["j1_inner_equi_join"].fn(spark, sf_oracle_dir)
    sql_form = spark.sql(registry()["j1_inner_equi_join"].oracle)
    assert _df_equal(df_form, sql_form)


def test_window_sql_form_matches_dataframe_form(spark, sf_oracle_dir):
    register_temp_views(spark, sf_oracle_dir)
    df_form = registry()["w1_ranking"].fn(spark, sf_oracle_dir)
    sql_form = spark.sql(registry()["w1_ranking"].oracle)
    assert _df_equal(df_form, sql_form)
