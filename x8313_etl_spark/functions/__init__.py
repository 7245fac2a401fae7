"""Expression-level function helpers (vector math, text, deterministic aggs).

Everything here produces Column expressions built from
``pyspark.sql.functions`` — JVM-side, codegen-friendly; no Python UDFs
in any hot path (SURVEY.md §4).
"""
