"""x8313_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first implementation of the capability surface of
``kulidje/x8313-etl`` (reference tree was empty at survey time — see
SURVEY.md §0; the capability contract is SURVEY.md §2).

Design (SURVEY.md §3-§4): this package is a thin, well-factored operator
layer over the PySpark DataFrame API. We add no custom IR, parser,
optimizer, or executor — Catalyst + Tungsten + AQE are the engine; this
repo contributes operator semantics, composition, and verification.

Layout:
    session.py    SparkSession factory tuned for the scale contract
    schemas.py    pinned StructTypes for the ten fixture tables
    io.py         sources/sinks (parquet/csv/json/streaming), schema-pinned
    registry.py   query registry powering __spark_entry__.py
    functions/    deterministic numeric aggs, vector math, text analysis
    operators/    composite operators (dedup, as-of join, sessionize, ANN)
    streaming/    structured-streaming operators with batch twins
    queries/      SURVEY.md §2 inventory: one registered query per operator
"""

__version__ = "0.1.0"
