"""SURVEY.md §2 operator inventory — one registered query per operator.

Modules self-register into ``x8313_etl_spark.registry`` on import;
``registry.registry()`` imports them all.
"""
