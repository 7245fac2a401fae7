"""Composite operators built from DataFrame primitives.

Each module implements one operator family that plain single-call
DataFrame API doesn't provide directly (deterministic dedup, as-of
joins, sessionization, similarity search, MinHash LSH, ...). All are
shuffle-conscious compositions of built-in ops — no Python UDFs unless
the module says so explicitly.
"""
