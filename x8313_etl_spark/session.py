"""SparkSession factory + session-level invariants.

Two concerns live here:

1. ``get_spark()`` — build a local session for tests/bench with settings
   that mirror how we'd configure a real cluster (AQE on, shuffle
   partitions sized to parallelism, broadcast threshold for star dims).

2. ``ensure_session_invariants(spark)`` — the driver owns the session
   used for correctness runs; some invariants are *required for
   correctness* (not tuning) and must be (re)applied at runtime on any
   session before reading fixtures:

   - ``spark.sql.session.timeZone=UTC``: all fixture timestamps are
     parquet isAdjustedToUTC=false (naive) and pinned TIMESTAMP_NTZ on
     read, but queries that cast NTZ → LTZ (epoch math, streaming
     windows) must agree with the DuckDB oracle, which treats naive
     timestamps as UTC.

   (Until the 2026-08-13 fixture regeneration ``events.ts`` was
   TIMESTAMP(NANOS) and needed ``spark.sql.legacy.parquet.nanosAsLong``;
   the fixtures are MICROS now and io.py asserts that unit at load.)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Correctness-critical runtime confs (see module docstring).
_INVARIANT_CONFS = {
    "spark.sql.session.timeZone": "UTC",
}


def ensure_session_invariants(spark: SparkSession) -> SparkSession:
    """Apply correctness-critical confs to an existing (driver-owned) session.

    Idempotent and cheap; called by every loader in io.py.
    """
    for k, v in _INVARIANT_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)
    return spark


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "x8313-etl-spark", cpus: int | None = None) -> SparkSession:
    """Local session configured the way we'd configure a cluster.

    Scale notes (SURVEY.md §1.3/§4): AQE handles skew-join splitting and
    post-shuffle coalescing at any scale; shuffle partitions default to
    the local core count here but on a 1000-executor cluster would be
    sized ~2-3x total cores (AQE coalesces the excess). The broadcast
    threshold is raised to 64 MB so every star-schema dimension
    (region/nation/customer/supplier/part at fixture scale; the same
    dims are <<64 MB even at TPC-H sf1000) broadcasts instead of
    shuffling the fact table.
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Respect the 64 MB advisory target when coalescing instead of
        # maximizing parallelism: post-shuffle stages get right-SIZED
        # tasks, not core-count tasks. Locally this halves small-query
        # fixed cost (q1 @sf0.001: 1.01s → 0.58s — fewer empty tasks);
        # on a real cluster it is the busy-cluster posture Spark's
        # tuning guide recommends (64 MB partitions of a 100 TB shuffle
        # still give ~1.6M-way parallelism — the advisory size, not
        # core count, is the binding constraint at scale).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in _INVARIANT_CONFS.items():
        builder = builder.config(k, v)
    return ensure_session_invariants(builder.getOrCreate())
