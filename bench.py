#!/usr/bin/env python3
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol (BASELINE.md): one shared SparkSession (JVM startup excluded),
one warm-up run per query, then median of 3 timed runs. Each timed run
executes the full plan and consumes every row on the executors
(count of a 1-column projection is NOT used — we force full
materialization via ``df.write.format("noop")`` so column pruning can't
fake the numbers).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from x8313_etl_spark.registry import bench_queries  # noqa: E402
from x8313_etl_spark.session import get_spark  # noqa: E402


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    spark = get_spark("x8313-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name, spec in sorted(bench_queries().items()):
        _run(spec.fn(spark, sf_dir))  # warm-up: JIT, code cache, fs cache
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _run(spec.fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "runs_per_query": runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
