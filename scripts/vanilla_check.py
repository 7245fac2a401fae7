"""Run env-sensitive queries on a DEFAULT-config SparkSession vs DuckDB.

Mirrors the grading driver's environment: it owns its SparkSession and
applies none of our get_spark configs, so correctness must come from
ensure_session_invariants alone. Run standalone:

    python scripts/vanilla_check.py [sf_dir]

Exits non-zero with a per-query report on any mismatch. Invoked by
tests/test_vanilla_session.py as a subprocess (a truly default session
can't be created inside the test JVM — getOrCreate returns the already-
configured one).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries whose results depend on session timezone / timestamp configs
#: or streaming session state — the mechanisms a foreign session can
#: break (round 2 lost t1/t3/w5/f4 driver rows to exactly this).
ENV_SENSITIVE = [
    "f4_datetime_extract",  # calendar fields from events.ts
    "f5_datetime_arith",  # date arithmetic on orders timestamps
    "w5_sliding_range_sum",  # epoch-seconds RANGE frame
    "t1_tumbling_window",  # streaming window alignment
    "t3_session_window",  # streaming session gap state
    "j9_asof_join",  # timestamp ordering across tables
    "ts_ohlc_bars",  # time-bucket alignment on NTZ
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    from tests.oracle_utils import compare_query
    from x8313_etl_spark.registry import registry

    spark = (
        SparkSession.builder.master("local[8]").appName("vanilla-check").getOrCreate()
    )
    reg = registry()
    failed = []
    for name in ENV_SENSITIVE:
        res = compare_query(spark, reg[name], sf_dir)
        print(f"{name}: {'OK' if res.ok else 'FAIL'} {res.detail[:200]}", flush=True)
        if not res.ok:
            failed.append(name)
    spark.stop()
    if failed:
        print(f"FAILED on vanilla session: {failed}")
        return 1
    print("all env-sensitive queries correct on a default-config session")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
