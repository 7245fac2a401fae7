"""Duplicate-scan diagnostic: which queries' RETURNED plans contain 3+
FileScans of the same table?

Written round 10 after the p_item_cf union fix generalized: a DataFrame
referenced by multiple plan branches is RE-EXECUTED per branch unless
something materializes it (persist / audited_checkpoint / the cachepool)
— Spark's ReusedExchange rarely fires across these shapes (measured: 0
ReusedExchange nodes across the whole registry), so a self-union or an
aggregate-joined-back-to-its-source doubles real scan work at 100 TB.

CAVEAT — the string count OVERSTATES for materialized plans: a persisted
or checkpointed subtree re-PRINTS per InMemoryTableScan reference while
executing once (the sim_* pooled assignment, g2's per-round persist).
Read hits through that lens: a flagged query with no persist/checkpoint
anywhere in its chain is TRUE re-execution; one with materialization is
usually just plan-string re-expansion. r10 true-reexecution fixes:
ts_acf 6→1, p_markov 2→1 (window totals), dq5 8→3 (checkpoint binned),
a16 6→3 (checkpoint steps), m8 20→4 (checkpoint deltas), l1 +
p_corpus_clean (explode instead of self-union for the offset copy).

Usage: python scripts/scan_sweep.py [sf_dir]   (default sf0.001)
"""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run() -> None:
    from x8313_etl_spark.operators.cachepool import clear_pool
    from x8313_etl_spark.registry import registry
    from x8313_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    tag = os.path.basename(sf_dir.rstrip("/"))
    spark = get_spark("scan-sweep", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, spec in registry().items():
        if spec.category in ("streaming", "timeseries"):
            continue  # their fns execute real microbatch jobs
        clear_pool(forget_ledger=False)
        try:
            plan = (
                spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as exc:  # noqa: BLE001 - diagnostic sweep
            print(f"ERR {name}: {type(exc).__name__}", file=sys.stderr)
            continue
        n = len(re.findall(r"FileScan", plan))
        tables = re.findall(rf"({re.escape(tag)}/\w+\.parquet|\.scratch/[\w/]+)", plan)
        dup = {t: k for t, k in Counter(tables).items() if k >= 3}
        if dup:
            rows.append((name, n, dup))
    for name, n, dup in sorted(rows, key=lambda r: -max(r[2].values())):
        print(f"{name:32s} scans={n:2d} dup={dup}")


if __name__ == "__main__":
    run()
