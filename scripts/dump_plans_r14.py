"""Dump `.explain("formatted")` for bench-set queries → plans/r14/.

Deliverable for the r14 optimization round: the judge checks plan
claims (Exchange counts, join strategies, PushedFilters, Python-eval
nodes) against these files. Plan-only — nothing executes.

Usage:
    python scripts/dump_plans_r14.py before [sf_dir] [name ...]
    python scripts/dump_plans_r14.py after  [sf_dir] [name ...]

With no names, dumps every non-streaming bench query.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]

    from x8313_etl_spark.registry import bench_queries, registry
    from x8313_etl_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(ROOT, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    specs = registry() if names else bench_queries()
    todo = names or sorted(specs)
    for name in todo:
        spec = specs[name]
        if spec.category == "streaming" and not names:
            continue  # streaming runner owns execution; batch twin audited
        df = spec.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
