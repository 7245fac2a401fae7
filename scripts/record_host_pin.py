"""Record the quiet-host reference pin for bench.py's pin-relative
comparability stamp (r11 verdict item 1).

Runs bench.py's OWN ``_host_norm`` path — Spark q1_pricing_summary and
its DuckDB twin, median of 3, warm, inside a live 32-thread session —
so the recorded pin and every future run's in-run pin measure exactly
the same thing. Writes the result into BASELINE_PROXY.json under
``host_pin`` (merged in place; the per-query proxy numbers are
untouched). Refuses to record under ambient load: a pin captured in a
drifted host regime would silently re-baseline every future
comparability verdict — the exact failure the pin exists to catch.

Usage: python scripts/record_host_pin.py            # gate + record
       python scripts/record_host_pin.py --force    # skip the load gate
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from x8313_etl_spark.session import get_spark


def main() -> int:
    if "--force" not in sys.argv:
        gate = bench._load_gate()
        if not gate["comparable"]:
            print(f"host not quiet (loadavg {gate['start']} >= "
                  f"{gate['threshold']}); refusing to record a drifted pin "
                  "(--force overrides)")
            return 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("record-host-pin", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py measures host_norm at the END of a full run, in a
    # JIT-warm JVM; a fresh JVM runs q1 ~2x slower for the first few
    # repetitions (measured: 8.9/2.3/1.7/1.5/1.4s). Warm q1 itself to
    # convergence before recording so the Spark half of the pin
    # approximates the warm-context value. The DuckDB half has no such
    # effect and is the only input to ``comparable_pins``; the Spark
    # half ships for corroboration.
    from x8313_etl_spark.registry import registry

    q1 = registry()["q1_pricing_summary"]
    for _ in range(5):
        bench._run(q1.fn(spark, sf_dir))
    norm = bench._host_norm(spark, sf_dir, runs=3)
    spark.stop()
    if "q1_duckdb_sec" not in norm:
        print(f"DuckDB half missing ({norm}); not recording")
        return 1
    proxy = json.load(open(bench.PROXY_PATH))
    proxy["host_pin"] = {
        "q1_spark_sec": norm["q1_spark_sec"],
        "q1_duckdb_sec": norm["q1_duckdb_sec"],
        "q1_duckdb_min_sec": norm["q1_duckdb_min_sec"],
        "spark_over_duckdb": norm["spark_over_duckdb"],
        "sf_dir": sf_dir,
        "loadavg_1m": round(os.getloadavg()[0], 3),
    }
    json.dump(proxy, open(bench.PROXY_PATH, "w"), indent=1, sort_keys=True)
    print("recorded host_pin:", json.dumps(proxy["host_pin"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
