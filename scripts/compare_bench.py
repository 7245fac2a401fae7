"""Pin-normalized cross-run bench comparison — the protocol BASELINE.md
states ("divide a run's ratios by its drift_factor before comparing"),
operationalized so no reader has to do it by hand.

Takes two bench JSONs (older first), normalizes each run's per-query
walls by its own comparability.drift_factor (1.0 when the stamp is
missing or None — flagged in the header so the reader knows the
normalization is partial), and prints per-query normalized deltas with
a >25% flag column. This replaces the by-hand adjudications of rounds
8, 10, 11 and 12 (t1/ts_gap_fill, the r10 drift, the r11 uniform
drift, the r12 pin validation) with one command.

Exit status: 0 always — the output is an adjudication aid, not a gate
(a flagged delta may be a plan change, a fixture regen, or a regime
shift the pins could not see; the REASON needs a human).

Usage: python scripts/compare_bench.py OLD.json NEW.json [--flag-pct 25]
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    raw = open(path).read().strip()
    try:
        d = json.loads(raw)  # a full JSON document (driver BENCH_rN.json)
    except ValueError:
        d = json.loads(raw.splitlines()[-1])  # bench.py stdout capture
    # driver BENCH_rN.json files wrap the bench line under "parsed"
    return d.get("parsed", d)


def _drift(run: dict) -> tuple[float, bool]:
    # full record nests the stamp under "comparability"; the r13 compact
    # stdout line carries "drift_factor" at top level (BASELINE.md's
    # compact stdout contract) — accept both shapes
    comp = run.get("comparability") or {}
    f = comp.get("drift_factor", run.get("drift_factor"))
    if f:
        return float(f), True
    return 1.0, False


def compare(old: dict, new: dict, flag_pct: float = 25.0) -> list[dict]:
    """Per-query normalized deltas; pure so tests can pin the math."""
    od, _ = _drift(old)
    nd, _ = _drift(new)
    out = []
    for q in sorted(set(old.get("queries", {})) & set(new.get("queries", {}))):
        o = old["queries"][q] / od
        n = new["queries"][q] / nd
        ratio = n / o if o else float("inf")
        out.append({
            "query": q,
            "old_norm": round(o, 4),
            "new_norm": round(n, 4),
            "ratio": round(ratio, 3),
            "flag": abs(ratio - 1.0) * 100 >= flag_pct,
        })
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flag_pct = 25.0
    if "--flag-pct" in sys.argv:
        flag_pct = float(sys.argv[sys.argv.index("--flag-pct") + 1])
    old, new = _load(args[0]), _load(args[1])
    od, o_stamped = _drift(old)
    nd, n_stamped = _drift(new)
    print(f"old: {args[0]}  drift_factor={od}"
          f"{'' if o_stamped else ' (UNSTAMPED — raw walls)'}")
    print(f"new: {args[1]}  drift_factor={nd}"
          f"{'' if n_stamped else ' (UNSTAMPED — raw walls)'}")
    if not (o_stamped and n_stamped):
        print("WARNING: at least one run carries no pin stamp; deltas "
              "below mix host regime with plan changes (the pre-r12 "
              "reading problem).")
    rows = compare(old, new, flag_pct)
    flagged = [r for r in rows if r["flag"]]
    print(f"{'query':30s} {'old/d':>8s} {'new/d':>8s} {'ratio':>7s}")
    for r in rows:
        mark = "  <-- >%g%%" % flag_pct if r["flag"] else ""
        print(f"{r['query']:30s} {r['old_norm']:8.3f} {r['new_norm']:8.3f} "
              f"{r['ratio']:7.2f}{mark}")
    tot_o = sum(r["old_norm"] for r in rows)
    tot_n = sum(r["new_norm"] for r in rows)
    print(f"normalized totals: {tot_o:.1f} -> {tot_n:.1f} "
          f"({tot_n / tot_o:.2f}x), {len(flagged)} flagged of {len(rows)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
