"""Regenerate registry._DRIVER_GREEN from every CORRECTNESS_r*.json.

Run at the start of each round, after the driver drops the previous
round's CORRECTNESS file:

    python scripts/gen_green.py          # print the frozenset literal
    python scripts/gen_green.py --write  # patch registry.py in place

Green = hash_match, or the designed rows-only outcome (err: no_oracle).
Names that later FAILED in a newer round are still green if any round
passed them — driver rows are cumulative evidence; a repaired failure
re-earns its row by sorting into the verify window (registry._R02_FAILED
shows the pattern). Also prints the window composition so the round's
coverage plan is visible at a glance.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def green_stamps() -> dict[str, int]:
    """name → LATEST round number with a green driver row (hash_match,
    or the designed rows-only outcome). Feeds both _DRIVER_GREEN and
    the stalest-first rotation map _DRIVER_STAMP."""
    stamps: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json", path).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("hash_match") or row.get("err") == "no_oracle":
                stamps[name] = max(stamps.get(name, 0), rnd)
    return stamps


def literal(names: set[str]) -> str:
    items = sorted(names)
    lines = []
    for i in range(0, len(items), 4):
        lines.append("        " + " ".join(f'"{n}",' for n in items[i : i + 4]))
    return "_DRIVER_GREEN = frozenset(\n    {\n" + "\n".join(lines) + "\n    }\n)"


def stamp_literal(stamps: dict[str, int]) -> str:
    items = sorted(stamps.items())
    lines = []
    for i in range(0, len(items), 4):
        lines.append(
            "    " + " ".join(f'"{n}": {r},' for n, r in items[i : i + 4])
        )
    return "_DRIVER_STAMP: dict[str, int] = {\n" + "\n".join(lines) + "\n}"


def main() -> int:
    sys.path.insert(0, ROOT)
    stamps = green_stamps()
    green = set(stamps)
    lit = literal(green)
    slit = stamp_literal(stamps)
    if "--write" in sys.argv:
        reg_path = os.path.join(ROOT, "x8313_etl_spark", "registry.py")
        src = open(reg_path).read()
        new_src, n = re.subn(
            r"_DRIVER_GREEN = frozenset\(\n    \{\n(?:.*\n)*?    \}\n\)",
            lit,
            src,
            count=1,
        )
        if n != 1:
            print("could not locate _DRIVER_GREEN block in registry.py")
            return 1
        new_src, n = re.subn(
            r"_DRIVER_STAMP: dict\[str, int\] = \{\n(?:.*\n)*?\}",
            slit,
            new_src,
            count=1,
        )
        if n != 1:
            print("could not locate _DRIVER_STAMP block in registry.py")
            return 1
        open(reg_path, "w").write(new_src)
        print(f"patched registry.py: {len(green)} green names + stamps")
    else:
        print(lit)
        print(slit)

    from x8313_etl_spark.registry import registry

    names = list(registry())
    window = names[:WINDOW]
    unverified = [n for n in names if n not in green]
    print(f"\nregistry: {len(names)} | green: {len(green)} | unverified: {len(unverified)}")
    print(f"window covers {sum(1 for n in window if n not in green)}/{min(WINDOW, len(unverified))} possible")
    print("overflow:", [n for n in unverified if n not in window])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
