"""Leak guard (VERDICT r03 §Next-round #6): no internal hostname /
bucket / key / env-var pattern may appear in tracked files we maintain.

The driver's per-round LEAKCHECK greps the working tree and git log;
r03's only hits were a doc line (since removed) and immutable history.
This test keeps the working tree clean going forward — a doc edit that
re-quotes an internal name fails pytest locally before the driver sees
it.

Patterns are assembled from fragments at runtime so this file (and its
docstrings) can never match itself. Driver/judge-owned artifacts that
QUOTE hits (LEAKCHECK.json, prior-round VERDICT/ADVICE) are excluded —
we don't author them; everything else tracked is scanned.
"""

from __future__ import annotations

import re
import subprocess
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

#: files the driver/judge writes (they quote raw hits, so they may
#: legitimately contain flagged strings); we never edit them.
_JUDGE_OWNED = {"LEAKCHECK.json", "VERDICT.md", "ADVICE.md"}

#: fragment-assembled patterns mirroring the driver's categories.
_PATTERNS = [
    re.compile(p, re.IGNORECASE)
    for p in (
        # internal-url: the artifact-mirror host family
        r"artifa" + r"ctory\.",
        r"\binfra\." + r"ant\." + r"dev\b",
        r"\bant\." + r"dev\b",
        # slack-link
        r"slack\.com/" + r"archives",
        # api-key
        r"sk-" + r"ant-",
        # axon-env
        r"\bAX" + r"ON_[A-Z_]+",
        # internal-bucket
        r"s3://" + r"(anthropic|internal)[-\w]*",
    )
]


def _tracked_files() -> list[Path]:
    out = subprocess.run(
        ["git", "ls-files"], cwd=ROOT, capture_output=True, text=True, check=True
    ).stdout
    return [
        ROOT / line
        for line in out.splitlines()
        if line and Path(line).name not in _JUDGE_OWNED
    ]


def test_no_internal_patterns_in_tracked_files():
    hits: list[str] = []
    for path in _tracked_files():
        try:
            text = path.read_text(errors="ignore")
        except (OSError, IsADirectoryError):
            continue
        for i, line in enumerate(text.splitlines(), 1):
            for pat in _PATTERNS:
                if pat.search(line):
                    hits.append(f"{path.relative_to(ROOT)}:{i}: {line.strip()[:100]}")
    assert not hits, "internal-pattern leak(s):\n" + "\n".join(hits)
