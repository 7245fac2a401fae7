"""Source/sink behaviors the oracle compare can't see: s15's on-disk
file-count contract (compaction must actually reduce file counts, not
just preserve content — content preservation is the oracle's job)."""

from __future__ import annotations

import glob
import os

from x8313_etl_spark.queries.sources_q import _tag, s15_compaction, scratch


def _files_per_partition(root: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for part_dir in glob.glob(os.path.join(root, "o_orderstatus=*")):
        n = len(glob.glob(os.path.join(part_dir, "*.parquet")))
        out[os.path.basename(part_dir)] = n
    return out


def test_s15_compaction_reduces_file_counts(spark, sf_dir):
    s15_compaction(spark, sf_dir).collect()
    small = _files_per_partition(scratch(f"s15_small_{_tag(sf_dir)}"))
    compact = _files_per_partition(scratch(f"s15_compact_{_tag(sf_dir)}"))
    assert set(small) == set(compact) and small, "same partition dirs"
    # ingest wrote up to 16 files per partition; compaction must emit
    # exactly one per partition (one shuffle task owns each status)
    assert all(n > 1 for n in small.values()), f"ingest not fragmented: {small}"
    assert all(n == 1 for n in compact.values()), f"not compacted: {compact}"
    assert sum(small.values()) > sum(compact.values())
