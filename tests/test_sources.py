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


def test_o4_files_are_internally_sorted(spark, sf_dir):
    """O4's contract is stronger than row-set equality: every output
    file must be internally sorted by the global sort key, and file N's
    key range must end before file N+1's begins (total order across
    files)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from x8313_etl_spark.registry import registry

    registry()["o4_global_sorted_write"].fn(spark, sf_dir).count()  # (re)write
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"o4_sorted_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    prev_max = None
    for d in sorted(
        glob.glob(os.path.join(root, "fileno=*")),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    ):
        rows = []
        for f in glob.glob(os.path.join(d, "*.parquet")):
            t = pq.read_table(f)
            rows += list(zip(t["o_totalprice"].to_pylist(), t["o_orderkey"].to_pylist()))
        assert rows == sorted(rows), f"file {d} not internally sorted"
        if prev_max is not None:
            assert prev_max <= rows[0], f"range overlap entering {d}"
        prev_max = rows[-1]
