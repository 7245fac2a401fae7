"""SnapshotTable (operators/snapshots.py): versioned commits, append
lineage, time travel by version and timestamp, write-ahead-manifest
torn-write invisibility, and CDC-merge semantics."""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
import pytest

from x8313_etl_spark.operators.snapshots import SnapshotTable


def _tbl():
    return SnapshotTable(tempfile.mkdtemp(prefix="x8313-snap-"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_overwrite_and_append_lineage(spark):
    t = _tbl()
    assert t.latest_version() is None
    assert t.commit(_df(spark, [(1, "a"), (2, "b")])) == 0
    assert t.commit(_df(spark, [(3, "c")]), mode="append") == 1
    assert t.commit(_df(spark, [(9, "z")]), mode="overwrite") == 2

    def rows(**kw):
        return sorted((r.k, r.v) for r in t.read(spark, **kw).collect())

    assert rows(version=0) == [(1, "a"), (2, "b")]
    assert rows(version=1) == [(1, "a"), (2, "b"), (3, "c")]
    assert rows(version=2) == [(9, "z")]
    assert rows() == [(9, "z")]  # latest
    # append reuses the parent dir — 3 data dirs total, not 4
    data_dirs = [d for d in os.listdir(t.base) if d.startswith("d-")]
    assert len(data_dirs) == 3


def test_time_travel_by_timestamp(spark):
    t = _tbl()
    t.commit(_df(spark, [(1, "old")]))
    ts_between = t.versions()[0]["commit_ts"] + 0.0001
    # synthetic later commit_ts so the two versions are orderable even
    # on a coarse clock
    t.commit(_df(spark, [(1, "new")]))
    vs = t.versions()
    assert vs[1]["commit_ts"] >= vs[0]["commit_ts"]
    got = t.read(spark, as_of_ts=ts_between).collect()
    assert [(r.k, r.v) for r in got] == [(1, "old")]
    with pytest.raises(KeyError):
        t.read(spark, as_of_ts=vs[0]["commit_ts"] - 1)


def test_torn_write_is_invisible(spark):
    """A data directory with no manifest entry (a crashed commit) must
    not affect reads."""
    t = _tbl()
    t.commit(_df(spark, [(1, "a")]))
    _df(spark, [(666, "torn")]).write.parquet(os.path.join(t.base, "d-torn"))
    assert [(r.k, r.v) for r in t.read(spark).collect()] == [(1, "a")]
    assert t.latest_version() == 0


def test_apply_cdc_upsert_delete_insert(spark):
    t = _tbl()
    t.commit(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    changes = spark.createDataFrame(
        [(2, "B2", "U"), (3, None, "D"), (7, "new", "U")],
        "k long, v string, cdc_op string",
    )
    v = t.apply_cdc(spark, changes, "k")
    assert v == 1
    got = sorted((r.k, r.v) for r in t.read(spark).collect())
    assert got == [(1, "a"), (2, "B2"), (7, "new")]
    # v0 untouched — the audit path m2_time_travel exercises
    assert sorted((r.k, r.v) for r in t.read(spark, version=0).collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]


def test_vacuum_drops_old_versions_keeps_shared_dirs(spark):
    """vacuum(keep_last=1) must delete only data dirs no surviving
    manifest references: an append lineage shares its parent's dirs, so
    vacuuming after an append keeps the shared dir alive."""
    t = _tbl()
    t.commit(_df(spark, [(1, "a")]))  # v0 → dir A
    t.commit(_df(spark, [(2, "b")]), mode="append")  # v1 → dirs A+B
    t.commit(_df(spark, [(9, "z")]))  # v2 → dir C (overwrite)
    deleted = t.vacuum(keep_last=2)
    # v0 dropped, but dir A survives — v1 still references it
    assert deleted == []
    assert sorted((r.k, r.v) for r in t.read(spark, version=1).collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    with pytest.raises(KeyError):
        t.read(spark, version=0)
    deleted = t.vacuum(keep_last=1)  # drops v1 → dirs A and B now dead
    assert len(deleted) == 2
    assert [(r.k, r.v) for r in t.read(spark).collect()] == [(9, "z")]
    data_dirs = [d for d in os.listdir(t.base) if d.startswith("d-")]
    assert len(data_dirs) == 1


def test_unknown_version_raises(spark):
    t = _tbl()
    with pytest.raises(FileNotFoundError):
        t.read(spark)
    t.commit(_df(spark, [(1, "a")]))
    with pytest.raises(KeyError):
        t.read(spark, version=5)


def test_concurrent_commit_loser_fails_loudly(spark, tmp_path):
    """Two writers racing to the same version: the loser must raise
    ConcurrentCommitError through the REAL commit() path (not silently
    clobber the winner), and the loser's orphaned data dir must be
    reclaimed immediately — vacuum() only walks manifest-listed dirs,
    so a leaked orphan would never be collectable."""
    import os

    import pytest as _pytest

    from x8313_etl_spark.operators.snapshots import (
        ConcurrentCommitError,
        SnapshotTable,
    )

    base = str(tmp_path / "tbl")
    winner = SnapshotTable(base)
    loser = SnapshotTable(base)
    winner.commit(spark.range(3).withColumnRenamed("id", "k"))  # v0

    # stale read: the loser snapshots versions() BEFORE the winner's
    # next commit lands (the race window), then both target version 1
    stale = loser.versions()
    loser.versions = lambda branch="main": stale  # type: ignore[method-assign]
    assert winner.commit(spark.range(7).withColumnRenamed("id", "k")) == 1

    before = {d for d in os.listdir(base) if d.startswith("d-")}
    with _pytest.raises(ConcurrentCommitError):
        loser.commit(spark.range(5).withColumnRenamed("id", "k"))
    after = {d for d in os.listdir(base) if d.startswith("d-")}
    assert after == before, "loser's orphaned data dir was not reclaimed"
    # no stray tmp manifests either
    assert not [
        f for f in os.listdir(os.path.join(base, "_manifest")) if f.endswith(".tmp")
    ]

    # the winner's commit is what version 1 resolves to
    assert winner.read(spark, version=1).count() == 7


# -- deletion vectors (merge-on-read) ---------------------------------


def _dv_table(spark, tmp_path):
    import pyspark.sql.functions as F

    from x8313_etl_spark.operators.snapshots import SnapshotTable

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    tbl = SnapshotTable(str(tmp_path / "dvtab"))
    tbl.commit(df.repartition(4))  # multi-file on purpose
    return tbl


def test_dv_delete_is_positional_and_multifile(spark, tmp_path):
    import os

    import pyspark.sql.functions as F

    tbl = _dv_table(spark, tmp_path)
    ddir = os.path.join(tbl.base, tbl.versions()[0]["dirs"][0])
    n_files = len([f for f in os.listdir(ddir) if f.endswith(".parquet")])
    assert n_files >= 2, "precondition: base must span multiple files"
    tbl.delete_where(spark, F.col("k") % 3 == 0)
    got = sorted(r.k for r in tbl.read(spark).collect())
    assert got == [k for k in range(100) if k % 3 != 0]
    # no data rewrite happened: v1 references v0's data dirs verbatim
    v0, v1 = tbl.versions()
    assert v1["dirs"] == v0["dirs"] and len(v1["dvs"]) == 1


def test_dv_time_travel_and_second_delete(spark, tmp_path):
    import pyspark.sql.functions as F

    tbl = _dv_table(spark, tmp_path)
    tbl.delete_where(spark, F.col("k") < 10)  # v1
    tbl.delete_where(spark, F.col("k") >= 90)  # v2
    assert tbl.read(spark, version=0).count() == 100
    assert tbl.read(spark, version=1).count() == 90
    got = sorted(r.k for r in tbl.read(spark).collect())
    assert got == list(range(10, 90))


def test_dv_rewrite_compact_preserves_rows_and_clears_dvs(spark, tmp_path):
    import pyspark.sql.functions as F

    tbl = _dv_table(spark, tmp_path)
    tbl.delete_where(spark, F.col("k") % 2 == 0)
    before = sorted((r.k, r.v) for r in tbl.read(spark).collect())
    tbl.rewrite_compact(spark)
    after = sorted((r.k, r.v) for r in tbl.read(spark).collect())
    assert before == after
    assert tbl.versions()[-1]["dvs"] == []


def test_dv_append_keeps_parent_tombstones(spark, tmp_path):
    import pyspark.sql.functions as F

    tbl = _dv_table(spark, tmp_path)
    tbl.delete_where(spark, F.col("k") < 50)
    extra = spark.range(100, 110).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    tbl.commit(extra, mode="append")
    got = sorted(r.k for r in tbl.read(spark).collect())
    assert got == list(range(50, 110)), "append must not resurrect deleted rows"


def test_dv_vacuum_keeps_referenced_dv_dirs(spark, tmp_path):
    import os

    import pyspark.sql.functions as F

    tbl = _dv_table(spark, tmp_path)
    tbl.delete_where(spark, F.col("k") % 7 == 0)  # v1
    tbl.delete_where(spark, F.col("k") % 11 == 0)  # v2
    expect = sorted(r.k for r in tbl.read(spark).collect())
    tbl.vacuum(keep_last=1)
    assert sorted(r.k for r in tbl.read(spark).collect()) == expect
    live = tbl.versions()[-1]
    for d in live["dirs"] + live["dvs"]:
        assert os.path.isdir(os.path.join(tbl.base, d))


# -- equality deletes (sequence-scoped) --------------------------------


def test_eqdelete_exempts_younger_appends(spark, tmp_path):
    import pyspark.sql.functions as F

    tbl = _dv_table(spark, tmp_path)
    tbl.delete_eq(
        spark, spark.range(0, 100, 2).select(F.col("id").alias("k")), on="k"
    )
    # append rows REUSING deleted keys — younger than the delete
    # (v cast to long: the table's column is bigint, and parquet multi-dir
    # scans do not coerce int32 files to an int64 schema)
    extra = spark.range(0, 10, 2).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    tbl.commit(extra, mode="append")
    rows = tbl.read(spark).collect()
    odd = sorted(r.k for r in rows if r.v >= 0)
    reused = sorted(r.k for r in rows if r.v == -1)
    assert odd == list(range(1, 100, 2)), "covered rows must be deleted"
    assert reused == [0, 2, 4, 6, 8], "younger appends must be exempt"


def test_eqdelete_composes_with_positional_and_compacts(spark, tmp_path):
    import pyspark.sql.functions as F

    tbl = _dv_table(spark, tmp_path)
    tbl.delete_where(spark, F.col("k") >= 90)  # positional
    tbl.delete_eq(spark, spark.range(0, 5).select(F.col("id").alias("k")), on="k")
    expect = list(range(5, 90))
    assert sorted(r.k for r in tbl.read(spark).collect()) == expect
    tbl.rewrite_compact(spark)
    m = tbl.versions()[-1]
    assert m["dvs"] == [] and m["eqdvs"] == []
    assert sorted(r.k for r in tbl.read(spark).collect()) == expect


def test_eqdelete_time_travel(spark, tmp_path):
    import pyspark.sql.functions as F

    tbl = _dv_table(spark, tmp_path)
    tbl.delete_eq(spark, spark.range(50).select(F.col("id").alias("k")), on="k")
    assert tbl.read(spark, version=0).count() == 100
    assert tbl.read(spark, version=1).count() == 50


def test_schema_evolution_time_travel_keeps_old_schema(spark, tmp_path):
    import pyspark.sql.functions as F

    from x8313_etl_spark.operators.snapshots import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "evo"))
    tbl.commit(spark.range(10).select(F.col("id").alias("k")))
    tbl.commit(
        spark.range(10, 15).select(
            F.col("id").alias("k"), F.lit("x").alias("extra")
        ),
        mode="append",
    )
    v1 = tbl.read(spark)
    assert set(v1.columns) == {"k", "extra"}
    assert v1.filter(F.col("extra").isNull()).count() == 10, "old dirs null-fill"
    v0 = tbl.read(spark, version=0)
    assert v0.columns == ["k"], "time travel must keep the original schema"


# -- write-audit-publish branches -------------------------------------


def test_wap_stage_is_invisible_until_publish(spark, tmp_path):
    import pyspark.sql.functions as F

    from x8313_etl_spark.operators.snapshots import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "wap"))
    tbl.commit(spark.range(10).select(F.col("id").alias("k")))
    tbl.commit(
        spark.range(5).select(F.col("id").alias("k")), branch="staging"
    )
    assert tbl.read(spark).count() == 10, "main must not see staged commits"
    assert tbl.read(spark, branch="staging").count() == 5
    tbl.publish("staging")
    assert tbl.read(spark).count() == 5, "publish fast-forwards main"


def test_wap_publish_is_metadata_only(spark, tmp_path):
    import os

    import pyspark.sql.functions as F

    from x8313_etl_spark.operators.snapshots import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "wap2"))
    tbl.commit(spark.range(10).select(F.col("id").alias("k")))
    tbl.commit(spark.range(5).select(F.col("id").alias("k")), branch="b")
    dirs_before = {d for d in os.listdir(tbl.base) if d.startswith("d-")}
    tbl.publish("b")
    dirs_after = {d for d in os.listdir(tbl.base) if d.startswith("d-")}
    assert dirs_before == dirs_after, "publish must move zero data"
    m = tbl.versions()[-1]
    assert m["mode"] == "publish"
    assert m["dirs"] == tbl.versions("b")[-1]["dirs"]


def test_wap_vacuum_keeps_branch_heads(spark, tmp_path):
    import pyspark.sql.functions as F

    from x8313_etl_spark.operators.snapshots import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "wap3"))
    tbl.commit(spark.range(10).select(F.col("id").alias("k")))  # main v0
    tbl.commit(spark.range(20).select(F.col("id").alias("k")))  # main v1
    tbl.commit(spark.range(7).select(F.col("id").alias("k")), branch="b")
    tbl.vacuum(keep_last=1)
    assert tbl.read(spark).count() == 20
    assert tbl.read(spark, branch="b").count() == 7, (
        "an unpublished branch head must survive vacuum"
    )


# -- round-6 regression tests (ADVICE.md findings) ---------------------


def test_publish_lost_race_does_not_delete_table(spark, tmp_path):
    """publish() is metadata-only (data_dir="") — a lost commit race
    must reclaim NOTHING. Before the guard, _commit_manifest ran
    rmtree(join(base, "")) == rmtree(base), silently deleting the
    entire table (every data dir and all manifests)."""
    import os

    import pyspark.sql.functions as F
    import pytest as _pytest

    from x8313_etl_spark.operators.snapshots import (
        ConcurrentCommitError,
        SnapshotTable,
    )

    base = str(tmp_path / "waprace")
    tbl = SnapshotTable(base)
    tbl.commit(spark.range(10).select(F.col("id").alias("k")))  # v0 main
    tbl.commit(spark.range(5).select(F.col("id").alias("k")), branch="b")  # v1

    # race: another publisher lands version 2 between this publisher's
    # versions() read and its link(2) — simulate with a stale snapshot
    loser = SnapshotTable(base)
    stale = {None: loser.versions(None), "b": loser.versions("b")}
    loser.versions = (  # type: ignore[method-assign]
        lambda branch="main": stale.get(branch, [])
    )
    assert tbl.publish("b") == 2  # the winner

    with _pytest.raises(ConcurrentCommitError):
        loser.publish("b")
    # the table must be fully intact: all dirs, all manifests, readable
    assert os.path.isdir(base), "lost publish race deleted the table root"
    assert tbl.read(spark).count() == 5
    assert tbl.read(spark, version=0).count() == 10
    assert len(tbl.versions(None)) == 3


def test_positional_delete_after_eqdelete_keeps_eq_tombstones(spark, tmp_path):
    """delete_where after delete_eq: the new manifest must carry the
    parent's equality tombstones forward, or the positional delete
    silently resurrects every equality-deleted row."""
    import pyspark.sql.functions as F

    tbl = _dv_table(spark, tmp_path)  # keys 0..99
    tbl.delete_eq(
        spark, spark.range(0, 100, 2).select(F.col("id").alias("k")), on="k"
    )  # evens dead
    tbl.delete_where(spark, F.col("k") >= 91)  # odds >= 91 dead too
    got = sorted(r.k for r in tbl.read(spark).collect())
    assert got == list(range(1, 91, 2)), (
        "positional delete must not resurrect equality-deleted rows"
    )
    # and the reverse order still holds (the previously-tested path)
    assert tbl.versions()[-1]["eqdvs"], "eqdvs must be forwarded in the manifest"


def test_delete_preserves_schema_evolution_dir_cols(spark, tmp_path):
    """Deletes on a schema-evolved table must forward dir_cols: without
    them _scan() sees <=1 fingerprint, never enables mergeSchema, and
    the evolved column silently disappears for rows in older dirs."""
    import pyspark.sql.functions as F

    from x8313_etl_spark.operators.snapshots import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "evodel"))
    tbl.commit(spark.range(10).select(F.col("id").alias("k")))
    tbl.commit(
        spark.range(10, 15).select(
            F.col("id").alias("k"), F.lit("x").alias("extra")
        ),
        mode="append",
    )
    tbl.delete_where(spark, F.col("k") == 3)  # positional
    v = tbl.read(spark)
    assert set(v.columns) == {"k", "extra"}, "delete_where lost the evolved column"
    assert sorted(r.k for r in v.collect()) == [k for k in range(15) if k != 3]
    tbl.delete_eq(spark, spark.range(12, 13).select(F.col("id").alias("k")), on="k")
    v = tbl.read(spark)
    assert set(v.columns) == {"k", "extra"}, "delete_eq lost the evolved column"
    assert sorted(r.k for r in v.collect()) == [
        k for k in range(15) if k not in (3, 12)
    ]


def test_delete_version_numbering_is_global_across_branches(spark, tmp_path):
    """Versions are numbered globally (commit()/publish() rule). A
    branch commit ahead of main must not make deletes collide forever:
    main-head+1 would hit the branch's manifest file with EEXIST and
    every retry recomputes the same colliding version."""
    import pyspark.sql.functions as F

    from x8313_etl_spark.operators.snapshots import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "gver"))
    tbl.commit(
        spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    )  # main v0
    tbl.commit(
        spark.range(3).select(F.col("id").alias("k"), F.lit(2).alias("v")),
        branch="b",
    )  # global v1 on branch b
    v = tbl.delete_where(spark, F.col("k") >= 8)  # must be v2, not v1
    assert v == 2
    assert tbl.read(spark).count() == 8
    v = tbl.delete_eq(spark, spark.range(1).select(F.col("id").alias("k")), on="k")
    assert v == 3
    assert sorted(r.k for r in tbl.read(spark).collect()) == list(range(1, 8))
    # the branch is untouched throughout
    assert tbl.read(spark, branch="b").count() == 3
