"""Snapshot-versioned parquet tables: MERGE + time travel without a
lakehouse format (SURVEY.md §2 "etl" family; VERDICT r03 named the
missing table format the largest real-user capability gap — this is
the Spark-first subset of it that needs no external dependency).

Layout (the Delta/Iceberg idea at directory granularity):

    <base>/
      _manifest/00000000.json   {"version":0,"dirs":["d-<uuid>"],...}
      _manifest/00000001.json
      d-<uuid>/part-*.parquet   (immutable once committed)

A commit writes its data directory FIRST, then the manifest entry —
readers only see directories a manifest names, so a torn write is
invisible (the classic write-ahead-manifest protocol). ``append``
commits reference the parent's dirs plus the new delta dir (no
rewrite); ``overwrite`` commits reference only the new dir.
Time travel = pick the manifest with the requested version (or the
largest commit timestamp ≤ the requested one) and read exactly the
dirs it names — old versions stay readable until explicitly vacuumed.

Scale notes: the manifest is O(commits) tiny JSON files read on the
driver once per read — the data path is an ordinary multi-dir
vectorized parquet scan with full predicate pushdown / partition
parallelism. MERGE (apply_cdc) is one keyed shuffle (or an AQE
broadcast when the change set is the usual <1% of base) + a full
rewrite of the base into the next version dir — copy-on-write
semantics, the same cost model as Delta's non-deletion-vector MERGE.

Round-5 extensions give the merge-on-read side of the trade:
- ``delete_where`` — POSITIONAL deletion vectors, (file_path,
  row_index) tombstones from the parquet reader's hidden _metadata
  columns (the Iceberg v2 position-delete design): a DELETE costs
  O(matched rows), reads pay one anti-join on the DV union.
- ``delete_eq`` — sequence-scoped EQUALITY deletes: key tombstones
  recorded with the dir set they cover, so appends committed AFTER the
  delete are exempt (the upsert-by-delete-then-append pattern).
- ``rewrite_compact`` — materialize visible rows, clear all tombstones.
- schema evolution — manifests record per-dir column fingerprints and
  reads enable mergeSchema only when a version's dirs disagree; time
  travel keeps each version's own schema.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest"


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first (optimistic
    concurrency: retry commit() to target the next version)."""


class SnapshotTable:
    """A versioned parquet table rooted at ``base`` (local or any
    Hadoop-visible path when given a path the cluster shares)."""

    def __init__(self, base: str):
        self.base = base.rstrip("/")
        os.makedirs(os.path.join(self.base, _MANIFEST), exist_ok=True)

    # -- manifest bookkeeping (driver-side, O(commits) tiny files) ----

    def _manifest_dir(self) -> str:
        return os.path.join(self.base, _MANIFEST)

    def versions(self, branch: str = "main") -> list[dict]:
        """Manifests of one branch, version-ordered ("main" unless the
        commit was staged on a named branch — write-audit-publish).
        ``branch=None`` returns every manifest (vacuum liveness)."""
        out = []
        for f in sorted(os.listdir(self._manifest_dir())):
            if f.endswith(".json"):
                with open(os.path.join(self._manifest_dir(), f)) as fh:
                    m = json.load(fh)
                if branch is None or m.get("branch", "main") == branch:
                    out.append(m)
        return out

    def latest_version(self, branch: str = "main") -> int | None:
        vs = self.versions(branch)
        return vs[-1]["version"] if vs else None

    def _resolve(
        self,
        version: int | None,
        as_of_ts: float | None,
        branch: str = "main",
    ) -> dict:
        vs = self.versions(branch)
        if not vs:
            raise FileNotFoundError(f"snapshot table {self.base} has no commits")
        if version is not None:
            for m in vs:
                if m["version"] == version:
                    return m
            raise KeyError(f"version {version} not in {self.base}")
        if as_of_ts is not None:
            eligible = [m for m in vs if m["commit_ts"] <= as_of_ts]
            if not eligible:
                raise KeyError(f"no version at or before ts={as_of_ts}")
            return eligible[-1]
        return vs[-1]

    # -- commits ------------------------------------------------------

    def commit(
        self, df: DataFrame, mode: str = "overwrite", branch: str = "main"
    ) -> int:
        """Write ``df`` as the next version. ``append`` keeps the
        parent's data dirs (and deletion vectors — the parent's files
        stay live, so their tombstones must too) and adds one delta
        dir; ``overwrite`` replaces the dir set and clears all DVs.
        Data lands before the manifest entry, so concurrent readers
        never see a half-written version."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        prev = self.versions(branch)
        allv = self.versions(None)
        version = allv[-1]["version"] + 1 if allv else 0
        ddir = f"d-{uuid.uuid4().hex[:12]}"
        df.write.mode("errorifexists").parquet(os.path.join(self.base, ddir))
        # per-dir column fingerprint: read() turns on mergeSchema only
        # when a version's dirs actually disagree (schema evolution —
        # the added column null-fills older dirs), so the common
        # homogeneous case keeps the cheap single-schema scan
        dirs, dvs, eqdvs = [ddir], [], []
        if mode == "append" and prev:
            dirs = prev[-1]["dirs"] + dirs
            dvs = prev[-1].get("dvs") or []
            # parent equality deletes stay scoped to their recorded
            # covered dirs — the NEW delta dir is younger, so exempt
            eqdvs = prev[-1].get("eqdvs") or []
        cols = {ddir: list(df.columns)}
        if mode == "append" and prev:
            cols.update(prev[-1].get("dir_cols") or {})
        return self._commit_manifest(
            version=version, dirs=dirs, dvs=dvs, mode=mode, data_dir=ddir,
            eqdvs=eqdvs, dir_cols=cols, branch=branch,
        )

    def _commit_manifest(
        self,
        *,
        version: int,
        dirs: list,
        dvs: list,
        mode: str,
        data_dir: str,
        eqdvs: list | None = None,
        dir_cols: dict | None = None,
        branch: str = "main",
    ) -> int:
        """Publish a manifest for ``version`` with writer mutual
        exclusion; on a lost race, reclaim ``data_dir`` (this writer's
        just-written dir — data or DV) and raise. Metadata-only commits
        (publish) pass ``data_dir=""`` and have nothing to reclaim —
        the guard below matters: rmtree(join(base, "")) IS rmtree(base),
        i.e. the whole table."""
        manifest = {
            "version": version,
            "dirs": dirs,
            "dvs": dvs,
            "eqdvs": eqdvs or [],
            "dir_cols": dir_cols or {},
            "branch": branch,
            "mode": mode,
            "commit_ts": time.time(),
        }
        # tmp is UNIQUE PER WRITER (uuid): a shared tmp name would let a
        # racing committer truncate/overwrite this writer's manifest
        # bytes before the link, publishing the wrong dir set under
        # this writer's "success"
        tmp = os.path.join(
            self._manifest_dir(),
            f".{version:08d}.{uuid.uuid4().hex[:8]}.json.tmp",
        )
        final = os.path.join(self._manifest_dir(), f"{version:08d}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        # Commit point with writer mutual exclusion: os.rename would
        # silently CLOBBER a concurrent committer's manifest for the
        # same version (POSIX rename overwrites), losing their commit.
        # link(2) fails with EEXIST instead — the loser raises, which is
        # the correct optimistic-concurrency outcome (retry → version+1).
        try:
            os.link(tmp, final)
        except FileExistsError as exc:
            os.unlink(tmp)
            # reclaim the loser's data dir NOW: no manifest will ever
            # reference it, and vacuum() only walks manifest-listed
            # dirs, so leaving it would leak a table copy per lost race
            if data_dir:
                import shutil

                shutil.rmtree(
                    os.path.join(self.base, data_dir), ignore_errors=True
                )
            raise ConcurrentCommitError(
                f"version {version} was committed by another writer"
            ) from exc
        os.unlink(tmp)
        return version

    # -- reads --------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        as_of_ts: float | None = None,
        branch: str = "main",
    ) -> DataFrame:
        """Latest version, a specific ``version``, or time travel to the
        last version committed at or before ``as_of_ts``. When the
        version carries deletion vectors the scan applies them
        (merge-on-read); otherwise it is a plain multi-dir scan."""
        m = self._resolve(version, as_of_ts, branch)
        if m.get("dvs") or m.get("eqdvs"):
            return self._scan_minus_dvs(spark, m).drop("__dv_file", "__dv_pos")
        return self._scan(spark, m)

    def _scan(self, spark: SparkSession, m: dict) -> DataFrame:
        paths = [os.path.join(self.base, d) for d in m["dirs"]]
        reader = spark.read
        cols = m.get("dir_cols") or {}
        schemas = {tuple(cols[d]) for d in m["dirs"] if d in cols}
        if len(schemas) > 1:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*paths)

    # -- deletion vectors (merge-on-read DELETE) ----------------------

    def _scan_minus_dvs(self, spark: SparkSession, m: dict) -> DataFrame:
        """Data-dir scan carrying (__dv_file, __dv_pos) = the parquet
        reader's hidden (_metadata.file_path, _metadata.row_index),
        with every DV the manifest names anti-joined away. Positions
        are per PHYSICAL FILE, so they survive any re-partitioning of
        downstream reads and never depend on row content — the Iceberg
        v2 position-delete design."""
        import pyspark.sql.functions as F

        df = self._scan(spark, m).select(
            "*",
            F.col("_metadata.file_path").alias("__dv_file"),
            F.col("_metadata.row_index").alias("__dv_pos"),
        )
        dvs = m.get("dvs") or []
        if dvs:
            dv = spark.read.parquet(*[os.path.join(self.base, d) for d in dvs])
            df = df.join(
                dv.select(
                    F.col("file_path").alias("__dv_file"),
                    F.col("row_index").alias("__dv_pos"),
                ),
                ["__dv_file", "__dv_pos"],
                "left_anti",
            )
        for eq in m.get("eqdvs") or []:
            # anti-join restricted to the dirs this delete covers: the
            # row's source dir is the second-to-last path segment of its
            # file — younger (appended-later) dirs fall outside `covers`
            # and keep their rows, Iceberg's sequence-number semantics
            eqk = spark.read.parquet(os.path.join(self.base, eq["dir"]))
            src_dir = F.element_at(F.split(F.col("__dv_file"), "/"), -2)
            df = df.join(
                F.broadcast(eqk),
                (F.col(eq["on"]) == eqk["key"]) & src_dir.isin(list(eq["covers"])),
                "left_anti",
            )
        return df

    def delete_where(self, spark: SparkSession, condition) -> int:
        """Merge-on-read DELETE: rows matching ``condition`` (a Column
        over the table schema) are tombstoned by writing a POSITIONAL
        deletion vector — (file_path, row_index) pairs, nothing else —
        and a manifest that references the parent's data dirs plus the
        new DV. No data file is rewritten: the cost is proportional to
        the DELETED rows, not the table (the whole point of DVs vs
        copy-on-write at 100 TB). The predicate is evaluated on the
        CURRENT visible state, so re-deleting already-dead rows can't
        bloat the vector. Readers of old versions are untouched; time
        travel across delete versions replays exactly the right
        tombstone sets. Compaction is ``rewrite_compact``."""
        import pyspark.sql.functions as F

        prev = self.versions()
        if not prev:
            raise FileNotFoundError(f"snapshot table {self.base} has no commits")
        m = prev[-1]
        dv = (
            self._scan_minus_dvs(spark, m)
            .filter(condition)
            .select(
                # stored under the public names; read path re-aliases
                F.col("__dv_file").alias("file_path"),
                F.col("__dv_pos").alias("row_index"),
            )
        )
        ddir = f"dv-{uuid.uuid4().hex[:12]}"
        dv.write.mode("errorifexists").parquet(os.path.join(self.base, ddir))
        # version numbering is GLOBAL across branches (same rule as
        # commit()/publish()): main-head+1 would collide forever with
        # any branch commit ahead of main (EEXIST on every retry).
        # eqdvs and dir_cols are forwarded — dropping them would
        # resurrect equality-deleted rows and lose evolved-schema
        # mergeSchema detection in the new version.
        return self._commit_manifest(
            version=self.versions(None)[-1]["version"] + 1,
            dirs=m["dirs"],
            dvs=(m.get("dvs") or []) + [ddir],
            mode="delete",
            data_dir=ddir,
            eqdvs=m.get("eqdvs") or [],
            dir_cols=m.get("dir_cols") or {},
        )

    def rewrite_compact(self, spark: SparkSession) -> int:
        """Materialize the current visible rows into a fresh data dir
        and commit it with NO deletion vectors — the maintenance
        rewrite that re-earns pure-scan reads after many deletes. Same
        visible rows before and after (pinned by tests)."""
        return self.commit(self.read(spark), mode="overwrite")

    # -- equality deletes (sequence-scoped, the Iceberg v2 sibling) ---

    def delete_eq(self, spark: SparkSession, keys: DataFrame, on: str) -> int:
        """Merge-on-read EQUALITY delete: tombstone every row whose
        ``on`` value appears in ``keys`` — but ONLY in the data dirs
        that exist NOW. Iceberg's sequence-number rule at directory
        granularity: an equality delete applies to files OLDER than
        itself, so rows appended later with the same key are exempt
        (the upsert-by-delete-then-append pattern depends on this).
        The manifest records each eq-delete with its covered dir set;
        reads apply each eq set as one anti-join restricted to rows
        whose source dir is covered."""
        prev = self.versions()
        if not prev:
            raise FileNotFoundError(f"snapshot table {self.base} has no commits")
        m = prev[-1]
        import pyspark.sql.functions as F

        ddir = f"ev-{uuid.uuid4().hex[:12]}"
        keys.select(F.col(on).alias("key")).distinct().write.mode(
            "errorifexists"
        ).parquet(os.path.join(self.base, ddir))
        eqdvs = list(m.get("eqdvs") or []) + [
            {"dir": ddir, "on": on, "covers": list(m["dirs"])}
        ]
        return self._commit_manifest(
            version=self.versions(None)[-1]["version"] + 1,
            dirs=m["dirs"],
            dvs=m.get("dvs") or [],
            mode="delete_eq",
            data_dir=ddir,
            eqdvs=eqdvs,
            dir_cols=m.get("dir_cols") or {},
        )

    # -- write-audit-publish ------------------------------------------

    def publish(self, branch: str) -> int:
        """Fast-forward ``main`` to a branch's head: write the next MAIN
        manifest referencing the branch head's exact dir/DV/schema sets
        — no data moves, the staged directories simply become visible
        to main readers. This is the PUBLISH step of write-audit-publish
        (stage commits on a branch, validate them there, then promote
        atomically); the link(2) commit point gives publish the same
        optimistic concurrency as any commit — a racing publish or
        main commit loses cleanly and retries."""
        head = self.versions(branch)
        if not head:
            raise KeyError(f"branch {branch!r} has no commits")
        h = head[-1]
        allv = self.versions(None)
        return self._commit_manifest(
            version=allv[-1]["version"] + 1,
            dirs=h["dirs"],
            dvs=h.get("dvs") or [],
            mode="publish",
            data_dir="",
            eqdvs=h.get("eqdvs") or [],
            dir_cols=h.get("dir_cols") or {},
            branch="main",
        )

    # -- retention ------------------------------------------------------

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Drop the manifests of all but the newest ``keep_last``
        versions, then delete every data directory no surviving
        manifest references. Returns the deleted data dirs. Time travel
        to vacuumed versions raises KeyError afterwards — the same
        contract as a lakehouse VACUUM breaking time travel past the
        retention window. Manifest files are removed BEFORE data dirs
        (a reader that resolved a version pre-vacuum may still be
        scanning; removing the manifest first means new resolutions
        can't land on a dir mid-delete)."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        allv = self.versions(None)
        mains = [m for m in allv if m.get("branch", "main") == "main"]
        others = [m for m in allv if m.get("branch", "main") != "main"]
        heads = {}
        for m in others:
            heads[m.get("branch")] = m  # version-ordered → last wins
        vs = mains
        if len(vs) <= keep_last:
            return []
        def _alldirs(m):
            return (
                m["dirs"]
                + (m.get("dvs") or [])
                + [e["dir"] for e in (m.get("eqdvs") or [])]
            )

        drop, keep = vs[:-keep_last], vs[-keep_last:]
        keep = keep + list(heads.values())  # branch heads stay readable
        drop = drop + [m for m in others if m is not heads.get(m.get("branch"))]
        live = {d for m in keep for d in _alldirs(m)}
        for m in drop:
            os.remove(os.path.join(self._manifest_dir(), f"{m['version']:08d}.json"))
        deleted = []
        for m in drop:
            for d in _alldirs(m):
                if d not in live and os.path.isdir(os.path.join(self.base, d)):
                    shutil.rmtree(os.path.join(self.base, d))
                    deleted.append(d)
        return deleted

    # -- MERGE (CDC apply) --------------------------------------------

    def apply_cdc(
        self,
        spark: SparkSession,
        changes: DataFrame,
        on: str,
        op_col: str = "cdc_op",
    ) -> int:
        """MERGE-statement semantics producing a new version from a CDC
        change set: ``changes`` carries the target's schema plus
        ``op_col`` ∈ {'U','D'} — 'D' removes the key, 'U' upserts the
        full row (update when the key exists, insert when it doesn't).
        One full-outer join on the key (AQE broadcasts the usual small
        change batch), then a copy-on-write overwrite commit — the same
        cost model as a lakehouse MERGE without deletion vectors."""
        import pyspark.sql.functions as F

        target = self.read(spark)
        data_cols = [c for c in target.columns if c != on]
        src = changes.select(
            F.col(on).alias("__k"),
            F.col(op_col).alias("__op"),
            *[F.col(c).alias(f"__s_{c}") for c in data_cols],
        )
        joined = target.join(src, target[on] == src["__k"], "full_outer")
        upsert = F.col("__op") == "U"
        out = joined.filter(F.col("__op").isNull() | upsert).select(
            F.coalesce(target[on], F.col("__k")).alias(on),
            *[
                F.when(upsert, F.col(f"__s_{c}")).otherwise(target[c]).alias(c)
                for c in data_cols
            ],
        )
        return self.commit(out, mode="overwrite")
