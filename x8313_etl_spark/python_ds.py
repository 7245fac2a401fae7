"""Custom batch data source via the Spark 4 Python DataSource API
(SURVEY.md §2.1 S17) — deterministic partitioned sensor readings.

Kept in its own importable module: executors unpickle the reader, so
the classes must resolve by module path (defining them inside a query
function would ship closures and break on a real cluster).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    WriterCommitMessage,
)

N_ROWS = 10_000
N_PARTS = 8
N_SENSORS = 50


def reading(seq: int) -> float:
    """6-dp md5-derived reading — the same algebra the SQL twin runs."""
    h = int(hashlib.md5(f"x11-{seq}".encode()).hexdigest()[:8], 16)
    return (h % 1_000_000) / 1_000_000.0


class SensorReader(DataSourceReader):
    def partitions(self):
        return [InputPartition(i) for i in range(N_PARTS)]

    def read(self, partition):
        per = N_ROWS // N_PARTS
        start = partition.value * per
        for seq in range(start, start + per):
            yield (seq % N_SENSORS, seq, reading(seq))


class SensorDataSource(DataSource):
    @classmethod
    def name(cls):
        return "x8313_sensors"

    def schema(self):
        return "sensor_id int, seq int, reading double"

    def reader(self, schema):
        return SensorReader()


# ---------------------------------------------------------------------------
# Streaming Python data source (SURVEY.md §2.1 S7/S17 streaming
# counterpart; r9 candidate s21) — the Spark 4 DataSourceStreamReader
# extension point: the PARTITION-PLANNED streaming reader (executor-side
# reads), not SimpleDataSourceStreamReader's driver-side convenience
# variant, so each micro-batch scales by adding partitions exactly like
# the batch source above.
# ---------------------------------------------------------------------------

STREAM_TICKS = 4  # micro-batches the source serves before going idle
STREAM_ROWS_PER_TICK = 1_000
STREAM_PARTS = 8


def stream_reading(seq: int) -> float:
    """6-dp md5-derived reading (s21's algebra — distinct salt from the
    batch source so the two sources can't mask each other in tests)."""
    h = int(hashlib.md5(f"s21-{seq}".encode()).hexdigest()[:8], 16)
    return (h % 1_000_000) / 1_000_000.0


class TickPartition(InputPartition):
    def __init__(self, tick: int, part: int):
        self.tick, self.part = tick, part


class SensorStreamReader(DataSourceStreamReader):
    """Offset = how many ticks have been served. latestOffset advances
    one tick per micro-batch until STREAM_TICKS, then holds — Spark
    stops planning batches once start == end, so the stream goes idle
    (a finite deterministic feed, the fixture analog of a caught-up
    queue). partitions(start, end) fans each pending tick into
    STREAM_PARTS independent slices; read() runs executor-side on the
    slice alone.

    RESTART SAFETY: the served-tick high-water lives in a sidecar file
    (``progressDir`` option), NOT an in-memory invocation counter — a
    reader rebuilt from a query checkpoint must never report an offset
    BELOW the committed one (Spark would plan nothing, or reject the
    regression), which is exactly what a fresh counter would do. This
    mirrors real sources, whose offsets come from the external system's
    durable positions. Without the option the counter is process-local
    (fresh ad-hoc queries only; documented fixture convenience).
    The hazard runs BOTH ways: latestOffset persists the advanced tick
    before the batch commits, so a STALE sidecar paired with a FRESH
    checkpoint (a new query reusing an old progressDir) starts at the
    held high-water and serves zero batches — pair each checkpoint with
    its own sidecar (the s21 harness uses a per-run uuid path).
    Trigger note: one tick is released per latestOffset call, so an
    availableNow trigger (one offset probe) would see a single tick —
    run this source with a processingTime trigger and poll the sink to
    the known row count (the s21 harness does)."""

    def __init__(self, progress_path: str | None = None):
        self._progress = progress_path
        self._tick = 0

    def _stored(self) -> int:
        if self._progress:
            try:
                with open(self._progress) as f:
                    return int(f.read().strip() or 0)
            except FileNotFoundError:
                return 0
        return self._tick

    def _store(self, tick: int) -> None:
        if self._progress:
            tmp = f"{self._progress}.tmp"
            with open(tmp, "w") as f:
                f.write(str(tick))
            import os

            os.replace(tmp, self._progress)  # atomic on POSIX
        self._tick = tick

    def initialOffset(self):
        return {"tick": 0}

    def latestOffset(self):
        tick = min(self._stored() + 1, STREAM_TICKS)
        self._store(tick)
        return {"tick": tick}

    def partitions(self, start, end):
        return [
            TickPartition(t, p)
            for t in range(start["tick"], end["tick"])
            for p in range(STREAM_PARTS)
        ]

    def read(self, partition):
        per = STREAM_ROWS_PER_TICK // STREAM_PARTS
        base = partition.tick * STREAM_ROWS_PER_TICK + partition.part * per
        for seq in range(base, base + per):
            yield (seq % N_SENSORS, seq, stream_reading(seq))

    def commit(self, end):
        pass


class SensorStreamDataSource(DataSource):
    @classmethod
    def name(cls):
        return "x8313_sensor_stream"

    def schema(self):
        return "sensor_id int, seq int, reading double"

    def streamReader(self, schema):
        # reader options arrive case-insensitively (Spark lower-cases
        # DataFrameReader option keys) — accept either spelling
        path = self.options.get("progressdir") or self.options.get("progressDir")
        return SensorStreamReader(path)


# ---------------------------------------------------------------------------
# Streaming Python data SINK (r9/r10 candidate x13) — the write half of
# the Spark 4 streaming Python DataSource API: executor-side
# ``write(iterator)`` stages a file per task, driver-side
# ``commit(messages, batchId)`` publishes the batch ATOMICALLY by
# renaming the staged files into a ``v{batchId}`` dir. Replayed batch
# ids are idempotent no-ops (the dir already exists) — the same
# per-epoch commit contract as operators/upsert_sink.py and verdir.py,
# expressed through the DataSourceStreamWriter extension point instead
# of foreachBatch.
# ---------------------------------------------------------------------------


class _FileCommit(WriterCommitMessage):
    def __init__(self, path: str):
        self.path = path


class JsonDirStreamWriter(DataSourceStreamWriter):
    """Stages files executor-side and commits driver-side with
    os.replace on the SAME base path — correct only in local mode or on
    a shared filesystem (NFS/FUSE-mounted object store), the same
    assumption the sibling fixture sinks document; a multi-host
    production deployment would stage to task-local storage and publish
    via the store's rename/multipart-commit primitive."""

    def __init__(self, base: str):
        self.base = base

    def write(self, iterator):
        """Executor-side: serialize this task's rows as JSON lines into
        a staging file; the file only becomes visible if the driver
        commits the whole batch."""
        import json as _json
        import os
        import uuid as _uuid

        stage = os.path.join(self.base, "_staging")
        os.makedirs(stage, exist_ok=True)
        path = os.path.join(stage, f"task-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(path, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        if n == 0:
            os.remove(path)
            return _FileCommit("")
        return _FileCommit(path)

    def commit(self, messages, batchId):
        """Driver-side atomic publish: move every staged file into
        v{batchId} and rename it into place. A replayed batchId finds
        the version dir already present and drops its staging files —
        exactly-once output under micro-batch retries."""
        import os
        import shutil
        import uuid as _uuid

        vdir = os.path.join(self.base, f"v{batchId}")
        paths = [m.path for m in messages if m is not None and m.path]
        if os.path.isdir(vdir):  # replay: already committed
            for p in paths:
                try:
                    os.remove(p)
                except OSError:
                    pass
            return
        tmp = os.path.join(self.base, f"_commit-{_uuid.uuid4().hex}")
        os.makedirs(tmp)
        for i, p in enumerate(paths):
            os.replace(p, os.path.join(tmp, f"part-{i:05d}.jsonl"))
        os.replace(tmp, vdir)  # atomic on POSIX

    def abort(self, messages, batchId):
        import os

        for m in messages:
            if m is not None and m.path:
                try:
                    os.remove(m.path)
                except OSError:
                    pass


class JsonDirStreamDataSource(DataSource):
    @classmethod
    def name(cls):
        return "x8313_jsondir_sink"

    def schema(self):
        # sinks don't need a schema of their own; Spark passes the
        # input schema to streamWriter
        return "value string"

    def streamWriter(self, schema, overwrite):
        path = self.options.get("path")
        if not path:
            raise ValueError("x8313_jsondir_sink requires a path option")
        return JsonDirStreamWriter(path)
