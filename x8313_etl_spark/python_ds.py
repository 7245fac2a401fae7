"""Custom batch data source via the Spark 4 Python DataSource API
(SURVEY.md §2.1 S17) — deterministic partitioned sensor readings.

Kept in its own importable module: executors unpickle the reader, so
the classes must resolve by module path (defining them inside a query
function would ship closures and break on a real cluster).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
