"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference reads only CSV from disk (SURVEY §2.1); a complete engine
must also ingest from systems Spark has no built-in connector for. The
Spark 4 Python DataSource API is the sanctioned extension point: a
`DataSource` declares schema + partitions on the driver, and each
`InputPartition` is read INSIDE an executor task — so a custom feed
parallelizes and co-schedules like any native scan, with no driver-side
row handling.

`SyntheticEventsDataSource` is the in-repo instance: a deterministic,
seeded event generator (the stand-in for "your internal feed client").
Each partition derives its rows purely from (seed, partition_id, row
index) — re-running a failed task regenerates identical rows, which is
exactly the idempotence contract a custom source must honor for Spark's
task retries to be safe.

Register + read:

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("rows_per_partition", 1000)
          .option("partitions", 8)
          .option("seed", 42)
          .load())
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_BASE_TS = datetime(2024, 1, 1)


def _h(seed: int, part: int, i: int, field: str) -> int:
    """Deterministic 60-bit value from (seed, partition, row, field) —
    md5-based so regeneration after task retry is bit-identical
    everywhere (no RNG state, no platform dependence)."""
    key = f"{seed}/{part}/{i}/{field}".encode()
    return int(hashlib.md5(key).hexdigest()[:15], 16)


class _Partition(InputPartition):
    def __init__(self, part_id: int, rows: int, seed: int):
        self.part_id = part_id
        self.rows = rows
        self.seed = seed


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows_per_partition", 1000))
        self.parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        return [_Partition(p, self.rows, self.seed) for p in range(self.parts)]

    def read(self, partition: _Partition):
        # runs in the executor task; yields plain tuples matching schema
        p, n, seed = partition.part_id, partition.rows, partition.seed
        for i in range(n):
            event_id = p * n + i
            ts = _BASE_TS + timedelta(seconds=_h(seed, p, i, "ts") % 2_592_000)
            user_id = _h(seed, p, i, "user") % 1000
            etype = EVENT_TYPES[_h(seed, p, i, "type") % len(EVENT_TYPES)]
            value = round((_h(seed, p, i, "value") % 10_000) / 100.0, 2)
            yield (event_id, ts, user_id, etype, value)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)
