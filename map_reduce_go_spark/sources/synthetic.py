"""Custom Python DataSource: deterministic synthetic event generation.

Spark 4's Python DataSource API is the extension point the reference's
pluggable-source concept maps to (reference src/mr/worker.go reads files
because files are its only source abstraction; Spark's is a first-class
API). This module implements `synthetic_events` — a partitioned,
fully deterministic event-log generator:

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("rows", 100000).option("partitions", 32)
          .option("users", 500).load())

Every field derives from the row index by integer arithmetic (no RNG
state), so any (rows, partitions, users) triple yields bit-identical data
on every read, any partitioning, any engine — the same determinism
contract the rest of the repo holds itself to. Generation is embarrassingly
parallel: each InputPartition materializes only its own row range, so the
source scales to any size without driver involvement (the 100 TB use:
load/soak testing the pipeline without storing a corpus).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")

_BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)

SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
)


def _row(rid: int, n_users: int):
    """One deterministic event from a row index: pure integer arithmetic
    (identical on every executor, attempt, and partitioning)."""
    ts = _BASE + timedelta(seconds=(rid * 37) % 2_592_000, microseconds=(rid * 101) % 1_000_000)
    return (
        rid,
        ts.replace(tzinfo=None),
        (rid * 13 + 7) % n_users,
        EVENT_TYPES[(rid * 11) % len(EVENT_TYPES)],
        ((rid * 31) % 10_000) / 100.0,
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 4)))
        self.n_users = max(1, int(options.get("users", 50)))

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)  # ceil division
        return [
            _Range(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _Range):
        for rid in range(partition.start, partition.end):
            yield _row(rid, self.n_users)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Unbounded streaming form (the rate-source analog): each micro-batch
    is the next ``rowsPerBatch`` row indices. The offset is just the row
    index, so replay (``readBetweenOffsets``, exactly-once recovery after
    a checkpoint restart) regenerates the identical rows — determinism IS
    the recovery story; there is no state beyond the offset."""

    def __init__(self, options):
        self.rows_per_batch = max(1, int(options.get("rowsPerBatch", 100)))
        self.n_users = max(1, int(options.get("users", 50)))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        s = int(start["offset"])
        e = s + self.rows_per_batch
        return iter([_row(r, self.n_users) for r in range(s, e)]), {"offset": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [_row(r, self.n_users) for r in range(int(start["offset"]), int(end["offset"]))]
        )


class SyntheticEventsDataSource(DataSource):
    """`synthetic_events` batch + streaming source. Batch options: rows
    (default 1000), partitions (default 4 — the parallelism contract),
    users (default 50, the user_id cardinality). Streaming options:
    rowsPerBatch (default 100), users."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return SyntheticEventsStreamReader(self.options)
