"""Custom Python data source (Spark 4 ``pyspark.sql.datasource``):
a deterministic synthetic event generator, ``format("eventgen")``.

Why an engine ships this: load tests, soak tests, and shuffle/agg
benchmarks need N rows of realistic events WITHOUT reading storage —
and the DataSource API is the sanctioned way to plug "not a file, not
JDBC" sources (feature stores, internal RPC services, queue snapshots)
into the planner with real partitioning, instead of
``spark.createDataFrame`` driver-side materialization (which serializes
every row through the driver and caps out at driver memory).

Scale notes: ``partitions()`` declares the split — each InputPartition
generates its slice independently on an executor, so 10^12 rows is
just ``n_partitions`` tasks of streaming generators (rows yield one at
a time; nothing materializes a partition in memory). Generation is a
pure function of (seed, row index) — splittable, restartable,
shuffle-free, and identical across retries, which is what makes the
source usable under task re-execution.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


def _u64(seed: int, i: int, salt: str) -> int:
    """Deterministic 64-bit stream: md5 of (seed, salt, i) — the same
    engine-portable construction functions/text.py hash64 uses."""
    h = hashlib.md5(f"{seed}:{salt}:{i}".encode()).digest()
    return int.from_bytes(h[:8], "big")


_START = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _gen_rows(seed: int, n_users: int, lo: int, hi: int):
    """THE row generator — batch reader, stream reader, and stream
    replay all call this one function, so 'stream == batch' is true by
    construction, not by keeping copies in sync."""
    for i in range(lo, hi):
        uid = _u64(seed, i, "u") % n_users
        etype = _EVENT_TYPES[_u64(seed, i, "t") % len(_EVENT_TYPES)]
        # cents-granular value, deterministic
        value = (_u64(seed, i, "v") % 1_000_000) / 100.0
        ts = _START + timedelta(seconds=_u64(seed, i, "s") % 2_592_000)
        yield (i, uid, etype, value, ts.replace(tzinfo=None))


class EventGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_partitions", 4))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("n_users", 100))

    def partitions(self):
        return [InputPartition(p) for p in range(self.n_parts)]

    def read(self, partition: InputPartition):
        p = partition.value
        lo = self.n_rows * p // self.n_parts
        hi = self.n_rows * (p + 1) // self.n_parts
        return _gen_rows(self.seed, self.n_users, lo, hi)


class EventGenStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch twin of the batch reader: the offset IS the row
    index, so batches are contiguous slices of the same deterministic
    (seed, index) stream. ``readBetweenOffsets`` replays any slice
    bit-identically — exactly-once replay under checkpoint recovery
    costs nothing because generation is a pure function, the same
    property that makes the batch source retry-safe."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 50))
        self.n_total = int(options.get("n_total", 0))  # 0 = unbounded
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("n_users", 100))

    def initialOffset(self):
        return {"index": 0}

    def read(self, start: dict):
        lo = start["index"]
        hi = lo + self.rows_per_batch
        if self.n_total:
            hi = min(hi, self.n_total)
        return iter(list(_gen_rows(self.seed, self.n_users, lo, hi))), {
            "index": hi
        }

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            list(_gen_rows(self.seed, self.n_users, start["index"], end["index"]))
        )


class EventGenDataSource(DataSource):
    """``spark.read.format("eventgen").option("n_rows", N).load()`` —
    or ``spark.readStream.format("eventgen")`` for the micro-batch
    twin of the same deterministic stream."""

    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return (
            "event_id bigint, user_id bigint, event_type string, "
            "value double, ts timestamp"
        )

    def reader(self, schema) -> EventGenReader:
        return EventGenReader(self.options)

    def simpleStreamReader(self, schema) -> EventGenStreamReader:
        return EventGenStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the eventgen format on a session."""
    spark.dataSource.register(EventGenDataSource)
