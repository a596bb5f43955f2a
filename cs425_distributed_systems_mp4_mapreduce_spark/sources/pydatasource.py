"""Python DataSource API (Spark 4): a custom, partition-parallel
source implemented in pure Python — the extension point for reading
systems Spark has no built-in connector for (internal services, bespoke
formats).  The reference's analogue is its SDFS file reader; here the
point is the CONTRACT: schema declaration, option handling, partition
planning (split the keyspace, one generator per task — reads
parallelize across executors like any scan), and deterministic output.

This source generates a synthetic event stream from pure integer
arithmetic (LCG-style mixing on the row index), which makes it
oracle-checkable: DuckDB reproduces the exact rows from
generate_series with the same arithmetic — so the full
read-path (options → partitions → per-partition generators → rows) is
verified by value hash, not just row count.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: LCG-ish mixing constants (classic glibc values).  A·i stays inside
#: int64 only while i < 2^63/A ≈ 8.36e9, so the DuckDB generate_series
#: oracle twin computes identically up to that row count (Python's
#: arbitrary-precision ints would silently keep going past it, which
#: is why the reader validates ``rows`` below — review r12).
A = 1103515245
C = 12345
M = 2_147_483_648  # 2^31
MAX_ROWS = 8_000_000_000  # conservative int64-safe bound for A*i

SCHEMA = "event_id long, user_id long, etype string, value double"

ETYPES = ["click", "view", "signup", "purchase", "error"]


def mix(i: int) -> int:
    """Deterministic int64 mix of the row index (one LCG step)."""
    return (A * i + C) % M


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", "1000"))
        self.nparts = int(options.get("partitions", "4"))
        if self.rows < 0 or self.rows > MAX_ROWS:
            raise ValueError(
                f"rows={self.rows} outside [0, {MAX_ROWS}]: beyond the"
                " bound A*i overflows int64 and the DuckDB oracle twin"
                " diverges from Python's arbitrary-precision arithmetic"
            )
        if self.nparts < 1:
            raise ValueError(f"partitions={self.nparts} must be >= 1")

    def partitions(self):
        if self.rows == 0:  # range(0, 0, 0) would raise on step=0
            return [_Range(0, 0)]
        step = -(-self.rows // self.nparts)  # ceil
        return [
            _Range(s, min(s + step, self.rows))
            for s in range(0, self.rows, step)
        ]

    def read(self, part: _Range):
        for i in range(part.start, part.end):
            # (event_id, user_id, etype, 2-decimal double-exact value)
            yield _row(i)


def _row(i: int):
    h = mix(i)
    return (i, h % 50, ETYPES[i % 5], (h % 10_000) / 100.0)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the same source (Spark 4
    ``SimpleDataSourceStreamReader``): the deterministic row space is
    consumed as micro-batches of ``batch_rows``, with the offset =
    next unread row index.

    Exactly-once contract: ``read`` advances the offset and
    ``readBetweenOffsets`` REPLAYS any [start, end) range untouched —
    possible only because rows are a pure function of the index
    (``mix``), the same property that makes the batch half
    value-hash-oracled.  Once ``rows`` is exhausted the reader returns
    empty batches at a fixed offset, so ``Trigger.AvailableNow``
    terminates and stream output can be compared 1:1 against the batch
    read — asserted in tests/test_streaming.py."""

    def __init__(self, options):
        self.rows = int(options.get("rows", "1000"))
        self.batch_rows = int(options.get("batch_rows", "100"))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self.batch_rows, self.rows)
        return iter([_row(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(start["i"], end["i"])])


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events").option("rows", N)
    .option("partitions", P).load() — or readStream with
    .option("batch_rows", B) for the micro-batched streaming half."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)
