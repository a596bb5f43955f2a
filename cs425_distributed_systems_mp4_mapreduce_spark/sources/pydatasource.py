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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: LCG-ish mixing constants (classic glibc values) — arithmetic chosen
#: to stay well inside int64 so Spark and DuckDB compute identically.
A = 1103515245
C = 12345
M = 2_147_483_648  # 2^31

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

    def partitions(self):
        step = -(-self.rows // self.nparts)  # ceil
        return [
            _Range(s, min(s + step, self.rows))
            for s in range(0, self.rows, step)
        ]

    def read(self, part: _Range):
        for i in range(part.start, part.end):
            h = mix(i)
            yield (
                i,                        # event_id
                h % 50,                   # user_id
                ETYPES[i % 5],            # etype
                (h % 10_000) / 100.0,     # value: 2-decimal, double-exact
            )


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events").option("rows", N)
    .option("partitions", P).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)
