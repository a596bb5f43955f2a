"""Table loading for the driver testdata (FIXTURES.md schemas).

The reference's "dataset" is a named SDFS file-set of text lines
[spec: maple sdfs_src_directory — SURVEY.md §1.1]; our equivalent is a
parquet-backed DataFrame per table.  Scans stay fully declarative so
Catalyst gets predicate pushdown + column pruning into the parquet
reader — at 100 TB the scan is the dominant cost and pruning is the
single biggest lever.

events.ts gotcha (verified, SURVEY.md §1.2): parquet TIMESTAMP(NANOS)
requires ``spark.sql.legacy.parquet.nanosAsLong=true`` (runtime-set by
``ensure_conf``); we read it as Long nanoseconds and derive ``event_ts``
(µs TimestampType) with exact integer division — ``ts div 1000`` — so
truncation matches DuckDB's ns→µs conversion bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_conf

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: dims safe to broadcast at ANY scale factor (bounded cardinality:
#: region=5, nation=25 — these never grow with SF, exactly the class of
#: table you broadcast on a 1000-executor cluster).
BROADCAST_SAFE = {"region", "nation"}


#: (applicationId, sf_dir, name) → DataFrame.  DataFrames are immutable
#: logical plans, so handing the same object to every query is safe and
#: saves a parquet footer read + py4j analysis round-trip per table per
#: query (~100ms each — plan construction was half the wall time of the
#: join-heavy benchmarks before this cache).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _evict_dead_sessions(app_id: str) -> None:
    """Drop cache entries bound to defunct SparkContexts: plans keyed by
    an applicationId other than the live session's are unusable (a
    stopped-then-recreated session gets a fresh appId), and keeping
    them leaks plan objects in long-lived processes."""
    stale = [k for k in _TABLE_CACHE if k[0] != app_id]
    for k in stale:
        del _TABLE_CACHE[k]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (cached per session+dir).

    For ``events``, adds ``event_ts``: a µs-precision timestamp derived
    from the nanosecond Long via integer division (no double rounding).
    """
    ensure_conf(spark)
    app_id = spark.sparkContext.applicationId
    _evict_dead_sessions(app_id)
    key = (app_id, sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
        _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all ten tables; also registers each as a temp view so the
    SQL surface (`spark.sql`) sees the same names as the DuckDB oracle."""
    out = {}
    for name in TABLE_NAMES:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
