"""Table loading for the driver testdata (FIXTURES.md schemas).

The reference's "dataset" is a named SDFS file-set of text lines
[spec: maple sdfs_src_directory — SURVEY.md §1.1]; our equivalent is a
parquet-backed DataFrame per table.  Scans stay fully declarative so
Catalyst gets predicate pushdown + column pruning into the parquet
reader — at 100 TB the scan is the dominant cost and pruning is the
single biggest lever.

events.ts gotcha (verified, SURVEY.md §1.2): the driver has shipped the
events table under two parquet schemas — TIMESTAMP(NANOS), which Spark
reads as Long nanoseconds under ``spark.sql.legacy.parquet.nanosAsLong=
true`` (runtime-set by ``ensure_conf``), and plain timestamp[µs], which
Spark reads as TIMESTAMP_NTZ.  :func:`normalize_events` presents BOTH
clocks under either schema: ``ts`` as Long nanoseconds (what every
``ts div 1000`` expression downstream expects) and ``event_ts`` as a µs
TimestampType.  The session timezone is pinned to UTC, so the NTZ→LTZ
cast is instant-preserving and ``ts div 1000`` ≡ DuckDB ``epoch_us(ts)``
bit-for-bit under either schema.
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


#: (applicationId, sf_dir, vec_id) → list[float].  Queries that rank
#: against a fixed query vector need it driver-side once (it becomes a
#: broadcast literal in the ranking expression); memoizing makes each
#: invocation a single Spark job instead of fetch-job + rank-job.
_VEC_CACHE: dict[tuple[str, str, int], list] = {}


def _evict_dead_sessions(app_id: str) -> None:
    """Drop cache entries bound to defunct SparkContexts: plans keyed by
    an applicationId other than the live session's are unusable (a
    stopped-then-recreated session gets a fresh appId), and keeping
    them leaks plan objects in long-lived processes."""
    for cache in (_TABLE_CACHE, _VEC_CACHE):
        stale = [k for k in cache if k[0] != app_id]
        for k in stale:
            del cache[k]


def query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list:
    """Fetch one embedding vector driver-side (memoized per session+dir).
    The 1-row fetch pushes ``vec_id = N`` into the parquet scan; at any
    scale this is a point lookup, and the cache makes repeated top-k
    invocations single-job."""
    app_id = spark.sparkContext.applicationId
    _evict_dead_sessions(app_id)
    key = (app_id, sf_dir, vec_id)
    vec = _VEC_CACHE.get(key)
    if vec is None:
        row = (
            table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") == vec_id)
            .select("embedding")
            .first()
        )
        if row is None:
            raise ValueError(f"vec_id {vec_id} not found in {sf_dir}/embeddings.parquet")
        vec = row["embedding"]
        _VEC_CACHE[key] = vec
    # copy: a caller mutating the returned list in place (normalize,
    # sort) must not corrupt the memoized value for every later call
    return list(vec)


def normalize_events(df: DataFrame) -> DataFrame:
    """Present the events table under both clocks, whatever the source
    parquet schema:

    - ``ts``: Long epoch **nanoseconds** (the legacy TIMESTAMP(NANOS)
      representation every downstream ``ts div 1000`` expression uses);
    - ``event_ts``: µs-precision TimestampType for windowing/watermarks.

    Legacy schema (ts already bigint ns) derives event_ts by exact
    integer division; the timestamp[µs] schema derives the ns Long from
    ``unix_micros`` (exact — no sub-µs information exists to lose).
    Requires session timeZone=UTC (set by ``ensure_conf``) so the
    TIMESTAMP_NTZ→TIMESTAMP cast preserves the stored instant.
    """
    if dict(df.dtypes).get("ts") == "bigint":
        return df.withColumn("event_ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("event_ts", F.col("ts").cast("timestamp")).withColumn(
        "ts", F.unix_micros(F.col("event_ts")) * F.lit(1000)
    )


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (cached per session+dir).

    For ``events``, normalizes the time columns — see
    :func:`normalize_events`.
    """
    ensure_conf(spark)
    app_id = spark.sparkContext.applicationId
    _evict_dead_sessions(app_id)
    key = (app_id, sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = normalize_events(df)
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
