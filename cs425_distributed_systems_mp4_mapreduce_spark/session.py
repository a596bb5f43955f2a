"""SparkSession construction + defensive runtime config.

The driver owns its own SparkSession for t2 (``entry(spark)`` /
``queries()[name](spark, sf_dir)``), so every config we *require* must
be runtime-settable; ``ensure_conf`` is called from the table loader so
queries work on any session handed to us.  Verified on this machine:
``spark.sql.legacy.parquet.nanosAsLong`` IS runtime-settable and is
required to read events.parquet (TIMESTAMP(NANOS) — SURVEY.md §1.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: configs that are runtime-settable (SQLConf) and required for
#: correctness/parity on any session we receive from the driver.
RUNTIME_CONF: dict[str, str] = {
    # events.ts is parquet TIMESTAMP(NANOS); Spark 4 otherwise throws
    # PARQUET_TYPE_ILLEGAL.  Reads as LongType nanoseconds.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # DuckDB (the oracle) is timezone-naive; pin Spark to UTC so
    # timestamp arithmetic/collection matches byte-for-byte.
    "spark.sql.session.timeZone": "UTC",
    # runtime re-planning: coalesce shuffle partitions, skew-join
    # splitting, broadcast conversion — the 100 TB posture.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for any pandas-UDF path and for toPandas().
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_conf(spark: SparkSession) -> SparkSession:
    """Apply required runtime confs to an externally-created session."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - non-settable on some builds
            pass
    return spark


def get_spark(
    app_name: str = "mp4-mapreduce-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Local session for tests/bench.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all cores; shuffle
    partitions default to 2x cores on the local harness (at cluster
    scale you would size by data volume instead — see bench.py notes).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        ncores = os.cpu_count() or 8 if cores == "*" else int(cores)
        shuffle_partitions = max(8, 2 * ncores) if ncores else 32

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return ensure_conf(builder.getOrCreate())
