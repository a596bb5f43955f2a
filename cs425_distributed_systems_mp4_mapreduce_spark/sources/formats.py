"""Interchange formats (SURVEY.md §2.2 scans block: CSV/JSON
read-write).  Parquet is the engine's native format; CSV/JSON are
import/export surfaces.  At scale: CSV/JSON are line-splittable so
reads parallelize, but they lose types (schema must be supplied) and
columnar pruning — convert to parquet at the pipeline edge."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_conf


#: explicit NULL sentinel for CSV — the format cannot otherwise
#: distinguish NULL from empty string (both serialize to an empty
#: field and the default reader maps empty back to null, silently
#: corrupting empty-string data; found by tests/test_formats_edge.py)
CSV_NULL = "\\N"


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    (
        df.write.mode("overwrite")
        .option("header", header)
        .option("nullValue", CSV_NULL)
        # two double-quote characters — Spark's write-side default,
        # stated explicitly because the round-trip read side depends on
        # empty strings being quoted (distinguishing them from the \\N
        # null marker); the previous spelling '"\\"' evaluated to the
        # same string but read like a botched escape
        .option("emptyValue", '""')
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    multiline: bool = False,
) -> DataFrame:
    """Schema is REQUIRED — inference costs an extra full scan and can
    mis-type columns; at 100 TB you always know your schema.

    ``multiline=True`` is required to read back string values with
    EMBEDDED NEWLINES (the writer quotes them correctly; the default
    reader splits records on raw newlines regardless of quoting).  The
    tradeoff is real at scale: multiLine parsing cannot split a file
    across tasks, so each file parses on one core — keep files small
    (repartition before write) or strip newlines at ingest when the
    corpus allows.  Pinned by tests/test_formats_edge.py."""
    ensure_conf(spark)
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("multiLine", multiline)
        .option("nullValue", CSV_NULL)
        .option("emptyValue", "")
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    ensure_conf(spark)
    return spark.read.schema(schema).json(path)


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-style partitioned parquet sink — the layout that turns
    WHERE partition_col = x into partition pruning instead of a scan."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC interchange (Hive/Trino ecosystems).  Columnar like parquet
    — types, compression, predicate pushdown all survive — so unlike
    CSV/JSON no schema re-supply is needed on read."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    ensure_conf(spark)
    return spark.read.orc(path)
