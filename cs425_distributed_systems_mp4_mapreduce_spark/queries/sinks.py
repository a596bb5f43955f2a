"""Declared sink queries: the write side of the engine, exercised
end-to-end (SURVEY.md §2.2 scans/sinks block).

The reference's SDFS put/get surface is subsumed by parquet write/read;
what matters at 100 TB is the LAYOUT — a Hive-partitioned sink turns
``WHERE partition_col = x`` into partition PRUNING (the scan lists only
the matching directory) instead of a full-table scan.  The roundtrip
below is driver-verified: the oracle aggregates the SOURCE table, so
the write → prune → read → aggregate path must be lossless and the
partition filter exact.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parity import dsum, o_dsum
from ..registry import query
from ..sources.formats import write_parquet_partitioned
from ..sources.tables import table as T


def sink_path(sf_dir: str, name: str) -> str:
    """Deterministic scratch location per (scale factor, sink name)."""
    return os.path.join(
        tempfile.gettempdir(),
        "cs425_distributed_systems_mp4_mapreduce_spark_sinks",
        os.path.basename(sf_dir.rstrip("/")),
        name,
    )


@query(
    "q_sink_partitioned",
    oracle="""
    SELECT l_linestatus, {sq}, {sdp}, COUNT(*) AS n
    FROM lineitem
    WHERE l_returnflag = 'R'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """.format(
        sq=o_dsum("l_quantity", "sum_qty"),
        sdp=o_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price"),
    ),
)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-sink roundtrip: write lineitem partitioned by
    l_returnflag, read it back with a partition filter (pruned to the
    'R' directory — asserted as PartitionFilters in tests/test_plans.py)
    and aggregate.  The oracle runs the same aggregate on the SOURCE
    table, so any loss or duplication in the sink surfaces as a hash
    mismatch."""
    li = T(spark, sf_dir, "lineitem")
    path = sink_path(sf_dir, "lineitem_by_returnflag")
    write_parquet_partitioned(li, path, ["l_returnflag"])
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    return (
        back.groupBy("l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_linestatus")
    )
