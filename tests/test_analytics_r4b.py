"""Round-4b operator tests: bitmap exact-distinct mergeability and
LOCF edge semantics (the properties the oracle parity row can't show).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cs425_distributed_systems_mp4_mapreduce_spark.sources.tables import table as T
from conftest import SF_T2


def test_bitmap_partials_merge_exactly(spark):
    """The scale claim behind q_agg_bitmap_distinct: partial bitmaps
    built on DISJOINT row subsets OR together into the same exact
    distinct count as a single global pass — i.e. the aggregation is
    associative/mergeable like a sum, which is what makes it
    one-shuffle at 100 TB.  Split the table by event_id parity (rows of
    one user land in BOTH halves — the hard case), build per-half
    partial bitmaps, merge with bitmap_or_agg, compare to
    countDistinct."""
    e = T(spark, SF_T2, "events").withColumn("uid", F.col("user_id") + 1)
    halves = e.withColumn("half", (F.col("event_id") % 2).cast("int"))
    partial = halves.groupBy(
        "event_type", "half", F.expr("bitmap_bucket_number(uid)").alias("bucket")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(uid))").alias("bm"))
    merged = (
        partial.groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users"))
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    m = {r["event_type"]: r["n_users"] for r in merged.collect()}
    x = {r["event_type"]: r["n_users"] for r in exact.collect()}
    assert m == x and len(m) == 5


def test_locf_null_prefix_stays_null(spark):
    """Rows before a user's first purchase have no observation to carry
    forward — value_filled must be NULL there, not 0 or a value leaked
    across the user partition boundary."""
    from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

    df = all_queries()["q_window_locf"].fn(spark, SF_T2)
    pdf = df.toPandas()
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        seen = False
        for sparse, filled in zip(g["value_sparse"], g["value_filled"]):
            if sparse == sparse and sparse is not None:  # non-NaN observation
                seen = True
                assert filled == sparse
            elif not seen:
                assert filled != filled or filled is None  # NaN before first obs
        # at least the carried value never changes except at an observation
        obs = g["value_sparse"].ffill()
        got = g["value_filled"]
        assert ((obs == got) | (obs.isna() & got.isna())).all()
