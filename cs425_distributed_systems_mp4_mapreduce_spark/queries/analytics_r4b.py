"""Round-4b surface: mergeable exact-distinct bitmaps, last-observation
-carried-forward gap fill, and the runtime-bloom-filter join shape.

Like everything in this package these are Spark-first designs of
capabilities the reference's users would reach for at scale, not ports
(the reference — SURVEY.md §0 — has no analytics surface beyond
maple/juice + the SQL filter/join frontend).

Scale notes, per query:

- ``q_agg_bitmap_distinct``: COUNT(DISTINCT) at 100 TB is a two-shuffle
  expand-and-dedup; HLL is one-shuffle but approximate.  Fixed-width
  bitmaps (Spark 3.5 ``bitmap_construct_agg``) give the third point on
  that curve: EXACT and mergeable in one shuffle — partial bitmaps OR
  together associatively exactly like partial sums (the property
  tests/test_analytics_r4b.py proves by splitting the table in half).
  This is the roaring-bitmap pattern ClickHouse/Druid use for exact
  distinct users.

- ``q_window_locf``: forward-fill of a sparse measurement column is the
  canonical time-series prep step (sensor/metric tables are mostly
  NULL between readings).  ``last_value(..., ignoreNulls)`` over a
  per-key ordered window is one shuffle + one per-partition sort; no
  self-join, no driver loop; DuckDB's ``IGNORE NULLS`` makes the
  oracle a literal transliteration.

- ``q_join_bloom_pruned``: the selective-dim ⋈ huge-fact shape.  At
  bench scale AQE broadcasts the filtered dim; on a 100 TB fact where
  even the filtered dim exceeds the broadcast budget, Spark's runtime
  bloom-filter injection (spark.sql.optimizer.runtime.bloomFilter.*)
  builds a bloom filter from the dim side and semi-filters the fact
  SCAN before the shuffle — rows that cannot join never leave the
  mapper.  tests/test_plans.py forces the shuffle-join regime (no
  broadcast, thresholds lowered) and pins BloomFilterMightContain in
  the optimized plan, so the scale path is verified, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.parity import dsum, o_dsum
from ..registry import query
from ..sources.tables import table as T


@query(
    "q_agg_bitmap_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event_type via mergeable bitmaps:
    bucket = (user_id+1) div 32768, partial bitmap per (event_type,
    bucket) via ``bitmap_construct_agg(bitmap_bit_position(...))``,
    then Σ ``bitmap_count`` per event_type.  The +1 shift keeps ids
    strictly positive (bit_position is 1-based; testdata user_ids start
    at 0) and is bijective, so the distinct count is unchanged.  The
    oracle is the plain COUNT(DISTINCT): the bitmap path must be
    exactly equivalent, not approximately."""
    e = T(spark, sf_dir, "events").withColumn("uid", F.col("user_id") + 1)
    partial = e.groupBy(
        "event_type", F.expr("bitmap_bucket_number(uid)").alias("bucket")
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(uid))").alias("bm"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users"),
            F.sum("n").alias("n_events"),
        )
        .orderBy("event_type")
    )


@query(
    "q_window_locf",
    headline=True,
    oracle="""
    SELECT event_id, user_id, ts_us, value_sparse,
           LAST_VALUE(value_sparse IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
    FROM (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             CASE WHEN event_type = 'purchase' THEN value END AS value_sparse
      FROM events)
    ORDER BY user_id, ts_us, event_id
    """,
)
def q_window_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: treat ``value`` as a sparse
    measurement only present on purchase events, forward-fill it per
    user in event-time order.  ``last_value`` with ignoreNulls over a
    running frame — one hash shuffle on user_id, sort within
    partitions, no join."""
    e = T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "value_sparse"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.withColumn(
        "value_filled", F.last("value_sparse", ignorenulls=True).over(w)
    ).orderBy("user_id", "ts_us", "event_id")


@query(
    "q_join_bloom_pruned",
    oracle="""
    SELECT p_brand, {rev}, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand IN ('Brand#1', 'Brand#2')
    GROUP BY p_brand
    ORDER BY p_brand
    """.format(rev=o_dsum("l_extendedprice * (1 - l_discount)", "revenue")),
)
def q_join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dim ⋈ fact: ~4% of parts join against the full
    lineitem scan.  Declarative join only — the engine picks broadcast
    here and bloom-filter-semi-join at scale (the regime
    tests/test_plans.py::test_bloom_filter_injected_in_shuffle_regime
    pins); the query code is identical in both, which is the point."""
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
    )


@query(
    "q_table_diff",
    oracle="""
    WITH v2 AS (
      SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 101 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 97 <> 0
      UNION ALL
      SELECT -c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 89 = 0
    )
    SELECT COALESCE(a.c_custkey, b.c_custkey) AS c_custkey,
           CASE WHEN a.c_custkey IS NULL THEN 'insert'
                WHEN b.c_custkey IS NULL THEN 'delete'
                ELSE 'update' END AS change,
           a.c_acctbal AS old_acctbal, b.c_acctbal AS new_acctbal
    FROM customer a FULL OUTER JOIN v2 b USING (c_custkey)
    WHERE a.c_custkey IS NULL OR b.c_custkey IS NULL
       OR a.c_name IS DISTINCT FROM b.c_name
       OR a.c_nationkey IS DISTINCT FROM b.c_nationkey
       OR a.c_acctbal IS DISTINCT FROM b.c_acctbal
       OR a.c_mktsegment IS DISTINCT FROM b.c_mktsegment
    ORDER BY c_custkey
    """,
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table reconciliation (snapshot diff): classify every key as
    insert / delete / update between a table and its next version —
    the audit primitive behind CDC backfills and replica verification.
    One key-partitioned full-outer join; change detection is per-column
    ``IS DISTINCT FROM`` (NULL-safe, no lossy row-hash, no
    engine-specific float formatting).  The v2 snapshot is synthesized
    deterministically from the base table (drops %97 keys, bumps %101
    balances, inserts %89 clones in the NEGATIVE key space so inserts
    can never collide with real keys at any SF — the q_merge_upsert
    discipline).  Unchanged rows are filtered before any ordering, so
    the output stays |changes|-sized however large the table."""
    c = T(spark, sf_dir, "customer")
    v2 = c.filter(F.col("c_custkey") % 97 != 0).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 101 == 0, F.col("c_acctbal") + 100.0
        ).otherwise(F.col("c_acctbal")),
    ).unionByName(
        c.filter(F.col("c_custkey") % 89 == 0).withColumn(
            "c_custkey", -F.col("c_custkey")
        )
    )
    a, b = c.alias("a"), v2.alias("b")
    changed = F.lit(False)
    for col in ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]:
        changed = changed | ~F.col(f"a.{col}").eqNullSafe(F.col(f"b.{col}"))
    return (
        a.join(b, F.col("a.c_custkey") == F.col("b.c_custkey"), "full_outer")
        .filter(
            F.col("a.c_custkey").isNull()
            | F.col("b.c_custkey").isNull()
            | changed
        )
        .select(
            F.coalesce(F.col("a.c_custkey"), F.col("b.c_custkey")).alias(
                "c_custkey"
            ),
            F.when(F.col("a.c_custkey").isNull(), "insert")
            .when(F.col("b.c_custkey").isNull(), "delete")
            .otherwise("update")
            .alias("change"),
            F.col("a.c_acctbal").alias("old_acctbal"),
            F.col("b.c_acctbal").alias("new_acctbal"),
        )
        .orderBy("c_custkey")
    )
