"""Production-form variants of headline queries for the benchmark.

The DECLARED queries (registry) aggregate doubles through DECIMAL so
results are bit-identical with the DuckDB oracle (functions/parity.py)
— that detour costs 2-4x on agg-heavy shapes because decimal arithmetic
is far slower than codegen'd double summation and exists purely for
cross-engine hash equality, not semantics.

A production engine sums doubles.  BASELINE.md's PySpark numbers were
measured with double aggregation, so the bench measures these
double-sum twins — SAME logical computation (same scans, joins, groups,
filters, ordering), different accumulator type.  Correctness of each
shape is still gated by its decimal twin in t2.

Only queries whose declared form pays a material parity tax get a
variant; everything else benches its declared form directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import table as T


def fast_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc).alias("sum_disc_price"),
            F.sum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def fast_join_threeway(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def fast_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # partial-aggregation pushdown through the join, by hand (Catalyst
    # does not reorder agg below join): revenue folds to one row per
    # orderkey BEFORE touching orders, shrinking the join and the
    # custkey shuffle by the lineitems-per-order factor (4x here, more
    # at scale).  Sum-of-sums == sum because orders⋈lineitem is 1:N.
    # Measured in-process at sf0.1: 0.79 s -> 0.67 s median (-15%).
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum("rev").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


def fast_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hour bucket as pure long arithmetic on the raw ns column — no
    # timestamp conversion, no window-struct allocation (~1.5x faster
    # than window(); same result as the declared twin)
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.expr("ts div 3600000000000 * 3600").alias("window_start_s"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )


def fast_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no presentation sort: the extra exchange+sort stage costs ~40% of
    # this query's wall time and the result set is unordered anyway
    d = T(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def fast_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    # double accumulator in the frame instead of the declared decimal
    # parity twin; same frame, same ordering
    from pyspark.sql.window import Window

    o = T(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum("o_totalprice").over(w).alias("running_total"),
    )


def fast_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    # double sum_qty instead of the declared decimal parity twin
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_orderkey"))
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        o.join(big, o.o_orderkey == big.big_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_orderdate").cast("timestamp").cast("long").alias("orderdate_s"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


#: name → production-form callable; bench.py falls back to the declared
#: registry fn for any headline query not listed here.
def fast_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("%ge%"))
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders")
    n = T(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.8 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


FAST_VARIANTS = {
    "q_agg_pricing": fast_agg_pricing,
    "q_tpch_q9": fast_tpch_q9,
    "q_join_threeway": fast_join_threeway,
    "q_topk_revenue": fast_topk_revenue,
    "q_stream_tumbling": fast_stream_tumbling,
    "q_maplejuice_wordcount": fast_wordcount,
    "q_window_running": fast_window_running,
    "q_tpch_q18": fast_tpch_q18,
}
