"""Round-9 pack A: scale-safe two-pass twins for the two remaining
global-rank statistics (VERDICT r8 task 3).

``q_events_rfm`` and ``q_agg_gini`` were the last two queries whose
declared forms ran an unpartitioned ``Window.orderBy`` over a
per-key table — fine to tens of millions of keys, a single-partition
sort wall beyond.  Their docstrings named the two-pass histogram
decomposition as the remedy; this module IMPLEMENTS it, hash-proven:
each twin keeps the ORIGINAL oracle (the naive global-rank form), so
the driver gate certifies the decomposition exactly equal.

The shared kernel is :func:`twopass_rank` — the exact global rank of
``(value, tiebreak)`` with no unpartitioned window over an unbounded
domain:

* pass A: bucket census (``value DIV width``) + a running count over
  the BOUNDED bucket table (the only ordered window, sized by the
  value domain / width, never by the row count — the
  q_agg_percentile_twopass discipline);
* pass B: per-(bucket) ``row_number`` (partitioned window) + the
  bucket's preceding cumulative count.

Order preservation holds because integer division by a positive
width is monotonic, and ties (equal values) always share a bucket, so
``(bucket, value, tiebreak)`` ordering equals the global
``(value, tiebreak)`` ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T
from .analytics_r8d import _GINI_ORACLE, _RFM_ORACLE

_CENTS_BUCKET = 65536  # the q_agg_percentile_twopass width


def twopass_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    bucket_width: int,
    out_col: str,
) -> DataFrame:
    """Add ``out_col`` = the EXACT 1-based global rank of each row
    under ``ORDER BY value, tiebreak`` without any unpartitioned
    window over the row domain (module docstring has the proof
    sketch).  ``tiebreak_col`` must make the ordering total."""
    b = df.withColumn("_bkt", F.expr(f"{value_col} DIV {bucket_width}"))
    census = (
        b.groupBy("_bkt")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_cum_before",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("_cnt")
    )
    j = F.row_number().over(
        Window.partitionBy("_bkt").orderBy(value_col, tiebreak_col)
    )
    return (
        b.join(F.broadcast(census), "_bkt")
        .withColumn(out_col, (F.col("_cum_before") + j).cast("long"))
        .drop("_bkt", "_cum_before")
    )


def _ntile_expr(rank_col: str, n_col: str, k: int) -> str:
    """Closed-form ntile(k) from a 1-based rank and the row count —
    replicates Spark/DuckDB ntile exactly: with q = n DIV k and
    rem = n % k, the first ``rem`` tiles hold q+1 rows, the rest q.
    (When q = 0 the first branch covers every rank, so the q-division
    in the ELSE arm is never taken.)"""
    q = f"({n_col} DIV {k})"
    rem = f"({n_col} % {k})"
    head = f"{rem} * ({q} + 1)"
    return (
        f"CASE WHEN {rank_col} <= {head}"
        f" THEN ({rank_col} - 1) DIV ({q} + 1) + 1"
        f" ELSE {rem} + ({rank_col} - {head} - 1) DIV {q} + 1 END"
    )


@query("q_agg_gini_twopass", oracle=_GINI_ORACLE)
def q_agg_gini_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient with NO global-rank window — the
    100 TB form of q_agg_gini (same oracle, so the driver hash
    certifies the decomposition): Σi·x decomposes over the cents
    histogram as Σ_b (cum_before_b · mass_b + Σ_j j·x_j within b),
    i.e. the global rank from :func:`twopass_rank` feeds the same
    Σ rank·cents, but every ordered window runs over either the
    bounded bucket census or a single bucket's rows.

    Scale: one map-side-combined per-customer agg, one census agg,
    one partitioned window — the sort is per-bucket parallel, never a
    single-partition global sort."""
    o = T(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    ranked = twopass_rank(per_cust, "cents", "o_custkey", _CENTS_BUCKET, "i")
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("weighted"),
    )
    return s.select(
        "n",
        "total",
        (
            F.lit(2.0) * F.col("weighted") / (F.col("n") * F.col("total"))
            - (F.col("n").cast("double") + 1) / F.col("n")
        ).alias("gini"),
    )


@query("q_events_rfm_twopass", oracle=_RFM_ORACLE)
def q_events_rfm_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation with NO unpartitioned ntile windows —
    the 100 TB form of q_events_rfm (same oracle): each of the three
    metric ranks comes from :func:`twopass_rank`, and the quintile is
    recovered from (rank, n) by the closed-form ntile arithmetic
    (:func:`_ntile_expr`) — bit-identical to ntile(5) OVER
    (ORDER BY metric, user_id) because ntile is a pure function of
    the rank once the ordering is total.

    Scale: the three metrics MELT to (metric, value) rows so one
    census + one (metric, bucket)-partitioned window ranks all three
    axes in a single shuffle — recency/frequency bucket by the raw
    value (day / count domains are bounded), monetary by 65536 cents;
    n joins back per metric from the census (an equi broadcast, not a
    scalar cross); zero global sorts anywhere."""
    e = T(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    p = e.select(
        "user_id",
        F.expr("ts div 1000").alias("us"),
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    mx = p.agg(F.max("us").alias("max_us"))
    per_user = (
        p.crossJoin(F.broadcast(mx))
        .groupBy("user_id", "max_us")
        .agg(
            F.max("us").alias("last_us"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("cents").cast("long").alias("monetary_cents"),
        )
        .select(
            "user_id",
            F.expr("(max_us - last_us) DIV 86400000000").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    # MELT the three metrics to (metric, value) rows so ONE census +
    # ONE partitioned window ranks all three axes (three separate
    # twopass_rank chains re-evaluated the per-user subplan ~9× —
    # column pruning makes each copy's exchange unique, so Spark's
    # ReuseExchange cannot collapse them; the melted form keeps it to
    # 3 evaluations and a single (metric, bucket) shuffle).
    melted = per_user.selectExpr(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        "stack(3, 'r', recency_days, 'f', frequency,"
        " 'm', monetary_cents) AS (metric, value)",
    ).withColumn(
        "_bkt",
        F.expr(
            f"CASE WHEN metric = 'm' THEN value DIV {_CENTS_BUCKET}"
            f" ELSE value END"
        ),
    )
    census = (
        melted.groupBy("metric", "_bkt")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_cum_before",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.partitionBy("metric")
                    .orderBy("_bkt")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    totals = census.groupBy("metric").agg(
        F.sum("_cnt").cast("long").alias("n")
    )
    ranked = (
        melted.join(F.broadcast(census.drop("_cnt")), ["metric", "_bkt"])
        .withColumn(
            "rank",
            (
                F.col("_cum_before")
                + F.row_number().over(
                    Window.partitionBy("metric", "_bkt").orderBy(
                        "value", "user_id"
                    )
                )
            ).cast("long"),
        )
        .join(F.broadcast(totals), "metric")
        .withColumn("tile", F.expr(_ntile_expr("rank", "n", 5)))
    )
    scored = ranked.groupBy("user_id").agg(
        F.first("recency_days").alias("recency_days"),
        F.first("frequency").alias("frequency"),
        F.first("monetary_cents").alias("monetary_cents"),
        F.max(F.when(F.col("metric") == "r", F.col("tile"))).alias("r_inv"),
        F.max(F.when(F.col("metric") == "f", F.col("tile"))).alias("f_q"),
        F.max(F.when(F.col("metric") == "m", F.col("tile"))).alias("m_q"),
    )
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        (6 - F.col("r_inv")).cast("long").alias("r_score"),
        F.col("f_q").cast("long").alias("f_score"),
        F.col("m_q").cast("long").alias("m_score"),
        ((6 - F.col("r_inv")) * 100 + F.col("f_q") * 10 + F.col("m_q"))
        .cast("long")
        .alias("rfm"),
    ).orderBy("user_id")
