"""Round-9 pack M: robust trend estimation, survival curves, ABC
inventory classification.

* ``q_stats_theilsen`` — Theil–Sen robust trend slope of daily
  revenue: the median of all pairwise slopes over the
  calendar-bounded daily census (breakdown point 29%, vs OLS's 0 —
  the slope a single promo-day outlier cannot move).
* ``q_events_survival`` — user survival curve: the fraction of users
  whose observed lifespan (last − first event day) reaches k days,
  for k = 0..30 — the Kaplan-Meier-style retention curve with no
  censoring model (the window is fully observed).
* ``q_orders_abc`` — ABC inventory classification of parts by
  cumulative revenue share (A ≤ 80%, B ≤ 95%, C rest), thresholds
  cross-multiplied into exact integer gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# Theil–Sen slope (median of pairwise slopes on the daily census)
# ------------------------------------------------------------------

_TS_ORACLE = """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS r
  FROM orders GROUP BY 1),
pairs AS (
  SELECT b.r - a.r AS dy, b.day - a.day AS dx,
         CAST(b.r - a.r AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope,
         a.day AS i, b.day AS j
  FROM daily a JOIN daily b ON a.day < b.day),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY slope, i, j) AS rn,
         COUNT(*) OVER () AS n0
  FROM pairs)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(dy AS BIGINT) AS med_dy,
       CAST(dx AS BIGINT) AS med_dx, slope AS med_slope
FROM ranked WHERE rn = (n0 + 1) // 2
"""


@query("q_stats_theilsen", oracle=_TS_ORACLE)
def q_stats_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend slope of the daily-revenue series: the
    LOWER MEDIAN of all pairwise slopes (rⱼ−rᵢ)/(dayⱼ−dayᵢ) — the
    trend estimator with a 29% breakdown point, immune to the
    promo-day outliers that swing OLS (q_stats_regr is the OLS
    companion).  Each slope is ONE exact-int division (deterministic
    IEEE); the median selection carries the (slope, i, j) total
    tie-break, and the median pair's exact integer (dy, dx) is
    reported beside the double so the result is auditable as a
    rational.

    Scale: the pair table is O(days²) over the CALENDAR-bounded
    census (the q_stats_kendall argument — SF-independent); the rank
    window runs over those bounded pairs, never over fact rows.

    r14 (guide §2.5 — the global ``row_number`` window was ONE task
    sorting all 2.9M pairs, ~5.7 s of the query's 6.7 s): the lower
    median is now selected by distributed partial ranking —
    range-partition the pairs by the full (slope, i, j) sort key
    (parallel sort, materialized once via localCheckpoint so the
    partition ids both consumers see are THE SAME physical rows), count
    rows per partition (tiny), locate the partition holding global rank
    m = (n0+1) DIV 2 by prefix sums, and row_number only WITHIN that
    one partition (~n0/P rows).  n0 itself is d·(d−1)/2 from the day
    census — no count-over-everything window.  Exactness does not
    depend on the range sampler's balance: (slope, i, j) is a total
    order with unique (i, j), so no ties straddle a partition boundary
    and prefix-sum + local rank reproduces the global rank exactly.
    Same output, bit-identical (oracle-attested)."""
    daily = T(spark, sf_dir, "orders").groupBy(
        F.expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')").alias(
            "day"
        )
    ).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("r")
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.day") < F.col("b.day")).select(
        (F.col("b.r") - F.col("a.r")).alias("dy"),
        (F.col("b.day") - F.col("a.day")).alias("dx"),
        (
            (F.col("b.r") - F.col("a.r")).cast("double")
            / (F.col("b.day") - F.col("a.day")).cast("double")
        ).alias("slope"),
        F.col("a.day").alias("i"),
        F.col("b.day").alias("j"),
    )
    n_parts = spark.sparkContext.defaultParallelism
    rp = (
        pairs.repartitionByRange(n_parts, "slope", "i", "j")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # n0 = C(days, 2): every (a.day < b.day) pair of distinct census days
    n0df = daily.agg(F.count(F.lit(1)).alias("d")).select(
        (F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n0")
    )
    counts = (
        rp.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(n0df))
        .select(
            "pid",
            "c",
            "n0",
            F.coalesce(
                F.sum("c").over(
                    Window.orderBy("pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("prev"),
        )
    )
    target = counts.where(
        F.expr("prev < (n0 + 1) DIV 2 AND (n0 + 1) DIV 2 <= prev + c")
    ).select("pid", "prev", "n0")
    wloc = Window.partitionBy("pid").orderBy("slope", "i", "j")
    return (
        rp.join(F.broadcast(target), "pid")
        .withColumn("rn", F.row_number().over(wloc))
        .where(F.expr("rn + prev = (n0 + 1) DIV 2"))
        .select(
            F.col("n0").cast("long").alias("n0"),
            F.col("dy").cast("long").alias("med_dy"),
            F.col("dx").cast("long").alias("med_dx"),
            F.col("slope").alias("med_slope"),
        )
    )


# ------------------------------------------------------------------
# User survival curve (lifespan ≥ k days, k = 0..30)
# ------------------------------------------------------------------

_SURV_MAX_K = 30

_SURV_ORACLE = f"""
WITH ev AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
  FROM events),
life AS (
  SELECT user_id, MAX(d) - MIN(d) AS lifespan FROM ev GROUP BY 1),
ls AS (
  SELECT lifespan, CAST(COUNT(*) AS BIGINT) AS cnt FROM life GROUP BY 1),
grid AS (SELECT UNNEST(range(0, {_SURV_MAX_K + 1})) AS k),
surv AS (
  SELECT g.k,
         CAST(COALESCE(SUM(ls.cnt), 0) AS BIGINT) AS n_surviving
  FROM grid g LEFT JOIN ls ON ls.lifespan >= g.k
  GROUP BY 1),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_users FROM ls)
SELECT surv.k, surv.n_surviving, tot.n_users,
       CAST((1000000 * surv.n_surviving) // tot.n_users AS BIGINT)
         AS survival_ppm
FROM surv, tot
ORDER BY surv.k
"""


@query("q_events_survival", oracle=_SURV_ORACLE)
def q_events_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User survival curve: the share of users whose observed lifespan
    (days between first and last event) reaches k, for k = 0..30
    — the retention-economics curve in its fully-observed form (every
    user's window is closed, so no censoring model is needed; the
    cohort-LTV table q_events_cohort_ltv prices what this curve
    predicts).  One lifespan reduction per user, then a reverse
    cumulative over the lifespan CENSUS joined onto a literal k-grid;
    all shares exact integer ppm.

    Scale: the user reduction is one map-side-combined exchange; the
    census and the 31-row grid are key-domain bounded; the ≥ join is
    31 × |distinct lifespans| — trivially broadcast."""
    e = T(spark, sf_dir, "events")
    life = e.select(
        "user_id",
        F.expr("CAST(datediff(CAST(event_ts AS DATE), DATE'1970-01-01') AS BIGINT)")
        .alias("d"),
    ).groupBy("user_id").agg((F.max("d") - F.min("d")).alias("lifespan"))
    ls = life.groupBy("lifespan").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    grid = spark.range(0, _SURV_MAX_K + 1).select(F.col("id").alias("k"))
    surv = (
        grid.join(F.broadcast(ls), ls.lifespan >= grid.k, "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_surviving"))
    )
    tot = ls.agg(F.sum("cnt").cast("long").alias("n_users"))
    return (
        surv.crossJoin(F.broadcast(tot))
        .select(
            "k",
            "n_surviving",
            "n_users",
            F.expr(
                "CAST((1000000 * n_surviving) DIV n_users AS BIGINT)"
            ).alias("survival_ppm"),
        )
        .orderBy("k")
    )


# ------------------------------------------------------------------
# ABC inventory classification by cumulative revenue share
# ------------------------------------------------------------------

_ABC_ORACLE = """
WITH pr AS (
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY 1),
ranked AS (
  SELECT cents,
         SUM(cents) OVER (ORDER BY cents DESC, l_partkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cents) OVER () AS total
  FROM pr),
classed AS (
  SELECT CASE WHEN 5 * cum <= 4 * total THEN 'A'
              WHEN 20 * cum <= 19 * total THEN 'B'
              ELSE 'C' END AS abc_class,
         cents, total
  FROM ranked)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(cents) AS BIGINT) AS rev_cents,
       CAST((1000000 * SUM(cents)) // MAX(total) AS BIGINT) AS rev_share_ppm
FROM classed GROUP BY 1 ORDER BY 1
"""


@query("q_orders_abc", oracle=_ABC_ORACLE)
def q_orders_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts bucketed by cumulative
    revenue share — A while cum ≤ 80%, B while cum ≤ 95%, C for the
    tail — with both thresholds cross-multiplied into exact integer
    gates (5·cum ≤ 4·total, 20·cum ≤ 19·total): no ratio, no float,
    no boundary wobble.  The per-class census (count, revenue, exact
    ppm share) is what a warehouse planner actually files.

    Scale: the cumulative window runs over the per-PART census
    (key-domain bounded), with the partkey total tie-break; past
    ~10⁷ parts the two-pass histogram decomposition replaces the
    global window (the q_agg_pareto_coverage note — the machinery is
    hash-proven in q_agg_deciles_twopass)."""
    li = T(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    wo = Window.orderBy(F.desc("cents"), F.asc("l_partkey"))
    ranked = pr.select(
        "cents",
        F.sum("cents").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
        F.sum("cents").over(Window.partitionBy()).alias("total"),
    )
    classed = ranked.select(
        F.when(5 * F.col("cum") <= 4 * F.col("total"), "A")
        .when(20 * F.col("cum") <= 19 * F.col("total"), "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents",
        "total",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("rev_cents"),
            F.expr(
                "CAST((1000000 * SUM(cents)) DIV MAX(total) AS BIGINT)"
            ).alias("rev_share_ppm"),
        )
        .orderBy("abc_class")
    )
