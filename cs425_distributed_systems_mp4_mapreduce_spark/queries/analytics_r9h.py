"""Round-9 pack H: rank correlation, usage heatmaps, forecast
baselines, A/B significance, winsorized means.

* ``q_stats_spearman`` — Spearman rank correlation between daily
  revenue and daily order count, as Pearson ON doubled midranks:
  every moment is exact int64; the only doubles are one
  correctly-rounded sqrt and one division (IEEE-deterministic).
* ``q_events_heatmap`` — (weekday × hour) activity census with ppm
  share — the usage-pattern heatmap behind capacity planning.
* ``q_window_forecast_naive`` — seasonal-naive (t−7 days) forecast
  error: exact MAE and WAPE ppm — the baseline every real forecaster
  must beat.
* ``q_stats_two_proportion`` — two-proportion z-test between user
  cohorts (the A/B-test primitive): z² as the exact rational
  N·(a₁n₂−a₂n₁)² / (n₁n₂·A·(N−A)), α=0.05 verdict cross-multiplied.
* ``q_agg_winsorized_mean`` — 10% winsorized mean (CLAMP the tails to
  the boundary order statistics, q_agg_trimmed_mean DROPS them) on
  the same value-domain census machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# shared daily census (day, revenue dollars, order count)
# ------------------------------------------------------------------

_DAILY2_SQL = """
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS r,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
"""


def _daily2_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.groupBy(
        F.expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')").alias(
            "day"
        )
    ).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("r"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )


# ------------------------------------------------------------------
# Spearman rank correlation (Pearson on doubled midranks)
# ------------------------------------------------------------------

_SPEAR_ORACLE = f"""
WITH daily AS ({_DAILY2_SQL}),
rk AS (
  SELECT day,
         2 * RANK() OVER (ORDER BY r)
           + COUNT(*) OVER (PARTITION BY r) - 1 AS x,
         2 * RANK() OVER (ORDER BY n_orders)
           + COUNT(*) OVER (PARTITION BY n_orders) - 1 AS y
  FROM daily),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM rk)
SELECT n,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS var_x,
       CAST(n * syy - sy * sy AS BIGINT) AS var_y,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)) AS rho
FROM m
"""


@query("q_stats_spearman", oracle=_SPEAR_ORACLE)
def q_stats_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between daily revenue and daily order
    volume — the monotone-association monitor (robust to the heavy
    price tails that distort Pearson; the classic 1−6Σd²/(n³−n) form
    is only valid without ties, so this computes Pearson ON ranks,
    the tie-correct definition).  Ranks are DOUBLED midranks
    2·RANK() + tiecount − 1 (exact integers even for half-integral
    midranks, the q_stats_mannwhitney algebra), every moment sum is
    exact int64, and the reported rho is one correctly-rounded sqrt
    plus one division on those exact integers — bit-identical across
    engines by IEEE-754.  var products are cast to double BEFORE
    multiplying (vx·vy can pass 2⁶³; doubles lose nothing that
    survives the sqrt).

    Scale: both rank windows run over the calendar-bounded daily
    census; at the fact level ranks come from the value-domain census
    (q_stats_mannwhitney) instead — same algebra."""
    daily = _daily2_spark(spark, sf_dir)
    rk = daily.select(
        (
            2 * F.rank().over(Window.orderBy("r"))
            + F.count(F.lit(1)).over(Window.partitionBy("r"))
            - 1
        )
        .cast("long")
        .alias("x"),
        (
            2 * F.rank().over(Window.orderBy("n_orders"))
            + F.count(F.lit(1)).over(Window.partitionBy("n_orders"))
            - 1
        )
        .cast("long")
        .alias("y"),
    )
    m = rk.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return m.select(
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("cov_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("var_x"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("long")
        .alias("var_y"),
        F.expr(
            "CAST(n * sxy - sx * sy AS DOUBLE)"
            " / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)"
            " * CAST(n * syy - sy * sy AS DOUBLE))"
        ).alias("rho"),
    )


# ------------------------------------------------------------------
# Weekday × hour usage heatmap (ppm share census)
# ------------------------------------------------------------------

_HEAT_ORACLE = """
WITH e AS (
  SELECT dayofweek(CAST(ts AS DATE)) AS dow, hour(ts) AS hod FROM events),
c AS (
  SELECT dow, hod, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM e GROUP BY 1, 2),
t AS (
  SELECT dow, hod, n_events, SUM(n_events) OVER () AS total FROM c)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod, n_events,
       CAST(n_events * 1000000 // total AS BIGINT) AS share_ppm
FROM t ORDER BY dow, hod
"""


@query("q_events_heatmap", oracle=_HEAT_ORACLE)
def q_events_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour activity heatmap with exact ppm shares — the
    capacity-planning census (when to schedule maintenance, where the
    weekly peak sits).  Hours come from the UTC-pinned µs timestamp
    (session timezone is pinned, so hour() agrees across engines);
    weekday uses the pinned dayofweek−1 mapping (q_timeseries_dow).

    Scale: one map-side-combined census to ≤168 cells; the share
    window runs over those 168 rows."""
    e = T(spark, sf_dir, "events")
    c = e.select(
        (F.dayofweek(F.to_date("event_ts")) - 1).cast("long").alias("dow"),
        F.hour("event_ts").cast("long").alias("hod"),
    ).groupBy("dow", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        c.withColumn("total", F.sum("n_events").over(wall))
        .select(
            "dow",
            "hod",
            "n_events",
            F.expr("CAST(n_events * 1000000 DIV total AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy("dow", "hod")
    )


# ------------------------------------------------------------------
# Seasonal-naive forecast baseline (t − 7 days)
# ------------------------------------------------------------------

_NAIVE_ORACLE = f"""
WITH daily AS ({_DAILY2_SQL}),
j AS (
  SELECT a.day, a.r, b.r AS pred
  FROM daily a JOIN daily b ON a.day = b.day + 7)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(ABS(r - pred)) AS BIGINT) AS mae_sum_dollars,
       CAST(SUM(pred) AS BIGINT) AS pred_sum_dollars,
       CAST(SUM(ABS(r - pred)) * 1000000 // SUM(pred) AS BIGINT)
         AS wape_ppm
FROM j
"""


@query("q_window_forecast_naive", oracle=_NAIVE_ORACLE)
def q_window_forecast_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast baseline: predict each day's revenue
    with the value 7 CALENDAR days earlier (an equi-join on day−7,
    not a 7-ROW lag — row lags slip on calendar gaps), scored by
    exact MAE and WAPE in ppm (Σ|err|/Σactual-of-predictor — the
    scale-free error every production forecaster reports and must
    beat).  All integer dollars; the division is positive.

    Scale: a self-equi-join of the calendar-bounded daily census on
    a shifted key — broadcastable at any corpus size."""
    daily = _daily2_spark(spark, sf_dir)
    a = daily.select("day", "r")
    b = daily.select(
        (F.col("day") + 7).alias("day"), F.col("r").alias("pred")
    )
    j = a.join(b, "day")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.abs(F.col("r") - F.col("pred")))
        .cast("long")
        .alias("mae_sum_dollars"),
        F.sum("pred").cast("long").alias("pred_sum_dollars"),
        F.expr(
            "CAST(SUM(ABS(r - pred)) * 1000000 DIV SUM(pred) AS BIGINT)"
        ).alias("wape_ppm"),
    )


# ------------------------------------------------------------------
# Two-proportion z-test (A/B significance)
# ------------------------------------------------------------------

#: z²(α=0.05, two-sided) = 1.96² = 3.8416 → exact rational gate
_AB_CRIT_NUM, _AB_CRIT_DEN = 38416, 10000

_AB_ORACLE = f"""
WITH u AS (
  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS cohort,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS converted
  FROM events GROUP BY user_id),
c AS (
  SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(converted) AS BIGINT) AS a
  FROM u GROUP BY cohort),
w AS (
  SELECT MAX(CASE WHEN cohort = 0 THEN n END) AS n1,
         MAX(CASE WHEN cohort = 0 THEN a END) AS a1,
         MAX(CASE WHEN cohort = 1 THEN n END) AS n2,
         MAX(CASE WHEN cohort = 1 THEN a END) AS a2
  FROM c),
z AS (
  SELECT n1, a1, n2, a2, a1 + a2 AS aa, n1 + n2 AS nn,
         (n1 + n2) * (a1 * n2 - a2 * n1) * (a1 * n2 - a2 * n1) AS num,
         n1 * n2 * (a1 + a2) * (n1 + n2 - a1 - a2) AS den
  FROM w)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(a1 AS BIGINT) AS a1,
       CAST(n2 AS BIGINT) AS n2, CAST(a2 AS BIGINT) AS a2,
       CAST(CASE WHEN den = 0 THEN 0 ELSE num END AS BIGINT) AS z2_num,
       CAST(CASE WHEN den = 0 THEN 1 ELSE den END AS BIGINT) AS z2_den,
       CAST(CASE WHEN den = 0 THEN 0 ELSE num END AS DOUBLE)
         / CASE WHEN den = 0 THEN 1 ELSE den END AS z2,
       CASE WHEN den <> 0 AND {_AB_CRIT_DEN} * num > {_AB_CRIT_NUM} * den
            THEN 1 ELSE 0 END AS significant
FROM z
"""


@query("q_stats_two_proportion", oracle=_AB_ORACLE)
def q_stats_two_proportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between the even/odd user cohorts on
    purchase conversion — the A/B-test decision primitive.  With
    pooled A = a₁+a₂, N = n₁+n₂ the squared statistic is the exact
    rational z² = N·(a₁n₂−a₂n₁)² / (n₁n₂·A·(N−A)); the α=0.05
    verdict is the cross-multiplied integer gate
    {_AB_CRIT_DEN}·num > {_AB_CRIT_NUM}·den, and degenerate pools
    (A=0 or A=N: zero variance) pin to z²=0/not-significant in both
    engines.  int64-safe to cohort sizes ~5·10³ at this a₁n₂ scale;
    past that the docstring remedy is DECIMAL(38) for the two
    products (Spark decimal / DuckDB HUGEINT) — the algebra is
    unchanged.

    Scale: one per-user conversion census (map-side combined), one
    2-group rollup, scalar algebra after."""
    e = T(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("long").alias("cohort"), "converted"
    )
    c = u.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("converted").cast("long").alias("a"),
    )
    w = c.agg(
        F.max(F.when(F.col("cohort") == 0, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("cohort") == 0, F.col("a"))).alias("a1"),
        F.max(F.when(F.col("cohort") == 1, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("cohort") == 1, F.col("a"))).alias("a2"),
    )
    z = w.select(
        "n1",
        "a1",
        "n2",
        "a2",
        F.expr(
            "(n1 + n2) * (a1 * n2 - a2 * n1) * (a1 * n2 - a2 * n1)"
        ).alias("num"),
        F.expr("n1 * n2 * (a1 + a2) * (n1 + n2 - a1 - a2)").alias("den"),
    )
    return z.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("a1").cast("long").alias("a1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("a2").cast("long").alias("a2"),
        F.expr("CAST(CASE WHEN den = 0 THEN 0 ELSE num END AS BIGINT)").alias(
            "z2_num"
        ),
        F.expr("CAST(CASE WHEN den = 0 THEN 1 ELSE den END AS BIGINT)").alias(
            "z2_den"
        ),
        F.expr(
            "CAST(CASE WHEN den = 0 THEN 0 ELSE num END AS DOUBLE)"
            " / CASE WHEN den = 0 THEN 1 ELSE den END"
        ).alias("z2"),
        F.expr(
            f"CASE WHEN den <> 0 AND {_AB_CRIT_DEN} * num"
            f" > {_AB_CRIT_NUM} * den THEN 1 ELSE 0 END"
        ).alias("significant"),
    )


# ------------------------------------------------------------------
# 10% winsorized mean (clamp tails on the value-domain census)
# ------------------------------------------------------------------

_WINS_ORACLE = """
WITH v AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders),
c AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY v),
r AS (
  SELECT v, cnt,
         SUM(cnt) OVER (ORDER BY v) AS cum,
         SUM(cnt) OVER () AS n
  FROM c),
k AS (
  SELECT v, cnt, cum, n, n // 10 AS lo, n - n // 10 AS hi FROM r),
b AS (
  SELECT MAX(n) AS n, MAX(lo) AS lo, MAX(hi) AS hi,
         MIN(CASE WHEN cum >= lo + 1 THEN v END) AS lo_v,
         MIN(CASE WHEN cum >= hi THEN v END) AS hi_v,
         SUM(v * GREATEST(LEAST(cum, hi) - GREATEST(cum - cnt, lo), 0))
           AS inner_sum
  FROM k)
SELECT CAST(n AS BIGINT) AS n,
       CAST(lo_v AS BIGINT) AS lo_clamp_cents,
       CAST(hi_v AS BIGINT) AS hi_clamp_cents,
       CAST(inner_sum + lo * lo_v + (n - hi) * hi_v AS BIGINT)
         AS winsor_sum_cents,
       CAST((inner_sum + lo * lo_v + (n - hi) * hi_v) * 1000 // n
            AS BIGINT) AS winsor_mean_millicents
FROM b
"""


@query("q_agg_winsorized_mean", oracle=_WINS_ORACLE)
def q_agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided 10% WINSORIZED mean: clamp the lowest/highest ⌊n/10⌋
    observations to the boundary order statistics instead of dropping
    them (q_agg_trimmed_mean drops; winsorizing keeps n constant —
    the robust mean preferred when downstream needs the full weight).
    Boundary values are rank selections on the value-domain census
    (lo_v at rank lo+1, hi_v at rank hi); the interior keeps the same
    rank-interval clamp as the trimmed form; everything is exact
    int64 cents.

    Scale: identical shape to q_agg_trimmed_mean — the ordered window
    runs over the distinct-cents census only."""
    o = T(spark, sf_dir, "orders")
    c = o.select(
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v")
    ).groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    k = c.select(
        "v",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    ).select(
        "v",
        "cnt",
        "cum",
        "n",
        F.expr("n DIV 10").alias("lo"),
        F.expr("n - n DIV 10").alias("hi"),
    )
    b = k.agg(
        F.max("n").alias("n"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.min(
            F.when(F.col("cum") >= F.col("lo") + 1, F.col("v"))
        ).alias("lo_v"),
        F.min(F.when(F.col("cum") >= F.col("hi"), F.col("v"))).alias("hi_v"),
        F.sum(
            F.col("v")
            * F.greatest(
                F.least(F.col("cum"), F.col("hi"))
                - F.greatest(F.col("cum") - F.col("cnt"), F.col("lo")),
                F.lit(0),
            )
        ).alias("inner_sum"),
    )
    return b.select(
        F.col("n").cast("long").alias("n"),
        F.col("lo_v").cast("long").alias("lo_clamp_cents"),
        F.col("hi_v").cast("long").alias("hi_clamp_cents"),
        (
            F.col("inner_sum")
            + F.col("lo") * F.col("lo_v")
            + (F.col("n") - F.col("hi")) * F.col("hi_v")
        )
        .cast("long")
        .alias("winsor_sum_cents"),
        F.expr(
            "CAST((inner_sum + lo * lo_v + (n - hi) * hi_v) * 1000 DIV n"
            " AS BIGINT)"
        ).alias("winsor_mean_millicents"),
    )
