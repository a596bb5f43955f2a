"""Round-9 pack W: audience affinity, count overdispersion, and
downside-risk summary.

* ``q_events_type_affinity`` — pairwise event-type audience overlap:
  Jaccard and lift over distinct-user sets, exact ppm — which
  behaviors share an audience vs merely share traffic.
* ``q_stats_poisson_dispersion`` — the variance-to-mean ratio (index
  of dispersion) of daily event counts as an exact integer rational,
  with the overdispersion verdict cross-multiplied.
* ``q_window_ulcer_index`` — the Ulcer Index (RMS percentage
  drawdown) of the daily revenue trajectory: drawdowns in exact ppm
  off a running max, one pinned √ at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# Pairwise event-type audience overlap
# ------------------------------------------------------------------

_AFFINITY_ORACLE = """
WITH a AS (SELECT DISTINCT event_type AS et, user_id FROM events),
sz AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS n FROM a GROUP BY 1),
tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_all FROM a),
inter AS (
  SELECT x.et AS et_a, y.et AS et_b, CAST(COUNT(*) AS BIGINT) AS n_both
  FROM a x JOIN a y ON x.user_id = y.user_id AND x.et < y.et
  GROUP BY 1, 2)
SELECT i.et_a, i.et_b, sa.n AS n_a, sb.n AS n_b, i.n_both,
       CAST((1000000 * i.n_both) // (sa.n + sb.n - i.n_both) AS BIGINT)
         AS jaccard_ppm,
       CAST((1000000 * i.n_both * t.n_all) // (sa.n * sb.n) AS BIGINT)
         AS lift_ppm
FROM inter i
JOIN sz sa ON sa.et = i.et_a
JOIN sz sb ON sb.et = i.et_b
CROSS JOIN tot t
ORDER BY et_a, et_b
"""


@query("q_events_type_affinity", oracle=_AFFINITY_ORACLE)
def q_events_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise event-type audience affinity: for every type pair,
    the Jaccard of their distinct-user sets AND the lift
    P(both)/(P(a)·P(b)) in exact ppm — Jaccard says how much audience
    is shared, lift says whether doing one predicts doing the other
    beyond reach alone (the q_rules_association algebra applied to
    behaviors instead of baskets).  All counts are exact integers
    over the (type, user) distinct set.

    Scale: the pair expansion joins ON user_id (a user with k types
    fans out to k(k−1)/2 rows — bounded by the type-domain square);
    the 1-row total-audience scalar crosses into the lift ratio."""
    ev = T(spark, sf_dir, "events")
    a = ev.select(F.col("event_type").alias("et"), "user_id").distinct()
    sz = a.groupBy("et").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = a.select("user_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_all")
    )
    x, y = a.alias("x"), a.alias("y")
    inter = (
        x.join(
            y,
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.et") < F.col("y.et")),
        )
        .groupBy(F.col("x.et").alias("et_a"), F.col("y.et").alias("et_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    sa = sz.select(F.col("et").alias("et_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("et").alias("et_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "et_a")
        .join(F.broadcast(sb), "et_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "et_a",
            "et_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr(
                "CAST((1000000 * n_both) DIV (n_a + n_b - n_both)"
                " AS BIGINT)"
            ).alias("jaccard_ppm"),
            F.expr(
                "CAST((1000000 * n_both * n_all) DIV (n_a * n_b)"
                " AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy("et_a", "et_b")
    )


# ------------------------------------------------------------------
# Index of dispersion for daily event counts
# ------------------------------------------------------------------

_PD_US_PER_DAY = 86_400_000_000
#: overdispersed verdict at VMR > 1.5 (cross-multiplied: 2·num > 3·den)
_PD_THRESH_NUM, _PD_THRESH_DEN = 3, 2

_DISP_ORACLE = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {_PD_US_PER_DAY} AS di,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1),
b AS (SELECT MIN(di) AS lo, MAX(di) AS hi FROM daily),
spine AS (SELECT UNNEST(generate_series(lo, hi)) AS di FROM b),
series AS (
  SELECT COALESCE(d.cnt, 0) AS x
  FROM spine s LEFT JOIN daily d ON s.di = d.di),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
  FROM series),
dev AS (
  SELECT CAST(SUM(CAST((se.x * m.n - m.s) AS HUGEINT)
              * (se.x * m.n - m.s)) AS HUGEINT) AS ss
  FROM series se CROSS JOIN mom m),
agg AS (
  SELECT m.n, m.s, CAST(CAST(d.ss AS VARCHAR) AS DOUBLE) AS ss_d, d.ss
  FROM mom m CROSS JOIN dev d)
SELECT n, s,
       CAST(CASE WHEN n < 2 OR s = 0 THEN NULL
            ELSE CAST(ss AS BIGINT) // (n * (n - 1)) END AS BIGINT)
         AS var_num_scaled,
       CASE WHEN n < 2 OR s = 0 THEN NULL
            ELSE ss_d / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                         * CAST(s AS DOUBLE)) END AS vmr,
       CAST(CASE WHEN n < 2 OR s = 0 THEN NULL
            WHEN {_PD_THRESH_DEN} * CAST(ss AS BIGINT)
                 > {_PD_THRESH_NUM} * n * (n - 1) * s THEN 1 ELSE 0 END
            AS BIGINT) AS overdispersed
FROM agg
"""


@query("q_stats_poisson_dispersion", oracle=_DISP_ORACLE)
def q_stats_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) for the gap-filled
    daily event-count series — the Poisson-ness check behind every
    count-based alert threshold (a Poisson process has VMR = 1;
    VMR ≫ 1 means bursty arrivals and q_text_fano's per-term story at
    the series level).  The centered sum Σ(x·n − s)² is exact
    (HUGEINT/decimal), VMR = Σ/(n(n−1)s) is one pinned double
    division, and the overdispersion verdict (VMR > 3/2) is an exact
    integer cross-multiplication — no float ever decides the flag.
    Degenerate inputs (n < 2 or an all-zero series) report NULL.

    Scale: calendar-bounded series; the 1-row (n, s) moment scalar
    crosses into the deviation pass (the q_stats_grubbs shape)."""
    ev = T(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr(f"(ts div 1000) div {_PD_US_PER_DAY}").alias("di")
        )
        .groupBy("di")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    spine = daily.agg(
        F.min("di").alias("lo"), F.max("di").alias("hi")
    ).select(F.explode(F.expr("sequence(lo, hi)")).alias("di"))
    series = spine.join(daily, "di", "left").select(
        F.coalesce(F.col("cnt"), F.lit(0)).alias("x")
    )
    mom = series.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    dev = (
        series.crossJoin(F.broadcast(mom))
        .agg(
            F.sum(
                F.expr(
                    "CAST(x * n - s AS DECIMAL(19,0))"
                    " * CAST(x * n - s AS DECIMAL(19,0))"
                )
            ).alias("ss_dec")
        )
    )
    agg = mom.crossJoin(dev).select(
        "n",
        "s",
        F.col("ss_dec").cast("string").cast("double").alias("ss_d"),
        F.col("ss_dec").cast("long").alias("ss"),
    )
    return agg.select(
        "n",
        "s",
        F.expr(
            "CAST(CASE WHEN n < 2 OR s = 0 THEN NULL"
            " ELSE ss DIV (n * (n - 1)) END AS BIGINT)"
        ).alias("var_num_scaled"),
        F.expr(
            "CASE WHEN n < 2 OR s = 0 THEN NULL"
            " ELSE ss_d / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)"
            " * CAST(s AS DOUBLE)) END"
        ).alias("vmr"),
        F.expr(
            f"CAST(CASE WHEN n < 2 OR s = 0 THEN NULL"
            f" WHEN {_PD_THRESH_DEN} * ss"
            f" > {_PD_THRESH_NUM} * n * (n - 1) * s THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("overdispersed"),
    )


# ------------------------------------------------------------------
# Ulcer Index of the daily revenue trajectory
# ------------------------------------------------------------------

_ULCER_ORACLE = """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS r
  FROM orders GROUP BY 1),
dd AS (
  SELECT day, r,
         MAX(r) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM daily),
pct AS (
  SELECT CASE WHEN peak = 0 THEN 0
          ELSE CAST((1000000 * (peak - r)) // peak AS BIGINT) END AS dd_ppm
  FROM dd),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dd_ppm * dd_ppm) AS BIGINT) AS ss,
         CAST(MAX(dd_ppm) AS BIGINT) AS max_dd_ppm
  FROM pct)
SELECT n, max_dd_ppm,
       CASE WHEN n = 0 THEN NULL
            ELSE SQRT(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)) END
         AS ulcer_ppm
FROM agg
"""


@query("q_window_ulcer_index", oracle=_ULCER_ORACLE)
def q_window_ulcer_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ulcer Index of the daily revenue LEVEL: RMS of the percentage
    decline from the running best day — the downside-risk summary
    that penalizes DEEP and LONG slumps where max-drawdown
    (q_window_drawdown) sees only the deepest point.  (The trajectory
    is the daily level, not the cumulative sum — a cumulative revenue
    curve never falls, which would make the index trivially zero.)
    Drawdowns are exact integer ppm off the running-max window; only
    the final RMS square root is floating point, in pinned order.

    Scale: calendar-bounded series, two stacked windows on one sort
    (the q_window_cusum shape) plus one 1-row reduce."""
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')")
        .cast("long")
        .alias("day")
    ).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("r")
    )
    wrun = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.select(
        "r", F.max("r").over(wrun).alias("peak")
    )
    pct = dd.select(
        F.expr(
            "CASE WHEN peak = 0 THEN 0"
            " ELSE CAST((1000000 * (peak - r)) DIV peak AS BIGINT) END"
        ).alias("dd_ppm")
    )
    agg = pct.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("dd_ppm * dd_ppm")).cast("long").alias("ss"),
        F.max("dd_ppm").cast("long").alias("max_dd_ppm"),
    )
    return agg.select(
        "n",
        "max_dd_ppm",
        F.expr(
            "CASE WHEN n = 0 THEN NULL"
            " ELSE SQRT(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)) END"
        ).alias("ulcer_ppm"),
    )
