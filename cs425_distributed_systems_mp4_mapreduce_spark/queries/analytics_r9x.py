"""Round-9 pack X: nearest-neighbor as-of joins, trend runs, and
robust quartile skewness.

* ``q_join_asof_nearest`` — the NEAREST-in-time variant of the as-of
  join (either direction, min |Δt|, backward-preferring tie-break)
  via two IGNORE-NULLS windows on one per-user sort — no range-join
  explosion.
* ``q_stats_runs_updown`` — the runs-up-and-down trend test on the
  daily revenue series (complements q_stats_runs' above/below-median
  form): exact integer run counts, pinned normal approximation.
* ``q_agg_bowley_skew`` — Bowley's quartile skewness from discrete
  order statistics marked on the value census, sign-aware integer
  ppm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# Nearest as-of join: each click ↔ nearest view, either direction
# ------------------------------------------------------------------

_NEAREST_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
  FROM events WHERE event_type IN ('click', 'view')),
w AS (
  SELECT event_id, user_id, event_type, ts_us,
         LAST_VALUE(CASE WHEN event_type = 'view' THEN event_id END
             IGNORE NULLS) OVER (PARTITION BY user_id
             ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_view_id,
         LAST_VALUE(CASE WHEN event_type = 'view' THEN ts_us END
             IGNORE NULLS) OVER (PARTITION BY user_id
             ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_view_ts,
         FIRST_VALUE(CASE WHEN event_type = 'view' THEN event_id END
             IGNORE NULLS) OVER (PARTITION BY user_id
             ORDER BY ts_us, event_id
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_view_id,
         FIRST_VALUE(CASE WHEN event_type = 'view' THEN ts_us END
             IGNORE NULLS) OVER (PARTITION BY user_id
             ORDER BY ts_us, event_id
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_view_ts
  FROM e)
SELECT event_id AS click_id, user_id,
       CAST(CASE
         WHEN prev_view_id IS NULL AND next_view_id IS NULL THEN NULL
         WHEN next_view_id IS NULL THEN prev_view_id
         WHEN prev_view_id IS NULL THEN next_view_id
         WHEN ts_us - prev_view_ts <= next_view_ts - ts_us
           THEN prev_view_id ELSE next_view_id END AS BIGINT)
         AS nearest_view_id,
       CAST(CASE
         WHEN prev_view_id IS NULL AND next_view_id IS NULL THEN NULL
         WHEN next_view_id IS NULL THEN ts_us - prev_view_ts
         WHEN prev_view_id IS NULL THEN next_view_ts - ts_us
         WHEN ts_us - prev_view_ts <= next_view_ts - ts_us
           THEN ts_us - prev_view_ts ELSE next_view_ts - ts_us END
         AS BIGINT) AS gap_us
FROM w WHERE event_type = 'click'
ORDER BY click_id
"""


@query("q_join_asof_nearest", oracle=_NEAREST_ORACLE)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: every click paired with the same user's
    NEAREST view in time — either direction, minimum |Δt|, ties
    resolved backward (the feature-store "closest reading" variant of
    q_join_asof's backward-only form, and the third member of the
    family with q_join_pit_tolerance).  Both candidates come from
    IGNORE-NULLS windows over ONE interleaved per-user sort — the
    last view before and the first view after — so there is no range
    join and no event×view explosion; clicks from view-less users
    report NULL identically.

    Scale: one (user, time) exchange carries both windows — the
    q_join_asof posture, unchanged at 100 TB."""
    e = (
        T(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "view"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.expr("ts div 1000").alias("ts_us"),
        )
    )
    view_id = F.expr(
        "CASE WHEN event_type = 'view' THEN event_id END"
    )
    view_ts = F.expr("CASE WHEN event_type = 'view' THEN ts_us END")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    w = e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.last(view_id, ignorenulls=True).over(wb).alias("prev_view_id"),
        F.last(view_ts, ignorenulls=True).over(wb).alias("prev_view_ts"),
        F.first(view_id, ignorenulls=True).over(wf).alias("next_view_id"),
        F.first(view_ts, ignorenulls=True).over(wf).alias("next_view_ts"),
    )
    pick_id = (
        "CAST(CASE"
        " WHEN prev_view_id IS NULL AND next_view_id IS NULL THEN NULL"
        " WHEN next_view_id IS NULL THEN prev_view_id"
        " WHEN prev_view_id IS NULL THEN next_view_id"
        " WHEN ts_us - prev_view_ts <= next_view_ts - ts_us"
        "   THEN prev_view_id ELSE next_view_id END AS BIGINT)"
    )
    pick_gap = (
        "CAST(CASE"
        " WHEN prev_view_id IS NULL AND next_view_id IS NULL THEN NULL"
        " WHEN next_view_id IS NULL THEN ts_us - prev_view_ts"
        " WHEN prev_view_id IS NULL THEN next_view_ts - ts_us"
        " WHEN ts_us - prev_view_ts <= next_view_ts - ts_us"
        "   THEN ts_us - prev_view_ts ELSE next_view_ts - ts_us END"
        " AS BIGINT)"
    )
    return (
        w.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.expr(pick_id).alias("nearest_view_id"),
            F.expr(pick_gap).alias("gap_us"),
        )
        .orderBy("click_id")
    )


# ------------------------------------------------------------------
# Runs-up-and-down trend test on daily revenue
# ------------------------------------------------------------------

#: mean (2n−1)/3 and variance (16n−29)/90 of the run count for a
#: random sequence of n observations — pinned double z.
_RUD_Z = (
    "CASE WHEN n_eff < 2 OR 16 * n_eff - 29 <= 0 THEN NULL ELSE "
    "(CAST(runs AS DOUBLE)"
    " - (2.0 * CAST(n_eff AS DOUBLE) - 1.0) / 3.0)"
    " / SQRT((16.0 * CAST(n_eff AS DOUBLE) - 29.0) / 90.0) END"
)

_RUD_ORACLE = f"""
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS r
  FROM orders GROUP BY 1),
d AS (
  SELECT day,
         CASE WHEN r > LAG(r) OVER (ORDER BY day) THEN 1
              WHEN r < LAG(r) OVER (ORDER BY day) THEN -1 END AS sgn
  FROM daily),
s AS (SELECT day, sgn FROM d WHERE sgn IS NOT NULL),
chg AS (
  SELECT sgn, LAG(sgn) OVER (ORDER BY day) AS prev_sgn FROM s),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) + 1 AS n_eff,
         CAST(1 + SUM(CASE WHEN prev_sgn IS NOT NULL AND sgn <> prev_sgn
                      THEN 1 ELSE 0 END) AS BIGINT) AS runs
  FROM chg)
SELECT CASE WHEN runs IS NULL THEN 0 ELSE n_eff END AS n_eff,
       COALESCE(runs, 0) AS runs,
       {_RUD_Z} AS z_stat
FROM agg
"""


@query("q_stats_runs_updown", oracle=_RUD_ORACLE)
def q_stats_runs_updown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs-up-and-down trend test on the daily revenue series: count
    maximal runs of rising/falling days (flat days drop, the
    classical convention) and compare against the random-sequence
    moments E[R] = (2n−1)/3, Var[R] = (16n−29)/90 — the
    trend/oscillation detector that complements q_stats_runs'
    above/below-median form (which sees LEVEL clustering, not
    direction changes).  Run counts are exact integers from one lag
    chain; z is one pinned double expression.  Degenerate series
    (fewer than 2 direction changes possible) report NULL.

    Scale: calendar-bounded series, two lags on one sort."""
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
    wl = Window.orderBy("day")
    d = daily.select(
        "day",
        F.expr(
            "CASE WHEN r > LAG(r) OVER (ORDER BY day) THEN 1"
            " WHEN r < LAG(r) OVER (ORDER BY day) THEN -1 END"
        ).alias("sgn"),
    )
    s = d.where(F.col("sgn").isNotNull())
    chg = s.select(
        "sgn", F.lag("sgn").over(wl).alias("prev_sgn"), "day"
    )
    agg = chg.agg(
        (F.count(F.lit(1)) + 1).cast("long").alias("n_eff"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev_sgn").isNotNull()
                    & (F.col("sgn") != F.col("prev_sgn")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("runs"),
    )
    return agg.select(
        F.expr("CASE WHEN runs IS NULL THEN 0 ELSE n_eff END").alias(
            "n_eff"
        ),
        F.coalesce(F.col("runs"), F.lit(0)).alias("runs"),
        F.expr(_RUD_Z).alias("z_stat"),
    )


# ------------------------------------------------------------------
# Bowley quartile skewness from discrete order statistics
# ------------------------------------------------------------------

_BOWLEY_ORACLE = """
WITH o AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v FROM orders),
census AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM o GROUP BY v),
marked AS (
  SELECT v, cnt,
         COALESCE(SUM(cnt) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb,
         SUM(cnt) OVER () AS n
  FROM census),
qs AS (
  SELECT
    CAST(MIN(CASE WHEN cumb + cnt >= (n + 3) // 4
             AND cumb < (n + 3) // 4 THEN v END) AS BIGINT) AS q1,
    CAST(MIN(CASE WHEN cumb + cnt >= (n + 1) // 2
             AND cumb < (n + 1) // 2 THEN v END) AS BIGINT) AS q2,
    CAST(MIN(CASE WHEN cumb + cnt >= (3 * n + 3) // 4
             AND cumb < (3 * n + 3) // 4 THEN v END) AS BIGINT) AS q3,
    CAST(MAX(n) AS BIGINT) AS n
  FROM marked)
SELECT n, q1, q2, q3,
       CAST(CASE WHEN q3 = q1 THEN NULL
            WHEN q1 + q3 - 2 * q2 >= 0
              THEN (1000000 * (q1 + q3 - 2 * q2)) // (q3 - q1)
            ELSE -((1000000 * (2 * q2 - q1 - q3)) // (q3 - q1)) END
            AS BIGINT) AS bowley_ppm
FROM qs
"""


@query("q_agg_bowley_skew", oracle=_BOWLEY_ORACLE)
def q_agg_bowley_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowley's quartile skewness (Q₁ + Q₃ − 2Q₂)/(Q₃ − Q₁) of order
    totals — the robust skew that survives the heavy tail
    q_stats_jarque_bera's moment skew is dragged by.  The three
    quartiles are DISCRETE order statistics at ranks ⌈n/4⌉, ⌈n/2⌉,
    ⌈3n/4⌉ = (3n+3) DIV 4 (the q_agg_percentile_disc /
    q_text_sentence_stats convention) marked directly on the
    value census window — no scalar cross, no sort of the fact table
    — and the coefficient is a sign-aware integer ppm division
    (DuckDB floors, Spark truncates: identical only via the CASE
    sign split).  A zero interquartile range reports NULL.

    Scale: value-domain census + one census window — the
    q_stats_mood_median shape with three rank thresholds."""
    o = T(spark, sf_dir, "orders").select(
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v")
    )
    census = o.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wt = Window.partitionBy()
    marked = census.select(
        "v",
        "cnt",
        F.coalesce(F.sum("cnt").over(wb), F.lit(0)).alias("cumb"),
        F.sum("cnt").over(wt).alias("n"),
    )
    def _q(thr: str, alias: str):
        return (
            F.min(
                F.expr(
                    f"CASE WHEN cumb + cnt >= {thr} AND cumb < {thr}"
                    " THEN v END"
                )
            )
            .cast("long")
            .alias(alias)
        )

    qs = marked.agg(
        _q("(n + 3) DIV 4", "q1"),
        _q("(n + 1) DIV 2", "q2"),
        _q("(3 * n + 3) DIV 4", "q3"),
        F.max("n").cast("long").alias("n"),
    )
    return qs.select(
        "n",
        "q1",
        "q2",
        "q3",
        F.expr(
            "CAST(CASE WHEN q3 = q1 THEN NULL"
            " WHEN q1 + q3 - 2 * q2 >= 0"
            "   THEN (1000000 * (q1 + q3 - 2 * q2)) DIV (q3 - q1)"
            " ELSE -((1000000 * (2 * q2 - q1 - q3)) DIV (q3 - q1)) END"
            " AS BIGINT)"
        ).alias("bowley_ppm"),
    )
