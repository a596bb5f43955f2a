"""Round-9 pack P: market-style indicators and periodicity detection
on the calendar-bounded daily censuses.

* ``q_window_stochastic`` — stochastic oscillator %K/%D over the
  daily revenue series in exact ppm (rolling min/max window + an
  integer 3-bar smoothing).
* ``q_window_aroon`` — Aroon up/down via the integer argmax-key
  trick: MAX(value·SHIFT + idx) decodes to "bars since the rolling
  high" with the most-recent tie-break, entirely in int64.
* ``q_window_obv`` — on-balance volume: the cumulative signed order
  count, sign from the day-over-day revenue delta.
* ``q_timeseries_fold_periodicity`` — variance explained by folding
  the gap-filled daily event-count series at candidate periods
  {5, 7, 9}, complete cycles only, so the ANOVA decomposition is an
  EXACT integer rational (balanced groups clear every denominator).
* ``q_timeseries_mase`` — seasonal-naive (lag 7) forecast error
  scaled by the one-step-naive error (MASE), as an exact integer
  cross-multiplied ppm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T
from .analytics_r9f import _DAILY_SQL, _daily_spark

# ------------------------------------------------------------------
# Stochastic oscillator %K / %D on daily revenue
# ------------------------------------------------------------------

_ST_P = 14  # lookback bars for %K

_STOCH_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
w AS (
  SELECT day, r,
         COUNT(*) OVER win AS n_win,
         MIN(r) OVER win AS mn,
         MAX(r) OVER win AS mx
  FROM daily
  WINDOW win AS (ORDER BY day ROWS BETWEEN {_ST_P - 1} PRECEDING
                 AND CURRENT ROW)),
k AS (
  SELECT day, r, mn, mx,
         CASE WHEN n_win < {_ST_P} OR mx = mn THEN NULL
              ELSE (1000000 * (r - mn)) // (mx - mn) END AS k_ppm
  FROM w),
d AS (
  SELECT day, r, mn, mx, k_ppm,
         LAG(k_ppm, 1) OVER (ORDER BY day) AS k1,
         LAG(k_ppm, 2) OVER (ORDER BY day) AS k2
  FROM k)
SELECT CAST(day AS BIGINT) AS day, r,
       CAST(mn AS BIGINT) AS mn, CAST(mx AS BIGINT) AS mx,
       CAST(k_ppm AS BIGINT) AS k_ppm,
       CAST(CASE WHEN k_ppm IS NULL OR k1 IS NULL OR k2 IS NULL
            THEN NULL ELSE (k_ppm + k1 + k2) // 3 END AS BIGINT) AS d_ppm
FROM d ORDER BY day
"""


@query("q_window_stochastic", oracle=_STOCH_ORACLE)
def q_window_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator on the daily revenue series: %K =
    (close − min₁₄)/(max₁₄ − min₁₄) in exact ppm over a 14-bar rolling
    window (NULL until the window fills or when it is flat — the
    q_window_rsi degenerate discipline), and %D = the 3-bar average
    of %K as integer division over the ppm values (NULL until three
    %K values exist).  Everything is integer, so the trajectory
    hash-matches bit-for-bit.

    Scale: the series is CALENDAR-bounded (one row per day at any
    SF); the fact table is touched once by the daily census — the
    q_window_rsi shape with a second cheap window."""
    daily = _daily_spark(spark, sf_dir)
    win = Window.orderBy("day").rowsBetween(-(_ST_P - 1), 0)
    w = daily.select(
        F.col("day").cast("long").alias("day"),
        "r",
        F.count(F.lit(1)).over(win).alias("n_win"),
        F.min("r").over(win).alias("mn"),
        F.max("r").over(win).alias("mx"),
    )
    k = w.select(
        "day",
        "r",
        F.col("mn").cast("long").alias("mn"),
        F.col("mx").cast("long").alias("mx"),
        F.expr(
            f"CASE WHEN n_win < {_ST_P} OR mx = mn THEN NULL"
            " ELSE (1000000 * (r - mn)) DIV (mx - mn) END"
        ).alias("k_ppm"),
    )
    wl = Window.orderBy("day")
    d = k.select(
        "day",
        "r",
        "mn",
        "mx",
        "k_ppm",
        F.lag("k_ppm", 1).over(wl).alias("k1"),
        F.lag("k_ppm", 2).over(wl).alias("k2"),
    )
    return d.select(
        "day",
        "r",
        "mn",
        "mx",
        F.col("k_ppm").cast("long").alias("k_ppm"),
        F.expr(
            "CAST(CASE WHEN k_ppm IS NULL OR k1 IS NULL OR k2 IS NULL"
            " THEN NULL ELSE (k_ppm + k1 + k2) DIV 3 END AS BIGINT)"
        ).alias("d_ppm"),
    ).orderBy("day")


# ------------------------------------------------------------------
# Aroon up/down via the integer argmax-key trick
# ------------------------------------------------------------------

_AR_P = 14  # Aroon period: window = p+1 bars, bars-since ∈ [0, p]
_AR_SHIFT = 100_000  # > any bar index (calendar days since epoch)

_AROON_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
idx AS (
  SELECT day, r, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
w AS (
  SELECT day, r, rn,
         COUNT(*) OVER win AS n_win,
         MAX(r * {_AR_SHIFT} + rn) OVER win AS key_hi,
         MIN(r * {_AR_SHIFT} + ({_AR_SHIFT} - 1 - rn)) OVER win AS key_lo
  FROM idx
  WINDOW win AS (ORDER BY day ROWS BETWEEN {_AR_P} PRECEDING
                 AND CURRENT ROW))
SELECT CAST(day AS BIGINT) AS day, r,
       CAST(CASE WHEN n_win < {_AR_P + 1} THEN NULL
            ELSE rn - key_hi % {_AR_SHIFT} END AS BIGINT) AS bars_since_hi,
       CAST(CASE WHEN n_win < {_AR_P + 1} THEN NULL
            ELSE rn - ({_AR_SHIFT} - 1 - key_lo % {_AR_SHIFT}) END
            AS BIGINT) AS bars_since_lo,
       CAST(CASE WHEN n_win < {_AR_P + 1} THEN NULL
            ELSE (1000000 * ({_AR_P} - (rn - key_hi % {_AR_SHIFT})))
                 // {_AR_P} END AS BIGINT) AS aroon_up_ppm,
       CAST(CASE WHEN n_win < {_AR_P + 1} THEN NULL
            ELSE (1000000 * ({_AR_P} - (rn - ({_AR_SHIFT} - 1
                 - key_lo % {_AR_SHIFT})))) // {_AR_P} END
            AS BIGINT) AS aroon_dn_ppm
FROM w ORDER BY day
"""


@query("q_window_aroon", oracle=_AROON_ORACLE)
def q_window_aroon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aroon up/down over a 14-bar window on the daily revenue
    series: "bars since the rolling high/low" extracted WITHOUT a
    self-join by the integer argmax-key trick — MAX(r·SHIFT + rn)
    carries the index of the window maximum (ties resolve to the most
    recent bar, the charting convention), and the symmetric
    MIN(r·SHIFT + (SHIFT−1−rn)) does the same for the minimum.
    Aroon = (p − bars_since)/p in exact ppm; rows before the window
    fills report NULL.  r·SHIFT stays inside int64 to ~9×10¹³ daily
    revenue units.

    Scale: calendar-bounded series, two rolling windows on one sort —
    no join, no second exchange."""
    daily = _daily_spark(spark, sf_dir)
    idx = daily.select(
        F.col("day").cast("long").alias("day"),
        "r",
        F.row_number().over(Window.orderBy("day")).alias("rn"),
    )
    win = Window.orderBy("day").rowsBetween(-_AR_P, 0)
    w = idx.select(
        "day",
        "r",
        "rn",
        F.count(F.lit(1)).over(win).alias("n_win"),
        F.max(F.expr(f"r * {_AR_SHIFT} + rn")).over(win).alias("key_hi"),
        F.min(F.expr(f"r * {_AR_SHIFT} + ({_AR_SHIFT} - 1 - rn)"))
        .over(win)
        .alias("key_lo"),
    )
    full = f"n_win < {_AR_P + 1}"
    bars_hi = f"rn - key_hi % {_AR_SHIFT}"
    bars_lo = f"rn - ({_AR_SHIFT} - 1 - key_lo % {_AR_SHIFT})"
    return w.select(
        "day",
        "r",
        F.expr(
            f"CAST(CASE WHEN {full} THEN NULL ELSE {bars_hi} END AS BIGINT)"
        ).alias("bars_since_hi"),
        F.expr(
            f"CAST(CASE WHEN {full} THEN NULL ELSE {bars_lo} END AS BIGINT)"
        ).alias("bars_since_lo"),
        F.expr(
            f"CAST(CASE WHEN {full} THEN NULL ELSE"
            f" (1000000 * ({_AR_P} - ({bars_hi}))) DIV {_AR_P} END AS BIGINT)"
        ).alias("aroon_up_ppm"),
        F.expr(
            f"CAST(CASE WHEN {full} THEN NULL ELSE"
            f" (1000000 * ({_AR_P} - ({bars_lo}))) DIV {_AR_P} END AS BIGINT)"
        ).alias("aroon_dn_ppm"),
    ).orderBy("day")


# ------------------------------------------------------------------
# On-balance volume
# ------------------------------------------------------------------

_OBV_ORACLE = """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS r,
         CAST(COUNT(*) AS BIGINT) AS vol
  FROM orders GROUP BY 1),
s AS (
  SELECT day, r, vol,
         CASE WHEN LAG(r) OVER (ORDER BY day) IS NULL THEN 0
              WHEN r > LAG(r) OVER (ORDER BY day) THEN 1
              WHEN r < LAG(r) OVER (ORDER BY day) THEN -1
              ELSE 0 END AS sgn
  FROM daily)
SELECT CAST(day AS BIGINT) AS day, r, vol,
       CAST(sgn AS BIGINT) AS sgn,
       CAST(SUM(sgn * vol) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS obv
FROM s ORDER BY day
"""


@query("q_window_obv", oracle=_OBV_ORACLE)
def q_window_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance volume over the daily series: the cumulative sum of
    order volume signed by the day-over-day revenue direction (+1 up,
    −1 down, 0 flat or first bar) — the classic volume-confirmation
    indicator, exactly integer end-to-end.

    Scale: one daily census of the fact table, one lag and one
    running-sum window over the calendar-bounded series."""
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')")
        .cast("long")
        .alias("day")
    ).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("r"),
        F.count(F.lit(1)).cast("long").alias("vol"),
    )
    wl = Window.orderBy("day")
    s = daily.select(
        "day",
        "r",
        "vol",
        F.expr(
            "CASE WHEN LAG(r) OVER (ORDER BY day) IS NULL THEN 0"
            " WHEN r > LAG(r) OVER (ORDER BY day) THEN 1"
            " WHEN r < LAG(r) OVER (ORDER BY day) THEN -1"
            " ELSE 0 END"
        ).alias("sgn"),
    )
    return s.select(
        "day",
        "r",
        "vol",
        F.col("sgn").cast("long").alias("sgn"),
        F.sum(F.expr("sgn * vol"))
        .over(wl.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("obv"),
    ).orderBy("day")


# ------------------------------------------------------------------
# Periodicity by folding: exact balanced ANOVA at candidate periods
# ------------------------------------------------------------------

_FP_PERIODS = [5, 7, 9]
_FP_US_PER_DAY = 86_400_000_000

_FOLD_ORACLE = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {_FP_US_PER_DAY} AS di,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1),
b AS (SELECT MIN(di) AS lo, MAX(di) AS hi FROM daily),
spine AS (SELECT UNNEST(generate_series(lo, hi)) AS di FROM b),
series AS (
  SELECT ROW_NUMBER() OVER (ORDER BY s.di) AS rn,
         COALESCE(d.cnt, 0) AS x
  FROM spine s LEFT JOIN daily d ON s.di = d.di),
grid AS (SELECT UNNEST([{", ".join(str(p) for p in _FP_PERIODS)}]) AS p),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM series),
folded AS (
  SELECT g.p, (s.rn - 1) % g.p AS phase, s.x
  FROM grid g CROSS JOIN total t JOIN series s
    ON s.rn <= (t.n // g.p) * g.p),
phases AS (
  SELECT p, phase,
         CAST(SUM(x) AS BIGINT) AS sj,
         CAST(SUM(x * x) AS BIGINT) AS qj,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM folded GROUP BY p, phase),
agg AS (
  SELECT p,
         CAST(MAX(m) AS BIGINT) AS m,
         CAST(SUM(sj) AS BIGINT) AS s,
         CAST(SUM(qj) AS BIGINT) AS q,
         CAST(SUM(sj * sj) AS BIGINT) AS sj2
  FROM phases GROUP BY p)
SELECT CAST(p AS BIGINT) AS p, m, s,
       CAST(p * sj2 - s * s AS BIGINT) AS ssb_num,
       CAST(p * m * q - s * s AS BIGINT) AS sst_num,
       CAST(CASE WHEN p * m * q - s * s = 0 THEN NULL
            ELSE (1000000 * (p * sj2 - s * s)) // (p * m * q - s * s) END
            AS BIGINT) AS explained_ppm
FROM agg ORDER BY p
"""


@query("q_timeseries_fold_periodicity", oracle=_FOLD_ORACLE)
def q_timeseries_fold_periodicity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Periodicity detection WITHOUT trigonometry: fold the gap-filled
    daily event-count series at candidate periods {5, 7, 9} —
    complete cycles only, so every phase holds exactly m days — and
    report the between-phase share of total variance.  Balanced
    groups clear every denominator: scaled by p·m, SSB = p·Σsⱼ² − s²
    and SST = p·m·Σx² − s² are exact int64, and the explained share
    is one integer ppm division (a zero-variance series reports NULL
    identically).  The ANOVA-by-phase formulation sidesteps the
    cross-libm cos/sin hazard a DFT periodogram would carry.

    Scale: the series is CALENDAR-bounded, so the 3-row period grid
    joined against it (with the ≤-truncation predicate) is a bounded
    nested-loop by construction — the q_events_survival pattern; the
    fact table is touched once by the daily census."""
    ev = T(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr(f"(ts div 1000) div {_FP_US_PER_DAY}").alias("di")
        )
        .groupBy("di")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    spine = daily.agg(
        F.min("di").alias("lo"), F.max("di").alias("hi")
    ).select(F.explode(F.expr("sequence(lo, hi)")).alias("di"))
    series = (
        spine.join(daily, "di", "left")
        .select(
            F.row_number().over(Window.orderBy("di")).alias("rn"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("x"),
        )
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    grid = spark.createDataFrame([(p,) for p in _FP_PERIODS], "p long")
    folded = (
        F.broadcast(grid)
        .join(series, F.expr("rn <= (n DIV p) * p"))
        .select("p", F.expr("(rn - 1) % p").alias("phase"), "x")
    )
    phases = folded.groupBy("p", "phase").agg(
        F.sum("x").cast("long").alias("sj"),
        F.sum(F.expr("x * x")).cast("long").alias("qj"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    agg = phases.groupBy("p").agg(
        F.max("m").cast("long").alias("m"),
        F.sum("sj").cast("long").alias("s"),
        F.sum("qj").cast("long").alias("q"),
        F.sum(F.expr("sj * sj")).cast("long").alias("sj2"),
    )
    return agg.select(
        F.col("p").cast("long").alias("p"),
        "m",
        "s",
        F.expr("CAST(p * sj2 - s * s AS BIGINT)").alias("ssb_num"),
        F.expr("CAST(p * m * q - s * s AS BIGINT)").alias("sst_num"),
        F.expr(
            "CAST(CASE WHEN p * m * q - s * s = 0 THEN NULL"
            " ELSE (1000000 * (p * sj2 - s * s)) DIV (p * m * q - s * s) END"
            " AS BIGINT)"
        ).alias("explained_ppm"),
    ).orderBy("p")


# ------------------------------------------------------------------
# MASE: seasonal-naive error scaled by the one-step-naive error
# ------------------------------------------------------------------

_MASE_S = 7  # seasonal lag

_MASE_ORACLE = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {_FP_US_PER_DAY} AS di,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1),
b AS (SELECT MIN(di) AS lo, MAX(di) AS hi FROM daily),
spine AS (SELECT UNNEST(generate_series(lo, hi)) AS di FROM b),
series AS (
  SELECT s.di, COALESCE(d.cnt, 0) AS x
  FROM spine s LEFT JOIN daily d ON s.di = d.di),
lagged AS (
  SELECT x,
         LAG(x, {_MASE_S}) OVER (ORDER BY di) AS xs,
         LAG(x, 1) OVER (ORDER BY di) AS x1
  FROM series),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN xs IS NOT NULL THEN ABS(x - xs) ELSE 0 END)
              AS BIGINT) AS err_seasonal,
         CAST(SUM(CASE WHEN x1 IS NOT NULL THEN ABS(x - x1) ELSE 0 END)
              AS BIGINT) AS err_naive
  FROM lagged)
SELECT n, err_seasonal, err_naive,
       CAST(CASE WHEN n <= {_MASE_S} OR err_naive = 0 THEN NULL
            ELSE (1000000 * err_seasonal * (n - 1))
                 // (err_naive * (n - {_MASE_S})) END AS BIGINT) AS mase_ppm
FROM agg
"""


@query("q_timeseries_mase", oracle=_MASE_ORACLE)
def q_timeseries_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE for the weekly seasonal-naive forecast on the gap-filled
    daily event-count series: mean |xₜ − xₜ₋₇| scaled by the in-sample
    one-step-naive mean |xₜ − xₜ₋₁| — the scale-free forecast-quality
    yardstick that complements q_window_forecast_naive's raw MAE/WAPE.
    Both error sums are exact int64, and the ratio is one
    cross-multiplied integer ppm: (1e6·Σ₇·(n−1)) / (Σ₁·(n−7)).
    Degenerate inputs (series shorter than the season, or a constant
    series with zero naive error) report NULL identically.

    Scale: calendar-bounded series, two lag windows on one sort; the
    fact table is touched once by the daily census."""
    ev = T(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr(f"(ts div 1000) div {_FP_US_PER_DAY}").alias("di")
        )
        .groupBy("di")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    spine = daily.agg(
        F.min("di").alias("lo"), F.max("di").alias("hi")
    ).select(F.explode(F.expr("sequence(lo, hi)")).alias("di"))
    series = spine.join(daily, "di", "left").select(
        "di", F.coalesce(F.col("cnt"), F.lit(0)).alias("x")
    )
    wl = Window.orderBy("di")
    lagged = series.select(
        "x",
        F.lag("x", _MASE_S).over(wl).alias("xs"),
        F.lag("x", 1).over(wl).alias("x1"),
    )
    agg = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.expr("CASE WHEN xs IS NOT NULL THEN ABS(x - xs) ELSE 0 END")
        )
        .cast("long")
        .alias("err_seasonal"),
        F.sum(
            F.expr("CASE WHEN x1 IS NOT NULL THEN ABS(x - x1) ELSE 0 END")
        )
        .cast("long")
        .alias("err_naive"),
    )
    return agg.select(
        "n",
        "err_seasonal",
        "err_naive",
        F.expr(
            f"CAST(CASE WHEN n <= {_MASE_S} OR err_naive = 0 THEN NULL"
            f" ELSE (1000000 * err_seasonal * (n - 1))"
            f" DIV (err_naive * (n - {_MASE_S})) END AS BIGINT)"
        ).alias("mase_ppm"),
    )
