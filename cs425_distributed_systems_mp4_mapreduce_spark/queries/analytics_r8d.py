"""Round-8 fourth pack: weighted median, null-safe join semantics,
RFM segmentation, hapax census.  All integer-deterministic, all fully
DuckDB-oracled."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# Weighted median (quantity-weighted price per return flag)
# ------------------------------------------------------------------

_WMEDIAN_ORACLE = """
WITH v AS (
  SELECT l_returnflag AS flag,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem),
pervalue AS (
  SELECT flag, cents, CAST(SUM(w) AS BIGINT) AS w
  FROM v GROUP BY flag, cents),
tot AS (SELECT flag, CAST(SUM(w) AS BIGINT) AS total_w FROM pervalue
        GROUP BY flag),
cum AS (
  SELECT flag, cents, w,
         CAST(SUM(w) OVER (PARTITION BY flag ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cumw
  FROM pervalue)
SELECT cum.flag, tot.total_w,
       CAST(MIN(cum.cents) AS BIGINT) AS wmedian_cents
FROM cum JOIN tot USING (flag)
WHERE 2 * cum.cumw >= tot.total_w
GROUP BY cum.flag, tot.total_w
ORDER BY cum.flag
"""


@query("q_agg_weighted_median", oracle=_WMEDIAN_ORACLE)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median — quantity-weighted extendedprice per return
    flag (the lower weighted median: smallest value whose cumulative
    weight reaches half the total), the robust price statistic a
    marketplace reports when line items carry different volumes.
    Exact and integer throughout: per-DISTINCT-value weight sums, a
    cumulative-weight window over the VALUE DOMAIN (bounded by the
    price range in cents, not the row count — the q_stats_ks_drift /
    q_agg_percentile_twopass domain-bounded argument), and an integer
    2·cumw ≥ W threshold, so the selected cent value hash-matches.

    Scale: one map-side-combined agg collapses the corpus to
    (flag, value) weights; the window and the threshold scan run over
    that bounded census."""
    li = T(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    pervalue = v.groupBy("flag", "cents").agg(F.sum("w").cast("long").alias("w"))
    tot = pervalue.groupBy("flag").agg(F.sum("w").cast("long").alias("total_w"))
    cum = pervalue.withColumn(
        "cumw",
        F.sum("w")
        .over(
            Window.partitionBy("flag")
            .orderBy("cents")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("long"),
    )
    return (
        cum.join(tot, "flag")
        .where(2 * F.col("cumw") >= F.col("total_w"))
        .groupBy("flag", "total_w")
        .agg(F.min("cents").cast("long").alias("wmedian_cents"))
        .select("flag", "total_w", "wmedian_cents")
        .orderBy("flag")
    )


# ------------------------------------------------------------------
# Null-safe equi join (<=> / IS NOT DISTINCT FROM semantics)
# ------------------------------------------------------------------

_NULLSAFE_ORACLE = """
WITH dim(status_key, label) AS (
  VALUES ('O', 'open'), ('F', 'finished'), (NULL, 'unknown')),
f AS (
  SELECT NULLIF(o_orderstatus, 'P') AS status_key,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders)
SELECT d.label,
       CAST(COUNT(f.cents) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM(f.cents), 0) AS BIGINT) AS sum_cents
FROM f JOIN dim d ON f.status_key IS NOT DISTINCT FROM d.status_key
GROUP BY d.label ORDER BY d.label
"""


@query("q_join_nullsafe", oracle=_NULLSAFE_ORACLE)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-SAFE equi join (`<=>` / IS NOT DISTINCT FROM): the fact
    side derives a NULLABLE key (order status with 'P' mapped to
    NULL), the dim carries an explicit NULL row ('unknown'), and the
    join must match NULL↔NULL — the semantics a plain `=` join
    silently drops (every NULL fact row would vanish).  A real SQL
    surface corner: Spark spells it Column.eqNullSafe / `<=>`, DuckDB
    IS NOT DISTINCT FROM — independent implementations whose
    agreement the hash attests, including the aggregated NULL-bucket
    row that proves the NULL matches happened.

    Scale: the dim is 3 rows (broadcast); null-safe equality is still
    hashable (Spark plans BroadcastHashJoin on the null-safe key), so
    the plan is the ordinary map-side join, not an NLJ."""
    o = T(spark, sf_dir, "orders")
    f = o.select(
        F.expr("NULLIF(o_orderstatus, 'P')").alias("status_key"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    dim = spark.createDataFrame(
        [("O", "open"), ("F", "finished"), (None, "unknown")],
        "status_key string, label string",
    )
    return (
        f.join(
            F.broadcast(dim),
            f["status_key"].eqNullSafe(dim["status_key"]),
        )
        .groupBy("label")
        .agg(
            F.count("cents").cast("long").alias("n_orders"),
            F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("sum_cents"),
        )
        .orderBy("label")
    )


# ------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quintiles)
# ------------------------------------------------------------------

_RFM_ORACLE = """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
mx AS (SELECT MAX(us) AS max_us FROM p),
per_user AS (
  SELECT user_id,
         CAST((mx.max_us - MAX(us)) // 86400000000 AS BIGINT) AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(cents) AS BIGINT) AS monetary_cents
  FROM p, mx GROUP BY user_id, mx.max_us),
scored AS (
  SELECT user_id, recency_days, frequency, monetary_cents,
         ntile(5) OVER (ORDER BY recency_days, user_id) AS r_inv,
         ntile(5) OVER (ORDER BY frequency, user_id) AS f_q,
         ntile(5) OVER (ORDER BY monetary_cents, user_id) AS m_q
  FROM per_user)
SELECT user_id, recency_days, frequency, monetary_cents,
       CAST(6 - r_inv AS BIGINT) AS r_score,
       CAST(f_q AS BIGINT) AS f_score,
       CAST(m_q AS BIGINT) AS m_score,
       CAST((6 - r_inv) * 100 + f_q * 10 + m_q AS BIGINT) AS rfm
FROM scored ORDER BY user_id
"""


@query("q_events_rfm", oracle=_RFM_ORACLE)
def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer scoring: per user the
    purchase recency (days since last, against the corpus max — the
    1-row scalar the oracle correlates in), frequency, and monetary
    total in cents, each quintiled with a TOTAL tie-break
    (metric, user_id) so the segment code (r·100 + f·10 + m, recent =
    high r) is engine-deterministic — the q_window_ntile discipline
    applied to a three-axis score.

    Scale note: ntile here runs over the per-user table with an
    unpartitioned window — fine to the tens of millions; beyond that
    use q_events_rfm_twopass (queries/analytics_r9.py), the
    IMPLEMENTED two-pass decomposition hash-proven against this very
    oracle: ranks from the bucket census + per-bucket windows,
    quintiles by closed-form ntile arithmetic."""
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
    scored = per_user.select(
        "*",
        F.ntile(5).over(Window.orderBy("recency_days", "user_id")).alias("r_inv"),
        F.ntile(5).over(Window.orderBy("frequency", "user_id")).alias("f_q"),
        F.ntile(5).over(Window.orderBy("monetary_cents", "user_id")).alias("m_q"),
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


# ------------------------------------------------------------------
# Hapax legomena census (vocabulary-health diagnostic)
# ------------------------------------------------------------------

_HAPAX_ORACLE = """
WITH tok AS (
  SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents),
freq AS (
  SELECT source, word, COUNT(*) AS c FROM tok GROUP BY source, word)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(SUM(c) AS BIGINT) AS tokens,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS hapax_ppm
FROM freq GROUP BY source ORDER BY source
"""


@query("q_text_hapax", oracle=_HAPAX_ORACLE)
def q_text_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena census per source — vocabulary-health
    diagnostics (a high hapax rate signals OCR noise / boilerplate
    mangling; a near-zero rate signals template text; the rate also
    estimates the unseen-vocabulary mass à la Good-Turing).  Integer
    ppm, two map-side-combined aggregations, no joins."""
    d = T(spark, sf_dir, "documents")
    freq = (
        d.select("source", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        freq.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.sum("c").cast("long").alias("tokens"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax"),
            F.expr(
                "CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000"
                " DIV COUNT(*) AS BIGINT)"
            ).alias("hapax_ppm"),
        )
        .orderBy("source")
    )


# ------------------------------------------------------------------
# Gini coefficient (revenue concentration)
# ------------------------------------------------------------------

_GINI_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, o_custkey) AS i
  FROM per_cust),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS total,
         CAST(SUM(i * cents) AS BIGINT) AS weighted
  FROM ranked)
SELECT n, total,
       CAST(2 AS DOUBLE) * weighted / (n * total)
         - (CAST(n AS DOUBLE) + 1) / n AS gini
FROM s
"""


@query("q_agg_gini", oracle=_GINI_ORACLE)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue — the concentration
    statistic behind "what share of corpus mass sits in the head"
    decisions (skew remediation, dedup priorities, mixture caps).
    Exact: integer-cent customer totals, the classic sorted-rank
    identity G = 2·Σi·x₍ᵢ₎/(n·Σx) − (n+1)/n with Σi·x an exact int64
    (rank ties broken totally by (cents, custkey)), and the two final
    divisions on hash-attested integers — bit-identical cross-engine.

    Scale note: the rank window here runs over the per-CUSTOMER table
    (one row per key after the map-side-combined agg); at billions of
    keys use q_agg_gini_twopass (queries/analytics_r9.py), the
    IMPLEMENTED histogram decomposition hash-proven against this very
    oracle — Σi·x bucket-by-bucket with only partitioned windows."""
    o = T(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    ranked = per_cust.select(
        "cents",
        F.row_number()
        .over(Window.orderBy("cents", "o_custkey"))
        .cast("long")
        .alias("i"),
    )
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


# ------------------------------------------------------------------
# Day-of-week seasonality profile
# ------------------------------------------------------------------

_DOW_ORACLE = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d,
         dayofweek(o_orderdate) AS dow,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS r
  FROM orders GROUP BY 1, 2),
prof AS (
  SELECT dow,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(r) AS BIGINT) AS cents
  FROM daily GROUP BY dow),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total,
               CAST(SUM(n_days) AS BIGINT) AS days FROM prof)
SELECT CAST(prof.dow AS BIGINT) AS dow, prof.n_days, prof.cents,
       CAST(prof.cents * 1000000 // tot.total AS BIGINT) AS share_ppm,
       CAST((prof.cents * tot.days * 1000 )
            // (tot.total * prof.n_days) AS BIGINT) AS index_milli
FROM prof, tot ORDER BY dow
"""


@query("q_timeseries_dow", oracle=_DOW_ORACLE)
def q_timeseries_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile of order revenue — the calendar
    decomposition a forecasting pipeline inspects before detrending:
    per weekday the day count, revenue mass, corpus share (ppm), and
    the SEASONALITY INDEX (per-day revenue vs the all-week per-day
    average, milli — 1000 = flat).  DuckDB's dayofweek (0=Sunday)
    equals Spark's ``dayofweek − 1``; the mapping is pinned here, and
    everything else is integer-exact.

    Scale: one map-side-combined daily agg (calendar-bounded), a
    7-group census, a 1-row total scalar crossed in."""
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").alias("d"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
    ).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("r")
    )
    prof = daily.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("r").cast("long").alias("cents"),
    )
    tot = prof.agg(
        F.sum("cents").cast("long").alias("total"),
        F.sum("n_days").cast("long").alias("days"),
    )
    return (
        prof.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_days",
            "cents",
            F.expr("cents * 1000000 DIV total").alias("share_ppm"),
            F.expr("(cents * days * 1000) DIV (total * n_days)").alias(
                "index_milli"
            ),
        )
        .orderBy("dow")
    )
