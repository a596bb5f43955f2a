"""Round-9 pack E: rank-sum testing, rolling VWAP, engagement
stickiness, categorical uniformity, inter-arrival censuses, and
kNN classification.

* ``q_stats_mannwhitney`` — Mann–Whitney U rank-sum test between two
  order-priority samples, computed over the VALUE-DOMAIN census (the
  q_stats_ks_drift discipline): doubled midranks keep tie handling in
  exact int64, no per-row global sort.
* ``q_window_vwap`` — 7-day rolling volume-weighted average price via
  one RANGE frame over the bounded daily census (cents × integral
  units; floor-divided micro-dollars per unit).
* ``q_events_stickiness`` — weekly DAU/WAU engagement ratio in ppm
  (the product-analytics habit metric), all integer counts.
* ``q_stats_chisq_dow`` — χ² goodness-of-fit of each event type's
  day-of-week profile against uniform, as the exact rational
  Σ(7·O−N)² / (7·N) — zero cells materialized via explode, no logs,
  no doubles until the reported statistic.
* ``q_events_interarrival`` — per-user inter-arrival-gap log₂ histogram
  (burstiness census): exact microsecond gaps, bit-length bucket via a
  pure CASE ladder (stays in codegen — no HOF).
* ``q_sim_knn_classify`` — k=5 nearest-neighbour majority-vote label
  prediction over the proven int8 codes with a sign-aware quantized
  integer-cosine sort key; deterministic vote tie-breaks; fully
  hash-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T
from .ann_xengine import _CODES_SPARK, _CODES_SQL

_DIM = 64

# ------------------------------------------------------------------
# Mann–Whitney U rank-sum test (value-domain census form)
# ------------------------------------------------------------------

_MW_A, _MW_B = "1-URGENT", "5-LOW"

_MW_ORACLE = f"""
WITH s AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
         CASE WHEN o_orderpriority = '{_MW_A}' THEN 1 ELSE 0 END AS is_a
  FROM orders WHERE o_orderpriority IN ('{_MW_A}', '{_MW_B}')),
c AS (
  SELECT v, CAST(SUM(is_a) AS BIGINT) AS a,
         CAST(COUNT(*) - SUM(is_a) AS BIGINT) AS b
  FROM s GROUP BY v),
r AS (
  SELECT v, a, b, a + b AS t,
         COALESCE(SUM(a + b) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_lt
  FROM c),
agg AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b,
         CAST(SUM(a * (2 * s_lt + t + 1)) AS BIGINT) AS two_r_a
  FROM r)
SELECT n_a, n_b, two_r_a,
       CAST(two_r_a - n_a * (n_a + 1) AS BIGINT) AS two_u_a,
       CAST(2 * n_a * n_b - (two_r_a - n_a * (n_a + 1)) AS BIGINT) AS two_u_b,
       CAST(two_r_a - n_a * (n_a + 1) AS DOUBLE) / 2 AS u_a
FROM agg
"""


@query("q_stats_mannwhitney", oracle=_MW_ORACLE)
def q_stats_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test: do URGENT and LOW priority orders
    draw from the same price distribution?  The nonparametric
    two-sample location test beside q_stats_ks_drift's shape test.

    Exactness: ranks are handled on the DISTINCT-VALUE census — for a
    value with t ties and s_lt smaller observations, the doubled
    midrank is 2·s_lt + t + 1 (an integer even when the midrank is
    half-integral), so 2R_A = Σ a_v·(2·s_lt + t + 1) and
    2U_A = 2R_A − n_A(n_A+1) are exact int64; the identity
    2U_A + 2U_B = 2·n_A·n_B is a built-in self-check.  int64 bound
    (round-10 overflow audit): every term is ≤ 2R_A ≤ n(2n+1) ≈ 2n²
    — exact to n ≈ 2.1e9 rows, no cubic tie term anywhere (the
    statistic needs no tie-corrected variance); past that the
    q_stats_kruskal DECIMAL discipline is the drop-in remedy.

    Scale: the only ordered window runs over the distinct-value census
    (bounded by the value domain, not the row count — the
    q_stats_ks_drift discipline); at 100 TB the census keys quantize to
    cents buckets first and the midrank algebra is unchanged."""
    o = T(spark, sf_dir, "orders")
    s = o.where(F.col("o_orderpriority").isin(_MW_A, _MW_B)).select(
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v"),
        F.when(F.col("o_orderpriority") == _MW_A, 1).otherwise(0).alias("is_a"),
    )
    c = s.groupBy("v").agg(
        F.sum("is_a").cast("long").alias("a"),
        (F.count(F.lit(1)) - F.sum("is_a")).cast("long").alias("b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    r = c.select(
        "a",
        "b",
        (F.col("a") + F.col("b")).alias("t"),
        F.coalesce(F.sum(F.col("a") + F.col("b")).over(w), F.lit(0)).alias(
            "s_lt"
        ),
    )
    agg = r.agg(
        F.sum("a").cast("long").alias("n_a"),
        F.sum("b").cast("long").alias("n_b"),
        F.sum(F.col("a") * (2 * F.col("s_lt") + F.col("t") + 1))
        .cast("long")
        .alias("two_r_a"),
    )
    return agg.select(
        "n_a",
        "n_b",
        "two_r_a",
        (F.col("two_r_a") - F.col("n_a") * (F.col("n_a") + 1))
        .cast("long")
        .alias("two_u_a"),
        (
            2 * F.col("n_a") * F.col("n_b")
            - (F.col("two_r_a") - F.col("n_a") * (F.col("n_a") + 1))
        )
        .cast("long")
        .alias("two_u_b"),
        (
            (F.col("two_r_a") - F.col("n_a") * (F.col("n_a") + 1)).cast(
                "double"
            )
            / 2
        ).alias("u_a"),
    )


# ------------------------------------------------------------------
# 7-day rolling VWAP (RANGE frame over the daily census)
# ------------------------------------------------------------------

_VWAP_ORACLE = """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS day,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                  * CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS pv,
         CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS vol
  FROM lineitem GROUP BY 1)
SELECT CAST(day AS BIGINT) AS day,
       CAST(SUM(pv) OVER w AS BIGINT) AS pv7,
       CAST(SUM(vol) OVER w AS BIGINT) AS vol7,
       CAST((SUM(pv) OVER w) * 10000 // (SUM(vol) OVER w) AS BIGINT)
         AS vwap_micro
FROM daily
WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
"""


@query("q_window_vwap", oracle=_VWAP_ORACLE)
def q_window_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling volume-weighted average price: Σ(price·qty)/Σqty
    over a RANGE frame keyed on integer epoch-days, so calendar gaps
    shrink the window instead of silently widening it (the ROWS-frame
    bug this family exists to avoid).  price in exact cents, quantity
    integral by construction (asserted against the generator), output
    floor-divided micro-dollars per unit — positive, so DuckDB ``//``
    and Spark ``DIV`` agree.

    Scale: the window runs over the DAILY census (calendar-bounded,
    q_stats_runs discipline) after one map-side-combining day
    aggregation of the fact table; the fact table is never sorted."""
    li = T(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.expr("datediff(CAST(l_shipdate AS DATE), DATE'1970-01-01')").alias(
            "day"
        )
    ).agg(
        F.sum(
            F.expr(
                "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
                " * CAST(FLOOR(l_quantity + 0.5) AS BIGINT)"
            )
        )
        .cast("long")
        .alias("pv"),
        F.sum(F.expr("CAST(FLOOR(l_quantity + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("vol"),
    )
    w = Window.orderBy("day").rangeBetween(-6, 0)
    return (
        daily.select(
            F.col("day").cast("long").alias("day"),
            F.sum("pv").over(w).cast("long").alias("pv7"),
            F.sum("vol").over(w).cast("long").alias("vol7"),
            F.expr(
                "CAST(SUM(pv) OVER (ORDER BY day RANGE BETWEEN 6 PRECEDING"
                " AND CURRENT ROW) * 10000 DIV SUM(vol) OVER (ORDER BY day"
                " RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)"
            ).alias("vwap_micro"),
        )
        .orderBy("day")
    )


# ------------------------------------------------------------------
# Weekly DAU/WAU stickiness (engagement ratio)
# ------------------------------------------------------------------

_STICKY_ORACLE = """
WITH d AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         user_id
  FROM events),
dau AS (
  SELECT day // 7 AS week, day,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM d GROUP BY 1, 2),
wau AS (
  SELECT day // 7 AS week,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM d GROUP BY 1)
SELECT CAST(dau.week AS BIGINT) AS week,
       CAST(SUM(dau) AS BIGINT) AS sum_dau,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       wau,
       CAST(SUM(dau) * 1000000 // (COUNT(*) * wau) AS BIGINT)
         AS stickiness_ppm
FROM dau JOIN wau ON dau.week = wau.week
GROUP BY dau.week, wau ORDER BY week
"""


@query("q_events_stickiness", oracle=_STICKY_ORACLE)
def q_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly DAU/WAU stickiness in ppm — the engagement habit metric
    (avg daily actives over weekly actives; 1,000,000 = every weekly
    user active every observed day).  Weeks are epoch-day÷7 integer
    buckets (no calendar-week locale parity trap); the average over
    OBSERVED days, so a day with zero events shrinks n_days rather
    than fabricating a zero-DAU row.

    Scale: two distinct-aggregations on the same (week, …, user) key
    prefix — partial aggregation collapses each to per-user bits
    map-side; the join is a tiny per-week census join."""
    e = T(spark, sf_dir, "events")
    d = e.select(
        F.expr("datediff(CAST(event_ts AS DATE), DATE'1970-01-01')").alias("day"),
        "user_id",
    )
    dau = d.groupBy(
        F.expr("day DIV 7").alias("week"), F.col("day")
    ).agg(F.countDistinct("user_id").cast("long").alias("dau"))
    wau = d.groupBy(F.expr("day DIV 7").alias("week")).agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return (
        dau.join(wau, "week")
        .groupBy(F.col("week").cast("long").alias("week"), F.col("wau"))
        .agg(
            F.sum("dau").cast("long").alias("sum_dau"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.expr(
                "CAST(SUM(dau) * 1000000 DIV (COUNT(1) * wau) AS BIGINT)"
            ).alias("stickiness_ppm"),
        )
        .select("week", "sum_dau", "n_days", "wau", "stickiness_ppm")
        .orderBy("week")
    )


# ------------------------------------------------------------------
# χ² day-of-week uniformity per event type (zero cells included)
# ------------------------------------------------------------------

#: χ²(df=6) critical value at α=0.05 is 12.592 → exact rational gate
_CHISQ_CRIT_NUM, _CHISQ_CRIT_DEN = 12592, 1000

_CHISQ_ORACLE = f"""
WITH e AS (
  SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dow FROM events),
o AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS obs
  FROM e GROUP BY 1, 2),
cells AS (
  SELECT t.event_type, UNNEST(range(0, 7)) AS dow
  FROM (SELECT DISTINCT event_type FROM e) t),
f AS (
  SELECT c.event_type, c.dow, COALESCE(o.obs, 0) AS obs
  FROM cells c LEFT JOIN o
    ON c.event_type = o.event_type AND c.dow = o.dow),
n AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS n FROM f GROUP BY 1),
x AS (
  SELECT f.event_type, MAX(n.n) AS n,
         CAST(SUM((7 * f.obs - n.n) * (7 * f.obs - n.n)) AS BIGINT)
           AS chisq_num,
         CAST(7 * MAX(n.n) AS BIGINT) AS chisq_den
  FROM f JOIN n ON f.event_type = n.event_type
  GROUP BY f.event_type)
SELECT event_type, n, chisq_num, chisq_den,
       CAST(chisq_num AS DOUBLE) / chisq_den AS chisq,
       CASE WHEN {_CHISQ_CRIT_DEN} * chisq_num
                 > {_CHISQ_CRIT_NUM} * chisq_den
            THEN 1 ELSE 0 END AS nonuniform
FROM x ORDER BY event_type
"""


@query("q_stats_chisq_dow", oracle=_CHISQ_ORACLE)
def q_stats_chisq_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² goodness-of-fit of each event type's day-of-week profile
    against the uniform law: with E = N/7 per cell,
    χ² = Σ(O−N/7)²/(N/7) = Σ(7·O−N)² / (7·N) — an exact int64
    rational reported beside its double, with the α=0.05 df=6
    verdict as the cross-multiplied integer gate
    {_CHISQ_CRIT_DEN}·num > {_CHISQ_CRIT_NUM}·den.  Zero cells (a
    type never seen on some weekday) contribute N² — materialized by
    EXPLODING the 7 weekdays per type (no cross join) and left-joining
    the observed census.  DuckDB's dayofweek (0=Sunday) = Spark's
    dayofweek − 1 (the q_timeseries_dow pinned mapping).

    Scale: one (type, dow) census off the fact scan, then ≤7·k-row
    algebra; the fact table is touched once, map-side combined."""
    e = T(spark, sf_dir, "events")
    marked = e.select(
        "event_type",
        (F.dayofweek(F.to_date("event_ts")) - 1).alias("dow"),
    )
    o = marked.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    cells = (
        marked.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("dow"),
        )
    )
    f = cells.join(o, ["event_type", "dow"], "left").select(
        "event_type", "dow", F.coalesce(F.col("obs"), F.lit(0)).alias("obs")
    )
    n = f.groupBy("event_type").agg(F.sum("obs").cast("long").alias("n"))
    x = (
        f.join(n, "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.sum((7 * F.col("obs") - F.col("n")) * (7 * F.col("obs") - F.col("n")))
            .cast("long")
            .alias("chisq_num"),
            (7 * F.max("n")).cast("long").alias("chisq_den"),
        )
    )
    return x.select(
        "event_type",
        "n",
        "chisq_num",
        "chisq_den",
        (F.col("chisq_num").cast("double") / F.col("chisq_den")).alias("chisq"),
        F.when(
            _CHISQ_CRIT_DEN * F.col("chisq_num")
            > _CHISQ_CRIT_NUM * F.col("chisq_den"),
            1,
        )
        .otherwise(0)
        .alias("nonuniform"),
    ).orderBy("event_type")


# ------------------------------------------------------------------
# Inter-arrival-gap log₂ histogram (burstiness census)
# ------------------------------------------------------------------

#: bit-length of gap_s as a pure CASE ladder (codegen-friendly — no
#: HOF): bucket k ⟺ 2^(k−1) ≤ gap_s < 2^k, bucket 0 ⟺ gap_s = 0.
_GAP_LADDER = " ".join(
    f"WHEN gap_s < {1 << k} THEN {k}" for k in range(0, 32)
)

_GAP_ORACLE = f"""
WITH s AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id FROM events),
g AS (
  SELECT tus - LAG(tus) OVER (PARTITION BY user_id
                              ORDER BY tus, event_id) AS gap_us
  FROM s),
b AS (
  SELECT gap_us // 1000000 AS gap_s FROM g WHERE gap_us IS NOT NULL),
k AS (
  SELECT CASE {_GAP_LADDER} ELSE 32 END AS bucket, gap_s FROM b)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
       CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
FROM k GROUP BY 1 ORDER BY bucket
"""


@query("q_events_interarrival", oracle=_GAP_ORACLE)
def q_events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival-gap log₂ histogram — the burstiness
    census behind rate-limiter and session-timeout tuning (a heavy
    bucket at small gaps = machine traffic; the knee locates the
    natural session gap; q_events_sessionize consumes that knee).
    Gaps in exact int64 MICROseconds (epoch_us both engines), ordered
    by the total (ts, event_id) key; seconds via positive floor
    division; the bucket is bit-length(gap_s) as a pure CASE ladder —
    stays inside whole-stage codegen, unlike an HOF indicator sum.

    Scale: one (user, time) exchange for the LAG (the sessionize
    shuffle, reusable), then a ≤33-group census."""
    e = T(spark, sf_dir, "events")
    s = e.select(
        "user_id", F.expr("ts DIV 1000").alias("tus"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    g = s.select(
        (F.col("tus") - F.lag("tus").over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    k = g.select(F.expr("gap_us DIV 1000000").alias("gap_s")).select(
        F.expr(f"CASE {_GAP_LADDER} ELSE 32 END").alias("bucket"), "gap_s"
    )
    return (
        k.groupBy(F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.min("gap_s").cast("long").alias("min_gap_s"),
            F.max("gap_s").cast("long").alias("max_gap_s"),
        )
        .orderBy("bucket")
    )


# ------------------------------------------------------------------
# kNN majority-vote classification (k=5, int8-code integer cosine)
# ------------------------------------------------------------------

_KNN_K = 5
_KNN_NQ = 8  # vec_id < 8 are the held-out queries

_KNN_ORACLE = f"""
WITH cod AS (
  SELECT vec_id, label, {_CODES_SQL} AS codes FROM embeddings),
q AS (
  SELECT vec_id AS qid, label AS qlabel, codes AS qc
  FROM cod WHERE vec_id < {_KNN_NQ}),
v AS (
  SELECT vec_id, label, codes,
         list_sum(list_transform(codes, x -> x * x)) AS n2
  FROM cod WHERE vec_id >= {_KNN_NQ}),
d AS (
  SELECT q.qid, q.qlabel, v.vec_id, v.label, v.n2,
         list_sum(list_transform(range(1, {_DIM} + 1),
                  i -> v.codes[i] * q.qc[i])) AS dot
  FROM v CROSS JOIN q WHERE v.n2 > 0),
keyd AS (
  SELECT qid, qlabel, vec_id, label,
         CASE WHEN dot >= 0 THEN (dot * dot * 1000000) // n2
              ELSE -((dot * dot * 1000000) // n2) END AS skey
  FROM d),
top AS (
  SELECT qid, qlabel, label,
         row_number() OVER (PARTITION BY qid
                            ORDER BY skey DESC, vec_id) AS rn
  FROM keyd),
votes AS (
  SELECT qid, qlabel, label, CAST(COUNT(*) AS BIGINT) AS votes
  FROM top WHERE rn <= {_KNN_K} GROUP BY 1, 2, 3),
pick AS (
  SELECT qid, qlabel, label AS pred_label, votes,
         row_number() OVER (PARTITION BY qid
                            ORDER BY votes DESC, label) AS pr
  FROM votes)
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(qlabel AS BIGINT) AS true_label,
       CAST(pred_label AS BIGINT) AS pred_label,
       votes,
       CASE WHEN pred_label = qlabel THEN 1 ELSE 0 END AS correct
FROM pick WHERE pr = 1 ORDER BY qid
"""


@query("q_sim_knn_classify", oracle=_KNN_ORACLE)
def q_sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-vote classification: predict each held-out query
    vector's label from its k={_KNN_K} nearest labelled neighbours —
    the label-propagation/auto-labelling primitive of a training-data
    pipeline (q_knn_graph builds the graph; this consumes it for a
    decision).  Neighbour order is the sign-aware quantized
    integer-cosine key sign(dot)·(dot²·10⁶ ÷ n2) — monotone in cosine
    (query norm constant per query), floor-division ties broken by
    vec_id in BOTH engines, so the top-k set is cross-engine exact;
    vote ties break to the smallest label.  dot²·10⁶ ≤ 1.07e18 < 2⁶³.

    Scale: the {_KNN_NQ}-row query batch broadcasts (q_sim_batch_topk
    shape — the corpus scans ONCE for the whole batch); per-query
    top-k is a WindowGroupLimit so each task forwards ≤k rows per
    query.  At corpus scale the candidate set first prunes through
    IVF/LSH (q_sim_ann_*), identical key algebra."""
    from ..operators.dedup import codes_dot_udf

    e = T(spark, sf_dir, "embeddings")
    cod = e.select(
        "vec_id", "label", F.expr(_CODES_SPARK).alias("codes")
    )
    q = cod.where(F.col("vec_id") < _KNN_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("codes").alias("qc"),
    )
    n2_expr = "aggregate(transform(codes, x -> x * x), 0L, (acc, v) -> acc + v)"
    v = cod.where(F.col("vec_id") >= _KNN_NQ).withColumn(
        "n2", F.expr(n2_expr)
    ).where(F.col("n2") > 0)
    dot_udf = codes_dot_udf()
    d = (
        v.crossJoin(F.broadcast(q))
        .select(
            "qid",
            "qlabel",
            "vec_id",
            "label",
            "n2",
            dot_udf(F.col("codes"), F.col("qc")).alias("dot"),
        )
    )
    keyd = d.select(
        "qid",
        "qlabel",
        "vec_id",
        "label",
        F.when(
            F.col("dot") >= 0,
            F.expr("(dot * dot * 1000000) DIV n2"),
        )
        .otherwise(-F.expr("(dot * dot * 1000000) DIV n2"))
        .alias("skey"),
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("skey"), F.asc("vec_id"))
    votes = (
        keyd.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= _KNN_K)
        .groupBy("qid", "qlabel", "label")
        .agg(F.count(F.lit(1)).cast("long").alias("votes"))
    )
    wp = Window.partitionBy("qid").orderBy(F.desc("votes"), F.asc("label"))
    return (
        votes.withColumn("pr", F.row_number().over(wp))
        .where(F.col("pr") == 1)
        .select(
            F.col("qid").cast("long").alias("qid"),
            F.col("qlabel").cast("long").alias("true_label"),
            F.col("label").cast("long").alias("pred_label"),
            "votes",
            F.when(F.col("label") == F.col("qlabel"), 1)
            .otherwise(0)
            .alias("correct"),
        )
        .orderBy("qid")
    )
