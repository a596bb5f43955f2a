"""Round-9 pack C: corpus diagnostics, graph similarity, sequence
statistics.

* ``q_text_term_lift`` — distinctive vocabulary per source via integer
  LIFT (the log-free PMI stand-in): how over-represented a word is in
  a source vs the corpus, in milli units, top-10 per source.
* ``q_graph_jaccard_neighbors`` — supplier similarity by neighbor-set
  Jaccard over the (supplier ↔ part) bipartite graph from lineitem —
  the link-prediction primitive, integer ppm.
* ``q_window_streak`` — longest runs of strictly-increasing daily
  revenue (gaps-and-islands over the SIGN of the day-over-day diff —
  the monotone-run variant of sessionization).
* ``q_events_funnel_time`` — view→purchase conversion latency: per
  user the gap between first view and first subsequent purchase, with
  the EXACT median selected by the two-pass histogram rank
  (analytics_r9.twopass_rank) — no global sort.
* ``q_agg_boxplot`` — per-source Tukey box-plot of document lengths:
  exact discrete quartiles by rank selection, 1.5·IQR whiskers and
  outlier census, all integer (the 1.5 factor is carried as 2·x vs
  2·q ± 3·iqr so nothing leaves int64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T
from .analytics_r9 import twopass_rank

# ------------------------------------------------------------------
# Term lift (distinctive vocabulary per source)
# ------------------------------------------------------------------

_LIFT_MIN_SUPPORT = 50
_LIFT_TOPK = 10

_LIFT_ORACLE = f"""
WITH tok AS (
  SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents),
sw AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n_sw
       FROM tok GROUP BY source, word),
ws AS (SELECT word, CAST(SUM(n_sw) AS BIGINT) AS n_w FROM sw GROUP BY word),
ss AS (SELECT source, CAST(SUM(n_sw) AS BIGINT) AS n_s FROM sw GROUP BY source),
tot AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n FROM ws),
lift AS (
  SELECT sw.source, sw.word, sw.n_sw,
         CAST(sw.n_sw * tot.n * 1000 // (ss.n_s * ws.n_w) AS BIGINT)
           AS lift_milli
  FROM sw JOIN ws USING (word) JOIN ss USING (source), tot
  WHERE sw.n_sw >= {_LIFT_MIN_SUPPORT}),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY lift_milli DESC, word) AS rank
  FROM lift)
SELECT source, word, n_sw, lift_milli, CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {_LIFT_TOPK}
ORDER BY source, rank
"""


@query("q_text_term_lift", oracle=_LIFT_ORACLE)
def q_text_term_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive vocabulary per source by integer LIFT —
    lift(w, s) = P(w|s) / P(w) = n_sw·N / (N_s·n_w) in milli units
    (the log-free PMI: same ranking, no libm) — the corpus-diagnostic
    a mixture pipeline runs to see what each source actually
    contributes.  Support floor {_LIFT_MIN_SUPPORT} kills the
    lift-∞-singleton tail; top-{_LIFT_TOPK} per source with a total
    (lift, word) tie-break.

    Scale: token census + two bounded side-aggregates joined back
    (broadcast); the per-source top-k is a partitioned window over
    rows that survive the support floor.  At web scale n_sw·N can
    pass int64 — there the lift computes in per-million token units
    (both factors DIV 10⁶ first), same ranking."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("word"))
    sw = tok.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("long").alias("n_sw")
    )
    ws = sw.groupBy("word").agg(F.sum("n_sw").cast("long").alias("n_w"))
    ss = sw.groupBy("source").agg(F.sum("n_sw").cast("long").alias("n_s"))
    tot = ws.agg(F.sum("n_w").cast("long").alias("n"))
    lift = (
        sw.where(F.col("n_sw") >= _LIFT_MIN_SUPPORT)
        .join(ws, "word")
        .join(F.broadcast(ss), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "word",
            "n_sw",
            F.expr("n_sw * n * 1000 DIV (n_s * n_w)").alias("lift_milli"),
        )
    )
    wr = Window.partitionBy("source").orderBy(
        F.desc("lift_milli"), "word"
    )
    return (
        lift.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= _LIFT_TOPK)
        .select("source", "word", "n_sw", "lift_milli", "rank")
        .orderBy("source", "rank")
    )


# ------------------------------------------------------------------
# Neighbor-set Jaccard (graph node similarity / link prediction)
# ------------------------------------------------------------------

_NJ_MIN_PPM = 100_000  # report pairs with Jaccard >= 0.10

_NJ_ORACLE = f"""
WITH e AS (
  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY s),
inter AS (
  SELECT a.s AS sa, b.s AS sb, CAST(COUNT(*) AS BIGINT) AS i
  FROM e a JOIN e b ON a.p = b.p AND a.s < b.s
  GROUP BY a.s, b.s)
SELECT inter.sa, inter.sb, inter.i,
       da.d AS deg_a, db.d AS deg_b,
       CAST(inter.i * 1000000 // (da.d + db.d - inter.i) AS BIGINT)
         AS jaccard_ppm
FROM inter
JOIN deg da ON da.s = inter.sa
JOIN deg db ON db.s = inter.sb
WHERE inter.i * 1000000 >= {_NJ_MIN_PPM} * (da.d + db.d - inter.i)
ORDER BY jaccard_ppm DESC, sa, sb
"""


@query("q_graph_jaccard_neighbors", oracle=_NJ_ORACLE)
def q_graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier similarity by neighbor-set Jaccard over the
    supplier↔part bipartite graph (distinct lineitem edges) — the
    link-prediction / entity-matching primitive: |N(a)∩N(b)| from a
    part-keyed self-join, |N| from the degree census, Jaccard as an
    integer-ppm cross-multiplied threshold (≥ 0.10) so the cut is
    bit-deterministic.

    Scale: the self-join fans out per part by its supplier count —
    the SAME hot-key quadratic every co-occurrence join has; the
    remedy ladder is in-repo (q_basket_pairs' support floor,
    q_dedup_allpairs' prefix filter).  Degrees broadcast."""
    li = T(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    deg = e.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a = e.select(F.col("s").alias("sa"), "p")
    b = e.select(F.col("s").alias("sb"), "p")
    inter = (
        a.join(b, "p")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).cast("long").alias("i"))
    )
    da = deg.select(F.col("s").alias("sa"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("s").alias("sb"), F.col("d").alias("deg_b"))
    return (
        inter.join(F.broadcast(da), "sa")
        .join(F.broadcast(db), "sb")
        .where(
            F.col("i") * 1_000_000
            >= _NJ_MIN_PPM * (F.col("deg_a") + F.col("deg_b") - F.col("i"))
        )
        .select(
            "sa",
            "sb",
            "i",
            "deg_a",
            "deg_b",
            F.expr("i * 1000000 DIV (deg_a + deg_b - i)").alias(
                "jaccard_ppm"
            ),
        )
        .orderBy(F.desc("jaccard_ppm"), "sa", "sb")
    )


# ------------------------------------------------------------------
# Longest increasing-revenue streaks (monotone-run islands)
# ------------------------------------------------------------------

_STREAK_ORACLE = """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS r
  FROM orders GROUP BY 1),
d AS (
  SELECT day, r, LAG(r) OVER (ORDER BY day) AS pr,
         CASE WHEN r > LAG(r) OVER (ORDER BY day) THEN 1 ELSE 0 END AS up
  FROM daily),
g AS (
  SELECT day, r, pr, up,
         CAST(SUM(1 - up) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS sid
  FROM d),
runs AS (
  SELECT sid,
         CAST(MIN(day) AS BIGINT) AS start_day,
         CAST(MAX(day) AS BIGINT) AS end_day,
         CAST(COUNT(*) AS BIGINT) AS len,
         CAST(MAX(r) - MIN(pr) AS BIGINT) AS gain_cents
  FROM g WHERE up = 1 GROUP BY sid)
SELECT start_day - 1 AS start_day, end_day, len + 1 AS run_days, gain_cents
FROM runs
ORDER BY len DESC, start_day
LIMIT 5
"""


@query("q_window_streak", oracle=_STREAK_ORACLE)
def q_window_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest strictly-increasing daily-revenue streaks — the
    monotone-run variant of gaps-and-islands (sessionize marks gaps
    in TIME; this marks sign changes in the day-over-day DIFF): mark
    each up-day, island id = running count of non-up days, then one
    agg per island.  Day = integer days since epoch, revenue in
    cents; the run's gain is last value − the base value before the
    first up-day (max(r) − min(lag(r)): exact, since the run is
    strictly increasing).
    A run of k up-days spans k+1 calendar points — reported as
    run_days with the preceding base day as start_day.

    Scale: the daily census is calendar-bounded, so the ordered
    windows run over a bounded table (the q_stats_ks_drift value-
    domain discipline); everything upstream is one map-side-combined
    agg."""
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')"
        ).alias("day")
    ).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("r")
    )
    wd = Window.orderBy("day")
    d = daily.withColumn("pr", F.lag("r").over(wd)).withColumn(
        "up",
        F.when(F.col("r") > F.col("pr"), 1).otherwise(0),
    )
    g = d.withColumn(
        "sid",
        F.sum(1 - F.col("up"))
        .over(wd.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    runs = (
        g.where(F.col("up") == 1)
        .groupBy("sid")
        .agg(
            F.min("day").cast("long").alias("start0"),
            F.max("day").cast("long").alias("end_day"),
            F.count(F.lit(1)).cast("long").alias("len"),
            # gain over the FULL run = last value - the base value
            # BEFORE the first up-day (min of the lagged series: the
            # run is increasing, so min(pr) is the base) — max(r) -
            # min(r) would drop the first increment
            (F.max("r") - F.min("pr")).cast("long").alias("gain_cents"),
        )
    )
    return (
        runs.select(
            (F.col("start0") - 1).alias("start_day"),
            "end_day",
            (F.col("len") + 1).alias("run_days"),
            "gain_cents",
        )
        .orderBy(F.desc(F.col("run_days")), "start_day")
        .limit(5)
    )


# ------------------------------------------------------------------
# Funnel conversion latency with an exact two-pass median
# ------------------------------------------------------------------

_FUNNEL_TIME_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS v_us
  FROM events WHERE event_type = 'view' GROUP BY user_id),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.v_us
  GROUP BY e.user_id),
delta AS (
  SELECT p.user_id, (p.p_us - v.v_us) // 1000000 AS delta_s
  FROM p JOIN v USING (user_id)),
n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM delta),
r AS (SELECT delta_s,
             row_number() OVER (ORDER BY delta_s, user_id) AS rn
      FROM delta)
SELECT n1.n AS n_users,
       CAST((SELECT MIN(delta_s) FROM delta) AS BIGINT) AS min_s,
       CAST(r.delta_s AS BIGINT) AS median_s,
       CAST((SELECT MAX(delta_s) FROM delta) AS BIGINT) AS max_s
FROM n1 JOIN r ON r.rn = (n1.n + 1) // 2
"""


@query("q_events_funnel_time", oracle=_FUNNEL_TIME_ORACLE)
def q_events_funnel_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion latency: per user the seconds between
    FIRST view and FIRST subsequent purchase, reported as
    (n, min, exact median, max).  The median is an order statistic —
    selected at rank ⌈n/2⌉ via the two-pass histogram rank
    (twopass_rank, hour-wide buckets), so there is NO global sort;
    the oracle uses the naive global row_number, making the hash
    match the decomposition proof (the q_agg_gini_twopass
    discipline).

    Scale: two per-user min-aggs on the events exchange, a bounded
    census window, one partitioned refine window."""
    e = T(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.expr("ts div 1000")).alias("v_us"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id", F.expr("ts div 1000").alias("us"))
        .join(v, "user_id")
        .where(F.col("us") > F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    delta = p.join(v, "user_id").select(
        "user_id",
        F.expr("(p_us - v_us) DIV 1000000").alias("delta_s"),
    )
    ranked = twopass_rank(delta, "delta_s", "user_id", 3600, "rn")
    stats = delta.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.min("delta_s").cast("long").alias("min_s"),
        F.max("delta_s").cast("long").alias("max_s"),
    )
    med = (
        ranked.crossJoin(F.broadcast(stats))
        .where(F.col("rn") == F.expr("(n_users + 1) DIV 2"))
        .select(F.col("delta_s").cast("long").alias("median_s"))
    )
    return stats.crossJoin(F.broadcast(med)).select(
        "n_users", "min_s", "median_s", "max_s"
    )


# ------------------------------------------------------------------
# Tukey box-plot census (per-source document lengths)
# ------------------------------------------------------------------

_BOXPLOT_ORACLE = """
WITH r AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM documents),
q AS (
  SELECT source, n,
         MAX(CASE WHEN rn = (n + 3) // 4 THEN n_chars END) AS q1,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS med,
         MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN n_chars END) AS q3
  FROM r GROUP BY source, n)
SELECT q.source, q.n,
       CAST(q.q1 AS BIGINT) AS q1,
       CAST(q.med AS BIGINT) AS med,
       CAST(q.q3 AS BIGINT) AS q3,
       CAST(q.q3 - q.q1 AS BIGINT) AS iqr,
       CAST(SUM(CASE WHEN 2 * d.n_chars < 2 * q.q1 - 3 * (q.q3 - q.q1)
                       OR 2 * d.n_chars > 2 * q.q3 + 3 * (q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM q JOIN documents d USING (source)
GROUP BY q.source, q.n, q.q1, q.med, q.q3
ORDER BY q.source
"""


@query("q_agg_boxplot", oracle=_BOXPLOT_ORACLE)
def q_agg_boxplot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Tukey box-plot of document lengths — the length-
    distribution card a corpus report shows: exact DISCRETE quartiles
    (values at ranks ⌈n/4⌉, ⌈n/2⌉, ⌈3n/4⌉ — ties cannot change the
    selected VALUE), IQR, and the 1.5·IQR outlier census computed as
    2·x ≷ 2·q ± 3·iqr so the fractional fence never leaves int64.

    Scale: ranks come from a per-SOURCE partitioned window (the
    partition key is the report key — nothing global); the outlier
    pass re-joins the 1-row-per-source quartile table broadcast."""
    d = T(spark, sf_dir, "documents")
    wsrc = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = d.select(
        "source",
        "n_chars",
        F.row_number().over(wsrc).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .cast("long")
        .alias("n"),
    )
    q = r.groupBy("source", "n").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(n + 3) DIV 4"), F.col("n_chars"))
        ).alias("q1"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("n_chars"))
        ).alias("med"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(3 * n + 3) DIV 4"),
                F.col("n_chars"),
            )
        ).alias("q3"),
    )
    return (
        d.join(F.broadcast(q), "source")
        .groupBy("source", "n", "q1", "med", "q3")
        .agg(
            F.sum(
                F.when(
                    (2 * F.col("n_chars") < 2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1")))
                    | (2 * F.col("n_chars") > 2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1"))),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "source",
            "n",
            F.col("q1").cast("long").alias("q1"),
            F.col("med").cast("long").alias("med"),
            F.col("q3").cast("long").alias("q3"),
            (F.col("q3") - F.col("q1")).cast("long").alias("iqr"),
            "n_outliers",
        )
        .orderBy("source")
    )
