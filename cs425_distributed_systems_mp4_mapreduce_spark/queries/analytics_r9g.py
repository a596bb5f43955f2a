"""Round-9 pack G: keyword extraction, inter-purchase cadence,
momentum deltas, mixture planning, robust group dispersion.

* ``q_text_keywords`` — per-document top-3 keywords by INTEGER tf·idf
  (term frequency × half-bit floor-log2 idf — the quantized-idf dual
  of q_text_tfidf's float scores), deterministic tie-breaks.
* ``q_orders_reorder_gap`` — per-segment exact MEDIAN inter-purchase
  gap in days, via a per-group value-domain census (the partitioned
  extension of the q_stats_mannwhitney midrank discipline).
* ``q_window_pct_change`` — day-over-day revenue change in sign-safe
  truncated ppm (the q_sim_knn_classify negative-floor-division
  treatment).
* ``q_mix_upsample_plan`` — sampling-factor plan to hit a pinned
  target source mixture: factor_ppm = target_ppm·N ÷ nᵢ, with the
  upsample-deficit flag — the planning census consumed before
  q_mix_temperature executes a mix.
* ``q_agg_absdev`` — per-priority mean absolute deviation around the
  EXACT group median (the Brown–Forsythe stage-1 census): robust
  dispersion in exact cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T
from .analytics_r9f import _blen_ladder

# ------------------------------------------------------------------
# Integer tf·idf keyword extraction (top-3 per document)
# ------------------------------------------------------------------

_KW_TOP = 3

_KW_ORACLE = f"""
WITH w AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM w WHERE term <> '' GROUP BY 1, 2),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
sc AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * (2 * (({_blen_ladder('n.n_docs')})
                       - ({_blen_ladder('df.df')})) + 1) AS score
  FROM tf JOIN df ON tf.term = df.term, n),
r AS (
  SELECT doc_id, term, tf, df, CAST(score AS BIGINT) AS score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rk
  FROM sc)
SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tf, df, score
FROM r WHERE rk <= {_KW_TOP} ORDER BY doc_id, rk
"""


@query("q_text_keywords", oracle=_KW_ORACLE)
def q_text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-{_KW_TOP} terms by INTEGER
    tf·idf, where idf is the half-bit quantization
    2·(blen(N) − blen(df)) + 1 of log₂(N/df) (the q_mix_entropy /
    q_text_bigram_lm discipline) — so scores are exact int64 and the
    ranking is bit-reproducible, unlike float tf·idf (q_text_tfidf
    keeps the float form; this is its deterministic dual for
    labelling/routing decisions).  Ties break (score desc, term).

    Scale: tf is one (doc, term) census; df one term census joined
    back on the SAME term key; the per-doc top-k is a WindowGroupLimit
    forwarding ≤{_KW_TOP} rows per doc per task."""
    d = T(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    tf = w.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = tf.agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    sc = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.expr(
                f"CAST(tf * (2 * (({_blen_ladder('n_docs')})"
                f" - ({_blen_ladder('df')})) + 1) AS BIGINT)"
            ).alias("score"),
        )
    )
    wk = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        sc.withColumn("rk", F.row_number().over(wk).cast("long"))
        .where(F.col("rk") <= _KW_TOP)
        .select("doc_id", "rk", "term", "tf", "df", "score")
        .orderBy("doc_id", "rk")
    )


# ------------------------------------------------------------------
# Per-segment exact median inter-purchase gap (partitioned census)
# ------------------------------------------------------------------

_GAP_ORACLE = """
WITH o AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
           AS day,
         o.o_orderkey
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
g AS (
  SELECT segment,
         day - LAG(day) OVER (PARTITION BY o_custkey
                              ORDER BY day, o_orderkey) AS gap
  FROM o),
c AS (
  SELECT segment, gap, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM g WHERE gap IS NOT NULL GROUP BY 1, 2),
r AS (
  SELECT segment, gap, cnt,
         SUM(cnt) OVER (PARTITION BY segment ORDER BY gap) AS cum,
         SUM(cnt) OVER (PARTITION BY segment) AS n
  FROM c)
SELECT segment, CAST(MAX(n) AS BIGINT) AS n_gaps,
       CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN gap END) AS BIGINT)
         AS median_gap_days
FROM r GROUP BY segment ORDER BY segment
"""


@query("q_orders_reorder_gap", oracle=_GAP_ORACLE)
def q_orders_reorder_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment exact MEDIAN inter-purchase gap in days — the
    reorder-cadence metric behind replenishment and churn windows
    (q_events_interarrival profiles event burstiness; this is the
    purchase-cycle analogue with an exact order statistic).  The
    median is selected on the per-segment (gap, count) census by the
    lower-midrank rule cum ≥ ⌈n/2⌉ — no per-row rank, no global sort;
    consecutive-order gaps order by the total (day, orderkey) key.

    Scale: one (customer, time) exchange for the LAG (bounded by the
    orders table, reusable with RFM's shuffle), then a gap-domain
    census per segment — the q_stats_mannwhitney discipline,
    PARTITIONED, so every window key is (segment, gap-domain)."""
    o = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    base = o.join(cust, o.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        "o_custkey",
        F.expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')").alias(
            "day"
        ),
        "o_orderkey",
    )
    wl = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    g = base.select(
        "segment", (F.col("day") - F.lag("day").over(wl)).alias("gap")
    ).where(F.col("gap").isNotNull())
    c = g.groupBy("segment", "gap").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wcum = (
        Window.partitionBy("segment")
        .orderBy("gap")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("segment")
    r = c.select(
        "segment",
        "gap",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    return (
        r.groupBy("segment")
        .agg(
            F.max("n").cast("long").alias("n_gaps"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(n + 1) DIV 2"), F.col("gap")
                )
            )
            .cast("long")
            .alias("median_gap_days"),
        )
        .orderBy("segment")
    )


# ------------------------------------------------------------------
# Day-over-day revenue change (sign-safe truncated ppm)
# ------------------------------------------------------------------

_PCT_ORACLE = """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS r
  FROM orders GROUP BY 1),
d AS (
  SELECT day, r, r - LAG(r) OVER (ORDER BY day) AS diff,
         LAG(r) OVER (ORDER BY day) AS prev
  FROM daily)
SELECT CAST(day AS BIGINT) AS day, r, CAST(diff AS BIGINT) AS diff,
       CASE WHEN diff >= 0 THEN CAST(diff * 1000000 // prev AS BIGINT)
            ELSE -CAST((-diff) * 1000000 // prev AS BIGINT)
       END AS change_ppm
FROM d WHERE diff IS NOT NULL AND prev > 0
ORDER BY day
"""


@query("q_window_pct_change", oracle=_PCT_ORACLE)
def q_window_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day revenue change in ppm — the elementary momentum
    delta under every dashboard.  The division is SIGN-SAFE truncated:
    DuckDB's ``//`` floors negatives while Spark's ``DIV`` truncates
    toward zero, so the quotient is taken on |diff| and the sign
    re-applied (the q_sim_knn_classify treatment) — identical in both
    engines for either sign.

    Scale: one LAG over the calendar-bounded daily census."""
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')").alias(
            "day"
        )
    ).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("r")
    )
    wd = Window.orderBy("day")
    d = daily.select(
        F.col("day").cast("long").alias("day"),
        "r",
        (F.col("r") - F.lag("r").over(wd)).cast("long").alias("diff"),
        F.lag("r").over(wd).alias("prev"),
    ).where(F.col("diff").isNotNull() & (F.col("prev") > 0))
    return d.select(
        "day",
        "r",
        "diff",
        F.when(
            F.col("diff") >= 0,
            F.expr("CAST(diff * 1000000 DIV prev AS BIGINT)"),
        )
        .otherwise(-F.expr("CAST((-diff) * 1000000 DIV prev AS BIGINT)"))
        .alias("change_ppm"),
    ).orderBy("day")


# ------------------------------------------------------------------
# Target-mixture upsample plan (pinned target weights)
# ------------------------------------------------------------------

#: pinned target mixture in ppm (sums to 1,000,000) — the plan every
#: LLM-data run starts from; sources absent from the corpus get no row
#: (they cannot be sampled into existence), extra corpus sources get
#: target 0.
_MIX_TARGETS = {
    "src0": 300000,
    "src1": 200000,
    "src2": 150000,
    "src3": 100000,
    "src4": 100000,
    "src5": 50000,
    "src6": 50000,
    "src7": 50000,
}

_MIX_CASES = " ".join(
    f"WHEN source = '{s}' THEN {t}" for s, t in sorted(_MIX_TARGETS.items())
)

_PLAN_ORACLE = f"""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source),
t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM c),
p AS (
  SELECT c.source, c.n_docs, t.total,
         CAST(CASE {_MIX_CASES} ELSE 0 END AS BIGINT) AS target_ppm
  FROM c, t)
SELECT source, n_docs, target_ppm,
       CAST(target_ppm * total // n_docs AS BIGINT) AS factor_ppm,
       CASE WHEN target_ppm * total > 1000000 * n_docs THEN 1 ELSE 0 END
         AS needs_upsample
FROM p ORDER BY source
"""


@query("q_mix_upsample_plan", oracle=_PLAN_ORACLE)
def q_mix_upsample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-factor plan to hit a pinned target source mixture:
    factor = target_share·N / nᵢ (in ppm — 1,000,000 = keep as is,
    less = downsample, more = repeat/upsample), with the
    needs_upsample flag as an exact cross-multiplied comparison.
    This is the PLANNING census a mixture run consults before
    q_mix_temperature/q_mix_sources executes it; the epoch bound is
    max factor over the must-not-repeat sources.

    Scale: one source census (≤ dozens of groups) against the 1-row
    corpus total — map-side combined, scalar algebra after."""
    d = T(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    t = c.agg(F.sum("n_docs").cast("long").alias("total"))
    p = c.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        F.expr(f"CAST(CASE {_MIX_CASES} ELSE 0 END AS BIGINT)").alias(
            "target_ppm"
        ),
        "total",
    )
    return p.select(
        "source",
        "n_docs",
        "target_ppm",
        F.expr("CAST(target_ppm * total DIV n_docs AS BIGINT)").alias(
            "factor_ppm"
        ),
        F.when(
            F.col("target_ppm") * F.col("total")
            > 1000000 * F.col("n_docs"),
            1,
        )
        .otherwise(0)
        .alias("needs_upsample"),
    ).orderBy("source")


# ------------------------------------------------------------------
# Robust per-group dispersion: mean |x − median| (Brown–Forsythe
# stage-1 census)
# ------------------------------------------------------------------

_ABSDEV_ORACLE = """
WITH v AS (
  SELECT o_orderpriority AS grp,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders),
c AS (
  SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2),
r AS (
  SELECT grp, v, cnt,
         SUM(cnt) OVER (PARTITION BY grp ORDER BY v) AS cum,
         SUM(cnt) OVER (PARTITION BY grp) AS n
  FROM c),
med AS (
  SELECT grp,
         CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS BIGINT) AS med
  FROM r GROUP BY grp),
z AS (
  SELECT v.grp, ABS(v.v - med.med) AS z, med.med
  FROM v JOIN med ON v.grp = med.grp)
SELECT grp,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(med) AS BIGINT) AS median_cents,
       CAST(SUM(z) AS BIGINT) AS sum_absdev_cents,
       CAST(SUM(z) * 1000 // COUNT(*) AS BIGINT)
         AS mean_absdev_millicents
FROM z GROUP BY grp ORDER BY grp
"""


@query("q_agg_absdev", oracle=_ABSDEV_ORACLE)
def q_agg_absdev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority robust dispersion: mean |x − median| around the
    EXACT group median — the Brown–Forsythe stage-1 census (feeding
    the variance-equality test) and the outlier-insensitive scale
    estimate beside q_outliers_mad (which takes the MEDIAN of the
    deviations; the mean keeps the statistic a one-pass sum once the
    median is known).  Medians are lower-midrank selections on the
    per-group value census; deviations are exact integer cents.

    Scale: the census windows partition by GROUP over the value
    domain (q_orders_reorder_gap discipline); the ≤k-row median table
    broadcasts back onto the fact scan — two bounded exchanges."""
    o = T(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v"),
    )
    c = v.groupBy("grp", "v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wcum = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("grp")
    r = c.select(
        "grp",
        "v",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    med = r.groupBy("grp").agg(
        F.min(F.when(F.col("cum") >= F.expr("(n + 1) DIV 2"), F.col("v")))
        .cast("long")
        .alias("med")
    )
    z = v.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("v") - F.col("med")).alias("z"), "med"
    )
    return (
        z.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("med").cast("long").alias("median_cents"),
            F.sum("z").cast("long").alias("sum_absdev_cents"),
            F.expr(
                "CAST(SUM(z) * 1000 DIV COUNT(1) AS BIGINT)"
            ).alias("mean_absdev_millicents"),
        )
        .orderBy("grp")
    )
