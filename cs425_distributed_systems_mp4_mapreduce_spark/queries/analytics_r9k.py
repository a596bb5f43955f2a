"""Round-9 pack K: parametric k-sample tests, effect sizes, the MACD
indicator, term burstiness, behavioral path mining, per-source dedup
pressure.

* ``q_stats_anova`` — one-way ANOVA F across the five order
  priorities (the parametric counterpart of q_stats_kruskal) plus
  the η² effect size, from the same exact int64 moment pivot.
* ``q_stats_cohens_d`` — Cohen's d standardized effect size between
  URGENT and LOW orders — the "is the significant difference LARGE?"
  companion to q_stats_mannwhitney / q_stats_two_proportion.
* ``q_window_macd`` — MACD (fast/slow dyadic EMA difference) with a
  signal line and crossover flags on the daily revenue series.
* ``q_text_fano`` — per-term Fano factor (variance-to-mean of
  per-document counts, exact cross-multiplied ppm): burstiness
  separates topical terms from function words at equal frequency.
* ``q_events_trigrams`` — most common 3-step behavioral paths per
  user timeline (the sequence-mining census behind funnel design).
* ``q_dedup_rate_by_source`` — duplicate pressure per source: the
  curation dashboard that decides which feeds need dedup first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

# ------------------------------------------------------------------
# shared 5-group exact-moment pivot (cents by priority)
# ------------------------------------------------------------------

_GRP_CASE = (
    "CASE "
    + " ".join(
        f"WHEN o_orderpriority = '{p}' THEN {i + 1}"
        for i, p in enumerate(_PRIORITIES)
    )
    + " END"
)
_PIVOT_SQL = ",\n".join(
    f"         CAST(SUM(CASE WHEN grp = {i} THEN v ELSE 0 END) AS BIGINT)"
    f" AS s{i},"
    f" CAST(SUM(CASE WHEN grp = {i} THEN 1 ELSE 0 END) AS BIGINT) AS n{i}"
    for i in range(1, 6)
)
_TERMS = "\n             + ".join(
    f"CASE WHEN n{i} = 0 THEN 0.0 ELSE"
    f" CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE) / CAST(n{i} AS DOUBLE) END"
    for i in range(1, 6)
)
_K = (
    "("
    + " + ".join(f"CASE WHEN n{i} = 0 THEN 0 ELSE 1 END" for i in range(1, 6))
    + ")"
)

_ANOVA_ORACLE = f"""
WITH o AS (
  SELECT {_GRP_CASE} AS grp,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s,
         CAST(CAST(SUM(v * v) AS VARCHAR) AS DOUBLE) AS q,
{_PIVOT_SQL}
  FROM o)
SELECT n, s, q, n1, n2, n3, n4, n5, s1, s2, s3, s4, s5,
       CASE WHEN {_K} < 2 OR CAST(q AS DOUBLE) - ({_TERMS}) = 0.0
            THEN NULL ELSE
       (({_TERMS})
         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       / ({_K} - 1.0)
       / ((CAST(q AS DOUBLE) - ({_TERMS}))
          / (CAST(n AS DOUBLE) - {_K})) END AS f_stat,
       CASE WHEN CAST(q AS DOUBLE)
          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) = 0.0
            THEN NULL ELSE
       (({_TERMS})
         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       / (CAST(q AS DOUBLE)
          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
         END AS eta_sq
FROM agg
"""


@query("q_stats_anova", oracle=_ANOVA_ORACLE)
def q_stats_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across the five order priorities: F =
    (SSB/(k−1))/(SSW/(N−k)) with SSB = Σsᵢ²/nᵢ − s²/N and
    SSW = Q − Σsᵢ²/nᵢ — the parametric counterpart of
    q_stats_kruskal, sharing its exact int64 moment pivot (every sum,
    square-sum and group sum is an exact integer in cents; F and the
    η² = SSB/SST effect size are fixed-order double expressions, so
    both engines agree bit-for-bit).  Empty groups drop out of both
    the Σ terms and the group count k.

    Scale: one map-side-combined aggregation over the fact scan — no
    shuffle wider than 1 row, no window anywhere."""
    o = T(spark, sf_dir, "orders").select(
        F.expr(_GRP_CASE).alias("grp"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v"),
    )
    group_aggs = [
        x
        for i in range(1, 6)
        for x in (
            F.sum(F.when(F.col("grp") == i, F.col("v")).otherwise(0))
            .cast("long")
            .alias(f"s{i}"),
            F.sum(F.when(F.col("grp") == i, 1).otherwise(0))
            .cast("long")
            .alias(f"n{i}"),
        )
    ]
    dec = F.col("v").cast("decimal(19,0)")
    agg = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        # Σv² passes 2⁶³ (5.5e7 cents squared × row count): exact
        # DECIMAL sum, pinned to double via the string round-trip
        # (the q_timeseries_autocorr parity discipline)
        F.sum(dec * dec).cast("string").cast("double").alias("q"),
        *group_aggs,
    )
    ssb = (
        f"(({_TERMS})"
        " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
    )
    # degenerate designs (k < 2 groups, zero within- or total-variance)
    # report NULL identically on both engines: ANSI Spark would raise
    # DIVIDE_BY_ZERO where DuckDB emits inf (found by the degenerate
    # mini-t2, the KMV under-k lesson applied to designs)
    f_expr = (
        f"CASE WHEN {_K} < 2 OR CAST(q AS DOUBLE) - ({_TERMS}) = 0.0"
        " THEN NULL ELSE "
        f"{ssb} / ({_K} - 1.0)"
        f" / ((CAST(q AS DOUBLE) - ({_TERMS}))"
        f"    / (CAST(n AS DOUBLE) - {_K})) END"
    )
    eta_expr = (
        "CASE WHEN CAST(q AS DOUBLE)"
        " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) = 0.0"
        " THEN NULL ELSE "
        f"{ssb} / (CAST(q AS DOUBLE)"
        " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) END"
    )
    return agg.select(
        "n", "s", "q", "n1", "n2", "n3", "n4", "n5",
        "s1", "s2", "s3", "s4", "s5",
        F.expr(f_expr).alias("f_stat"),
        F.expr(eta_expr).alias("eta_sq"),
    )


# ------------------------------------------------------------------
# Cohen's d between URGENT and LOW order prices
# ------------------------------------------------------------------

_CD_A, _CD_B = "1-URGENT", "5-LOW"

_COHEN_ORACLE = f"""
WITH o AS (
  SELECT o_orderpriority AS p,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders WHERE o_orderpriority IN ('{_CD_A}', '{_CD_B}')),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN p = '{_CD_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN p = '{_CD_A}' THEN v ELSE 0 END) AS BIGINT) AS s1,
    CAST(CAST(SUM(CASE WHEN p = '{_CD_A}' THEN v * v ELSE 0 END)
         AS VARCHAR) AS DOUBLE) AS q1,
    CAST(SUM(CASE WHEN p = '{_CD_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(SUM(CASE WHEN p = '{_CD_B}' THEN v ELSE 0 END) AS BIGINT) AS s2,
    CAST(CAST(SUM(CASE WHEN p = '{_CD_B}' THEN v * v ELSE 0 END)
         AS VARCHAR) AS DOUBLE) AS q2
  FROM o)
SELECT n1, s1, q1, n2, s2, q2,
       CAST(s1 * n2 - s2 * n1 AS BIGINT) AS mean_diff_num,
       CASE WHEN n1 < 2 OR n2 < 2
              OR (CAST(q1 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
               + (CAST(q2 AS DOUBLE)
                  - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
               = 0.0
            THEN NULL ELSE
       (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
       / SQRT(((CAST(q1 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             + (CAST(q2 AS DOUBLE)
                - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
             / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)) END AS d
FROM agg
"""


@query("q_stats_cohens_d", oracle=_COHEN_ORACLE)
def q_stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d standardized effect size between URGENT and LOW order
    prices — the "significant, but is it LARGE?" companion the A/B
    significance tests (q_stats_two_proportion, q_stats_mannwhitney)
    need before anyone acts on them.  Pooled-variance denominator
    from exact int64 moments (Σ(x−x̄)² = Q − S²/n per group), the
    exact cross-multiplied mean-difference numerator s1·n2 − s2·n1 is
    reported as an auditable integer, and d itself is one fixed-shape
    double expression — IEEE-deterministic across engines.

    Scale: single map-side-combined pass with a pushed-down priority
    filter; 1 output row."""
    o = T(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin(_CD_A, _CD_B)
    ).select(
        F.col("o_orderpriority").alias("p"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v"),
    )
    def _g(p, i):
        return (
            F.sum(F.when(F.col("p") == p, 1).otherwise(0)).cast("long").alias(f"n{i}"),
            F.sum(F.when(F.col("p") == p, F.col("v")).otherwise(0)).cast("long").alias(f"s{i}"),
            F.sum(F.when(F.col("p") == p,
                         F.col("v").cast("decimal(19,0)")
                         * F.col("v").cast("decimal(19,0)"))
                  .otherwise(F.lit(0).cast("decimal(38,0)")))
            .cast("string").cast("double").alias(f"q{i}"),
        )
    agg = o.agg(*_g(_CD_A, 1), *_g(_CD_B, 2))
    # degenerate designs (a side with < 2 samples, zero pooled spread)
    # report NULL identically on both engines (ANSI DIVIDE_BY_ZERO
    # vs DuckDB inf — the degenerate mini-t2 class)
    d_expr = (
        "CASE WHEN n1 < 2 OR n2 < 2"
        " OR (CAST(q1 AS DOUBLE)"
        "     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
        "  + (CAST(q2 AS DOUBLE)"
        "     - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
        "  = 0.0 THEN NULL ELSE "
        "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
        " - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
        " / SQRT(((CAST(q1 AS DOUBLE)"
        "          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
        "       + (CAST(q2 AS DOUBLE)"
        "          - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))"
        "       / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)) END"
    )
    return agg.select(
        "n1", "s1", "q1", "n2", "s2", "q2",
        F.expr("CAST(s1 * n2 - s2 * n1 AS BIGINT)").alias("mean_diff_num"),
        F.expr(d_expr).alias("d"),
    )


# ------------------------------------------------------------------
# MACD on the daily revenue series (dyadic truncated-stencil EMAs)
# ------------------------------------------------------------------

#: fast EMA: α = 1/2, depth 8 (the q_window_ewma geometry);
#: slow EMA: α = 1/4, depth 16; signal: α = 1/2 depth 8 over MACD.
_MACD_FAST = [(j, 0.5 ** (j + 1)) for j in range(8)]
_MACD_SLOW = [(j, 0.25 * 0.75 ** j) for j in range(16)]
_MACD_SIG = [(j, 0.5 ** (j + 1)) for j in range(8)]


def _stencil_sql(col: str, taps, order: str) -> str:
    return " + ".join(
        f"COALESCE(LAG({col}, {j}) OVER ({order}), 0.0) * {wgt!r}"
        for j, wgt in taps
    )


_MACD_DAILY = """
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS DOUBLE) AS r
  FROM orders GROUP BY 1
"""

_MACD_ORACLE = f"""
WITH daily AS ({_MACD_DAILY}),
m AS (
  SELECT day,
         ({_stencil_sql('r', _MACD_FAST, 'ORDER BY day')})
         - ({_stencil_sql('r', _MACD_SLOW, 'ORDER BY day')}) AS macd
  FROM daily),
sgn AS (
  SELECT day, macd,
         ({_stencil_sql('macd', _MACD_SIG, 'ORDER BY day')}) AS signal
  FROM m)
SELECT day,
       CAST(FLOOR(macd * 1000000 + 0.5) AS BIGINT) AS macd_micros,
       CAST(FLOOR(signal * 1000000 + 0.5) AS BIGINT) AS signal_micros,
       CASE WHEN macd > signal
              AND LAG(macd) OVER (ORDER BY day)
                  <= LAG(signal) OVER (ORDER BY day) THEN 1
            WHEN macd < signal
              AND LAG(macd) OVER (ORDER BY day)
                  >= LAG(signal) OVER (ORDER BY day) THEN -1
            ELSE 0 END AS crossover
FROM sgn
ORDER BY day
"""


@query("q_window_macd", oracle=_MACD_ORACLE)
def q_window_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD momentum indicator on the daily revenue series: fast EMA
    (dyadic α=½, depth 8 — the q_window_ewma geometry) minus slow EMA
    (α=¼, depth 16), a signal EMA over the MACD line, and ±1
    golden/death-cross flags where the lines cross.  Truncated-
    stencil EMAs keep the op a FIXED lag stencil (no unbounded
    recursion); every coefficient is a shared literal and every sum
    is spelled in one left-to-right expression, so both engines
    evaluate the identical IEEE sequence; results ship as floored
    integer micros (the BM25 trick) to kill representation drift.

    Scale: three stacked windows over the calendar-bounded daily
    census (~2.4k rows at any SF) — the fact scan aggregates once,
    map-side combined; the stencil is streaming-ready (a 16-value
    ring buffer per key, the q_window_ewma note)."""
    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') AS BIGINT)")
        .alias("day")
    ).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)"))
        .cast("double")
        .alias("r")
    )
    w = Window.orderBy("day")

    def _stencil(col, taps):
        expr = None
        for j, wgt in taps:
            t = F.coalesce(F.lag(col, j).over(w), F.lit(0.0)) * F.lit(wgt)
            expr = t if expr is None else expr + t
        return expr

    m = daily.select(
        "day",
        "r",
        (_stencil("r", _MACD_FAST) - _stencil("r", _MACD_SLOW)).alias("macd"),
    )
    sgn = m.select(
        "day", "macd", _stencil("macd", _MACD_SIG).alias("signal")
    )
    cross = (
        F.when(
            (F.col("macd") > F.col("signal"))
            & (F.lag("macd").over(w) <= F.lag("signal").over(w)),
            1,
        )
        .when(
            (F.col("macd") < F.col("signal"))
            & (F.lag("macd").over(w) >= F.lag("signal").over(w)),
            -1,
        )
        .otherwise(0)
    )
    return sgn.select(
        "day",
        F.floor(F.col("macd") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("macd_micros"),
        F.floor(F.col("signal") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("signal_micros"),
        cross.alias("crossover"),
    ).orderBy("day")


# ------------------------------------------------------------------
# Term burstiness: Fano factor of per-document counts
# ------------------------------------------------------------------

_FANO_MIN_FREQ = 50
_FANO_TOP = 20

_FANO_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, u.term
  FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
  WHERE u.term <> ''),
per_doc AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2),
moments AS (
  SELECT term,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS q
  FROM per_doc GROUP BY 1 HAVING SUM(c) >= {_FANO_MIN_FREQ}),
d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
SELECT term, s, q,
       CAST((1000000 * (q * d.n_docs - s * s)) // (d.n_docs * s) AS BIGINT)
         AS fano_ppm
FROM moments CROSS JOIN d
ORDER BY fano_ppm DESC, term
LIMIT {_FANO_TOP}
"""


@query("q_text_fano", oracle=_FANO_ORACLE)
def q_text_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness census: the Fano factor (variance-to-mean
    ratio) of each frequent term's per-document count, zeros included
    by algebra — Var/Mean = (Q·D − S²)/(D·S) over ALL D documents
    without materializing a zero row per absent document.  Bursty
    terms (Fano ≫ 1) are topical; Fano ≈ 1 is Poisson background —
    the dispersion signal TF-IDF misses at equal frequency.  All
    moments exact int64; the ppm ratio is exact integer floor
    division (cross-multiplied, no float anywhere).

    Scale: one (term, doc) reduce off the token explode, one term
    reduce (both map-side combined, Heaps-bounded term domain), a
    1-row doc-count broadcast, and a top-N.  The ≥{_FANO_MIN_FREQ}
    support cut prunes the singleton tail before the ranking."""
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    per_doc = tok.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    moments = (
        per_doc.groupBy("term")
        .agg(
            F.sum("c").cast("long").alias("s"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
        )
        .where(F.col("s") >= _FANO_MIN_FREQ)
    )
    n_docs = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        moments.crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "s",
            "q",
            F.expr(
                "CAST((1000000 * (q * n_docs - s * s))"
                " DIV (n_docs * s) AS BIGINT)"
            ).alias("fano_ppm"),
        )
        .orderBy(F.desc("fano_ppm"), F.asc("term"))
        .limit(_FANO_TOP)
    )


# ------------------------------------------------------------------
# Behavioral path mining: top event-type trigrams
# ------------------------------------------------------------------

_TRIGRAM_TOP = 10

_TRIGRAM_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
lagged AS (
  SELECT user_id,
         LAG(event_type, 2) OVER w AS t1,
         LAG(event_type, 1) OVER w AS t2,
         event_type AS t3
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
paths AS (
  SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n_paths,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM lagged WHERE t1 IS NOT NULL GROUP BY 1, 2, 3)
SELECT t1, t2, t3, n_paths, n_users
FROM paths
ORDER BY n_paths DESC, t1, t2, t3
LIMIT {_TRIGRAM_TOP}
"""


@query("q_events_trigrams", oracle=_TRIGRAM_ORACLE)
def q_events_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step behavioral paths (event-type trigrams along
    each user's timeline) with the user reach of each path — the
    sequence-mining census product funnels are designed from.  The
    trigram is two LAGs over the deterministic (time, event_id)
    order; counts are exact; top-N carries the full lexicographic
    tie-break.

    Scale: one (user, time) exchange shared with the rest of the
    per-user pipeline; the path census is (event-type)³-bounded (125
    cells here) and the top-N is a TakeOrderedAndProject."""
    e = T(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    lagged = e.select(
        "user_id",
        F.lag("event_type", 2).over(w).alias("t1"),
        F.lag("event_type", 1).over(w).alias("t2"),
        F.col("event_type").alias("t3"),
    ).where(F.col("t1").isNotNull())
    paths = lagged.groupBy("t1", "t2", "t3").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    return paths.orderBy(
        F.desc("n_paths"), F.asc("t1"), F.asc("t2"), F.asc("t3")
    ).limit(_TRIGRAM_TOP)


# ------------------------------------------------------------------
# Duplicate pressure per source
# ------------------------------------------------------------------

_DEDUP_RATE_ORACLE = """
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique
  FROM documents GROUP BY 1)
SELECT source, n_docs, n_unique,
       CAST(n_docs - n_unique AS BIGINT) AS n_dups,
       CAST((1000000 * (n_docs - n_unique)) // n_docs AS BIGINT)
         AS dup_ppm
FROM per ORDER BY source
"""


@query("q_dedup_rate_by_source", oracle=_DEDUP_RATE_ORACLE)
def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate pressure per source: docs, distinct texts, and the
    exact-ppm duplication rate — the curation dashboard that decides
    WHICH feed gets the dedup budget first (a 30% dup feed and a 0.1%
    dup feed should not share a pipeline stage).  Complements
    q_dedup_exact (which emits the canonical survivors) with the
    per-feed rate rollup.

    Scale: the distinct-count shuffles (source, text) — at 100 TB the
    text key is replaced by the 128-bit content hash the exact-dedup
    operator already standardizes on (operators/dedup.py), making the
    shuffle rows ~40 bytes; the rollup itself is source-domain
    bounded."""
    d = T(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("text").cast("long").alias("n_unique"),
    )
    return per.select(
        "source",
        "n_docs",
        "n_unique",
        (F.col("n_docs") - F.col("n_unique")).cast("long").alias("n_dups"),
        F.expr(
            "CAST((1000000 * (n_docs - n_unique)) DIV n_docs AS BIGINT)"
        ).alias("dup_ppm"),
    ).orderBy("source")
