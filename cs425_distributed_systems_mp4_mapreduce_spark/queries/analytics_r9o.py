"""Round-9 pack O: the classical statistical-test family, completed.

Six tests that round out the k-sample/effect-size machinery of packs
I/K (Kruskal-Wallis, ANOVA, Cohen's d, Brown-Forsythe) with their
remaining canonical siblings — every one on the exact-integer-moment
discipline (cents/micros int64 sums, fixed-order double expressions,
value-domain censuses for rank statistics), so each is fully DuckDB
hash-oracled:

* ``q_stats_welch_t`` — Welch's unequal-variance t between two
  return-flag populations, with the Welch-Satterthwaite df.
* ``q_stats_jarque_bera`` — the JB normality statistic from exact
  int64 raw moments (quantities ≤ 50 keep Σv⁴ far inside int64).
* ``q_stats_wilcoxon_signed`` — paired signed-rank over per-user
  early/late spend, doubled midranks on the |d| value census, tie-
  corrected normal approximation.
* ``q_stats_mood_median`` — k-sample median test: the grand median
  is marked on the value census WITHOUT a scalar cross (the census
  window total yields the rank threshold per-row).
* ``q_stats_cochran_q`` — k=3 paired binary treatments (event types
  per user); Q is an exact integer rational.
* ``q_stats_ljung_box`` — portmanteau autocorrelation test over the
  gap-filled daily count series; every lag's ρ̂ numerator is an exact
  int64, the per-lag term is floored to micros, and the running Q is
  an exact integer cumulative sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# Welch's t-test: R vs A return flags on extended price
# ------------------------------------------------------------------

_WT_A, _WT_B = "R", "A"

#: fixed-order double expressions shared verbatim by both engines;
#: q1/q2 are DECIMAL sums string-pinned to double (the q_stats_anova
#: / q_timeseries_autocorr parity discipline for Σv² past 2⁶³).
_WT_VAR1 = (
    "(CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
    " / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)"
)
_WT_VAR2 = (
    "(CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)"
    " / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)"
)
_WT_SE2 = (
    f"(({_WT_VAR1}) / CAST(n1 AS DOUBLE)"
    f" + ({_WT_VAR2}) / CAST(n2 AS DOUBLE))"
)
_WT_T = (
    "CASE WHEN n1 < 2 OR n2 < 2 OR " + _WT_SE2 + " <= 0.0 THEN NULL ELSE "
    "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    f" / SQRT({_WT_SE2}) END"
)
_WT_DF = (
    "CASE WHEN n1 < 2 OR n2 < 2 OR " + _WT_SE2 + " <= 0.0 THEN NULL ELSE "
    f"({_WT_SE2}) * ({_WT_SE2}) / "
    f"((({_WT_VAR1}) / CAST(n1 AS DOUBLE)) * (({_WT_VAR1}) / CAST(n1 AS DOUBLE))"
    " / (CAST(n1 AS DOUBLE) - 1.0)"
    f" + (({_WT_VAR2}) / CAST(n2 AS DOUBLE)) * (({_WT_VAR2}) / CAST(n2 AS DOUBLE))"
    " / (CAST(n2 AS DOUBLE) - 1.0)) END"
)

_WELCH_ORACLE = f"""
WITH li AS (
  SELECT l_returnflag AS g,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
  FROM lineitem WHERE l_returnflag IN ('{_WT_A}', '{_WT_B}')),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN g = '{_WT_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN g = '{_WT_A}' THEN v ELSE 0 END) AS BIGINT) AS s1,
    CAST(CAST(SUM(CASE WHEN g = '{_WT_A}' THEN v * v ELSE 0 END)
         AS VARCHAR) AS DOUBLE) AS q1,
    CAST(SUM(CASE WHEN g = '{_WT_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(SUM(CASE WHEN g = '{_WT_B}' THEN v ELSE 0 END) AS BIGINT) AS s2,
    CAST(CAST(SUM(CASE WHEN g = '{_WT_B}' THEN v * v ELSE 0 END)
         AS VARCHAR) AS DOUBLE) AS q2
  FROM li)
SELECT n1, s1, q1, n2, s2, q2,
       {_WT_T} AS t_stat,
       {_WT_DF} AS df_welch
FROM agg
"""


@query("q_stats_welch_t", oracle=_WELCH_ORACLE)
def q_stats_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t between the R and A
    return-flag populations on price cents, plus the Welch-
    Satterthwaite effective df — the default two-sample test when
    equal variances can't be assumed (q_stats_cohens_d reports the
    effect size for the same contrast; this reports the test).  All
    five moments are exact integers (Σv² as a DECIMAL sum pinned to
    double via the string round-trip); t and df are single fixed-
    order double expressions over them, so both engines agree
    bit-for-bit.  Degenerate designs (a group smaller than 2, or
    zero pooled standard error) report NULL identically on both
    engines.

    Scale: one map-side-combined aggregation over the fact scan —
    the same 1-row shape as q_stats_anova."""
    li = T(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin(_WT_A, _WT_B)
    )
    v = F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)")
    li = li.select(F.col("l_returnflag").alias("g"), v.alias("v"))
    dec = F.col("v").cast("decimal(19,0)")
    zero = F.lit(0).cast("decimal(38,0)")
    agg = li.agg(
        F.sum(F.when(F.col("g") == _WT_A, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("g") == _WT_A, F.col("v")).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("g") == _WT_A, dec * dec).otherwise(zero))
        .cast("string")
        .cast("double")
        .alias("q1"),
        F.sum(F.when(F.col("g") == _WT_B, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("g") == _WT_B, F.col("v")).otherwise(0))
        .cast("long")
        .alias("s2"),
        F.sum(F.when(F.col("g") == _WT_B, dec * dec).otherwise(zero))
        .cast("string")
        .cast("double")
        .alias("q2"),
    )
    return agg.select(
        "n1",
        "s1",
        "q1",
        "n2",
        "s2",
        "q2",
        F.expr(_WT_T).alias("t_stat"),
        F.expr(_WT_DF).alias("df_welch"),
    )


# ------------------------------------------------------------------
# Jarque-Bera normality statistic on order quantities
# ------------------------------------------------------------------

#: central moments from raw moments, then skew / kurtosis / JB — one
#: pinned-order expression tree.  m2^1.5 is written m2·√m2 (never
#: POWER(x, 1.5): pow is not IEEE-correctly-rounded and may differ
#: across libm implementations; SQRT is exactly rounded everywhere).
_JB_MEAN = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
_JB_M2 = f"(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - {_JB_MEAN} * {_JB_MEAN})"
_JB_M3 = (
    f"(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 3.0 * {_JB_MEAN} * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
    f" + 2.0 * {_JB_MEAN} * {_JB_MEAN} * {_JB_MEAN})"
)
_JB_M4 = (
    f"(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 4.0 * {_JB_MEAN} * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))"
    f" + 6.0 * {_JB_MEAN} * {_JB_MEAN}"
    f" * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
    f" - 3.0 * {_JB_MEAN} * {_JB_MEAN} * {_JB_MEAN} * {_JB_MEAN})"
)
_JB_SKEW = f"({_JB_M3} / ({_JB_M2} * SQRT({_JB_M2})))"
_JB_KURT = f"({_JB_M4} / ({_JB_M2} * {_JB_M2}))"
_JB_GUARD = f"CASE WHEN n < 2 OR {_JB_M2} <= 0.0 THEN NULL ELSE "
_JB_STAT = (
    _JB_GUARD + "CAST(n AS DOUBLE) / 6.0 * "
    f"({_JB_SKEW} * {_JB_SKEW}"
    f" + ({_JB_KURT} - 3.0) * ({_JB_KURT} - 3.0) / 4.0) END"
)

_JB_ORACLE = f"""
WITH q AS (
  SELECT CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS v FROM lineitem),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s1,
         CAST(SUM(v * v) AS BIGINT) AS s2,
         CAST(SUM(v * v * v) AS BIGINT) AS s3,
         CAST(SUM(v * v * v * v) AS BIGINT) AS s4
  FROM q)
SELECT n, s1, s2, s3, s4,
       {_JB_GUARD}{_JB_SKEW} END AS skewness,
       {_JB_GUARD}{_JB_KURT} END AS kurtosis,
       {_JB_STAT} AS jb_stat
FROM agg
"""


@query("q_stats_jarque_bera", oracle=_JB_ORACLE)
def q_stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality statistic (with its skewness and raw
    kurtosis inputs) over order quantities: JB = n/6·(S² + (K−3)²/4).
    Quantities are integers ≤ 50, so all four raw power sums are
    exact int64 (Σv⁴ ≤ 6.25e6·n — inside int64 to ~1.4e12 rows); the
    central-moment/skew/kurtosis ladder is one pinned-order double
    expression, with m2^1.5 spelled m2·√m2 because POWER is not
    correctly-rounded across libms while SQRT is.  Degenerate inputs
    (n < 2 or zero variance) report NULL identically.

    Scale: one map-side-combined aggregation; for value domains where
    Σv⁴ exceeds int64, the DECIMAL string-pin (q_stats_welch_t's q1)
    is the drop-in remedy."""
    li = T(spark, sf_dir, "lineitem").select(
        F.expr("CAST(FLOOR(l_quantity + 0.5) AS BIGINT)").alias("v")
    )
    agg = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(F.expr("v * v")).cast("long").alias("s2"),
        F.sum(F.expr("v * v * v")).cast("long").alias("s3"),
        F.sum(F.expr("v * v * v * v")).cast("long").alias("s4"),
    )
    return agg.select(
        "n",
        "s1",
        "s2",
        "s3",
        "s4",
        F.expr(_JB_GUARD + _JB_SKEW + " END").alias("skewness"),
        F.expr(_JB_GUARD + _JB_KURT + " END").alias("kurtosis"),
        F.expr(_JB_STAT).alias("jb_stat"),
    )


# ------------------------------------------------------------------
# Wilcoxon signed-rank: per-user early-vs-late month-half spend
# ------------------------------------------------------------------

_WX_Z = (
    "CASE WHEN n_pairs = 0 THEN NULL ELSE "
    "(CAST(wd AS DOUBLE) / 2.0"
    " - CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0) / 4.0)"
    " / SQRT(CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0)"
    "        * (2.0 * CAST(n_pairs AS DOUBLE) + 1.0) / 24.0"
    "        - tie_cubes / 48.0) END"
)

_WILCOXON_ORACLE = f"""
WITH pairs AS (
  SELECT user_id,
         SUM(CASE WHEN day(ts) <= 15
             THEN CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)
             ELSE 0 END) AS a,
         SUM(CASE WHEN day(ts) > 15
             THEN CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)
             ELSE 0 END) AS b
  FROM events GROUP BY user_id),
d AS (
  SELECT b - a AS d, ABS(b - a) AS ad FROM pairs WHERE b - a <> 0),
census AS (
  SELECT ad, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM d GROUP BY ad),
ranked AS (
  SELECT cnt, pos,
         2 * COALESCE(SUM(cnt) OVER (ORDER BY ad
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + cnt + 1 AS dr
  FROM census),
agg AS (
  SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_pairs,
         CAST(COALESCE(SUM(pos * dr), 0) AS BIGINT) AS wd,
         CAST(CAST(COALESCE(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt),
                            0) AS VARCHAR) AS DOUBLE)
           AS tie_cubes
  FROM ranked)
SELECT n_pairs, wd, tie_cubes, {_WX_Z} AS z_stat FROM agg
"""


@query("q_stats_wilcoxon_signed", oracle=_WILCOXON_ORACLE)
def q_stats_wilcoxon_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on paired per-user spend: each user's
    event-value total (exact micros) in the first month-half (day ≤
    15) vs the second; zero differences drop per the classical
    procedure.  Ranks of |d| come from the VALUE-DOMAIN census with
    doubled midranks (2·below + ties + 1 — the q_stats_kruskal /
    q_stats_mannwhitney machinery), so W⁺ (doubled) is exact int64
    (wd ≤ n(2n+1): safe to n ≈ 2.1e9 users); the tie correction
    Σ(t³−t) is CUBIC in the hottest |d| multiplicity (t³ passes 2⁶³
    past 2.1e6 users tied on one |d|), so it is summed in
    DECIMAL(38,0) / HUGEINT and string-pinned to double (round-10
    overflow audit; >2M-census regression in
    tests/test_overflow_census.py).  The tie-corrected normal z is
    ONE fixed-order double expression over them.  n = 0 (no
    nonzero differences) reports NULL identically on both engines.

    Scale: the pair table is one (user) aggregation of the fact scan;
    the rank window runs over the |d| census, never the user table —
    and σ² > 0 whenever n ≥ 1, so no variance guard is needed."""
    ev = T(spark, sf_dir, "events")
    micros = F.expr("CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)")
    pairs = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.dayofmonth("event_ts") <= 15, micros).otherwise(0)
        ).alias("a"),
        F.sum(
            F.when(F.dayofmonth("event_ts") > 15, micros).otherwise(0)
        ).alias("b"),
    )
    d = pairs.select(
        (F.col("b") - F.col("a")).alias("d"),
        F.abs(F.col("b") - F.col("a")).alias("ad"),
    ).where(F.col("d") != 0)
    census = d.groupBy("ad").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("long")
        .alias("pos"),
    )
    w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    ranked = census.select(
        "cnt",
        "pos",
        (
            2 * F.coalesce(F.sum("cnt").over(w), F.lit(0))
            + F.col("cnt")
            + 1
        ).alias("dr"),
    )
    agg = ranked.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_pairs"),
        F.coalesce(F.sum(F.col("pos") * F.col("dr")), F.lit(0))
        .cast("long")
        .alias("wd"),
        F.coalesce(
            F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")),
            F.lit(0).cast("decimal(38,0)"),
        )
        .cast("string")
        .cast("double")
        .alias("tie_cubes"),
    )
    return agg.select(
        "n_pairs", "wd", "tie_cubes", F.expr(_WX_Z).alias("z_stat")
    )


# ------------------------------------------------------------------
# Mood's median test across the five order priorities
# ------------------------------------------------------------------

_MM_PRIORITIES = [
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
]
_MM_GRP = (
    "CASE "
    + " ".join(
        f"WHEN o_orderpriority = '{p}' THEN {i + 1}"
        for i, p in enumerate(_MM_PRIORITIES)
    )
    + " END"
)
_MM_CENSUS_COLS = ",\n         ".join(
    f"CAST(SUM(CASE WHEN grp = {i} THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
    for i in range(1, 6)
)
_MM_AGG_COLS = ",\n         ".join(
    f"CAST(SUM(c{i}) AS BIGINT) AS n{i},"
    f" CAST(SUM(CASE WHEN is_le = 1 THEN c{i} ELSE 0 END) AS BIGINT) AS a{i}"
    for i in range(1, 6)
)
_MM_A = "(a1 + a2 + a3 + a4 + a5)"
_MM_N = "(n1 + n2 + n3 + n4 + n5)"
#: χ² over the 2×5 table, unrolled in pinned order; empty groups
#: contribute 0 (their expected counts are 0 too).
_MM_CHI_TERMS = "\n         + ".join(
    f"CASE WHEN n{i} = 0 THEN 0.0 ELSE "
    f"(CAST(a{i} AS DOUBLE) - CAST(n{i} AS DOUBLE) * CAST({_MM_A} AS DOUBLE)"
    f" / CAST({_MM_N} AS DOUBLE))"
    f" * (CAST(a{i} AS DOUBLE) - CAST(n{i} AS DOUBLE) * CAST({_MM_A} AS DOUBLE)"
    f" / CAST({_MM_N} AS DOUBLE))"
    f" / (CAST(n{i} AS DOUBLE) * CAST({_MM_A} AS DOUBLE) / CAST({_MM_N} AS DOUBLE))"
    f" + (CAST(n{i} AS DOUBLE) - CAST(a{i} AS DOUBLE)"
    f" - CAST(n{i} AS DOUBLE) * CAST({_MM_N} - {_MM_A} AS DOUBLE)"
    f" / CAST({_MM_N} AS DOUBLE))"
    f" * (CAST(n{i} AS DOUBLE) - CAST(a{i} AS DOUBLE)"
    f" - CAST(n{i} AS DOUBLE) * CAST({_MM_N} - {_MM_A} AS DOUBLE)"
    f" / CAST({_MM_N} AS DOUBLE))"
    f" / (CAST(n{i} AS DOUBLE) * CAST({_MM_N} - {_MM_A} AS DOUBLE)"
    f" / CAST({_MM_N} AS DOUBLE)) END"
    for i in range(1, 6)
)
_MM_CHI = (
    f"CASE WHEN {_MM_A} = 0 OR {_MM_N} - {_MM_A} = 0 THEN NULL ELSE "
    f"{_MM_CHI_TERMS} END"
)

_MOOD_ORACLE = f"""
WITH o AS (
  SELECT {_MM_GRP} AS grp,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders),
census AS (
  SELECT v,
         {_MM_CENSUS_COLS},
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM o WHERE grp IS NOT NULL GROUP BY v),
marked AS (
  SELECT *,
         CASE WHEN COALESCE(SUM(cnt) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              < (SUM(cnt) OVER () + 2) // 2
              THEN 1 ELSE 0 END AS is_le,
         CASE WHEN COALESCE(SUM(cnt) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt
              >= (SUM(cnt) OVER () + 2) // 2
              AND COALESCE(SUM(cnt) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              < (SUM(cnt) OVER () + 2) // 2
              THEN v END AS med_marker
  FROM census),
agg AS (
  SELECT {_MM_AGG_COLS},
         CAST(MAX(med_marker) AS BIGINT) AS median_cents
  FROM marked)
SELECT n1, a1, n2, a2, n3, a3, n4, a4, n5, a5, median_cents,
       {_MM_CHI} AS chisq
FROM agg
"""


@query("q_stats_mood_median", oracle=_MOOD_ORACLE)
def q_stats_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across the five order priorities: counts
    above/at-or-below the grand median per group, and the 2×5 χ²
    statistic.  The grand median (the rank-⌈(N+1)/2⌉ order statistic)
    is marked ON the value census itself — a row is ≤ median iff its
    preceding cumulative count is under the rank threshold, which the
    census window total yields per-row — so unlike q_stats_runs there
    is NO scalar cross anywhere.  Counts are exact int64; χ² is one
    unrolled pinned-order double expression over the ten cells, with
    empty groups contributing zero and a degenerate guard (all mass
    on one side) reporting NULL identically.

    Scale: the census is value-domain-bounded (price cents); the fact
    table is touched once by the census aggregation."""
    o = T(spark, sf_dir, "orders").select(
        F.expr(_MM_GRP).alias("grp"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v"),
    )
    census = (
        o.where(F.col("grp").isNotNull())
        .groupBy("v")
        .agg(
            *[
                F.sum(F.when(F.col("grp") == i, 1).otherwise(0))
                .cast("long")
                .alias(f"c{i}")
                for i in range(1, 6)
            ],
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
    )
    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    wt = Window.partitionBy()
    cumb = F.coalesce(F.sum("cnt").over(wb), F.lit(0))
    thr = F.expr("(total + 2) DIV 2")
    marked = census.withColumn("total", F.sum("cnt").over(wt)).select(
        *[f"c{i}" for i in range(1, 6)],
        "cnt",
        "v",
        F.when(cumb < thr, 1).otherwise(0).alias("is_le"),
        F.when((cumb + F.col("cnt") >= thr) & (cumb < thr), F.col("v")).alias(
            "med_marker"
        ),
    )
    agg = marked.agg(
        *[
            x
            for i in range(1, 6)
            for x in (
                F.sum(f"c{i}").cast("long").alias(f"n{i}"),
                F.sum(
                    F.when(F.col("is_le") == 1, F.col(f"c{i}")).otherwise(0)
                )
                .cast("long")
                .alias(f"a{i}"),
            )
        ],
        F.max("med_marker").cast("long").alias("median_cents"),
    )
    return agg.select(
        "n1",
        "a1",
        "n2",
        "a2",
        "n3",
        "a3",
        "n4",
        "a4",
        "n5",
        "a5",
        "median_cents",
        F.expr(_MM_CHI).alias("chisq"),
    )


# ------------------------------------------------------------------
# Cochran's Q over three paired binary treatments (event types)
# ------------------------------------------------------------------

_CQ_TYPES = ["click", "view", "purchase"]
_CQ_K = len(_CQ_TYPES)
_CQ_X_COLS = ",\n         ".join(
    f"MAX(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS x{j + 1}"
    for j, t in enumerate(_CQ_TYPES)
)
_CQ_T_SQ = " + ".join(f"t{j + 1} * t{j + 1}" for j in range(_CQ_K))
_CQ_T_SUM = " + ".join(f"t{j + 1}" for j in range(_CQ_K))
_CQ_NUM = (
    f"({_CQ_K} - 1) * ({_CQ_K} * ({_CQ_T_SQ})"
    f" - ({_CQ_T_SUM}) * ({_CQ_T_SUM}))"
)
_CQ_DEN = f"({_CQ_K} * sr - sr2)"

_COCHRAN_ORACLE = f"""
WITH x AS (
  SELECT user_id,
         {_CQ_X_COLS}
  FROM events WHERE event_type IN ({", ".join(f"'{t}'" for t in _CQ_TYPES)})
  GROUP BY user_id),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         {", ".join(f"CAST(SUM(x{j + 1}) AS BIGINT) AS t{j + 1}" for j in range(_CQ_K))},
         CAST(SUM(x1 + x2 + x3) AS BIGINT) AS sr,
         CAST(SUM((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT) AS sr2
  FROM x)
SELECT n_users, t1, t2, t3,
       CAST({_CQ_NUM} AS BIGINT) AS q_num,
       CAST({_CQ_DEN} AS BIGINT) AS q_den,
       CASE WHEN {_CQ_DEN} = 0 THEN NULL
            ELSE CAST({_CQ_NUM} AS DOUBLE) / CAST({_CQ_DEN} AS DOUBLE) END
         AS q_stat
FROM agg
"""


@query("q_stats_cochran_q", oracle=_COCHRAN_ORACLE)
def q_stats_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over k=3 paired binary treatments: did each user
    ever click / view / purchase?  Q = (k−1)(kΣTⱼ² − (ΣTⱼ)²) /
    (kΣRᵢ − ΣRᵢ²) is an exact integer rational (numerator ≥ 0 by
    Cauchy-Schwarz, denominator ≥ 0 since x² = x for binaries), so
    the verdict ships as exact (num, den) int64 plus the double
    ratio; a zero denominator (every user all-0 or all-k) reports
    NULL identically on both engines.

    Scale: one (user, 3-bit) aggregation then one 1-row combine —
    both map-side-combined; int64 holds to ~3e8 users (Tⱼ² bound),
    past which the DECIMAL string-pin is the drop-in remedy."""
    ev = T(spark, sf_dir, "events").where(F.col("event_type").isin(_CQ_TYPES))
    x = ev.groupBy("user_id").agg(
        *[
            F.max(
                F.when(F.col("event_type") == t, 1).otherwise(0)
            ).alias(f"x{j + 1}")
            for j, t in enumerate(_CQ_TYPES)
        ]
    )
    agg = x.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        *[
            F.sum(f"x{j + 1}").cast("long").alias(f"t{j + 1}")
            for j in range(_CQ_K)
        ],
        F.sum(F.expr("x1 + x2 + x3")).cast("long").alias("sr"),
        F.sum(F.expr("(x1 + x2 + x3) * (x1 + x2 + x3)"))
        .cast("long")
        .alias("sr2"),
    )
    return agg.select(
        "n_users",
        "t1",
        "t2",
        "t3",
        F.expr(f"CAST({_CQ_NUM} AS BIGINT)").alias("q_num"),
        F.expr(f"CAST({_CQ_DEN} AS BIGINT)").alias("q_den"),
        F.expr(
            f"CASE WHEN {_CQ_DEN} = 0 THEN NULL"
            f" ELSE CAST({_CQ_NUM} AS DOUBLE) / CAST({_CQ_DEN} AS DOUBLE) END"
        ).alias("q_stat"),
    )


# ------------------------------------------------------------------
# Ljung-Box portmanteau test on the daily event-count series
# ------------------------------------------------------------------

_LB_MAX_LAG = 7
_LB_US_PER_DAY = 86_400_000_000

#: per-row algebra shared verbatim by both engines.  a_num is the
#: ρ̂ numerator scaled by n² (exact int64): n²·Σxₜxₜ₋ₖ − n·s·(head +
#: tail) + (n−k)·s²; den = n·(n·Σx² − s²).
_LB_RHO = (
    "CASE WHEN n <= lag OR n * s2 - s * s = 0 THEN NULL ELSE "
    "CAST(a_num AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * CAST(n * s2 - s * s AS DOUBLE)) END"
)
_LB_TERM = (
    "CASE WHEN n <= lag OR n * s2 - s * s = 0 THEN NULL ELSE "
    "CAST(FLOOR(1000000.0 * CAST(n AS DOUBLE)"
    " * (CAST(n AS DOUBLE) + 2.0) / (CAST(n AS DOUBLE) - CAST(lag AS DOUBLE))"
    f" * ({_LB_RHO}) * ({_LB_RHO}) + 0.5) AS BIGINT) END"
)

_LB_AGG_COLS = ",\n         ".join(
    f"CAST(SUM(x * l{k}) AS BIGINT) AS sxx{k},"
    f" CAST(SUM(CASE WHEN l{k} IS NOT NULL THEN l{k} ELSE 0 END) AS BIGINT)"
    f" AS hd{k},"
    f" CAST(SUM(CASE WHEN l{k} IS NOT NULL THEN x ELSE 0 END) AS BIGINT)"
    f" AS tl{k}"
    for k in range(1, _LB_MAX_LAG + 1)
)
_LB_LAG_COLS = ",\n         ".join(
    f"LAG(x, {k}) OVER (ORDER BY di) AS l{k}"
    for k in range(1, _LB_MAX_LAG + 1)
)
_LB_GRID_CASE = {
    col: "CASE "
    + " ".join(
        f"WHEN lag = {k} THEN {col}{k}" for k in range(1, _LB_MAX_LAG + 1)
    )
    + " END"
    for col in ("sxx", "hd", "tl")
}

_LJUNG_ORACLE = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {_LB_US_PER_DAY} AS di,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1),
b AS (SELECT MIN(di) AS lo, MAX(di) AS hi FROM daily),
spine AS (SELECT UNNEST(generate_series(lo, hi)) AS di FROM b),
series AS (
  SELECT s.di, COALESCE(d.cnt, 0) AS x
  FROM spine s LEFT JOIN daily d ON s.di = d.di),
lagged AS (
  SELECT x,
         {_LB_LAG_COLS}
  FROM series),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(x * x) AS BIGINT) AS s2,
         {_LB_AGG_COLS}
  FROM lagged),
grid AS (SELECT UNNEST(range(1, {_LB_MAX_LAG + 1})) AS lag),
rows_ AS (
  SELECT CAST(g.lag AS BIGINT) AS lag, a.n, a.s, a.s2,
         {_LB_GRID_CASE["sxx"]} AS sxx,
         {_LB_GRID_CASE["hd"]} AS hd,
         {_LB_GRID_CASE["tl"]} AS tl
  FROM grid g CROSS JOIN agg a),
terms AS (
  SELECT lag, n, s, s2,
         CAST(n * n * sxx - n * s * (hd + tl) + (n - lag) * s * s
              AS BIGINT) AS a_num
  FROM rows_),
final AS (
  SELECT lag, n, a_num,
         {_LB_RHO} AS rho,
         {_LB_TERM} AS term_micros
  FROM terms)
SELECT lag, n, a_num, rho, term_micros,
       CAST(SUM(term_micros) OVER (ORDER BY lag
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS q_micros
FROM final ORDER BY lag
"""


@query("q_stats_ljung_box", oracle=_LJUNG_ORACLE)
def q_stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau autocorrelation test over the gap-filled
    daily event-count series, lags 1..7: for each lag the exact-int64
    ρ̂ numerator A_k = n²Σxₜxₜ₋ₖ − n·s·(head+tail) + (n−k)s² (the
    q_timeseries_autocorr centering algebra, generalized to every
    lag), ρ̂ₖ as one pinned double division, the per-lag LB term
    floored to micros, and the running Q statistic as an EXACT
    integer cumulative sum of those micro-terms — so the 7-row
    trajectory hash-matches bit-for-bit.  Lags ≥ n and zero-variance
    series report NULL terms on both engines; the running SUM window
    SKIPS those NULLs identically, so for 1 < n ≤ 7 the rows at
    lag ≥ n carry forward the partial Q of the valid lags (Q is NULL
    only when EVERY term is NULL, e.g. a zero-variance series).

    Scale: the series is CALENDAR-bounded (one row per day whatever
    the SF), so the spine join, the 7 lag windows, and the 7-row
    grid are all SF-independent; the fact table is touched once by
    the daily census.  Daily counts keep n²Σxx inside int64 to ~3e8
    events/day; past that the DECIMAL string-pin applies."""
    ev = T(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr(f"(ts div 1000) div {_LB_US_PER_DAY}").alias("di")
        )
        .groupBy("di")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    spine = daily.agg(
        F.min("di").alias("lo"), F.max("di").alias("hi")
    ).select(F.explode(F.expr("sequence(lo, hi)")).alias("di"))
    series = (
        spine.join(daily, "di", "left")
        .select("di", F.coalesce(F.col("cnt"), F.lit(0)).alias("x"))
    )
    lag_cols = [
        F.lag("x", k).over(Window.orderBy("di")).alias(f"l{k}")
        for k in range(1, _LB_MAX_LAG + 1)
    ]
    lagged = series.select("x", *lag_cols)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.expr("x * x")).cast("long").alias("s2"),
    ]
    for k in range(1, _LB_MAX_LAG + 1):
        aggs += [
            F.sum(F.expr(f"x * l{k}")).cast("long").alias(f"sxx{k}"),
            F.sum(F.expr(f"CASE WHEN l{k} IS NOT NULL THEN l{k} ELSE 0 END"))
            .cast("long")
            .alias(f"hd{k}"),
            F.sum(F.expr(f"CASE WHEN l{k} IS NOT NULL THEN x ELSE 0 END"))
            .cast("long")
            .alias(f"tl{k}"),
        ]
    agg = lagged.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({k} AS BIGINT), sxx{k}, hd{k}, tl{k}"
        for k in range(1, _LB_MAX_LAG + 1)
    )
    rows = agg.selectExpr(
        "n",
        "s",
        "s2",
        f"stack({_LB_MAX_LAG}, {stack_args}) AS (lag, sxx, hd, tl)",
    )
    terms = rows.select(
        "lag",
        "n",
        F.expr(
            "CAST(n * n * sxx - n * s * (hd + tl) + (n - lag) * s * s"
            " AS BIGINT)"
        ).alias("a_num"),
        "s",
        "s2",
    )
    final = terms.select(
        "lag",
        "n",
        "a_num",
        F.expr(_LB_RHO).alias("rho"),
        F.expr(_LB_TERM).alias("term_micros"),
    )
    wq = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    return final.select(
        "lag",
        "n",
        "a_num",
        "rho",
        "term_micros",
        F.sum("term_micros").over(wq).cast("long").alias("q_micros"),
    ).orderBy("lag")
