"""Round-9 pack T: the last three canonical members of the
classical-test family.

* ``q_stats_cvm`` — two-sample Cramér-von Mises via integer
  cross-multiplied ECDFs on the value census (the q_stats_ks_drift
  machinery, integrating the squared gap instead of taking its max).
* ``q_stats_grubbs`` — the Grubbs outlier statistic from exact
  moments and an exact integer max-deviation.
* ``q_stats_friedman`` — the within-block rank test (blocks = users,
  treatments = event types) with doubled midranks so every rank sum
  and the tie-corrected statistic pivot on exact int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# Two-sample Cramér-von Mises (R vs A return flags)
# ------------------------------------------------------------------

_CVM_A, _CVM_B = "R", "A"

#: T = Σ_points (a+b)·(CA·m − CB·n)² / (n·m·(n+m)²); the numerator is
#: an exact DECIMAL sum (string-pinned — (CA·m−CB·n)² alone passes
#: 2⁶³ beyond ~60k rows/side), the denominator a pinned double
#: product.
_CVM_T = (
    "CASE WHEN n = 0 OR m = 0 THEN NULL ELSE "
    "CAST(num AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)"
    "    * CAST(n + m AS DOUBLE) * CAST(n + m AS DOUBLE)) END"
)

_CVM_ORACLE = f"""
WITH li AS (
  SELECT l_returnflag AS g,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
  FROM lineitem WHERE l_returnflag IN ('{_CVM_A}', '{_CVM_B}')),
census AS (
  SELECT v,
         CAST(SUM(CASE WHEN g = '{_CVM_A}' THEN 1 ELSE 0 END) AS BIGINT)
           AS a,
         CAST(SUM(CASE WHEN g = '{_CVM_B}' THEN 1 ELSE 0 END) AS BIGINT)
           AS b
  FROM li GROUP BY v),
cum AS (
  SELECT a, b,
         SUM(a) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         SUM(b) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
         SUM(a) OVER () AS n,
         SUM(b) OVER () AS m
  FROM census),
agg AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(m) AS BIGINT) AS m,
         CAST(CAST(SUM(CAST(a + b AS HUGEINT)
              * CAST(ca * m - cb * n AS HUGEINT)
              * CAST(ca * m - cb * n AS HUGEINT)) AS VARCHAR)
              AS DOUBLE) AS num
  FROM cum)
SELECT n, m, num, {_CVM_T} AS cvm_t
FROM agg
"""


@query("q_stats_cvm", oracle=_CVM_ORACLE)
def q_stats_cvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises statistic between the R and A
    return-flag price populations: where q_stats_ks_drift takes the
    MAX of the integer cross-multiplied ECDF gap, CvM integrates its
    SQUARE over every sample point — more power against distributed
    (non-localized) distributional drift.  Per census row the gap
    (CA·m − CB·n) is exact int64; the point-weighted squared sum is
    an exact DECIMAL pinned to double via the string round-trip; T is
    one pinned-order double division.  An empty side reports NULL.
    int64/decimal bounds (round-10 overflow audit): the inner
    products CA·m ≤ n·m stay int64 to n ≈ m ≈ 3e9; the DECIMAL(38)
    sum Σ(a+b)·gap² is bounded by (n+m)·(n·m)² — exact to ~2.3e7
    rows per side in the adversarial fully-separated case (real
    overlapping distributions go much further; the >2M-census
    regression in tests/test_overflow_census.py exercises 2.2e6 per
    side), past which the remedy is normalizing the gap to ppm
    before squaring — a double formulation, stated rather than
    silently applied.

    Scale: the ECDF window runs over the VALUE-DOMAIN census (the KS
    discipline — never the row count); the fact table is touched once
    by the census aggregation."""
    li = T(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin(_CVM_A, _CVM_B)
    )
    census = li.select(
        F.col("l_returnflag").alias("g"),
        F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").alias(
            "v"
        ),
    ).groupBy("v").agg(
        F.sum(F.when(F.col("g") == _CVM_A, 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("g") == _CVM_B, 1).otherwise(0))
        .cast("long")
        .alias("b"),
    )
    wrun = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = census.select(
        "a",
        "b",
        F.sum("a").over(wrun).alias("ca"),
        F.sum("b").over(wrun).alias("cb"),
        F.sum("a").over(wall).alias("n"),
        F.sum("b").over(wall).alias("m"),
    )
    # Spark side: gap² first as a capped DECIMAL(38,0) (values fit, so
    # the precision cap never truncates), then the point weight — the
    # oracle mirrors with HUGEINT (int128); both string-pin to double
    agg = cum.agg(
        F.max("n").cast("long").alias("n"),
        F.max("m").cast("long").alias("m"),
        F.sum(
            F.expr(
                "CAST(a + b AS DECIMAL(19,0))"
                " * (CAST(ca * m - cb * n AS DECIMAL(19,0))"
                "    * CAST(ca * m - cb * n AS DECIMAL(19,0)))"
            )
        )
        .cast("string")
        .cast("double")
        .alias("num"),
    )
    return agg.select("n", "m", "num", F.expr(_CVM_T).alias("cvm_t"))


# ------------------------------------------------------------------
# Grubbs outlier statistic on order totals
# ------------------------------------------------------------------

#: G = (maxdev/n) / sd with sd² = (q − s²/n)/(n−1); maxdev = max|x·n − s|
#: is exact int64 (cents·rows ≤ 2⁶³ to ~1.5e11 row-cents products).
_GR_SD = (
    "SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
    " / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))"
)
_GR_G = (
    f"CASE WHEN n < 2 OR {_GR_SD} = 0.0 THEN NULL ELSE "
    f"(CAST(maxdev AS DOUBLE) / CAST(n AS DOUBLE)) / {_GR_SD} END"
)

_GRUBBS_ORACLE = f"""
WITH o AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v FROM orders),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s,
         CAST(CAST(SUM(CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0)))
              AS VARCHAR) AS DOUBLE) AS q
  FROM o),
dev AS (
  SELECT CAST(MAX(ABS(o.v * m.n - m.s)) AS BIGINT) AS maxdev
  FROM o CROSS JOIN mom m),
agg AS (SELECT m.n, m.s, m.q, d.maxdev FROM mom m CROSS JOIN dev d)
SELECT n, s, q, maxdev, {_GR_G} AS g_stat
FROM agg
"""


@query("q_stats_grubbs", oracle=_GRUBBS_ORACLE)
def q_stats_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs outlier statistic over order totals: G = max|x − x̄|/s,
    pivoted on exact integers — the deviation is computed as
    max|x·n − s| (one integer per row, no float mean anywhere) and
    only the final division is floating point, in pinned order.
    Degenerate inputs (n < 2 or zero variance) report NULL
    identically.  Complements q_outliers_mad: Grubbs is the
    parametric single-outlier test, MAD the robust mass screen.

    Scale: one moment aggregation + one max-deviation pass over the
    same scan (the 1-row moment scalar crossed in — the
    q_window_drawdown centering pattern)."""
    o = T(spark, sf_dir, "orders").select(
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v")
    )
    dec = F.col("v").cast("decimal(19,0)")
    mom = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(dec * dec).cast("string").cast("double").alias("q"),
    )
    dev = (
        o.crossJoin(F.broadcast(mom.select("n", "s")))
        .agg(
            F.max(F.expr("ABS(v * n - s)")).cast("long").alias("maxdev")
        )
    )
    agg = mom.crossJoin(dev)
    return agg.select("n", "s", "q", "maxdev", F.expr(_GR_G).alias("g_stat"))


# ------------------------------------------------------------------
# Friedman test (blocks = users, treatments = 3 event types)
# ------------------------------------------------------------------

_FR_TYPES = ["click", "view", "purchase"]
_FR_K = len(_FR_TYPES)


def _fr_rank(j: int) -> str:
    """Doubled midrank of x{j} among (x1, x2, x3): 2·(#less) +
    (#ties incl self) + 1 — unrolled comparisons, exact int64."""
    others = [i for i in range(1, _FR_K + 1) if i != j]
    less = " + ".join(
        f"CASE WHEN x{i} < x{j} THEN 1 ELSE 0 END" for i in others
    )
    ties = " + ".join(
        f"CASE WHEN x{i} = x{j} THEN 1 ELSE 0 END" for i in others
    )
    return f"(2 * ({less}) + ({ties}) + 2)"


_FR_X_COLS = ",\n         ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS x{j + 1}"
    for j, t in enumerate(_FR_TYPES)
)
#: doubled ranks: Σdr per treatment, Σdr² per cell; with k=3 the
#: tie-corrected Friedman statistic over doubled quantities is
#: (k−1)·Σ(R'_j − n(k+1))² / (A' − n·k·(k+1)²).
_FR_NUM = (
    f"({_FR_K} - 1) * ("
    + " + ".join(
        f"(r{j} - n_users * {_FR_K + 1}) * (r{j} - n_users * {_FR_K + 1})"
        for j in range(1, _FR_K + 1)
    )
    + ")"
)
_FR_DEN = f"(a2 - n_users * {_FR_K} * {(_FR_K + 1) ** 2})"

_FRIEDMAN_ORACLE = f"""
WITH x AS (
  SELECT user_id,
         {_FR_X_COLS}
  FROM events GROUP BY user_id),
rk AS (
  SELECT {", ".join(f"{_fr_rank(j)} AS dr{j}" for j in range(1, _FR_K + 1))}
  FROM x),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         {", ".join(f"CAST(SUM(dr{j}) AS BIGINT) AS r{j}" for j in range(1, _FR_K + 1))},
         CAST(SUM({" + ".join(f"dr{j} * dr{j}" for j in range(1, _FR_K + 1))})
              AS BIGINT) AS a2
  FROM rk)
SELECT n_users, r1, r2, r3, a2,
       CAST({_FR_NUM} AS BIGINT) AS f_num,
       CAST({_FR_DEN} AS BIGINT) AS f_den,
       CASE WHEN {_FR_DEN} = 0 THEN NULL
            ELSE CAST({_FR_NUM} AS DOUBLE) / CAST({_FR_DEN} AS DOUBLE) END
         AS friedman_stat
FROM agg
"""


@query("q_stats_friedman", oracle=_FRIEDMAN_ORACLE)
def q_stats_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman within-block rank test: does each user (block) rank
    the three event types (treatments) by activity the same way?
    Ranks are DOUBLED midranks computed by unrolled pairwise
    comparisons inside each block (k = 3 → two comparisons per cell,
    pure codegen CASE arithmetic — no window, no sort), so the rank
    sums R'_j, the squared-rank total A', and the tie-corrected
    statistic (k−1)·Σ(R'_j − n(k+1))²/(A' − nk(k+1)²) pivot on exact
    int64; the final division ships as exact (num, den) plus the
    double.  Fully-tied data (every user equal counts on all three)
    zeroes the denominator and reports NULL identically.

    int64 bounds (round-10 overflow audit): per-block doubled ranks
    are ≤ 2k = 6, so A' ≤ 36n and the rank sums R'_j ≤ 6n are linear
    in block count; the only QUADRATIC term is the 1-row pivot
    f_num = (k−1)·Σ(R'_j − 4n)² ≤ 24n² — exact int64 to n ≈ 6.2e8
    blocks (tests/test_overflow_census.py pins the >2M-block case),
    past which the remedy is DECIMAL(38,0)/HUGEINT widening of the
    two pivot columns — mechanical, since every operand is already a
    1-row integer.

    Scale: one (user, 3-count) aggregation then one 1-row combine —
    both map-side-combined, the q_stats_cochran_q shape with ranks
    instead of indicators."""
    ev = T(spark, sf_dir, "events")
    x = ev.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"x{j + 1}")
            for j, t in enumerate(_FR_TYPES)
        ]
    )
    rk = x.select(
        *[
            F.expr(_fr_rank(j)).alias(f"dr{j}")
            for j in range(1, _FR_K + 1)
        ]
    )
    agg = rk.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        *[
            F.sum(f"dr{j}").cast("long").alias(f"r{j}")
            for j in range(1, _FR_K + 1)
        ],
        F.sum(
            F.expr(" + ".join(f"dr{j} * dr{j}" for j in range(1, _FR_K + 1)))
        )
        .cast("long")
        .alias("a2"),
    )
    return agg.select(
        "n_users",
        "r1",
        "r2",
        "r3",
        "a2",
        F.expr(f"CAST({_FR_NUM} AS BIGINT)").alias("f_num"),
        F.expr(f"CAST({_FR_DEN} AS BIGINT)").alias("f_den"),
        F.expr(
            f"CASE WHEN {_FR_DEN} = 0 THEN NULL"
            f" ELSE CAST({_FR_NUM} AS DOUBLE) / CAST({_FR_DEN} AS DOUBLE) END"
        ).alias("friedman_stat"),
    )
