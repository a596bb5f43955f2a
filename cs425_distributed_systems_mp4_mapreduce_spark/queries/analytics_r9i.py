"""Round-9 pack I: rank-association, k-sample tests, categorical
association, cohort economics, graph degree structure, band joins.

* ``q_stats_kendall`` — Kendall tau-b between daily revenue and daily
  order count: exact concordant/discordant/tie pair counts over the
  calendar-bounded daily census (O(days²) pairs is SF-independent).
* ``q_stats_kruskal`` — Kruskal-Wallis H across the five order
  priorities: the k-sample extension of q_stats_mannwhitney, on the
  same doubled-midrank value-domain census; every rank-sum moment is
  exact int64, H is one fixed-order double expression.
* ``q_stats_cramers_v`` — Cramér's V association between market
  segment and nation: χ² as an order-free SUM of per-cell integer ppm
  contributions (each cell a deterministic double→floor), zero cells
  materialized by exploding the fixed segment domain per nation.
* ``q_events_cohort_ltv`` — cohort LTV curves: users grouped by
  first-seen month, cumulative revenue by cohort age — the
  lifetime-value table behind every retention-economics dashboard.
* ``q_graph_degree_census`` — co-purchase graph degree distribution
  (distinct same-order part partners), the power-law fingerprint of
  the basket graph.
* ``q_join_band`` — band join |s_acctbal − c_acctbal| ≤ $1.00 as a
  bucketed equi-join (width-δ buckets, 3-way explode on the small
  side) instead of the quadratic theta join the oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# shared daily census (day, revenue dollars, order count)
# ------------------------------------------------------------------

_DAILY_SQL = """
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS r,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
"""


def _daily_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    return o.groupBy(
        F.expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')").alias(
            "day"
        )
    ).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("r"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )


# ------------------------------------------------------------------
# Kendall tau-b (exact pair classification on the daily census)
# ------------------------------------------------------------------

_KENDALL_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
pairs AS (
  SELECT CASE WHEN a.r > b.r THEN 1 WHEN a.r < b.r THEN -1 ELSE 0 END AS cx,
         CASE WHEN a.n_orders > b.n_orders THEN 1
              WHEN a.n_orders < b.n_orders THEN -1 ELSE 0 END AS cy
  FROM daily a JOIN daily b ON a.day < b.day),
cnt AS (
  SELECT CAST(SUM(CASE WHEN cx * cy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(SUM(CASE WHEN cx * cy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nd,
         CAST(SUM(CASE WHEN cx = 0 AND cy <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
         CAST(SUM(CASE WHEN cy = 0 AND cx <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty,
         CAST(SUM(CASE WHEN cx = 0 AND cy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS txy,
         CAST(COUNT(*) AS BIGINT) AS n0
  FROM pairs)
SELECT nc, nd, tx, ty, txy, n0,
       CAST(nc - nd AS DOUBLE)
         / SQRT(CAST(n0 - tx - txy AS DOUBLE) * CAST(n0 - ty - txy AS DOUBLE))
         AS tau_b
FROM cnt
"""


@query("q_stats_kendall", oracle=_KENDALL_ORACLE)
def q_stats_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between daily revenue and daily
    order volume — the pair-concordance complement to
    q_stats_spearman (tau's ±1 bounds survive ties via the tau-b
    denominator; Spearman's rho weighs rank GAPS, tau weighs rank
    INVERSIONS).  Every pair of distinct days is classified exactly
    once (concordant / discordant / x-tie / y-tie / both-tie) with
    integer sign algebra; tau_b is one fixed-shape double expression
    over those exact int64 counts: (nc−nd)/√((n0−tx−txy)(n0−ty−txy)).

    Scale: the self-join runs over the CALENDAR-BOUNDED daily census
    (~2.4k rows for the 7-year TPC-H span, independent of fact rows),
    so the O(days²) pair table is a few million rows at ANY scale
    factor — the fact table is touched once, map-side combined."""
    daily = _daily_spark(spark, sf_dir)
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.day") < F.col("b.day")).select(
        F.when(F.col("a.r") > F.col("b.r"), 1)
        .when(F.col("a.r") < F.col("b.r"), -1)
        .otherwise(0)
        .alias("cx"),
        F.when(F.col("a.n_orders") > F.col("b.n_orders"), 1)
        .when(F.col("a.n_orders") < F.col("b.n_orders"), -1)
        .otherwise(0)
        .alias("cy"),
    )
    cnt = pairs.agg(
        F.sum(F.when(F.col("cx") * F.col("cy") > 0, 1).otherwise(0))
        .cast("long")
        .alias("nc"),
        F.sum(F.when(F.col("cx") * F.col("cy") < 0, 1).otherwise(0))
        .cast("long")
        .alias("nd"),
        F.sum(F.when((F.col("cx") == 0) & (F.col("cy") != 0), 1).otherwise(0))
        .cast("long")
        .alias("tx"),
        F.sum(F.when((F.col("cy") == 0) & (F.col("cx") != 0), 1).otherwise(0))
        .cast("long")
        .alias("ty"),
        F.sum(F.when((F.col("cx") == 0) & (F.col("cy") == 0), 1).otherwise(0))
        .cast("long")
        .alias("txy"),
        F.count(F.lit(1)).cast("long").alias("n0"),
    )
    return cnt.select(
        "nc",
        "nd",
        "tx",
        "ty",
        "txy",
        "n0",
        F.expr(
            "CAST(nc - nd AS DOUBLE)"
            " / SQRT(CAST(n0 - tx - txy AS DOUBLE)"
            "        * CAST(n0 - ty - txy AS DOUBLE))"
        ).alias("tau_b"),
    )


# ------------------------------------------------------------------
# Kruskal-Wallis H across the five order priorities
# ------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

_KW_GROUP_SQL = ",\n".join(
    f"         CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END)"
    f" AS BIGINT) AS a{i + 1}"
    for i, p in enumerate(_PRIORITIES)
)
_KW_S_SQL = ",\n".join(
    f"         CAST(SUM(a{i + 1} * (2 * s_lt + t + 1)) AS BIGINT) AS s{i + 1},"
    f" CAST(SUM(a{i + 1}) AS BIGINT) AS n{i + 1}"
    for i in range(5)
)

# an absent group contributes 0 to ΣRᵢ²/nᵢ (the empty-group convention
# that keeps tiny fixtures finite on BOTH engines — the KMV n≥k lesson)
_KW_TERMS = "\n             + ".join(
    f"CASE WHEN n{i} = 0 THEN 0.0 ELSE"
    f" CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE) / CAST(n{i} AS DOUBLE) END"
    for i in range(1, 6)
)

_KW_ORACLE = f"""
WITH v AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
{_KW_GROUP_SQL},
         CAST(COUNT(*) AS BIGINT) AS t
  FROM orders GROUP BY 1),
r AS (
  SELECT *, COALESCE(SUM(t) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_lt
  FROM v),
agg AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS VARCHAR)
              AS DOUBLE) AS tie_t,
         CAST(MAX(t) AS BIGINT) AS t_max,
{_KW_S_SQL}
  FROM r)
SELECT n, tie_t, n1, n2, n3, n4, n5, s1, s2, s3, s4, s5,
       CASE WHEN n < 2 OR t_max = n THEN NULL ELSE
       (3.0 * ({_KW_TERMS})
          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
        - 3.0 * (CAST(n AS DOUBLE) + 1.0))
       / (1.0 - tie_t
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
              - CAST(n AS DOUBLE))) END AS h
FROM agg
"""


@query("q_stats_kruskal", oracle=_KW_ORACLE)
def q_stats_kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test: do the five order priorities draw their
    prices from one distribution?  The k-sample extension of
    q_stats_mannwhitney, on the same machinery: ranks come from the
    VALUE-DOMAIN census (one row per distinct price cents), doubled
    midranks 2·s_lt + t + 1 keep every rank-sum moment exact int64
    (sᵢ = doubled rank sum of group i, so 12·ΣRᵢ²/nᵢ = 3·Σsᵢ²/nᵢ),
    and the tie term Σ(t³−t) is summed exactly on the census.  H is
    ONE fixed-order five-term double expression over those integers —
    bit-identical across engines because the summation order is
    pinned in the expression tree, never left to an aggregate.

    int64 bounds (round-10 overflow audit): the tie term is CUBIC in
    the hottest census multiplicity — t³ passes 2⁶³ once one price
    value holds > 2.1e6 rows — so Σ(t³−t) is summed in
    DECIMAL(38,0) / HUGEINT and string-pinned to double (exact
    < 2⁵³, identically rounded beyond on both engines; the >2M-row
    regression fixture in tests/test_overflow_census.py crashes the
    plain-int64 form under ANSI).  The doubled rank sums sᵢ ≤
    n·(2n+1) stay exact int64 to n ≈ 2.1e9 rows.

    Scale: the census is value-domain-bounded (price cents), the fact
    scan is touched once with map-side combine; the rank window runs
    over the census, not the rows — the q_stats_ks_drift discipline."""
    o = T(spark, sf_dir, "orders")
    group_cols = [
        F.sum(F.when(F.col("o_orderpriority") == p, 1).otherwise(0))
        .cast("long")
        .alias(f"a{i + 1}")
        for i, p in enumerate(_PRIORITIES)
    ]
    v = o.select(
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v"),
        "o_orderpriority",
    ).groupBy("v").agg(*group_cols, F.count(F.lit(1)).cast("long").alias("t"))
    w = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = v.withColumn("s_lt", F.coalesce(F.sum("t").over(w), F.lit(0)))
    agg = r.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * t * t - t"))
        .cast("string")
        .cast("double")
        .alias("tie_t"),
        F.max("t").cast("long").alias("t_max"),
        *[
            x
            for i in range(5)
            for x in (
                F.sum(
                    F.col(f"a{i + 1}")
                    * (2 * F.col("s_lt") + F.col("t") + 1)
                )
                .cast("long")
                .alias(f"s{i + 1}"),
                F.sum(f"a{i + 1}").cast("long").alias(f"n{i + 1}"),
            )
        ],
    )
    # n < 2 (tie-correction denominator n³−n = 0) and the all-one-tie
    # pool (correction factor = 0) report NULL identically on both
    # engines — ANSI Spark raises DIVIDE_BY_ZERO where DuckDB emits inf.
    # The all-tied guard is t_max = n (single census row), NOT
    # tie_t = n³−n: the integer n³ overflows int64 past ~2M rows under
    # ANSI — found by the 100× wall probe, fixed round 9.
    h_expr = (
        "CASE WHEN n < 2 OR t_max = n THEN NULL ELSE "
        f"(3.0 * ({_KW_TERMS})"
        "   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))"
        " - 3.0 * (CAST(n AS DOUBLE) + 1.0))"
        " / (1.0 - tie_t"
        "     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        "        - CAST(n AS DOUBLE))) END"
    )
    return agg.select(
        "n", "tie_t", "n1", "n2", "n3", "n4", "n5",
        "s1", "s2", "s3", "s4", "s5",
        F.expr(h_expr).alias("h"),
    )


# ------------------------------------------------------------------
# Cramér's V: market segment × nation association
# ------------------------------------------------------------------

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_SEG_ARRAY_SQL = ", ".join(f"'{s}'" for s in _SEGMENTS)

_CRAMER_ORACLE = f"""
WITH cell AS (
  SELECT c_nationkey AS nat, c_mktsegment AS seg,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM customer GROUP BY 1, 2),
domain AS (
  SELECT nat, seg
  FROM (SELECT DISTINCT c_nationkey AS nat FROM customer),
       UNNEST([{_SEG_ARRAY_SQL}]) AS u(seg)),
full_cells AS (
  SELECT d.nat, d.seg, COALESCE(cell.o, 0) AS o
  FROM domain d LEFT JOIN cell ON d.nat = cell.nat AND d.seg = cell.seg),
tot AS (
  SELECT f.nat, f.seg, f.o,
         SUM(f.o) OVER (PARTITION BY f.nat) AS row_tot,
         SUM(f.o) OVER (PARTITION BY f.seg) AS col_tot,
         SUM(f.o) OVER () AS n
  FROM full_cells f),
chi AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT nat) AS BIGINT) AS n_nat,
         CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_seg,
         CAST(SUM(CASE WHEN row_tot = 0 OR col_tot = 0 THEN 0
           ELSE CAST(FLOOR(
             1000000.0
             * CAST(n * o - row_tot * col_tot AS DOUBLE)
             * CAST(n * o - row_tot * col_tot AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(row_tot AS DOUBLE)
                * CAST(col_tot AS DOUBLE))) AS BIGINT) END) AS BIGINT)
           AS chi2_ppm
  FROM tot)
SELECT n, n_nat, n_seg, chi2_ppm,
       SQRT(CAST(chi2_ppm AS DOUBLE) / 1000000.0
            / (CAST(n AS DOUBLE) * 4.0)) AS cramers_v
FROM chi
"""


@query("q_stats_cramers_v", oracle=_CRAMER_ORACLE)
def q_stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between market segment and nation — the
    categorical×categorical dependence monitor (χ² normalized to
    [0,1] by N·min(r−1, c−1), here df factor 4).  The χ² total is an
    ORDER-FREE exact int64 sum: each cell contributes the DEFINED ppm
    quantity ⌊10⁶·(N·o − rᵢ·cⱼ)²/(N·rᵢ·cⱼ)⌋ where the delta is exact
    int64 (≤ N² ≈ 2.25e12 at sf1000, double-exact below 2⁵³) and the
    double divide + floor is one deterministic IEEE expression per
    cell — so the SUM commutes and both engines agree bit-for-bit,
    sidestepping the float-sum-order trap entirely.  Zero cells
    (segment absent in a nation) contribute rᵢcⱼ/N·10⁶ and are
    materialized by exploding the FIXED 5-segment domain per observed
    nation — no cross join enters the plan.

    Scale: one (nation, segment) census off the customer scan
    (map-side combined), then ≤ 125-cell window algebra."""
    c = T(spark, sf_dir, "customer")
    cell = c.groupBy(
        F.col("c_nationkey").alias("nat"), F.col("c_mktsegment").alias("seg")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    domain = (
        c.select(F.col("c_nationkey").alias("nat"))
        .distinct()
        .select(
            "nat",
            F.explode(F.array(*[F.lit(s) for s in _SEGMENTS])).alias("seg"),
        )
    )
    full_cells = domain.join(cell, ["nat", "seg"], "left").select(
        "nat", "seg", F.coalesce(F.col("o"), F.lit(0)).alias("o")
    )
    tot = full_cells.select(
        "nat",
        "seg",
        "o",
        F.sum("o").over(Window.partitionBy("nat")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("seg")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    chi = tot.agg(
        F.max("n").cast("long").alias("n"),
        F.countDistinct("nat").cast("long").alias("n_nat"),
        F.countDistinct("seg").cast("long").alias("n_seg"),
        F.sum(
            F.expr(
                "CASE WHEN row_tot = 0 OR col_tot = 0 THEN 0"
                " ELSE CAST(FLOOR(1000000.0"
                " * CAST(n * o - row_tot * col_tot AS DOUBLE)"
                " * CAST(n * o - row_tot * col_tot AS DOUBLE)"
                " / (CAST(n AS DOUBLE) * CAST(row_tot AS DOUBLE)"
                "    * CAST(col_tot AS DOUBLE))) AS BIGINT) END"
            )
        )
        .cast("long")
        .alias("chi2_ppm"),
    )
    return chi.select(
        "n",
        "n_nat",
        "n_seg",
        "chi2_ppm",
        F.expr(
            "SQRT(CAST(chi2_ppm AS DOUBLE) / 1000000.0"
            " / (CAST(n AS DOUBLE) * 4.0))"
        ).alias("cramers_v"),
    )


# ------------------------------------------------------------------
# Cohort LTV curves (first-seen month × cohort age)
# ------------------------------------------------------------------

_LTV_ORACLE = """
WITH ev AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
cohort AS (
  SELECT user_id, MIN(d) AS cohort_d FROM ev GROUP BY 1),
cells AS (
  SELECT c.cohort_d, ev.d - c.cohort_d AS age,
         CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_users,
         CAST(SUM(ev.cents) AS BIGINT) AS rev_cents
  FROM ev JOIN cohort c ON ev.user_id = c.user_id
  GROUP BY 1, 2)
SELECT cohort_d, age, n_users, rev_cents,
       CAST(SUM(rev_cents) OVER (PARTITION BY cohort_d ORDER BY age
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_rev_cents
FROM cells
ORDER BY cohort_d, age
"""


@query("q_events_cohort_ltv", oracle=_LTV_ORACLE)
def q_events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users bucketed by first-seen
    day, revenue accumulated by cohort age in days — the LTV table
    that prices acquisition spend (read row (c, a) as "a days in, the
    day-c cohort has produced Σ cents").  Revenue is exact integer
    cents (the FLOOR(x·100+0.5) house discipline), the cumulative sum
    runs inside each cohort's ≤ calendar-days partition.

    Scale: one shuffle on user_id for the first-seen reduction, one
    broadcast-sized (cohort, age) cell grid (days² / 2 rows,
    calendar-bounded), cumulation windows over ≤ days rows each —
    the fact table never sees a global sort."""
    e = T(spark, sf_dir, "events")
    ev = e.select(
        "user_id",
        F.expr("CAST(datediff(CAST(event_ts AS DATE), DATE'1970-01-01') AS BIGINT)")
        .alias("d"),
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("d").alias("cohort_d"))
    cells = (
        ev.join(cohort, "user_id")
        .groupBy("cohort_d", (F.col("d") - F.col("cohort_d")).alias("age"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
    )
    w = (
        Window.partitionBy("cohort_d")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.withColumn(
            "cum_rev_cents", F.sum("rev_cents").over(w).cast("long")
        )
        .orderBy("cohort_d", "age")
    )


# ------------------------------------------------------------------
# Co-purchase graph degree census
# ------------------------------------------------------------------

_DEGREE_ORACLE = """
WITH li AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
edges AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT u AS node, v FROM edges
        UNION ALL SELECT v AS node, u FROM edges)
  GROUP BY 1),
hist AS (
  SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_parts FROM deg GROUP BY 1)
SELECT degree, n_parts,
       CAST((1000000 * n_parts) // (SUM(n_parts) OVER ()) AS BIGINT)
         AS share_ppm
FROM hist
ORDER BY degree
"""


@query("q_graph_degree_census", oracle=_DEGREE_ORACLE)
def q_graph_degree_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph (parts are nodes;
    an edge joins two parts bought in the same order) — the power-law
    fingerprint that tells you whether a skew-aware join strategy is
    needed downstream (a heavy-tailed degree census is the canonical
    precursor to salting hub nodes).  Edges are deduplicated
    globally, each node's degree counts DISTINCT partners, and the
    ppm share uses exact integer floor division.

    Scale: the pair generator is bounded by order width (≤ 7 parts
    per TPC-H order ⇒ ≤ 21 pairs), so edges grow linearly in orders;
    degree + histogram are two key-domain-bounded exchanges.  The
    floor-div uses explicit FLOOR on nonneg ints, identical across
    engines."""
    li = (
        T(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    hist = deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )
    return hist.select(
        "degree",
        "n_parts",
        F.expr(
            "CAST((1000000 * n_parts) DIV (SUM(n_parts) OVER ()) AS BIGINT)"
        ).alias("share_ppm"),
    ).orderBy("degree")


# ------------------------------------------------------------------
# Band join: |s_acctbal − c_acctbal| ≤ $1.00 via width-δ buckets
# ------------------------------------------------------------------

_BAND_CENTS = 100  # δ = $1.00

_BAND_ORACLE = f"""
WITH s AS (
  SELECT s_suppkey, s_nationkey,
         CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) AS sc
  FROM supplier),
c AS (
  SELECT c_custkey,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cc
  FROM customer),
m AS (
  SELECT s.s_nationkey, s.s_suppkey, ABS(s.sc - c.cc) AS d
  FROM s JOIN c ON ABS(s.sc - c.cc) <= {_BAND_CENTS})
SELECT s_nationkey AS nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
       CAST(SUM(d) AS BIGINT) AS sum_absdiff_cents
FROM m GROUP BY 1 ORDER BY 1
"""


@query("q_join_band", oracle=_BAND_ORACLE)
def q_join_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join: pair every supplier with every customer whose
    account balance is within $1.00, grouped per supplier nation —
    the numeric-proximity join (record blocking, price matching,
    sensor alignment) that naive engines run as a quadratic theta
    join.  Here the join is an EQUI-join on width-δ buckets
    ⌊cents/δ⌋: a true match differs by ≤ δ so its buckets differ by
    ≤ 1, and exploding the 100-row supplier side into its 3 adjacent
    buckets makes bucket equality a complete candidate filter; the
    exact |diff| ≤ δ predicate then prunes the bucket collisions.
    The oracle runs the quadratic formulation — identical result.

    Scale: candidates = matches + same-bucket near-misses (expected
    3·N·M·δ/range instead of N·M); the bucket key shuffles both
    sides once and Catalyst picks SMJ/broadcast by size.  FLOOR on a
    double quotient (not integer DIV) keeps negative balances on the
    same bucket grid in both engines."""
    s = T(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        F.expr("CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT)").alias("sc"),
    )
    c = T(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr("CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)").alias("cc"),
    )
    sb = s.select(
        "s_suppkey",
        "s_nationkey",
        "sc",
        F.explode(
            F.array(F.lit(-1), F.lit(0), F.lit(1))
        ).alias("off"),
    ).select(
        "s_suppkey",
        "s_nationkey",
        "sc",
        (
            F.expr(f"CAST(FLOOR(sc / {_BAND_CENTS}.0) AS BIGINT)")
            + F.col("off")
        ).alias("bucket"),
    )
    cb = c.select(
        "cc",
        F.expr(f"CAST(FLOOR(cc / {_BAND_CENTS}.0) AS BIGINT)").alias("bucket"),
    )
    m = sb.join(cb, "bucket").where(
        F.abs(F.col("sc") - F.col("cc")) <= _BAND_CENTS
    )
    return (
        m.groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("s_suppkey").cast("long").alias("n_suppliers"),
            F.sum(F.abs(F.col("sc") - F.col("cc"))).cast("long").alias(
                "sum_absdiff_cents"
            ),
        )
        .orderBy("nationkey")
    )
