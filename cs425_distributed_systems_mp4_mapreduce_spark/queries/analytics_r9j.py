"""Round-9 pack J: session quality, revenue concentration, customer
tier migration, association rules, and the variance-equality test.

* ``q_events_bounce`` — daily bounce rate: share of 30-minute
  inactivity sessions containing exactly one event (the engagement
  red flag every clickstream dashboard leads with).
* ``q_agg_pareto_coverage`` — the "how many whales" query: the
  minimum number of top customers whose revenue covers 80% of the
  total, with the 80% gate cross-multiplied into exact integers.
* ``q_customer_migration`` — order-frequency tier migration matrix
  between two fixed calendar halves (the churn/upgrade flow behind
  every lifecycle-marketing report).
* ``q_rules_association`` — top association rules (support /
  confidence / lift in exact ppm) over the same-order part baskets.
* ``q_stats_brown_forsythe`` — Brown–Forsythe variance-equality W
  across the five order priorities: the SCALE complement of
  q_stats_kruskal's location test, stage 2 over q_agg_absdev's
  |x − group median| deviations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# Daily bounce rate (single-event 30-minute sessions)
# ------------------------------------------------------------------

_SESSION_GAP_US = 1_800_000_000  # the q_events_sessionize gap

_BOUNCE_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
marked AS (
  SELECT *,
         CASE WHEN us - lag(us) OVER w > {_SESSION_GAP_US}
                OR lag(us) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
runs AS (
  SELECT *,
         CAST(SUM(new_session) OVER (PARTITION BY user_id
              ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_seq
  FROM marked),
sess AS (
  SELECT user_id, session_seq,
         MIN(us) // 86400000000 AS day,
         COUNT(*) AS n_events
  FROM runs GROUP BY 1, 2)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST((1000000 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS bounce_ppm
FROM sess GROUP BY 1 ORDER BY 1
"""


@query("q_events_bounce", oracle=_BOUNCE_ORACLE)
def q_events_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: the share of sessions (30-minute inactivity
    gap, the exact q_events_sessionize definition) that contain a
    single event, keyed by the session's start day — THE engagement
    regression signal.  Sessions come from the same two-window
    gaps-and-islands pass; the ppm share is exact integer floor
    division (microsecond day index is exact int64: epoch µs DIV
    86400e6).

    Scale: the session pass is one (user, time) exchange (sessionize
    precedent); the daily rollup is a calendar-bounded second
    exchange.  Nothing global, nothing float."""
    e = T(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts div 1000").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    new_session = F.when(
        F.lag("us").over(w).isNull()
        | (F.col("us") - F.lag("us").over(w) > _SESSION_GAP_US),
        1,
    ).otherwise(0)
    runs = e.withColumn("new_session", new_session).withColumn(
        "session_seq",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    sess = runs.groupBy("user_id", "session_seq").agg(
        F.expr("MIN(us) div 86400000000").alias("day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        sess.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_bounces"),
        )
        .select(
            "day",
            "n_sessions",
            "n_bounces",
            F.expr("CAST((1000000 * n_bounces) DIV n_sessions AS BIGINT)").alias(
                "bounce_ppm"
            ),
        )
        .orderBy("day")
    )


# ------------------------------------------------------------------
# Pareto coverage: how many top customers cover 80% of revenue
# ------------------------------------------------------------------

_PARETO_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1),
ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rk,
         SUM(cents) OVER (ORDER BY cents DESC, o_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cents) OVER () AS total,
         COUNT(*) OVER () AS n_customers
  FROM cust)
SELECT CAST(MAX(n_customers) AS BIGINT) AS n_customers,
       CAST(MAX(total) AS BIGINT) AS total_cents,
       CAST(MIN(CASE WHEN 5 * cum >= 4 * total THEN rk END) AS BIGINT)
         AS k_for_80pct,
       CAST(MIN(CASE WHEN 5 * cum >= 4 * total THEN cum END) AS BIGINT)
         AS cum_cents_at_k
FROM ranked
"""


@query("q_agg_pareto_coverage", oracle=_PARETO_ORACLE)
def q_agg_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration, asked the operator's way round: how many
    top customers does it take to cover 80% of revenue?  (q_agg_lorenz
    draws the whole curve; this extracts the planning scalar.)  The
    80% gate is the cross-multiplied integer test 5·cum ≥ 4·total —
    no ratio, no float, no boundary wobble — and the cum at k is
    reported so the claim is auditable.  Ties in customer revenue
    carry the custkey total tie-break (the q_events_rfm discipline).

    Scale: the window runs over the per-CUSTOMER census (key-domain
    bounded, ~1.5e5 keys per SF unit), not the order rows; past ~10⁷
    keys the two-pass histogram decomposition
    (q_agg_percentile_twopass) replaces the global window, exactly as
    q_agg_gini_twopass already demonstrates in-repo."""
    o = T(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    wo = Window.orderBy(F.desc("cents"), F.asc("o_custkey"))
    ranked = cust.select(
        "cents",
        F.row_number().over(wo).alias("rk"),
        F.sum("cents").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
        F.sum("cents").over(Window.partitionBy()).alias("total"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_customers"),
    )
    gate = F.when(5 * F.col("cum") >= 4 * F.col("total"), F.col("rk"))
    gate_cum = F.when(5 * F.col("cum") >= 4 * F.col("total"), F.col("cum"))
    return ranked.agg(
        F.max("n_customers").cast("long").alias("n_customers"),
        F.max("total").cast("long").alias("total_cents"),
        F.min(gate).cast("long").alias("k_for_80pct"),
        F.min(gate_cum).cast("long").alias("cum_cents_at_k"),
    )


# ------------------------------------------------------------------
# Customer order-frequency tier migration (fixed calendar halves)
# ------------------------------------------------------------------

_MIGRATION_SPLIT = "1998-01-01"  # generator's fixed 1995–2001 span midpoint


def _tier_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} = 0 THEN 0 WHEN {col} <= 2 THEN 1 ELSE 2 END"
    )


_MIGRATION_ORACLE = f"""
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '{_MIGRATION_SPLIT}'
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_h1,
         CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_MIGRATION_SPLIT}'
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_h2
  FROM orders GROUP BY 1),
tiers AS (
  SELECT {_tier_sql('n_h1')} AS tier_h1, {_tier_sql('n_h2')} AS tier_h2
  FROM per),
cells AS (
  SELECT tier_h1, tier_h2, CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM tiers GROUP BY 1, 2)
SELECT tier_h1, tier_h2, n_customers,
       CAST((1000000 * n_customers) // (SUM(n_customers) OVER ()) AS BIGINT)
         AS share_ppm
FROM cells ORDER BY tier_h1, tier_h2
"""


@query("q_customer_migration", oracle=_MIGRATION_ORACLE)
def q_customer_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer tier-migration matrix: order-frequency tier (0 =
    dormant, 1 = 1–2 orders, 2 = 3+) in the first calendar half vs
    the second — the churn/upgrade flow matrix (cell (2,0) is "lost
    whales", (0,2) is "new whales").  The split date is a fixed
    literal (the generator's span midpoint), so the query is one
    conditional-aggregation pass: no scalar subquery, no data-derived
    threshold to re-derive at scale.  Shares are exact integer ppm.

    Scale: one map-side-combined pass over orders grouped by
    customer, then a ≤9-cell matrix; the tier CASE is pure codegen."""
    o = T(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.col("o_orderdate") < F.lit(_MIGRATION_SPLIT).cast(
                "timestamp"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_h1"),
        F.sum(
            F.when(F.col("o_orderdate") >= F.lit(_MIGRATION_SPLIT).cast(
                "timestamp"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_h2"),
    )
    tiers = per.select(
        F.expr(_tier_sql("n_h1")).alias("tier_h1"),
        F.expr(_tier_sql("n_h2")).alias("tier_h2"),
    )
    cells = tiers.groupBy("tier_h1", "tier_h2").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    return cells.select(
        "tier_h1",
        "tier_h2",
        "n_customers",
        F.expr(
            "CAST((1000000 * n_customers)"
            " DIV (SUM(n_customers) OVER ()) AS BIGINT)"
        ).alias("share_ppm"),
    ).orderBy("tier_h1", "tier_h2")


# ------------------------------------------------------------------
# Association rules: support / confidence / lift over part baskets
# ------------------------------------------------------------------

_RULES_MIN_PAIR = 2
_RULES_TOPN = 50

_RULES_ORACLE = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM li),
item AS (
  SELECT pk, CAST(COUNT(*) AS BIGINT) AS cnt FROM li GROUP BY 1),
pair AS (
  SELECT a.pk AS pa, b.pk AS pb, CAST(COUNT(*) AS BIGINT) AS cnt_ab
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2 HAVING COUNT(*) >= {_RULES_MIN_PAIR})
SELECT pa, pb, cnt_ab,
       ia.cnt AS cnt_a, ib.cnt AS cnt_b,
       CAST((1000000 * cnt_ab) // n.n_orders AS BIGINT) AS support_ppm,
       CAST((1000000 * cnt_ab) // ia.cnt AS BIGINT) AS conf_a_to_b_ppm,
       CAST((1000000 * cnt_ab * n.n_orders) // (ia.cnt * ib.cnt) AS BIGINT)
         AS lift_ppm
FROM pair JOIN item ia ON pair.pa = ia.pk
          JOIN item ib ON pair.pb = ib.pk
          CROSS JOIN n
ORDER BY lift_ppm DESC, pa, pb
LIMIT {_RULES_TOPN}
"""


@query("q_rules_association", oracle=_RULES_ORACLE)
def q_rules_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 association rules a→b over same-order part
    baskets, ranked by lift: support = P(ab), confidence = P(b|a),
    lift = P(ab)/(P(a)P(b)) — all reported in EXACT integer ppm
    (floor division; lift's cross-multiplied form
    10⁶·cnt_ab·N DIV (cnt_a·cnt_b) never materializes a float).
    Pairs below 2 co-occurrences are pruned before
    the rule algebra — the standard min-support cut that keeps the
    candidate set linear in baskets.

    Scale: pair generation is bounded by basket width (≤ 7 parts per
    TPC-H order); item counts broadcast into the pair table (both
    sides key-domain bounded); the top-N is a TakeOrderedAndProject,
    never a global sort materialization.  At 2³¹+ baskets the ppm
    products approach int64 limits — the docstring remedy is the
    DECIMAL(38,0) widening, mechanical because every operand is
    already an exact integer."""
    li = (
        T(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    item = li.groupBy("pk").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    a, b = li.alias("a"), li.alias("b")
    pair = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt_ab"))
        .where(F.col("cnt_ab") >= _RULES_MIN_PAIR)
    )
    n_orders = li.agg(
        F.countDistinct("ok").cast("long").alias("n_orders")
    )
    ia = item.select(F.col("pk").alias("pa"), F.col("cnt").alias("cnt_a"))
    ib = item.select(F.col("pk").alias("pb"), F.col("cnt").alias("cnt_b"))
    out = (
        pair.join(ia, "pa")
        .join(ib, "pb")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            "cnt_ab",
            "cnt_a",
            "cnt_b",
            F.expr("CAST((1000000 * cnt_ab) DIV n_orders AS BIGINT)").alias(
                "support_ppm"
            ),
            F.expr("CAST((1000000 * cnt_ab) DIV cnt_a AS BIGINT)").alias(
                "conf_a_to_b_ppm"
            ),
            F.expr(
                "CAST((1000000 * cnt_ab * n_orders)"
                " DIV (cnt_a * cnt_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
    return out.orderBy(
        F.desc("lift_ppm"), F.asc("pa"), F.asc("pb")
    ).limit(_RULES_TOPN)


# ------------------------------------------------------------------
# Brown–Forsythe variance-equality W across the five priorities
# ------------------------------------------------------------------

_BF_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

# fixed-order five-term sum of s_g^2 / n_g, empty groups contributing 0
_BF_TERMS = "\n             + ".join(
    f"CASE WHEN n{i} = 0 THEN 0.0 ELSE"
    f" CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE) / CAST(n{i} AS DOUBLE) END"
    for i in range(1, 6)
)
_BF_K = (
    "("
    + " + ".join(f"CASE WHEN n{i} = 0 THEN 0 ELSE 1 END" for i in range(1, 6))
    + ")"
)
_BF_GROUP_SQL = ",\n".join(
    f"         CAST(SUM(CASE WHEN grp = {i} THEN z ELSE 0 END) AS BIGINT)"
    f" AS s{i},"
    f" CAST(SUM(CASE WHEN grp = {i} THEN 1 ELSE 0 END) AS BIGINT) AS n{i}"
    for i in range(1, 6)
)
_BF_GRP_CASE = (
    "CASE "
    + " ".join(
        f"WHEN o_orderpriority = '{p}' THEN {i + 1}"
        for i, p in enumerate(_BF_PRIORITIES)
    )
    + " END"
)

_BF_ORACLE = f"""
WITH o AS (
  SELECT {_BF_GRP_CASE} AS grp,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders),
census AS (
  SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS cnt FROM o GROUP BY 1, 2),
cum AS (
  SELECT grp, v, cnt,
         SUM(cnt) OVER (PARTITION BY grp ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         SUM(cnt) OVER (PARTITION BY grp) AS ng
  FROM census),
med AS (
  SELECT grp, MIN(CASE WHEN 2 * c >= ng THEN v END) AS med FROM cum
  GROUP BY 1),
z AS (
  SELECT o.grp, ABS(o.v - med.med) AS z
  FROM o JOIN med ON o.grp = med.grp),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(z) AS BIGINT) AS s,
         CAST(CAST(SUM(z * z) AS VARCHAR) AS DOUBLE) AS q,
{_BF_GROUP_SQL}
  FROM z)
SELECT n, s, q, n1, n2, n3, n4, n5, s1, s2, s3, s4, s5,
       CASE WHEN {_BF_K} < 2 OR CAST(q AS DOUBLE) - ({_BF_TERMS}) = 0.0
            THEN NULL ELSE
       ((CAST(n AS DOUBLE) - {_BF_K})
        / ({_BF_K} - 1.0))
       * (({_BF_TERMS})
          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
       / (CAST(q AS DOUBLE) - ({_BF_TERMS})) END AS w
FROM agg
"""


@query("q_stats_brown_forsythe", oracle=_BF_ORACLE)
def q_stats_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-equality test across the five order
    priorities — the SCALE complement of q_stats_kruskal's location
    test: a one-way ANOVA F on the absolute deviations from each
    group's MEDIAN (the robust Levene variant; q_agg_absdev computes
    stage 1, this completes stage 2).  Group medians are exact lower
    medians off the per-group value-domain census (smallest v with
    2·cum ≥ n_g); deviations are exact integer cents; the F-numerator
    identity Σn_g(z̄_g−z̄)² = Σs_g²/n_g − s²/N and denominator
    Q − Σs_g²/n_g keep every moment int64, and W is one fixed-order
    double expression over those integers with empty groups dropping
    out of both the terms and the group count k.

    Scale: census + one broadcast of 5 medians back onto the fact
    scan; no global window (the census ranks are per-group)."""
    o = T(spark, sf_dir, "orders").select(
        F.expr(_BF_GRP_CASE).alias("grp"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v"),
    )
    census = o.groupBy("grp", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wg = Window.partitionBy("grp").orderBy("v")
    cum = census.select(
        "grp",
        "v",
        F.sum("cnt").over(wg.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "c"
        ),
        F.sum("cnt").over(Window.partitionBy("grp")).alias("ng"),
    )
    med = cum.groupBy("grp").agg(
        F.min(F.when(2 * F.col("c") >= F.col("ng"), F.col("v"))).alias("med")
    )
    z = o.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("v") - F.col("med")).alias("z")
    )
    group_aggs = [
        x
        for i in range(1, 6)
        for x in (
            F.sum(F.when(F.col("grp") == i, F.col("z")).otherwise(0))
            .cast("long")
            .alias(f"s{i}"),
            F.sum(F.when(F.col("grp") == i, 1).otherwise(0))
            .cast("long")
            .alias(f"n{i}"),
        )
    ]
    # Σz² can pass 2⁶³ on heavy-tailed cents: exact DECIMAL sum pinned
    # to double via the string round-trip (autocorr parity discipline)
    zdec = F.col("z").cast("decimal(19,0)")
    agg = z.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").cast("long").alias("s"),
        F.sum(zdec * zdec).cast("string").cast("double").alias("q"),
        *group_aggs,
    )
    # degenerate designs (k < 2 groups, zero within-group deviation
    # spread) report NULL identically on both engines — ANSI Spark
    # raises DIVIDE_BY_ZERO where DuckDB emits inf (degenerate mini-t2)
    w_expr = (
        f"CASE WHEN {_BF_K} < 2 OR CAST(q AS DOUBLE) - ({_BF_TERMS}) = 0.0"
        " THEN NULL ELSE "
        f"((CAST(n AS DOUBLE) - {_BF_K})"
        f" / ({_BF_K} - 1.0))"
        f" * (({_BF_TERMS})"
        "   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
        f" / (CAST(q AS DOUBLE) - ({_BF_TERMS})) END"
    )
    return agg.select(
        "n", "s", "q", "n1", "n2", "n3", "n4", "n5",
        "s1", "s2", "s3", "s4", "s5",
        F.expr(w_expr).alias("w"),
    )
