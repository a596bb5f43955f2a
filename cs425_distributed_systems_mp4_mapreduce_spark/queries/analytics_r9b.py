"""Round-9 pack B: concentration / robustness / dominance statistics.

Six new fully-oracled analytics families over the TPC-H-ish tables:

* ``q_window_drawdown`` — per-customer maximum drawdown of the
  cumulative revenue trajectory (the risk statistic a spend-anomaly
  monitor tracks), two stacked partitioned windows on one exchange —
  the q_window_cusum discipline applied to running-max instead of
  running-min.
* ``q_agg_lorenz`` — the Lorenz curve behind q_agg_gini: cumulative
  revenue share at each customer decile, with the decile derived from
  :func:`analytics_r9.twopass_rank` + closed-form ntile — so the curve
  is scale-safe by construction (no global window anywhere).
* ``q_stats_benford`` — first-significant-digit profile of order
  totals vs the Benford expectation (the classic fabricated-data /
  corruption probe).  The digit comes from the DECIMAL STRING of the
  integer cents — no log10, no libm, bit-identical cross-engine; the
  Benford expectations are pinned integer-ppm literals on both sides.
* ``q_stats_simpson`` — Simpson diversity index of each source's
  language mix, exact rational Σnᵢ(nᵢ−1)/(N(N−1)) as attested int64
  numerator/denominator plus the one int→double division.
* ``q_agg_time_weighted`` — per-user TIME-WEIGHTED average purchase
  value (the feature-store aggregate for irregular time series):
  Σ value·Δt / ΣΔt with Δt from LEAD on the per-user ordered stream,
  in integer cents × ms so every sum is exact int64.
* ``q_skyline_pareto`` — the 2-D skyline (Pareto frontier) of parts
  minimizing retail price while maximizing size: the classic
  dominance query, computed by the sort-order sweep (keep a row iff
  its size exceeds the running max over all strictly-cheaper rows)
  which is provably the skyline for 2 monotone dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T
from .analytics_r9 import _ntile_expr, twopass_rank

_CENTS = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"


# ------------------------------------------------------------------
# Maximum drawdown (per-customer cumulative-revenue risk statistic)
# ------------------------------------------------------------------

_DRAWDOWN_ORACLE = f"""
WITH m AS (
  SELECT CAST(SUM({_CENTS}) // COUNT(*) AS BIGINT) AS mean_cents
  FROM orders),
p AS (
  SELECT o_custkey, o_orderdate AS od, o_orderkey,
         {_CENTS} - m.mean_cents AS dev
  FROM orders, m),
r AS (
  SELECT o_custkey, od, o_orderkey,
         CAST(SUM(dev) OVER w AS BIGINT) AS cum
  FROM p
  WINDOW w AS (PARTITION BY o_custkey ORDER BY od, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
d AS (
  SELECT o_custkey,
         CAST(MAX(cum) OVER w AS BIGINT) - cum AS dd
  FROM r
  WINDOW w AS (PARTITION BY o_custkey ORDER BY od, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT o_custkey,
       CAST(MAX(dd) AS BIGINT) AS max_drawdown_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM d GROUP BY o_custkey
HAVING MAX(dd) > 0
ORDER BY max_drawdown_cents DESC, o_custkey
LIMIT 100
"""


@query("q_window_drawdown", oracle=_DRAWDOWN_ORACLE)
def q_window_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per customer: dd_i = max_{j≤i}(cum_j) − cum_i
    over the (date, orderkey)-ordered CENTERED spend trajectory (each
    order contributes cents − corpus mean as SUM DIV COUNT —
    raw positive totals would make cum monotone and every drawdown
    zero); the statistic is the deepest below-own-peak run, i.e. the
    longest relative losing streak vs the corpus baseline.  Top-100
    customers by depth, wholly in integer cents.

    Scale: a 1-row mean scalar broadcast, then two stacked windows on
    one (custkey, time) exchange — the q_window_cusum shape with
    running-MAX; the top-100 is TakeOrderedAndProject."""
    o = T(spark, sf_dir, "orders")
    # integer mean (SUM DIV COUNT): double AVG is summation-order
    # dependent across engines and FLOOR could land on a boundary
    m = o.agg(
        F.expr(f"CAST(SUM({_CENTS}) DIV COUNT(*) AS BIGINT)").alias(
            "mean_cents"
        )
    )
    p = o.crossJoin(F.broadcast(m)).select(
        "o_custkey",
        F.col("o_orderdate").alias("od"),
        "o_orderkey",
        (F.expr(_CENTS) - F.col("mean_cents")).alias("dev"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("od", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = p.withColumn("cum", F.sum("dev").over(w).cast("long"))
    d = r.withColumn("dd", F.max("cum").over(w).cast("long") - F.col("cum"))
    return (
        d.groupBy("o_custkey")
        .agg(
            F.max("dd").cast("long").alias("max_drawdown_cents"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
        .where(F.col("max_drawdown_cents") > 0)
        .orderBy(F.desc("max_drawdown_cents"), "o_custkey")
        .limit(100)
    )


# ------------------------------------------------------------------
# Lorenz curve (cumulative revenue share by customer decile)
# ------------------------------------------------------------------

_LORENZ_ORACLE = f"""
WITH per_cust AS (
  SELECT o_custkey, CAST(SUM({_CENTS}) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT cents, ntile(10) OVER (ORDER BY cents, o_custkey) AS decile
  FROM per_cust),
d AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_cust,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM ranked GROUP BY decile),
t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM d)
SELECT d.decile, d.n_cust, d.cents,
       CAST(CAST(SUM(d.cents) OVER (ORDER BY d.decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            * 1000000 // t.total AS BIGINT) AS cum_share_ppm
FROM d, t ORDER BY d.decile
"""


@query("q_agg_lorenz", oracle=_LORENZ_ORACLE)
def q_agg_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve — the concentration picture behind q_agg_gini
    ("the bottom 10% of customers hold x ppm of revenue"): customers
    decile-binned by total spend (total tie-break), cumulative revenue
    share per decile in integer ppm.

    Scale: the decile comes from twopass_rank + closed-form ntile
    (oracle: the naive global ntile — hash-equality IS the
    decomposition proof, the q_agg_gini_twopass discipline); the
    cumulative share window runs over the 10-row decile census."""
    o = T(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.expr(_CENTS)).cast("long").alias("cents")
    )
    ranked = twopass_rank(per_cust, "cents", "o_custkey", 65536, "rk")
    n1 = per_cust.agg(F.count(F.lit(1)).cast("long").alias("n"))
    d = (
        ranked.crossJoin(F.broadcast(n1))
        .withColumn("decile", F.expr(_ntile_expr("rk", "n", 10)))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    t = d.agg(F.sum("cents").cast("long").alias("total"))
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        d.crossJoin(F.broadcast(t))
        .withColumn("cum", F.sum("cents").over(wc).cast("long"))
        .select(
            "decile",
            "n_cust",
            "cents",
            F.expr("cum * 1000000 DIV total").alias("cum_share_ppm"),
        )
        .orderBy("decile")
    )


# ------------------------------------------------------------------
# Benford first-digit profile (data-quality / fabrication probe)
# ------------------------------------------------------------------

#: floor(log10(1 + 1/d) * 1e6) for d = 1..9 — pinned integer literals
#: (computed once offline; both engines compare against the SAME ints)
_BENFORD_PPM = [301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757]

_BENFORD_CASE_SQL = "CASE d " + " ".join(
    f"WHEN {i + 1} THEN {v}" for i, v in enumerate(_BENFORD_PPM)
) + " END"

_BENFORD_ORACLE = f"""
WITH c AS (
  SELECT CAST(SUBSTR(CAST({_CENTS} AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM orders WHERE o_totalprice > 0),
f AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY d),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM f)
SELECT f.d AS digit, f.n,
       CAST(f.n * 1000000 // t.total AS BIGINT) AS observed_ppm,
       CAST({_BENFORD_CASE_SQL} AS BIGINT) AS benford_ppm,
       CAST(f.n * 1000000 // t.total AS BIGINT)
         - CAST({_BENFORD_CASE_SQL} AS BIGINT) AS delta_ppm
FROM f, t ORDER BY digit
"""


@query("q_stats_benford", oracle=_BENFORD_ORACLE)
def q_stats_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of order totals — the
    data-quality probe that catches fabricated or truncated numeric
    columns before they poison a training mix.  The first significant
    digit is the first character of the integer-cents DECIMAL STRING
    (identical on both engines — no log10, no libm); expectations are
    the pinned integer-ppm literals ⌊log10(1+1/d)·10⁶⌋.

    Scale: one map-side-combined 9-group census + a 1-row total."""
    o = T(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    f = (
        o.select(
            F.expr(f"CAST(SUBSTR(CAST({_CENTS} AS STRING), 1, 1) AS BIGINT)").alias(
                "d"
            )
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    t = f.agg(F.sum("n").cast("long").alias("total"))
    return (
        f.crossJoin(F.broadcast(t))
        .select(
            F.col("d").alias("digit"),
            "n",
            F.expr("n * 1000000 DIV total").alias("observed_ppm"),
            F.expr(f"CAST({_BENFORD_CASE_SQL} AS BIGINT)").alias("benford_ppm"),
            (
                F.expr("n * 1000000 DIV total")
                - F.expr(f"CAST({_BENFORD_CASE_SQL} AS BIGINT)")
            ).alias("delta_ppm"),
        )
        .orderBy("digit")
    )


# ------------------------------------------------------------------
# Simpson diversity (language mix per source)
# ------------------------------------------------------------------

_SIMPSON_ORACLE = """
WITH f AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY source, lang),
s AS (
  SELECT source,
         CAST(SUM(n) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_langs,
         CAST(SUM(n * (n - 1)) AS BIGINT) AS num
  FROM f GROUP BY source)
SELECT source, n_docs, n_langs, num,
       CAST(n_docs * (n_docs - 1) AS BIGINT) AS den,
       1.0 - CAST(num AS DOUBLE) / (n_docs * (n_docs - 1)) AS simpson
FROM s WHERE n_docs > 1 ORDER BY source
"""


@query("q_stats_simpson", oracle=_SIMPSON_ORACLE)
def q_stats_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity index of each source's language mix — the
    mixture-health statistic (probability two random docs from a
    source differ in language), D = 1 − Σnᵢ(nᵢ−1)/(N(N−1)).  Unlike
    Shannon entropy this needs NO logarithm: the index is an exact
    rational, so the int64 numerator and denominator are
    hash-attested and the single division is bit-deterministic.

    Scale: two nested map-side-combined aggs; output is one row per
    source."""
    d = T(spark, sf_dir, "documents")
    f = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    s = f.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.sum(F.col("n") * (F.col("n") - 1)).cast("long").alias("num"),
    )
    return (
        s.where(F.col("n_docs") > 1)
        .select(
            "source",
            "n_docs",
            "n_langs",
            "num",
            (F.col("n_docs") * (F.col("n_docs") - 1))
            .cast("long")
            .alias("den"),
            (
                F.lit(1.0)
                - F.col("num").cast("double")
                / (F.col("n_docs") * (F.col("n_docs") - 1))
            ).alias("simpson"),
        )
        .orderBy("source")
    )


# ------------------------------------------------------------------
# Time-weighted average (irregular-series feature aggregate)
# ------------------------------------------------------------------

_TWA_ORACLE = """
WITH p AS (
  SELECT user_id, epoch_ms(ts) AS ms, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
seg AS (
  SELECT user_id, cents,
         LEAD(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) - ms
           AS dt_ms
  FROM p),
s AS (
  SELECT user_id,
         CAST(SUM(cents * dt_ms) AS BIGINT) AS num,
         CAST(SUM(dt_ms) AS BIGINT) AS den,
         CAST(COUNT(*) AS BIGINT) AS n_segments
  FROM seg WHERE dt_ms IS NOT NULL AND dt_ms > 0
  GROUP BY user_id)
SELECT user_id, num, den, n_segments,
       CAST(num AS DOUBLE) / den AS twa_cents
FROM s ORDER BY user_id
"""


@query("q_agg_time_weighted", oracle=_TWA_ORACLE)
def q_agg_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED average purchase value per user — the correct
    mean for irregularly-sampled series (a value that persisted 10
    days weighs 10× one replaced after a day): each value holds until
    the user's next purchase (LEAD), weight = the holding interval in
    ms.  cents ≤ ~10⁵ × interval-ms ≤ ~10⁹ keeps every product under
    10¹⁴ and per-user sums exact int64 (ms, not µs, exactly for this
    bound); num/den are hash-attested, the division deterministic.

    Scale: one LEAD window + one agg on the same (user, time)
    exchange."""
    e = T(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    p = e.select(
        "user_id",
        F.expr("ts div 1000000").alias("ms"),
        "event_id",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    seg = p.select(
        "user_id", "cents", (F.lead("ms").over(w) - F.col("ms")).alias("dt_ms")
    )
    return (
        seg.where(F.col("dt_ms").isNotNull() & (F.col("dt_ms") > 0))
        .groupBy("user_id")
        .agg(
            F.sum(F.col("cents") * F.col("dt_ms")).cast("long").alias("num"),
            F.sum("dt_ms").cast("long").alias("den"),
            F.count(F.lit(1)).cast("long").alias("n_segments"),
        )
        .select(
            "user_id",
            "num",
            "den",
            "n_segments",
            (F.col("num").cast("double") / F.col("den")).alias("twa_cents"),
        )
        .orderBy("user_id")
    )


# ------------------------------------------------------------------
# Skyline / Pareto frontier (dominance query)
# ------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH p AS (
  SELECT p_partkey,
         CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part)
SELECT p_partkey, price_cents, size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_cents <= a.price_cents AND b.size >= a.size
    AND (b.price_cents < a.price_cents OR b.size > a.size))
ORDER BY price_cents, size, p_partkey
"""


@query("q_skyline_pareto", oracle=_SKYLINE_ORACLE)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D SKYLINE (Pareto frontier) of parts — cheapest-for-the-size
    dominance (min price, max size), the classic preference query
    (Börzsönyi et al., ICDE'01).  The oracle is the quadratic NOT
    EXISTS definition; the Spark form is the linear sort-order sweep:
    order by (price asc, size desc) and keep a row iff its size
    strictly exceeds the running size-max over all STRICTLY cheaper
    rows (equal-price groups compare only against cheaper prices, so
    per-price maxima join the frontier together — and duplicate
    (price, size) points are all kept, matching the NOT EXISTS
    semantics where an identical twin does not dominate).

    Scale note: the sweep's window is a global order over the PART
    dimension (bounded); at fact scale the skyline distributes by
    grid partitioning (per-cell local skyline → merge the bounded
    candidate set), the documented decomposition for >10⁸ rows."""
    p = T(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr("CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)").alias(
            "price_cents"
        ),
        F.col("p_size").cast("long").alias("size"),
    )
    # per-price census first so the global window runs over the
    # bounded (price, max size) table, not the row table
    per_price = p.groupBy("price_cents").agg(F.max("size").alias("max_size"))
    wprev = (
        Window.orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier_prices = per_price.withColumn(
        "prev_max", F.max("max_size").over(wprev)
    )
    return (
        p.join(F.broadcast(frontier_prices), "price_cents")
        # dominated iff some strictly-cheaper row has size >= mine, or
        # a same-price row has size > mine
        .where(
            (F.col("prev_max").isNull() | (F.col("size") > F.col("prev_max")))
            & (F.col("size") == F.col("max_size"))
        )
        .select("p_partkey", "price_cents", "size")
        .orderBy("price_cents", "size", "p_partkey")
    )
