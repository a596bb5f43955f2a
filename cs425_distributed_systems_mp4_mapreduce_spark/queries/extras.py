"""Coverage completions: CUBE/GROUPING SETS, right/full outer joins,
percentile/median aggregates, conditional aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parity import dsum, o_dsum
from ..registry import query
from ..sources.tables import table as T


@query(
    "q_agg_cube",
    oracle="""
    SELECT r_name, o_orderstatus, {rev}, COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY CUBE (r_name, o_orderstatus)
    """.format(rev=o_dsum("o_totalprice", "revenue")),
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping combinations of (region, status) in one
    pass (Spark expands grouping sets before the shuffle, so it is one
    aggregation, not four scans)."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.cube("r_name", "o_orderstatus").agg(
        dsum("o_totalprice", "revenue"), F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "q_join_right",
    oracle="""
    SELECT o_orderkey, s_suppkey, s_name
    FROM (SELECT * FROM orders WHERE o_orderkey % 50 = 0) o
    RIGHT JOIN supplier ON o.o_orderkey = s_suppkey * 37
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (all suppliers survive; sparse matches)."""
    o = T(spark, sf_dir, "orders").filter(F.expr("o_orderkey % 50 = 0"))
    s = T(spark, sf_dir, "supplier")
    return o.join(s, o.o_orderkey == s.s_suppkey * 37, "right").select(
        "o_orderkey", "s_suppkey", "s_name"
    )


@query(
    "q_join_full",
    oracle="""
    SELECT a.r_regionkey AS left_key, b.r_regionkey AS right_key,
           a.r_name AS left_name, b.r_name AS right_name
    FROM region a FULL JOIN (SELECT * FROM region WHERE r_regionkey >= 2) b
      ON a.r_regionkey = b.r_regionkey + 1
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on both sides."""
    a = T(spark, sf_dir, "region").alias("a")
    b = T(spark, sf_dir, "region").filter(F.col("r_regionkey") >= 2).alias("b")
    return a.join(b, F.col("a.r_regionkey") == F.col("b.r_regionkey") + 1, "full").select(
        F.col("a.r_regionkey").alias("left_key"),
        F.col("b.r_regionkey").alias("right_key"),
        F.col("a.r_name").alias("left_name"),
        F.col("b.r_name").alias("right_name"),
    )


@query(
    "q_agg_conditional",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           {hi}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """.format(
        hi=o_dsum("CASE WHEN o_totalprice > 200000 THEN o_totalprice ELSE 0 END",
                  "high_value_revenue"),
    ),
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER / CASE-gated sums) per segment."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            dsum(
                F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice")).otherwise(
                    0
                ),
                "high_value_revenue",
            ),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_agg_minmax_by",
    oracle="""
    SELECT c_mktsegment,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           MIN({'p': o_totalprice, 'k': o_orderkey}).k AS cheapest_order,
           MAX({'p': o_totalprice, 'k': o_orderkey}).k AS priciest_order
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max + argmin/argmax via lexicographic struct MIN/MAX — the
    (price, orderkey) composite breaks price ties deterministically in
    both engines, unlike min_by/arg_min whose tie winner is arbitrary
    (ties are plausible at larger SFs with 2-decimal prices)."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    pk = F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.min(pk)["k"].alias("cheapest_order"),
            F.max(pk)["k"].alias("priciest_order"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25) AS DOUBLE) AS q25,
           CAST(quantile_cont(CAST(l_quantity AS DOUBLE), 0.50) AS DOUBLE) AS q50,
           CAST(quantile_cont(CAST(l_quantity AS DOUBLE), 0.75) AS DOUBLE) AS q75,
           CAST(MAX(l_quantity) AS DOUBLE) AS q100
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (sort-based `percentile`, not the t-digest
    approx_percentile): linear interpolation at rank p·(n-1), the same
    definition DuckDB's quantile_cont uses.  Quartile fractions are
    exact in binary and l_quantity is integer-valued, so the
    interpolated doubles are bit-identical across engines.  At 100 TB
    exact percentiles shuffle every group value — that is the point of
    this operator; approx_percentile (mergeable sketch, q_agg_custom
    family) is the scale path when ±ε is acceptable."""
    li = T(spark, sf_dir, "lineitem")
    q = F.expr("percentile(CAST(l_quantity AS DOUBLE), array(0.25, 0.5, 0.75))")
    return (
        li.groupBy("l_returnflag")
        .agg(
            q.getItem(0).alias("q25"),
            q.getItem(1).alias("q50"),
            q.getItem(2).alias("q75"),
            F.max("l_quantity").cast("double").alias("q100"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_pivot",
    oracle="""
    SELECT c_mktsegment,
           {f}, {o}, {p}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """.format(
        f=o_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", "F"),
        o=o_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", "O"),
        p=o_dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END", "P"),
    ),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): revenue per market segment × order status.
    The pivot value list is EXPLICIT — with it, Spark pivots in a
    single aggregation pass; without it, a distinct-values job must run
    first (two scans), which is the 100 TB anti-pattern."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum("o_totalprice"))
        .orderBy("c_mktsegment")
    )


@query(
    "q_join_skew_salted",
    oracle="""
    SELECT c_mktsegment, {rev}, COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """.format(rev=o_dsum("o_totalprice", "revenue")),
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicate join (operators/skew.py): fact side salted by
    row content, dimension exploded n_salts times, join on (key, salt)
    — every hot key spreads over n_salts tasks.  The oracle is the
    PLAIN join+aggregate: salting must be semantically invisible.
    This is the manual fallback for skew AQE can't fix (e.g. a
    broadcast-unfriendly mid-size dim with one pathological key)."""
    from ..operators.skew import replicate_broadcast_join

    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    joined = replicate_broadcast_join(o, c, "o_custkey", "c_custkey", n_salts=8)
    return (
        joined.groupBy("c_mktsegment")
        .agg(dsum("o_totalprice", "revenue"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy("c_mktsegment")
    )


@query(
    "q_agg_mode",
    oracle="""
    SELECT l_returnflag, l_quantity AS mode_qty, n FROM (
      SELECT l_returnflag, l_quantity, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY COUNT(*) DESC, l_quantity ASC) AS rn
      FROM lineitem GROUP BY l_returnflag, l_quantity)
    WHERE rn = 1 ORDER BY l_returnflag
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent value, ties broken by smallest
    value): two-level aggregate + rank, instead of the built-in
    ``mode()`` whose tie winner is engine-arbitrary and therefore not
    oracle-checkable.  Scale shape: the first groupBy shuffles
    (flag, quantity) — bounded by distinct-value count, not rows — and
    the rank runs over those small groups."""
    from pyspark.sql.window import Window

    li = T(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("n"), F.asc("l_quantity")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"), "n")
        .orderBy("l_returnflag")
    )


@query(
    "q_tpch_q3",
    oracle="""
    SELECT l_orderkey, {rev}, CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_s, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, orderdate_s, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """.format(rev=o_dsum("l_extendedprice * (1 - l_discount)", "revenue")),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) adapted to this schema: selective
    dim filter → two shuffled joins → grouped revenue → top-10.  The
    unique l_orderkey tiebreak makes the LIMIT deterministic.  Scale
    shape: the segment filter pushes into the customer scan, both date
    filters push into their scans, and the top-10 is
    TakeOrderedAndProject — no global sort."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("timestamp").cast("long").alias("orderdate_s"), "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate_s", "o_orderpriority")
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking) shape: EXISTS-correlated
    subquery with a non-equi time condition — Catalyst rewrites it to a
    LEFT SEMI join on l_orderkey with the date predicate as join
    condition, so the lineitem side never materializes per-order
    results.  Late-shipping definition adapted to this schema
    (l_shipdate > o_orderdate + 60 days)."""
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    late = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_tpch_q5",
    oracle="""
    SELECT n_name, {rev}
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """.format(rev=o_dsum("l_extendedprice * (1 - l_discount)", "revenue")),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume) adapted to this schema: a
    6-table snowflake with the EXTRA c_nationkey = s_nationkey equality
    ('local' supplier) that makes join ORDER matter.  Scale shape:
    region→nation is a broadcast chain pruning supplier before the big
    fact joins; the date filter pushes into the orders scan; revenue
    aggregates with map-side partials on the small n_name key."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "q_tpch_q6",
    oracle="""
    SELECT {rev}, COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """.format(rev=o_dsum("l_extendedprice * l_discount", "revenue")),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the canonical scan-filter-
    aggregate.  Every predicate (date range, discount band, quantity
    cap) pushes into the parquet scan as PushedFilters; the single
    global sum is a two-stage partial/final with ONE row crossing the
    shuffle — at 100 TB this query is pure scan bandwidth."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _pr_iter(prev: str, this: str) -> str:
    """One DuckDB power-iteration round: scatter prev ranks along
    edges, gather at dst, damp."""
    return f"""{this} AS (
      SELECT n.id,
             0.15 / (SELECT n FROM p) +
             0.85 * COALESCE(SUM(r.rank / d.outdeg), 0) AS rank
      FROM nodes n
      LEFT JOIN e ON e.dst = n.id
      LEFT JOIN {prev} r ON r.id = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.id
    )"""


@query(
    "q_graph_pagerank",
    oracle="""
    WITH eb AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), e AS (
      SELECT src, dst FROM eb UNION SELECT dst, src FROM eb
    ), deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    nodes AS (SELECT DISTINCT src AS id FROM e),
    p AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT id, 1.0 / (SELECT n FROM p) AS rank FROM nodes),
    {i1}, {i2}, {i3}
    SELECT id, ROUND(rank, 6) AS rank FROM r3 ORDER BY id
    """.format(
        i1=_pr_iter("r0", "r1"), i2=_pr_iter("r1", "r2"), i3=_pr_iter("r2", "r3")
    ),
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, d=0.85) over the symmetrized
    customer↔supplier trade graph (edge iff any lineitem links them;
    supplier ids offset by 1,000,000 into a shared node space) — the
    canonical iterative MapReduce app the reference family demos,
    re-expressed as a checkpointed DataFrame loop
    (operators/graph.pagerank).  The oracle unrolls the SAME three
    rounds as nested SQL; ROUND(.,6) on both sides absorbs
    summation-order float drift.  At 100 TB each round is one shuffle
    (join on src + groupBy dst) over a localCheckpoint-ed edge list."""
    from ..operators.graph import pagerank

    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    eb = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1000000).alias("dst"),
        )
        .distinct()
    )
    e = eb.union(eb.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    pr = pagerank(e, iterations=3, damping=0.85)
    return pr.select("id", F.round("rank", 6).alias("rank")).orderBy("id")


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, val
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             l_discount, l_tax
      FROM lineitem WHERE l_orderkey % 100 = 0
    )
    UNPIVOT (val FOR measure IN (
      l_quantity AS 'qty', l_extendedprice AS 'price',
      l_discount AS 'discount', l_tax AS 'tax'))
    ORDER BY l_orderkey, l_linenumber, measure
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt): 4 measure columns become (measure,
    val) rows — the inverse of q_pivot and the shape feature stores
    emit.  Spark's native ``unpivot`` expands rows WITHOUT a shuffle
    (a generator projection, 4× rows out of the scan); the modulo
    filter pushes into the scan on both engines."""
    li = T(spark, sf_dir, "lineitem").filter(F.expr("l_orderkey % 100 = 0"))
    return (
        li.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "val",
        )
        .filter(F.col("val").isNotNull())
        .withColumn(
            "measure",
            F.element_at(
                F.create_map(
                    F.lit("l_quantity"), F.lit("qty"),
                    F.lit("l_extendedprice"), F.lit("price"),
                    F.lit("l_discount"), F.lit("discount"),
                    F.lit("l_tax"), F.lit("tax"),
                ),
                F.col("measure"),
            ),
        )
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


@query(
    "q_agg_histogram",
    oracle="""
    SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                WHEN o_totalprice >= 500000.0 THEN 51
                ELSE CAST(FLOOR(o_totalprice / 10000.0) AS BIGINT) + 1 END
             AS bucket,
           COUNT(*) AS n_orders,
           {tot}
    FROM orders
    GROUP BY bucket ORDER BY bucket
    """.format(tot=o_dsum("o_totalprice", "sum_price")),
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals: 50 × 10k buckets over
    [0, 500k), width_bucket semantics (1..50 in range, 0 below, 51
    above) spelled as explicit FLOOR arithmetic because DuckDB has no
    width_bucket — the IDENTICAL double divide + floor runs in both
    engines, so bucket edges cannot disagree.  One small-key
    aggregation; at 100 TB the bucket id computes in the scan
    projection and partial aggregation collapses each partition to
    ≤52 rows before the shuffle."""
    o = T(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 0.0, F.lit(0))
        .when(F.col("o_totalprice") >= 500000.0, F.lit(51))
        .otherwise(F.floor(F.col("o_totalprice") / 10000.0) + 1)
    )
    return (
        o.select(bucket.cast("long").alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
        )
        .orderBy("bucket")
    )


@query(
    "q_graph_triangles",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 10 = 0
    ),
    e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT e1.u AS node, COUNT(*) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    GROUP BY node
    ORDER BY n_triangles DESC, node
    LIMIT 50
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (the classic MapReduce graph benchmark, next
    to PageRank/connected-components in this family) over the
    co-purchase graph: parts bought together in an order are edges;
    triangles anchored at their smallest vertex, top-50 hubs.  The
    oriented-edge formulation (u<v everywhere) counts each triangle
    exactly once and bounds the wedge join by out-degree, the standard
    skew fix — at 100 TB you additionally order vertices by degree so
    hub nodes get LOW out-degree, keeping wedges near-linear."""
    li = (
        T(spark, sf_dir, "lineitem")
        .filter(F.expr("l_orderkey % 10 = 0"))
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    e1 = e.select(F.col("u").alias("e1u"), F.col("v").alias("e1v"))
    e2 = e.select(F.col("u").alias("e2u"), F.col("v").alias("e2v"))
    e3 = e.select(F.col("u").alias("e3u"), F.col("v").alias("e3v"))
    return (
        e1.join(e2, F.col("e2u") == F.col("e1v"))
        .join(e3, (F.col("e3u") == F.col("e1u")) & (F.col("e3v") == F.col("e2v")))
        .groupBy(F.col("e1u").alias("node"))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "node")
        .limit(50)
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT c_mktsegment, o_orderstatus,
           CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           COUNT(*) AS n, {rev}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
    ORDER BY g_seg, g_status, c_mktsegment, o_orderstatus
    """.format(rev=o_dsum("o_totalprice", "revenue")),
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with the GROUPING() marker — unlike
    rollup/cube this picks exactly the wanted aggregation levels
    ((segment), (status), grand total) in ONE pass, and GROUPING()
    distinguishes a subtotal's NULL from a genuine NULL group value —
    the disambiguation every BI layer needs.  Spark expands the sets
    before the shuffle: one aggregation, not three scans."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    return (
        joined.groupingSets(
            [["c_mktsegment"], ["o_orderstatus"], []],
            "c_mktsegment",
            "o_orderstatus",
        )
        .agg(
            F.grouping("c_mktsegment").cast("long").alias("g_seg"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "revenue"),
        )
        .orderBy("g_seg", "g_status", "c_mktsegment", "o_orderstatus")
    )


@query(
    "q_agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           {num} / {den} AS wavg_discount,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """.format(
        num="CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)",
        den="CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)",
    ),
)
def q_agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean (price-weighted average discount): the ratio of
    two exact-decimal sums sharing one aggregation pass — avg() gives
    every row equal weight, which misprices discounts; weighting by
    extendedprice answers "what fraction of revenue is discounted".
    Same one-shuffle shape as any grouped agg."""
    from ..functions.parity import _dec2dbl

    DECI = "decimal(18,6)"
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (
                _dec2dbl(
                    F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(DECI))
                )
                / _dec2dbl(F.sum(F.col("l_extendedprice").cast(DECI)))
            ).alias("wavg_discount"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_scalar_posexplode",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents WHERE doc_id % 100 = 0
    )
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS word
    FROM toks,
         LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) u
    ORDER BY doc_id, pos
    """,
)
def q_scalar_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (ordinality-preserving expansion): token position is
    part of the output — what plain explode (and the wordcount UDTF)
    discards, and what sequence/attention features need.  Generator
    projection, no shuffle."""
    d = T(spark, sf_dir, "documents").filter(F.expr("doc_id % 100 = 0"))
    return (
        d.select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "word"),
        )
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "word")
        .orderBy("doc_id", "pos")
    )


@query("q_agg_approx_percentile", oracle=None)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) per returnflag —
    the mergeable-sketch scale path beside q_agg_percentile's exact
    sort: at 100 TB the sketch keeps O(1/ε) state per group and
    merges across partitions instead of shuffling every value.
    Rows-only by design: the sketch's chosen sample is engine-specific
    (DuckDB's approx_quantile uses t-digest — different algorithm,
    different picks); the rank-error bound vs the EXACT percentile is
    asserted in tests/test_extras.py instead."""
    li = T(spark, sf_dir, "lineitem")
    q = F.expr(
        "approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 1000)"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            q.getItem(0).alias("q25"),
            q.getItem(1).alias("q50"),
            q.getItem(2).alias("q75"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_distinct_salted",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_distinct_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase EXACT distinct count — the aggregation-side
    complement to q_join_skew_salted.  Phase 1 groups by (key,
    salt(user)) and counts distinct users per salt bucket; phase 2
    sums the per-bucket counts.  Exact because the salt is derived
    from the DISTINCT-counted column itself (xxhash64 % 32), so each
    user lands in exactly ONE bucket and the bucket counts partition
    the distinct set.  n_events rides along phase 1 as a plain sum.

    Why it matters at 100 TB: a plain COUNT(DISTINCT) materializes
    each hot key's entire distinct-state on ONE reducer (Spark expands
    to a (key, user) pre-aggregate, but the final per-key distinct
    state is still single-task); salting caps per-task state at 1/32
    of the hot key.  The oracle is the PLAIN distinct count — salting
    must be semantically invisible, same discipline as the salted
    join.  AQE can split skewed shuffle PARTITIONS, but cannot split a
    single group's aggregation state — this rewrite is the manual
    lever for that regime."""
    e = T(spark, sf_dir, "events")
    phase1 = (
        e.groupBy(
            "event_type",
            F.pmod(F.xxhash64("user_id"), F.lit(32)).alias("salt"),
        )
        .agg(
            F.countDistinct("user_id").alias("pn"),
            F.count(F.lit(1)).alias("pe"),
        )
    )
    return (
        phase1.groupBy("event_type")
        .agg(F.sum("pn").alias("n_users"), F.sum("pe").alias("n_events"))
        .orderBy("event_type")
    )


#: JVM expression producing ALL deletion variants of `word` at depth
#: <= 2 (FastSS blocking keys): the word itself, every single-char
#: deletion, every two-char deletion.  sequence(1, L) is safe for any
#: L >= 1; the (i, j) grid is filtered to j > i rather than generated
#: with sequence(i+1, L), because Spark's sequence(start, stop)
#: DESCENDS when start > stop — the empty-range trap.
_DELETION_VARIANTS = """
array_distinct(concat(
  array(word),
  transform(sequence(1, length(word)),
            i -> concat(substring(word, 1, i - 1),
                        substring(word, i + 1, length(word) - i))),
  transform(
    filter(flatten(transform(sequence(1, length(word)),
                             i -> transform(sequence(1, length(word)),
                                            j -> struct(i AS i, j AS j)))),
           p -> p.j > p.i),
    p -> concat(substring(word, 1, p.i - 1),
                substring(word, p.i + 1, p.j - p.i - 1),
                substring(word, p.j + 1, length(word) - p.j)))
))
"""


@query(
    "q_join_fuzzy",
    oracle="""
    WITH w AS (
      SELECT DISTINCT UNNEST(STRING_SPLIT(text, ' ')) AS word
      FROM documents)
    SELECT a.word AS word_a, b.word AS word_b,
           CAST(levenshtein(a.word, b.word) AS BIGINT) AS dist
    FROM w a JOIN w b ON a.word < b.word
    WHERE levenshtein(a.word, b.word) <= 2
    ORDER BY word_a, word_b
    """,
)
def q_join_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join at edit distance ≤ 2 over the corpus
    vocabulary — FastSS deletion-neighborhood blocking: each word
    emits its ≤2-deletion variants as blocking keys (pure JVM
    expression, ≤ 1 + L + C(L,2) variants), candidates come from a
    bucketed self-join on the variant, and candidates verify with
    levenshtein (Spark and DuckDB both implement unit-cost
    Levenshtein).  The oracle brute-forces ALL pairs, so the driver
    hash-compare is the FastSS completeness theorem on real data —
    ed(a,b) ≤ k ⟹ the ≤k-deletion neighborhoods intersect (each edit
    op deletes/changes at most one aligned char per side) — the same
    proof shape as the SimHash and LSH xengine twins; the theorem
    itself is fuzz-pinned over random edit scripts in
    tests/test_extras.py.

    Scale: neighborhoods are O(L²) per DISTINCT word (Heaps-law
    bounded), the self-join keys on short variant strings so candidate
    volume is Σ_buckets C(n_b, 2) — never the C(V, 2) all-pairs the
    oracle runs; verification shuffles ids + variants only.  Noise
    pairs are Θ(V²/26^(L−2)), so linearity needs word length ≳
    log26(V)+2 — the key-width-grows-with-log-N discipline every LSH
    family here follows; MEASURED in tests/test_candidate_scaling.py
    (8-12 char words + planted typo twins: 75 → 607 candidates at 8×
    vocab = linear; 6-10 char words: 19 → 1,424 = the quadratic
    saturation regime, documented not hidden).  This is the
    typo/near-key join a 100 TB entity-resolution or query-log
    pipeline runs."""
    d = T(spark, sf_dir, "documents")
    w = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .distinct()
    )
    variants = w.select(
        "word", F.explode(F.expr(_DELETION_VARIANTS)).alias("v")
    )
    a = variants.select(F.col("word").alias("word_a"), "v")
    b = variants.select(F.col("word").alias("word_b"), "v")
    cand = (
        a.join(b, "v")
        .filter(F.col("word_a") < F.col("word_b"))
        .select("word_a", "word_b")
        .distinct()
    )
    return (
        cand.filter(F.levenshtein("word_a", "word_b") <= 2)
        .select(
            "word_a",
            "word_b",
            F.levenshtein("word_a", "word_b").cast("long").alias("dist"),
        )
        .orderBy("word_a", "word_b")
    )


@query(
    "q_entity_clusters",
    oracle="""
    WITH RECURSIVE w AS (
      SELECT DISTINCT UNNEST(STRING_SPLIT(text, ' ')) AS word
      FROM documents
    ), pairs AS (
      SELECT a.word AS wa, b.word AS wb
      FROM w a JOIN w b ON a.word < b.word
      WHERE levenshtein(a.word, b.word) <= 2
    ), edges AS (
      SELECT wa AS src, wb AS dst FROM pairs
      UNION ALL SELECT wb, wa FROM pairs
    ), reach(id, r) AS (
      SELECT word, word FROM w
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
    )
    SELECT id AS word, MIN(r) AS entity_id
    FROM reach GROUP BY id ORDER BY word
    """,
)
def q_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: FastSS-blocked fuzzy matching
    (q_join_fuzzy's discovery) feeding connected components
    (operators/graph.connected_components — the same iterative
    min-label propagation the dedup clustering uses), so transitively
    linked spelling variants collapse to one canonical entity id (the
    lexicographically smallest member).  The oracle recomputes the
    closure from brute-force levenshtein edges with a recursive CTE —
    the same two-theorem compose the SimHash/cluster twins use:
    blocking completeness × closure correctness, hash-checked in one
    result.

    Scale: both stages are already individually scale-argued (FastSS
    blocking: candidates Σ C(n_b,2) with the length≳log V discipline;
    CC: O(diameter) rounds of equi-join + min-agg, lineage
    checkpointed).  Composition adds no new shuffle shape — the edge
    list IS the join output keyed by word."""
    from ..operators.graph import connected_components

    d = T(spark, sf_dir, "documents")
    w = d.select(F.explode(F.split("text", " ")).alias("word")).distinct()
    variants = w.select("word", F.explode(F.expr(_DELETION_VARIANTS)).alias("v"))
    a = variants.select(F.col("word").alias("wa"), "v")
    b = variants.select(F.col("word").alias("wb"), "v")
    edges = (
        a.join(b, "v")
        .filter(F.col("wa") < F.col("wb"))
        .select("wa", "wb")
        .distinct()
        .filter(F.levenshtein("wa", "wb") <= 2)
        .select(F.col("wa").alias("src"), F.col("wb").alias("dst"))
    )
    comps = connected_components(
        edges, src="src", dst="dst", nodes=w.select(F.col("word").alias("id"))
    )
    return comps.select(
        F.col("id").alias("word"), F.col("component").alias("entity_id")
    ).orderBy("word")
