"""Round-4 analytics pack: clickstream/product analytics over the
events stream (funnel, cohort retention, Markov transitions, time-
proximity self-join, time-hierarchy rollup), corpus utilities
(deterministic reservoir sample, substring-span dedup, market-basket
pairs), aggregate surface (bitwise aggs, deterministic LISTAGG,
bit-exact correlation/OLS, mergeable HLL sketches), and Spark 4
surface (VARIANT semi-structured type, Python DataSource API).

Every query except the HLL sketch carries a full DuckDB oracle; the
sketch is rows-only by necessity (implementation-defined estimate) and
its MERGEABILITY — the property that makes sketches the 100 TB rollup
primitive — is asserted exactly in tests (union-of-daily == global).

Time discipline follows streaming_twins.py: all arithmetic on
µs-truncated epochs (``ts DIV 1000`` ≡ DuckDB ``epoch_us``), never raw
ns, never timezone-dependent functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.parity import dsum, o_dsum
from ..registry import query
from ..sources.tables import table as T

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000
#: time-proximity window for the interval self-join (30 min)
PAIR_GAP_US = 1_800_000_000


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with a µs epoch column (oracle twin: epoch_us(ts))."""
    return T(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts DIV 1000")
    )


@query(
    "q_events_funnel",
    headline=True,
    oracle="""
    WITH tv AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t_v FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    tc AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_c
      FROM events e JOIN tv ON e.user_id = tv.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= tv.t_v
      GROUP BY e.user_id
    ),
    tp AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_p
      FROM events e JOIN tc ON e.user_id = tc.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= tc.t_c
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM tv) AS n_viewed,
           (SELECT COUNT(*) FROM tc) AS n_clicked,
           (SELECT COUNT(*) FROM tp) AS n_purchased
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): a user
    advances a stage only with an event AT OR AFTER their entry into
    the previous stage — first view, then first click ≥ that view,
    then first purchase ≥ that click.  The sequence constraint is what
    distinguishes a funnel from three independent filters (a click
    BEFORE any view must not count).

    Scale shape (round-5 rewrite): ONE hash shuffle on user_id total.
    The three stage-entry timestamps are STACKED unordered window
    aggregates over the same partitioning — each stage's conditional
    min can reference the previous stage's column because windows
    evaluate in sequence — and the per-user collapse + final scalar
    counts reuse that partitioning, so Spark elides every later
    exchange.  The previous form (three chained groupBy+join stages,
    all on user_id) computed the same thing through ~8 adaptive
    stages; co-partitioned but stage-latency-bound (in-process A/B at
    sf0.1: 0.92 s → 0.54 s median, −41%).  count(col) counts
    non-nulls, so users who
    never reach a stage (null t_*) drop out of each count exactly as
    the join chain dropped them."""
    e = _ev(spark, sf_dir).select("user_id", "ts_us", "event_type")
    w = Window.partitionBy("user_id")
    e = e.withColumn(
        "t_v",
        F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w),
    )
    # NULL-key discipline: Window.partitionBy groups NULL user_ids into
    # ONE partition, but the declared semantics (and the oracle's JOIN
    # chain) never match NULL keys — a NULL-user click must not advance
    # the funnel.  Gate the later stages on a non-null key so the
    # single-shuffle rewrite is row-identical to the join form on ANY
    # data, not just corpora without NULLs (caught by
    # tests/test_events_adversarial.py).
    e = e.withColumn(
        "t_c",
        F.when(
            F.col("user_id").isNotNull(),
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts_us") >= F.col("t_v")),
                    F.col("ts_us"),
                )
            ).over(w),
        ),
    )
    e = e.withColumn(
        "t_p",
        F.when(
            F.col("user_id").isNotNull(),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") >= F.col("t_c")),
                    F.col("ts_us"),
                )
            ).over(w),
        ),
    )
    per_user = e.groupBy("user_id").agg(
        F.first("t_v").alias("t_v"),
        F.first("t_c").alias("t_c"),
        F.first("t_p").alias("t_p"),
    )
    return per_user.agg(
        F.count("t_v").alias("n_viewed"),
        F.count("t_c").alias("n_clicked"),
        F.count("t_p").alias("n_purchased"),
    )


@query(
    "q_events_retention",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      FROM events
    ),
    cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id)
    SELECT cohort.cohort_day, act.day - cohort.cohort_day AS day_offset,
           COUNT(*) AS n_users
    FROM act JOIN cohort ON act.user_id = cohort.user_id
    WHERE act.day - cohort.cohort_day <= 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted
    on each subsequent day they return (offset 0–7) — the engagement
    triangle every product-analytics engine computes.

    Scale shape: the (user, day) activity set is the DISTINCT of the
    raw stream (one shuffle, heavy map-side combine since a user's
    events cluster in few partitions); cohorts derive from it by a
    user-keyed agg and join back on the SAME key — co-partitioned, no
    second wide shuffle; the final (cohort, offset) agg is tiny."""
    act = (
        _ev(spark, sf_dir)
        .select("user_id", F.expr(f"ts_us DIV {US_PER_DAY}").alias("day"))
        .distinct()
    )
    cohort = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        act.join(cohort, "user_id")
        .select(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "q_events_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS prev_type
      FROM events
    )
    SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY from_type, to_type
    ORDER BY from_type, to_type
    """,
)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order Markov counts): for
    each user's time-ordered stream, count (previous → current) event
    pairs — the raw material for journey analysis and anomalous-flow
    detection.  (ts, event_id) ordering makes ties deterministic.

    Scale shape: one shuffle on user_id for the lag window, then a
    5×5-keyed agg that collapses map-side; no join at all."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        _ev(spark, sf_dir)
        .select("event_type", F.lag("event_type").over(w).alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("from_type", "to_type")
    )


def interval_candidates(e: DataFrame, gap_us: int) -> DataFrame:
    """Pre-verification candidate pairs of the banded interval join:
    equi-join on (user_id, gap-width time bucket), the earlier side
    exploded to (b, b+1).  Exposed separately so the candidate VOLUME
    — the shuffle-cost driver at scale — can be measured directly
    (tests/test_candidate_scaling.py), the same discipline as the LSH
    dedup families.  Input needs (user_id, event_id, ts_us)."""
    early = e.select(
        "user_id",
        F.col("event_id").alias("id_early"),
        F.col("ts_us").alias("ts_early"),
        F.explode(
            F.array(
                F.expr(f"ts_us DIV {gap_us}"),
                F.expr(f"ts_us DIV {gap_us} + 1"),
            )
        ).alias("b"),
    )
    late = e.select(
        "user_id",
        F.col("event_id").alias("id_late"),
        F.col("ts_us").alias("ts_late"),
        F.expr(f"ts_us DIV {gap_us}").alias("b"),
    )
    return early.join(late, ["user_id", "b"])


@query(
    "q_join_interval_self",
    oracle=f"""
    SELECT a.user_id AS user_id, a.event_id AS id_early,
           b.event_id AS id_late,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a JOIN events b ON a.user_id = b.user_id
     AND (epoch_us(a.ts) < epoch_us(b.ts)
          OR (epoch_us(a.ts) = epoch_us(b.ts) AND a.event_id < b.event_id))
     AND epoch_us(b.ts) - epoch_us(a.ts) <= {PAIR_GAP_US}
    ORDER BY a.user_id, id_early, id_late
    """,
)
def q_join_interval_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-proximity self-join: pairs of events by the SAME user
    within 30 minutes of each other — the sessionization/attribution
    primitive ("which events co-occur?").

    Scale shape: the naive formulation is a per-user quadratic theta
    join.  This plans it as a BANDED EQUI-JOIN instead: bucket time
    into gap-width bins; a qualifying pair's buckets differ by 0 or 1,
    so the earlier side is emitted under (bucket, bucket+1) and joined
    to the later side on (user_id, bucket) — an exact equi-shuffle
    whose candidate volume is O(pairs within ~2 gap widths), not
    O(n²/user); the exact predicate then filters candidates.  Each
    true pair matches in EXACTLY one bucket (via b_early when buckets
    equal, via b_early+1 when adjacent), so no distinct is needed."""
    e = _ev(spark, sf_dir).select("user_id", "event_id", "ts_us")
    return (
        interval_candidates(e, PAIR_GAP_US)
        .filter(
            (
                (F.col("ts_early") < F.col("ts_late"))
                | (
                    (F.col("ts_early") == F.col("ts_late"))
                    & (F.col("id_early") < F.col("id_late"))
                )
            )
            & (F.col("ts_late") - F.col("ts_early") <= PAIR_GAP_US)
        )
        .select(
            "user_id",
            "id_early",
            "id_late",
            (F.col("ts_late") - F.col("ts_early")).alias("gap_us"),
        )
        .orderBy("user_id", "id_early", "id_late")
    )


@query(
    "q_rollup_time",
    oracle="""
    SELECT epoch_us(ts) // 86400000000 AS day,
           (epoch_us(ts) // 3600000000) % 24 AS hour,
           CAST(GROUPING(epoch_us(ts) // 86400000000) AS BIGINT) AS g_day,
           CAST(GROUPING((epoch_us(ts) // 3600000000) % 24) AS BIGINT) AS g_hour,
           COUNT(*) AS n, {sv}
    FROM events
    GROUP BY ROLLUP(day, hour)
    ORDER BY g_day, g_hour, day, hour
    """.format(sv=o_dsum("value", "sum_value")),
)
def q_rollup_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup (hypertable continuous-aggregate shape):
    hour-of-day within day within grand total, in ONE aggregation pass
    — GROUP BY ROLLUP(day, hour) with GROUPING() markers so a
    subtotal's NULL is distinguishable.  This is the materialized
    multi-granularity rollup a time-series store maintains
    incrementally; at 100 TB the single-pass formulation matters
    because each extra granularity is one more grouping-set expansion,
    not one more scan."""
    e = _ev(spark, sf_dir).select(
        F.expr(f"ts_us DIV {US_PER_DAY}").alias("day"),
        F.expr(f"(ts_us DIV {US_PER_HOUR}) % 24").alias("hour"),
        "value",
    )
    return (
        e.rollup("day", "hour")
        .agg(
            F.grouping("day").cast("long").alias("g_day"),
            F.grouping("hour").cast("long").alias("g_hour"),
            F.count(F.lit(1)).alias("n"),
            dsum("value", "sum_value"),
        )
        .orderBy("g_day", "g_hour", "day", "hour")
    )


@query(
    "q_sample_reservoir",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, lang, n_chars, rk FROM ranked WHERE rk <= 5
    ORDER BY lang, rk
    """,
)
def q_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group reservoir sample: k=5 documents per
    language, selected by rank of md5(doc_id) — a uniform-at-random
    draw (the hash is effectively a random permutation) that is
    REPRODUCIBLE across engines and runs, unlike rand()-based
    sampling.  This is how a pipeline pins audit samples: same corpus
    in, same sample out, no seed bookkeeping.

    Scale shape: per-group top-k over a hash ordering — Spark plans
    the rank filter as WindowGroupLimit, pruning to ≤k rows per group
    BEFORE the shuffle, so the exchange carries k·|groups| rows, not
    the corpus."""
    d = T(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", "n_chars")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .orderBy("lang", "rk")
    )


@query(
    "q_agg_bitwise",
    oracle="""
    SELECT event_type,
           bit_and(user_id) AS all_bits,
           bit_or(user_id) AS any_bits,
           bit_xor(user_id) AS parity_bits,
           bool_and(value > 5.0) AS all_gt5,
           bool_or(value > 990.0) AS any_gt990,
           COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise and boolean aggregate surface: BIT_AND/OR/XOR over ids
    (set-membership masks, parity checks) and BOOL_AND/BOOL_OR over
    predicates (per-group invariant checks) — the aggregates a data-
    quality layer uses to verify "every row satisfies P" without a
    second filtered pass.  All are associative + commutative, so they
    partial-aggregate map-side like any sum."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.expr("bit_and(user_id)").alias("all_bits"),
            F.expr("bit_or(user_id)").alias("any_bits"),
            F.expr("bit_xor(user_id)").alias("parity_bits"),
            F.expr("bool_and(value > 5.0)").alias("all_gt5"),
            F.expr("bool_or(value > 990.0)").alias("any_gt990"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@query("q_sketch_hll_merge")  # rows-only: see ROWS_ONLY.md
def q_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    hll_sketch_agg): per-day user sketches union-merged into a global
    estimate — THE re-aggregation primitive at 100 TB, where "distinct
    users this month" must come from merging 30 daily sketches, not
    re-scanning a month of raw events.  Emits per-day estimates plus a
    merged ALL row (day = -1).

    Rows-only by necessity (estimates are implementation-defined;
    DuckDB's HLL is not bit-compatible); the property that MATTERS —
    merge losslessness, union(daily sketches) == sketch(whole stream),
    exactly — is asserted in tests/test_llm_ops.py, as is estimate
    accuracy against the exact twin (q_agg_distinct_users family)."""
    e = _ev(spark, sf_dir).select(
        F.expr(f"ts_us DIV {US_PER_DAY}").alias("day"), "user_id"
    )
    daily = e.groupBy("day").agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk")
    )
    per_day = daily.select(
        "day", F.expr("hll_sketch_estimate(sk)").alias("n_users_est")
    )
    merged = daily.agg(
        F.expr(
            "hll_sketch_estimate(hll_union_agg(sk, false))"
        ).alias("n_users_est")
    ).select(F.lit(-1).cast("long").alias("day"), "n_users_est")
    return per_day.unionByName(merged).orderBy("day")


@query(
    "q_basket_pairs",
    oracle="""
    WITH pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS support
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY part_a, part_b
    )
    SELECT part_a, part_b, support FROM pairs
    WHERE support >= 2
    ORDER BY support DESC, part_a, part_b
    """,
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: pairs of parts appearing in the
    same order, with support counts — the classic MapReduce 'pairs'
    pattern (frequent-itemset mining's first pass).

    Scale shape: the self-join is keyed on l_orderkey, so the pair
    blow-up is per-ORDER quadratic — bounded by basket size (~7 line
    items), never corpus-quadratic; the candidate volume is
    Σ |basket|² ≈ O(rows · avg_basket).  One orderkey shuffle
    (co-partitioned self-join), then a pair-keyed agg with map-side
    combine.  The support floor prunes the long tail before the sort."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
        .orderBy(F.desc("support"), "part_a", "part_b")
    )


@query(
    "q_agg_listagg",
    oracle="""
    SELECT n_name,
           array_to_string(list_slice(list_sort(list(s_name)), 1, 5), ',')
             AS top_suppliers,
           COUNT(*) AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/GROUP_CONCAT surface: per nation, the first 5 supplier
    names (sorted) joined into one string.  collect_list alone is
    NON-DETERMINISTIC under parallelism (arrival order varies by
    partitioning); sort_array before joining restores a canonical
    order — the only way string aggregation is reproducible on a
    cluster, and exactly what the ORDER BY clause of ANSI LISTAGG
    does.  Scale note: collect_list is bounded here by group size
    (suppliers per nation); unbounded groups need a pre-limit
    (WindowGroupLimit top-k) before collecting."""
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(
                F.slice(F.sort_array(F.collect_list("s_name")), 1, 5), ","
            ).alias("top_suppliers"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
        .orderBy("n_name")
    )


@query(
    "q_scalar_variant",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): parse the events
    ``props`` JSON into the binary VARIANT type once, then extract
    typed paths with variant_get — the open-schema ingestion pattern
    (store first, type at query time) that replaces brittle
    get_json_object string re-parsing.  VARIANT keeps a parsed binary
    form, so repeated path extraction does not re-tokenize the JSON —
    at 100 TB the parse happens once per row, not once per accessed
    field.  Oracle extracts the same path with DuckDB's JSON reader."""
    e = T(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


@query(
    "q_source_python",
    oracle="""
    WITH src AS (
      SELECT i AS event_id,
             (1103515245 * i + 12345) % 2147483648 AS h,
             CASE i % 5 WHEN 0 THEN 'click' WHEN 1 THEN 'view'
                        WHEN 2 THEN 'signup' WHEN 3 THEN 'purchase'
                        ELSE 'error' END AS etype
      FROM generate_series(0, 9999) t(i)
    )
    SELECT etype, COUNT(*) AS n,
           COUNT(DISTINCT h % 50) AS n_users,
           {sv}
    FROM (SELECT etype, h, (h % 10000) / 100.0 AS value FROM src)
    GROUP BY etype ORDER BY etype
    """.format(sv=o_dsum("value", "sum_value")),
)
def q_source_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom source via the Python DataSource API (Spark 4): register
    a pure-Python partition-parallel source and aggregate its output.
    The source (sources/pydatasource.py) generates rows from
    deterministic integer arithmetic, so the ENTIRE read path —
    option parsing, partition planning (8 splits, reads parallelize
    like any scan), per-partition generators, Arrow transport — is
    verified by exact value hash against a DuckDB generate_series
    twin, not just a row count.  ``sf_dir`` is unused: the source IS
    the data; row count is fixed so the oracle matches at every SF."""
    from ..sources.pydatasource import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)
    src = (
        spark.read.format("synthetic_events")
        .option("rows", "10000")
        .option("partitions", "8")
        .load()
    )
    return (
        src.groupBy("etype")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("user_id").alias("n_users"),
            dsum("value", "sum_value"),
        )
        .orderBy("etype")
    )


@query(
    "q_stats_regr",
    oracle="""
    WITH sums AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                           * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                           * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx2,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy2
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (n * sxy - sx * sy)
             / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)) AS corr_qty_price,
           (n * sxy - sx * sy) / (n * sx2 - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sx2 - sx * sx) * sx) / n AS intercept
    FROM sums ORDER BY l_returnflag
    """,
)
def q_stats_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface — Pearson correlation and OLS
    slope/intercept (price ~ quantity per return flag), rebuilt from
    EXACT decimal sums (Σx, Σy, Σxy, Σx², Σy², n) instead of the
    builtin corr()/regr_slope(): the builtins accumulate doubles in
    partition order, so two engines (or two runs with different
    partitioning) disagree in the last ulps — the exact-sums
    formulation is order-independent, then both engines run the
    IDENTICAL IEEE post-arithmetic, giving bit-equal statistics with
    zero tolerance.  One aggregation pass, map-side combinable; the
    same template extends to any moment-based statistic (skew,
    kurtosis, covariance matrices)."""
    from ..functions.parity import _dec2dbl

    li = T(spark, sf_dir, "lineitem")
    xd = F.col("l_quantity").cast("decimal(18,2)")
    yd = F.col("l_extendedprice").cast("decimal(18,2)")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _dec2dbl(F.sum(xd)).alias("sx"),
        _dec2dbl(F.sum(yd)).alias("sy"),
        _dec2dbl(F.sum(xd * yd)).alias("sxy"),
        _dec2dbl(F.sum(xd * xd)).alias("sx2"),
        _dec2dbl(F.sum(yd * yd)).alias("sy2"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sx2, sy2 = F.col("sxy"), F.col("sx2"), F.col("sy2")
    slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    return sums.select(
        "l_returnflag",
        "n",
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sx2 - sx * sx) * F.sqrt(n * sy2 - sy * sy))
        ).alias("corr_qty_price"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    ).orderBy("l_returnflag")


#: duplicated-span window width (tokens).  Production substring dedup
#: (Lee et al. 2022, "Deduplicating Training Data...") uses ~50-token
#: spans over a suffix array; this corpus's ~31-word vocabulary makes
#: 8 the collision-rate equivalent (spans shared by chance are
#: ~31^-8, so every hit is a real shared span).
SPAN_W = 8


@query(
    "q_dedup_spans",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
    win AS (
      SELECT doc_id, i AS s_start, i + {SPAN_W - 1} AS s_end,
             array_to_string(t[i:i+{SPAN_W - 1}], ' ') AS s
      FROM toks,
           LATERAL (SELECT unnest(generate_series(1,
                      greatest(len(t) - {SPAN_W - 1}, 0))) AS i) u
    ),
    dup AS (SELECT s FROM win GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2),
    cov AS (
      SELECT doc_id, s_start, s_end,
             MAX(s_end) OVER (PARTITION BY doc_id ORDER BY s_start
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM win JOIN dup USING (s)
    ),
    per_doc AS (
      SELECT doc_id,
             SUM(GREATEST(s_end - GREATEST(s_start - 1,
                                           COALESCE(prev_end, 0)), 0))
               AS covered
      FROM cov GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text,' ')) AS BIGINT) AS n_tokens,
           CAST(COALESCE(covered, 0) AS BIGINT) AS dup_tokens,
           ROUND(CAST(COALESCE(covered, 0) AS BIGINT)
                 / CAST(len(string_split(d.text,' ')) AS BIGINT), 6)
             AS dup_frac
    FROM documents d LEFT JOIN per_doc USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring (span) dedup metrics: per document, how many of
    its tokens sit inside an 8-token window that appears VERBATIM in
    at least one other document — the span-level complement of
    document-level dedup (Lee et al.'s observation: near-dup docs slip
    document filters while sharing long exact substrings).  Pipeline
    use: rank documents by dup_frac and clip/drop the worst.

    Spark-first formulation of what suffix arrays do on one machine:
    (1) every document emits rolling window HASHES via
    xxhash64(slice(tokens, i, w)) — no span string is materialized
    (same trick as q_decontaminate); (2) one hash-keyed shuffle finds
    windows shared across ≥2 docs; (3) a per-doc interval merge
    (classic gaps-and-islands MAX-end window) converts overlapping hit
    windows into exact covered-token counts.  Three shuffles total
    (hash, hash-join back, doc window), each on compact keys; the
    oracle replays it on raw span strings."""
    d = T(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    win = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(size(t) - {SPAN_W - 1}, 0)),"
                f" i -> struct(i AS s_start, i + {SPAN_W - 1} AS s_end,"
                f" xxhash64(slice(t, i, {SPAN_W})) AS h))"
            )
        ).alias("w"),
    ).select("doc_id", "w.s_start", "w.s_end", "w.h")
    dup = (
        win.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    hits = win.join(dup, "h")
    mw = (
        Window.partitionBy("doc_id")
        .orderBy("s_start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_doc = (
        hits.withColumn("prev_end", F.max("s_end").over(mw))
        .select(
            "doc_id",
            F.greatest(
                F.col("s_end")
                - F.greatest(
                    F.col("s_start") - 1, F.coalesce(F.col("prev_end"), F.lit(0))
                ),
                F.lit(0),
            ).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("covered"))
    )
    n_tok = F.size(F.split("text", " ")).cast("long")
    return (
        d.select("doc_id", n_tok.alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("covered"), F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce(F.col("covered"), F.lit(0)).cast("long")
                / F.col("n_tokens"),
                6,
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_timeseries_ohlc",
    oracle="""
    WITH b AS (
      SELECT event_type,
             epoch_us(ts) // 3600000000 AS bucket,
             value,
             ROW_NUMBER() OVER (PARTITION BY event_type,
                                             epoch_us(ts) // 3600000000
                                ORDER BY epoch_us(ts), event_id) AS rk_open,
             ROW_NUMBER() OVER (PARTITION BY event_type,
                                             epoch_us(ts) // 3600000000
                                ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rk_close
      FROM events)
    SELECT event_type, bucket,
           MAX(CASE WHEN rk_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rk_close = 1 THEN value END) AS close,
           COUNT(*) AS n
    FROM b
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def q_timeseries_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar aggregation — the canonical time-series downsample
    (candlesticks, metrics rollups): per (series, hour bucket) the
    first/max/min/last value, first/last resolved by the TOTAL order
    (ts, event_id) so concurrent-timestamp rows cannot make the bars
    nondeterministic.

    Plan shape (measured, not assumed): the single-pass min_by over a
    STRUCT ordinal plans as SortAggregate — Spark's hash aggregate
    requires mutable primitive buffers, so a struct ordinal silently
    buys a per-partition SORT in both phases, the wrong trade at
    100 TB.  This implementation is the two-phase hash-only form
    instead: (1) one map-side-combining HashAggregate computes per-bar
    t_open/t_close/high/low/n; (2) the tiny bar table broadcasts back
    onto the stream, keeping only boundary rows (ts == t_open or
    t_close); (3) a second HashAggregate resolves timestamp ties with
    min_by/max_by over the BIGINT event_id — the one ordinal type that
    keeps the hash strategy (pinned in tests/test_plans.py: zero
    SortAggregate, zero Window).  Two columnar scans beat one sorted
    scan; open/close/high/low are SELECTED values, not arithmetic, so
    the doubles hash-match bit-for-bit cross-engine."""
    e = _ev(spark, sf_dir).select(
        "event_type",
        F.expr(f"ts_us DIV {US_PER_HOUR}").alias("bucket"),
        "ts_us",
        "event_id",
        "value",
    )
    bars = e.groupBy("event_type", "bucket").agg(
        F.min("ts_us").alias("t_open"),
        F.max("ts_us").alias("t_close"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.count(F.lit(1)).alias("n"),
    )
    edges = e.join(F.broadcast(bars), ["event_type", "bucket"]).filter(
        (F.col("ts_us") == F.col("t_open")) | (F.col("ts_us") == F.col("t_close"))
    )
    oc = edges.groupBy("event_type", "bucket").agg(
        F.expr(
            "min_by(value, CASE WHEN ts_us = t_open THEN event_id END)"
        ).alias("open"),
        F.expr(
            "max_by(value, CASE WHEN ts_us = t_close THEN event_id END)"
        ).alias("close"),
    )
    return (
        bars.join(oc, ["event_type", "bucket"])
        .select("event_type", "bucket", "open", "high", "low", "close", "n")
        .orderBy("event_type", "bucket")
    )
