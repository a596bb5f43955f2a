"""Round-7 second pack: distribution windows, sequence mining, data
validation, embedding column statistics, weighted systematic sampling,
kNN-graph construction, and framed audio features.

Like every declared query these are Spark-first designs of operations
the reference's user base (SURVEY.md §0/§2 — MapReduce-style analytics
plus the LLM-data north star) reaches for, each with a full DuckDB
oracle so the driver hash-attests values, not just row counts.

Scale notes, per query:

- ``q_events_sequences``: order-3 behavioral sequence counts (the
  n-gram generalization of q_events_transitions' first-order Markov
  matrix).  LEAD over (user, time) — one shuffle on user_id, the key
  the events stream is naturally bucketed by; the sequence-count agg
  re-shuffles only ~|event_types|³ distinct sequences.  At 100 TB the
  heavy stage is the per-user window, which co-partitions with every
  other per-user stage in the pipeline (funnel, retention, sessions).

- ``q_validate_constraints``: the dbt-test / Great-Expectations audit
  pattern — domain, range, uniqueness and FK rules evaluated as ONE
  conditional-aggregation pass per table plus one anti-join for the
  FK rule, unpivoted to a (rule, n_checked, n_violations) report.
  Nothing is row-materialized: violations are counted in the same
  scan that reads the table, so the audit costs what a COUNT(*)
  costs.  At 100 TB each rule family stays a single map-side-combined
  scan; the FK anti-join broadcasts the key side when bounded or
  falls back to the SMJ Catalyst picks.

- ``q_embed_dimstats``: per-dimension profile of an array<float>
  embedding column (count / mean / stddev / min / max) — the
  embedding-column twin of q_profile_table, used to catch dead or
  exploding dimensions before indexing.  posexplode keeps the 64×
  expansion in JVM codegen; 64 groups aggregate with map-side
  combine, so the shuffle is 64 rows per partition regardless of
  corpus size.  Mean/stddev use the exact-decimal parity sums
  (functions/parity.py) so every statistic is bit-identical.

- ``q_sample_systematic``: weighted (PPS) systematic sampling —
  deterministic pick of ~1 order per $10M of cumulative value within
  each priority class, the classic audit/estimation sample.  Unlike
  RNG sampling the selected set is a pure function of the data, so
  the ENTIRE selection (weights, prefix sums, threshold crossings)
  is value-hash-attested cross-engine.  The prefix sum is windowed
  PER PARTITION KEY (priority), the same bounded-window discipline
  as q_pack_shards: no global single-partition sort; for an
  unpartitioned 100 TB stream you'd range-partition and add
  per-range offsets (two passes, same arithmetic).

- ``q_knn_graph``: k-nearest-neighbor graph construction (k=5 by
  cosine) within each label block — the building block for
  graph-based dedup clustering and diversity filtering.  The
  within-block form IS the production shape: at scale the block is
  an LSH bucket or IVF cell (operators/dedup.py,
  queries/llm_ops.q_sim_ann_*), bounding the quadratic candidate
  stage, and the per-source top-k is a rank window over candidates
  only — never a global all-pairs.  The oracle brute-forces the same
  blocks, so the emitted edge set is hash-proven exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.parity import (
    davg,
    dstddev_cols,
    dsum,
    o_davg,
    o_dstddev,
    o_dsum,
    stddev_from,
)
from ..registry import query
from ..sources.tables import table as T


# --------------------------------------------------------------------------
# Behavioral sequence mining
# --------------------------------------------------------------------------


@query(
    "q_events_sequences",
    oracle="""
    WITH s AS (
      SELECT event_type,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS seq,
           COUNT(*) AS n
    FROM s
    WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, seq
    LIMIT 20
    """,
)
def q_events_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top order-3 event sequences per user timeline (the n-gram
    extension of q_events_transitions).  (ts, event_id) is a total
    order, so the LEAD chain is deterministic; sequences whose tail
    falls off the timeline are dropped on both engines by the e3 IS
    NOT NULL gate.  (n DESC, seq) totally orders the top-20 cut."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        s.select(F.concat_ws(">", "event_type", "e2", "e3").alias("seq"))
        .groupBy("seq")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "seq")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Data-quality constraint audit
# --------------------------------------------------------------------------


@query(
    "q_validate_constraints",
    oracle="""
    WITH o AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)
                  AS BIGINT) AS v_price,
             CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END)
                  AS BIGINT) AS v_status,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_unique
      FROM orders
    ),
    l AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CASE WHEN l_discount BETWEEN 0 AND 1 THEN 0 ELSE 1 END)
                  AS BIGINT) AS v_disc
      FROM lineitem
    ),
    fk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v_fk
      FROM lineitem li
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = li.l_orderkey)
    )
    SELECT rule, n_checked, n_violations
    FROM (
      SELECT 'lineitem_discount_in_range' AS rule, l.n AS n_checked, l.v_disc AS n_violations FROM l
      UNION ALL
      SELECT 'lineitem_fk_orders', l.n, fk.v_fk FROM l, fk
      UNION ALL
      SELECT 'orders_orderkey_unique', o.n, o.v_unique FROM o
      UNION ALL
      SELECT 'orders_status_domain', o.n, o.v_status FROM o
      UNION ALL
      SELECT 'orders_totalprice_positive', o.n, o.v_price FROM o
    )
    ORDER BY rule
    """,
)
def q_validate_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit (dbt-test / Great-Expectations shape): range,
    domain, and uniqueness rules as one conditional-aggregation scan
    per table, FK integrity as one left-anti join, unpivoted via
    ``stack`` into a (rule, n_checked, n_violations) report.  NULL
    predicate results count as violations on both engines (CASE WHEN
    pred THEN 0 ELSE 1).  Cost = one scan per audited table."""
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")

    viol = lambda pred: F.sum(F.when(pred, 0).otherwise(1))  # noqa: E731
    o_agg = o.agg(
        F.count(F.lit(1)).alias("o_rows"),
        viol(F.col("o_totalprice") > 0).alias("v_price"),
        viol(F.col("o_orderstatus").isin("O", "F", "P")).alias("v_status"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v_unique"),
    )
    l_agg = li.agg(
        F.count(F.lit(1)).alias("l_rows"),
        viol(F.col("l_discount").between(0, 1)).alias("v_disc"),
    )
    fk_agg = (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("v_fk"))
    )
    row = o_agg.crossJoin(l_agg).crossJoin(fk_agg)
    return row.selectExpr(
        """stack(5,
            'lineitem_discount_in_range', l_rows, v_disc,
            'lineitem_fk_orders',         l_rows, v_fk,
            'orders_orderkey_unique',     o_rows, v_unique,
            'orders_status_domain',       o_rows, v_status,
            'orders_totalprice_positive', o_rows, v_price
        ) AS (rule, n_checked, n_violations)"""
    ).orderBy("rule")


# --------------------------------------------------------------------------
# Embedding column statistics
# --------------------------------------------------------------------------


@query(
    "q_embed_dimstats",
    oracle="""
    SELECT CAST(i AS INT) AS dim,
           COUNT(*) AS n,
           {mean},
           {sd},
           MIN(v) AS min_v,
           MAX(v) AS max_v
    FROM (
      SELECT t.i AS i,
             list_extract(CAST(embedding AS DOUBLE[]), CAST(t.i + 1 AS INT)) AS v
      FROM embeddings, range(64) t(i)
    )
    GROUP BY dim
    ORDER BY dim
    """.format(
        mean=o_davg("v", "mean_v"),
        sd=o_dstddev("v", "sd_v", data_scale=6),
    ),
)
def q_embed_dimstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension statistics of the embedding column — the vector
    twin of q_profile_table (dead/exploding-dimension detection before
    index builds).  posexplode is JVM codegen; 64 groups aggregate
    with map-side combine so the shuffle is O(64·partitions) rows.
    float32→double is exact; mean/stddev go through the exact-decimal
    parity sums, min/max are exact doubles — the whole profile is
    bit-identical cross-engine."""
    e = T(spark, sf_dir, "embeddings")
    x = e.select(F.posexplode("embedding").alias("dim", "vf")).select(
        "dim", F.col("vf").cast("double").alias("v")
    )
    sx, sx2, n = dstddev_cols("v", data_scale=6)
    return (
        x.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            davg("v", "mean_v"),
            stddev_from(sx, sx2, n).alias("sd_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .orderBy("dim")
    )


# --------------------------------------------------------------------------
# Weighted systematic (PPS) sampling
# --------------------------------------------------------------------------

#: one pick per $10M of cumulative order value (integer cents)
_PPS_STEP = 1_000_000_000


@query(
    "q_sample_systematic",
    oracle=f"""
    SELECT o_orderkey, o_orderpriority, w, cum
    FROM (
      SELECT o_orderkey, o_orderpriority, w,
             CAST(SUM(w) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM (SELECT o_orderkey, o_orderpriority,
                   CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS w
            FROM orders)
    )
    WHERE cum // {_PPS_STEP} > (cum - w) // {_PPS_STEP}
    ORDER BY o_orderkey
    """,
)
def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted systematic (probability-proportional-to-size) sample:
    within each priority class, walk orders in key order accumulating
    integer-cent weights and pick every row whose cumulative weight
    crosses a $10M boundary — heavier orders are proportionally more
    likely to straddle a boundary, the PPS property.  All arithmetic
    is integer (FLOOR(x*100 + 0.5) — the repo's cents discipline: the
    +0.5 corrects double representation error like 0.29*100→28.999…,
    and FLOOR before the cast pins the one engine divergence:
    DuckDB's double→BIGINT cast rounds, Spark's truncates), so the
    selected set is hash-attested.  The prefix sum is windowed per
    priority key — bounded partitions, no global sort."""
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    weighted = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("w"),
    ).withColumn("cum", F.sum("w").over(w))
    return (
        weighted.filter(F.expr(f"cum DIV {_PPS_STEP} > (cum - w) DIV {_PPS_STEP}"))
        .select("o_orderkey", "o_orderpriority", "w", "cum")
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# kNN graph construction
# --------------------------------------------------------------------------


@query(
    "q_knn_graph",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    p AS (
      SELECT a.label AS label, a.vec_id AS src, b.vec_id AS nbr,
             ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
    )
    SELECT label, src, nbr, cos_sim, CAST(rk AS INT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                   ORDER BY cos_sim DESC, nbr) AS rk
      FROM p
    )
    WHERE rk <= 5
    ORDER BY src, rk
    """,
)
def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor graph (k=5, cosine) within each label block —
    the candidate graph that feeds graph-based dedup clustering
    (operators/graph.py) and diversity filters.  Block-local pairs +
    a per-source rank window; the block bounds the quadratic stage
    exactly as an LSH bucket or IVF cell does in the ANN operators,
    which is the 100 TB shape (swap `label` for the bucket key).
    Cosine is rounded to 6 on BOTH engines before ranking, so the
    order — and therefore the edge set — is deterministic and
    hash-proven."""
    from ..operators.similarity import pairwise_cosine_within

    e = T(spark, sf_dir, "embeddings")
    # materialize the unordered-pair cosines once (r14): the symmetric
    # union below references this subtree twice, and the per-group
    # kernel would otherwise run once per branch
    half = pairwise_cosine_within(e, group_col="label").localCheckpoint()
    sym = half.select(
        F.col("g").alias("label"),
        F.col("id_a").alias("src"),
        F.col("id_b").alias("nbr"),
        F.round("cosine", 6).alias("cos_sim"),
    ).unionByName(
        half.select(
            F.col("g").alias("label"),
            F.col("id_b").alias("src"),
            F.col("id_a").alias("nbr"),
            F.round("cosine", 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), "nbr")
    return (
        sym.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .orderBy("src", "rk")
    )


# --------------------------------------------------------------------------
# Multimodal: framed audio features
# --------------------------------------------------------------------------


@query(
    "q_multimodal_audio_windows",
    oracle="""
    WITH samp AS (
      SELECT d.doc_id, t.i,
             (d.doc_id * 7 + t.i * 3) % 2001 - 1000 AS s,
             CASE WHEN t.i > 0
                  THEN (d.doc_id * 7 + (t.i - 1) * 3) % 2001 - 1000 END AS sp
      FROM documents d, range(1000) t(i)
      WHERE t.i < 500 + d.doc_id % 500
    )
    SELECT doc_id,
           CAST(i // 100 AS BIGINT) AS win,
           COUNT(*) AS n,
           CAST(SUM(s * s) AS BIGINT) AS sum_sq,
           CAST(SUM(CASE WHEN sp IS NOT NULL AND s * sp < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS zcr
    FROM samp
    GROUP BY doc_id, win
    ORDER BY doc_id, win
    """,
)
def q_multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed audio analysis — the DSP step after q_multimodal_audio's
    clip-level decode: REAL RIFF/WAV decode, then fixed 100-sample
    frames each reduced to exact-integer energy (Σs²) and
    zero-crossing count (the voiced/unvoiced + loudness features a
    speech-data pipeline filters on).  One Arrow-batched 1→N
    mapInPandas stage (operators/multimodal.wav_window_features); the
    oracle BRUTE-FORCES every sample with a correlated range() and
    re-derives each frame's features, so the framing arithmetic and
    both reductions are value-hash attested.  Scale: map-only until
    the presentation sort; frames-per-clip is bounded, so the 1→N
    fan-out is a constant factor."""
    from ..operators.multimodal import make_wav_blobs, wav_window_features

    d = T(spark, sf_dir, "documents")
    return wav_window_features(make_wav_blobs(d)).orderBy("doc_id", "win")


# --------------------------------------------------------------------------
# Correlation matrix from exact sums
# --------------------------------------------------------------------------

#: measure columns for the correlation matrix (all money/ratio columns
#: at decimal scale 2 — the q_stats_regr parity discipline)
_CORR_COLS = ("l_discount", "l_extendedprice", "l_quantity", "l_tax")


def _corr_oracle() -> str:
    cols = _CORR_COLS
    dec = lambda c: f"CAST({c} AS DECIMAL(18,2))"  # noqa: E731
    d2d = lambda e: f"CAST(CAST({e} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    sums = ["COUNT(*) AS n"]
    for c in cols:
        sums.append(f"{d2d(f'SUM({dec(c)})')} AS s_{c}")
        sums.append(f"{d2d(f'SUM({dec(c)} * {dec(c)})')} AS s_{c}_{c}")
    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]
    ]
    for a, b in pairs:
        sums.append(f"{d2d(f'SUM({dec(a)} * {dec(b)})')} AS s_{a}_{b}")
    arms = []
    for a, b in pairs:
        corr = (
            f"(n * s_{a}_{b} - s_{a} * s_{b}) /"
            f" (sqrt(n * s_{a}_{a} - s_{a} * s_{a}) *"
            f"  sqrt(n * s_{b}_{b} - s_{b} * s_{b}))"
        )
        arms.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, n, {corr} AS corr FROM s"
        )
    return (
        "WITH s AS (SELECT " + ", ".join(sums) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(arms)
        + "\nORDER BY col_x, col_y"
    )


@query("q_stats_corr_matrix", oracle=_corr_oracle())
def q_stats_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation MATRIX over the lineitem measures — the
    covariance-matrix extension q_stats_regr's docstring promises:
    ONE aggregation pass computes every exact decimal sum (4 sums, 4
    sum-of-squares, 6 cross products, n), then each of the 6 unordered
    pairs is finished with identical IEEE post-arithmetic on both
    engines — bit-equal with zero tolerance.  Both the Spark plan and
    the DuckDB oracle are GENERATED from the same pair list, so the
    twins cannot drift.  Scale: single map-side-combinable pass; the
    matrix width grows O(k²) in columns, not in rows."""
    from ..functions.parity import _dec2dbl

    li = T(spark, sf_dir, "lineitem")
    cols = _CORR_COLS
    dec = {c: F.col(c).cast("decimal(18,2)") for c in cols}
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(_dec2dbl(F.sum(dec[c])).alias(f"s_{c}"))
        aggs.append(_dec2dbl(F.sum(dec[c] * dec[c])).alias(f"s_{c}_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        aggs.append(_dec2dbl(F.sum(dec[a] * dec[b])).alias(f"s_{a}_{b}"))
    sums = li.agg(*aggs)

    n = F.col("n")
    structs = []
    for a, b in pairs:
        sa, sb = F.col(f"s_{a}"), F.col(f"s_{b}")
        saa, sbb, sab = (
            F.col(f"s_{a}_{a}"),
            F.col(f"s_{b}_{b}"),
            F.col(f"s_{a}_{b}"),
        )
        corr = (n * sab - sa * sb) / (
            F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)
        )
        structs.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                n.alias("n"),
                corr.alias("corr"),
            )
        )
    return (
        sums.select(F.explode(F.array(*structs)).alias("r"))
        .select("r.*")
        .orderBy("col_x", "col_y")
    )


# --------------------------------------------------------------------------
# Trailing EWMA smoothing
# --------------------------------------------------------------------------

#: trailing depth (terms) and dyadic decay α = 1/2: weights 2^-1..2^-8
_EWMA_DEPTH = 8


@query(
    "q_window_ewma",
    oracle="""
    SELECT user_id, event_id,
           CAST(FLOOR(({expr}) * 1000000 + 0.5) AS BIGINT) AS ewma_micros
    FROM events
    ORDER BY user_id, event_id
    """.format(
        expr=" + ".join(
            f"COALESCE(LAG(value, {j}) OVER (PARTITION BY user_id"
            f" ORDER BY ts, event_id), 0.0) * {0.5 ** (j + 1)!r}"
            for j in range(_EWMA_DEPTH)
        )
    ),
)
def q_window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exponentially-weighted moving average (α = ½, depth 8)
    per user timeline — the standard smoothing op, made hash-exact by
    TWO choices: dyadic weights (2^-k scaling is exact in IEEE — each
    product keeps the value's mantissa), and a FIXED left-to-right
    summation order spelled out identically in both engines (neither
    Catalyst nor DuckDB reassociates float addition, the same
    guarantee every per-row expression in the repo leans on); the
    result is emitted as integer micros via the BM25 floor trick, so
    no ROUND-implementation difference can flip a boundary.  The
    truncation at depth 8 bounds the weight tail at 2^-8 — and keeps
    the window a fixed 8-lag stencil: one shuffle on user_id, no
    unbounded running state; the streaming form is an 8-value ring
    buffer per key, IMPLEMENTED as streaming/stateful.ewma_stream and
    asserted stream==batch in tests/test_streaming.py."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    terms = [
        F.coalesce(F.lag("value", j).over(w), F.lit(0.0)) * F.lit(0.5 ** (j + 1))
        for j in range(_EWMA_DEPTH)
    ]
    ewma = terms[0]
    for t in terms[1:]:
        ewma = ewma + t
    return ev.select(
        "user_id",
        "event_id",
        F.floor(ewma * F.lit(1_000_000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("ewma_micros"),
    ).orderBy("user_id", "event_id")


# --------------------------------------------------------------------------
# Higher-moment statistics from exact integer sums
# --------------------------------------------------------------------------


@query(
    "q_stats_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(q) AS BIGINT) AS s1,
             CAST(SUM(q*q) AS BIGINT) AS s2,
             CAST(SUM(q*q*q) AS BIGINT) AS s3,
             CAST(SUM(q*q*q*q) AS BIGINT) AS s4
      FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, s1, s2, s3, s4,
           (CAST(s3 AS DOUBLE)/n
              - 3.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n)
              + 2.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
             / ((CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
                * sqrt(CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)))
             AS skewness,
           (CAST(s4 AS DOUBLE)/n
              - 4.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s3 AS DOUBLE)/n)
              + 6.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n)
              - 3.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
             / ((CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n))
                * (CAST(s2 AS DOUBLE)/n - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n)))
             - 3.0 AS excess_kurtosis
    FROM s ORDER BY l_returnflag
    """,
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness + excess kurtosis per return flag from EXACT integer
    moment sums (l_quantity is integer-valued ≤ 50, verified, so Σq^k
    for k ≤ 4 is exact int64 at any corpus size that fits an engine) —
    the 3rd/4th-moment extension of the q_stats_regr template: one
    map-side-combinable pass collects (n, Σq, Σq², Σq³, Σq⁴); both
    engines then run the IDENTICAL central-moment IEEE arithmetic, so
    the statistics are bit-equal with zero tolerance — unlike the
    builtin skewness()/kurtosis(), whose double accumulation is
    partition-order dependent.  The raw sums are emitted too, so the
    driver hash attests the moment pipeline and not only the finished
    ratios."""
    li = T(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    sums = li.select("l_returnflag", q.alias("q")).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
        F.sum(F.col("q") * F.col("q") * F.col("q")).alias("s3"),
        F.sum(F.col("q") * F.col("q") * F.col("q") * F.col("q")).alias("s4"),
    )
    n = F.col("n")
    m1 = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n
    m3 = F.col("s3").cast("double") / n
    m4 = F.col("s4").cast("double") / n
    var = m2 - m1 * m1
    # var*sqrt(var) / var*var instead of pow(var, 1.5/2.0): pow with a
    # fractional exponent is libm-implementation-defined (observed 2-ulp
    # Spark-vs-DuckDB divergence); * and sqrt are correctly-rounded IEEE
    skew = (m3 - F.lit(3.0) * m1 * m2 + F.lit(2.0) * m1 * m1 * m1) / (
        var * F.sqrt(var)
    )
    kurt = (
        m4
        - F.lit(4.0) * m1 * m3
        + F.lit(6.0) * m1 * m1 * m2
        - F.lit(3.0) * m1 * m1 * m1 * m1
    ) / (var * var) - F.lit(3.0)
    return sums.select(
        "l_returnflag",
        "n",
        "s1",
        "s2",
        "s3",
        "s4",
        skew.alias("skewness"),
        kurt.alias("excess_kurtosis"),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# Phonetic blocking (soundex)
# --------------------------------------------------------------------------

#: char -> soundex code map (census soundex): vowels+y -> 0 (separator),
#: h/w -> 7 (transparent — deleted BEFORE collapsing so codes merge
#: across them), consonant groups -> 1..6
_SX_MAP = "01230127022455012623017202"

#: collapse digit runs without regex backreferences (DuckDB is RE2)
_SX_COLLAPSE_SQL = "m"
for _d in "0123456":
    _SX_COLLAPSE_SQL = (
        f"regexp_replace({_SX_COLLAPSE_SQL}, '{_d}+', '{_d}', 'g')"
    )


@query(
    "q_text_phonetic",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    coded AS (
      SELECT w,
             translate(w, 'abcdefghijklmnopqrstuvwxyz', '{_SX_MAP}') AS m
      FROM toks WHERE w <> ''
    ),
    collapsed AS (
      SELECT w, m,
             replace(replace({_SX_COLLAPSE_SQL}, '7', ''), '0', '') AS m3
      FROM (SELECT w, m, replace(m, '7', '') AS m_hw
            FROM coded) t(w, m_raw, m)
    ),
    sx AS (
      SELECT w,
             upper(substr(w, 1, 1)) ||
             substr(CASE WHEN substr(m_first, 1, 1) BETWEEN '1' AND '6'
                         THEN substr(m3, 2) ELSE m3 END || '000', 1, 3) AS code
      FROM (SELECT w, m3,
                   translate(substr(w, 1, 1),
                             'abcdefghijklmnopqrstuvwxyz', '{_SX_MAP}') AS m_first
            FROM collapsed)
    )
    SELECT code,
           COUNT(*) AS n_words,
           STRING_AGG(w, ',' ORDER BY w) AS words
    FROM sx GROUP BY code ORDER BY code
    """,
)
def q_text_phonetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking for entity resolution: census-soundex code
    per distinct token, grouped into blocks (the phonetic analogue of
    the FastSS deletion blocks in q_join_fuzzy — candidates share a
    block, verification joins within it).  Spark side is the builtin
    ``soundex()``; the DuckDB twin REPLAYS the census algorithm
    relationally (code translate → h/w deletion → run collapse →
    separator drop → first-letter casing), validated against Spark's
    implementation on the census edge-case suite (tymczak/pfister/
    ashcraft/honeyman/wray) in tests — so the driver hash proves two
    independent soundex implementations agree on real data.  Scale:
    map-side expression + one |vocabulary|-sized aggregation."""
    d = T(spark, sf_dir, "documents")
    toks = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    return (
        toks.select("w", F.soundex("w").alias("code"))
        .groupBy("code")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.array_join(F.array_sort(F.collect_list("w")), ",").alias("words"),
        )
        .orderBy("code")
    )


@query(
    "q_window_median",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS us,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    framed AS (
      SELECT user_id, event_id, us,
             list_sort(list(cents) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)) AS f
      FROM ev
    )
    SELECT user_id, event_id,
           CASE WHEN len(f) % 2 = 1 THEN 2 * f[(len(f) + 1) // 2]
                ELSE f[len(f) // 2] + f[len(f) // 2 + 1] END
             AS median_x2_cents,
           CAST(len(f) AS INTEGER) AS frame_n
    FROM framed
    ORDER BY user_id, event_id
    """,
)
def q_window_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median (order statistic in a moving frame) of
    per-user event values over the trailing 11 rows — the smoothing
    primitive Spark has no builtin for (percentile_approx is sketch-
    based).  Exactness protocol: values are exact 2-decimal doubles, so
    the median is computed in integer cents and reported DOUBLED
    (odd frame → 2·mid, even frame → lo+hi), keeping even-frame
    interpolation in integer arithmetic — bit-equal on both engines
    with no float division anywhere.

    Scale shape: one shuffle on user_id (the same key every per-user
    stage uses), then collect_list over an 11-row frame — O(frame)
    state per row inside the window sort, never a second shuffle.
    The collected frame stays in JVM expressions (sort_array +
    element_at — note these evaluate interpreted, not codegen, but on
    an 11-element primitive array that is noise; measured 5.0× wall at
    100× rows in SCALE_PROBE.json); no Python boundary."""
    e = T(spark, sf_dir, "events")
    ev = e.select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("us"),
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-10, Window.currentRow)
    )
    return (
        ev.withColumn("f", F.sort_array(F.collect_list("cents").over(w)))
        .select(
            "user_id",
            "event_id",
            F.expr(
                "CASE WHEN size(f) % 2 = 1"
                " THEN 2 * element_at(f, CAST((size(f) + 1) DIV 2 AS INT))"
                " ELSE element_at(f, CAST(size(f) DIV 2 AS INT))"
                "      + element_at(f, CAST(size(f) DIV 2 + 1 AS INT)) END"
            ).alias("median_x2_cents"),
            F.size("f").alias("frame_n"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q_events_attribution",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us
      FROM events
    ),
    marked AS (
      SELECT *,
             last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS click_us
      FROM ev
    )
    SELECT us // 86400000000 AS day,
           COUNT(*) AS n_purchases,
           CAST(SUM(CASE WHEN click_us IS NOT NULL
                          AND us - click_us <= 604800000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
           {av}
    FROM marked
    WHERE event_type = 'purchase'
    GROUP BY day
    ORDER BY day
    """.format(
        av=o_dsum(
            "CASE WHEN click_us IS NOT NULL AND us - click_us <= 604800000000"
            " THEN value ELSE 0 END",
            "attributed_value",
        )
    ),
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the most
    recent preceding click by the same user within a 7-day lookback,
    rolled up per day (purchases, attributed count, attributed
    revenue).  The marketing-analytics workhorse that is neither an
    as-of join (the click and purchase live in ONE stream) nor a
    funnel (it needs the *latest* prior touch, not existence) — it is
    the IGNORE NULLS conditional-window pattern.

    Scale shape: one shuffle on user_id shared with every other
    per-user stage; the window carries O(1) state (latest click time),
    and the final per-day rollup is a bounded-key aggregation with
    map-side combine."""
    e = T(spark, sf_dir, "events")
    ev = e.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.expr("ts div 1000").alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_us = F.last(
        F.when(F.col("event_type") == "click", F.col("us")), ignorenulls=True
    ).over(w)
    attributed = F.expr(
        "click_us IS NOT NULL AND us - click_us <= 604800000000"
    )
    return (
        ev.withColumn("click_us", click_us)
        .where(F.col("event_type") == "purchase")
        .groupBy(F.expr("us DIV 86400000000").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.when(attributed, 1).otherwise(0)).alias("n_attributed"),
            dsum(
                F.when(attributed, F.col("value")).otherwise(F.lit(0.0)),
                "attributed_value",
            ),
        )
        .orderBy("day")
    )


@query(
    "q_scd2_history",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS us
      FROM events
    ),
    marked AS (
      SELECT *,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    runs AS (
      SELECT *,
             CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS run_id
      FROM marked
    ),
    versions AS (
      SELECT user_id, run_id, event_type,
             MIN(us) AS valid_from_us,
             COUNT(*) AS n_events
      FROM runs GROUP BY user_id, run_id, event_type
    )
    SELECT user_id, event_type, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY valid_from_us, run_id)
             AS valid_to_us,
           n_events
    FROM versions
    ORDER BY user_id, valid_from_us
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history from a change log: per user,
    consecutive runs of the tracked attribute (event_type) collapse
    into versions with [valid_from, valid_to) validity intervals —
    the gaps-and-islands run detection (lag-compare → running-sum run
    id) plus a lead() for the closing edge, which is exactly how
    Delta/Iceberg SCD2 MERGE pipelines derive version rows.
    valid_to_us is NULL on each user's current version.  The closing
    lead() orders by (valid_from_us, run_id): two versions of one user
    CAN share a min-timestamp (two same-us events of different types
    form two runs), and without the run_id tiebreaker the order would
    not be total and the closing edge engine-nondeterministic
    (ADVICE r7; run_id itself is deterministic cross-engine because
    the run detection orders by the unique (us, event_id)).

    Scale shape: everything is windows + one aggregation over the
    SAME (user_id, time) shuffle — one exchange total, no joins; at
    100 TB the change log is naturally keyed by user_id so this
    co-partitions with the rest of the per-user pipeline."""
    e = T(spark, sf_dir, "events")
    ev = e.select(
        "user_id", "event_type", "event_id", F.expr("ts div 1000").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    runs = ev.withColumn("chg", chg).withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    versions = runs.groupBy("user_id", "run_id", "event_type").agg(
        F.min("us").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us", "run_id")
    return (
        versions.select(
            "user_id",
            "event_type",
            "valid_from_us",
            F.lead("valid_from_us").over(w2).alias("valid_to_us"),
            "n_events",
        )
        .orderBy("user_id", "valid_from_us")
    )


@query(
    "q_join_pointintime",
    oracle="""
    WITH dim AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(FLOOR(value) AS BIGINT) % 5 AS tier
      FROM events WHERE event_type = 'signup'
      QUALIFY row_number() OVER (PARTITION BY user_id, epoch_us(ts)
                                 ORDER BY event_id DESC) = 1
    ),
    facts AS (
      SELECT event_id, user_id, epoch_us(ts) AS us, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, f.us, f.value, d.tier
    FROM facts f
    ASOF LEFT JOIN dim d
      ON f.user_id = d.user_id AND f.us >= d.us + 1
    ORDER BY f.event_id
    """,
)
def q_join_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join: each purchase picks the dimension
    version (signup 'tier') in effect STRICTLY before its timestamp —
    the feature-store / SCD2-lookup join.  Spark side uses the
    scalable UNION + conditional-window form (tag dim and fact rows,
    one (user, time) sort, last(tier) IGNORE NULLS over preceding
    rows) — one shuffle, no range-join explosion, the plan that
    survives 100 TB.  The DuckDB oracle uses its native ASOF JOIN —
    an INDEPENDENT implementation of the same semantics, so the hash
    match proves the window encoding is a correct PIT join.  Equal
    timestamps resolve dim-after-fact on both sides (strict <).
    Dims are first deduplicated to one version per (user, instant)
    — max event_id wins — on BOTH engines: two signups at one
    timestamp would otherwise leave the window's (us, kind) order
    (and DuckDB's ASOF pick among tied right-side times) non-total
    and the joined tier engine-nondeterministic (ADVICE r7)."""
    e = T(spark, sf_dir, "events")
    dedup_w = Window.partitionBy("user_id", "us").orderBy(
        F.col("src_event_id").desc()
    )
    dim = (
        e.where(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("us"),
            F.expr("CAST(FLOOR(value) AS BIGINT) % 5").alias("tier"),
            F.col("event_id").alias("src_event_id"),
        )
        .withColumn("rn", F.row_number().over(dedup_w))
        .where("rn = 1")
        .select(
            "user_id",
            "us",
            "tier",
            F.lit(1).alias("kind"),  # dims sort AFTER facts at equal us
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    facts = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr("ts div 1000").alias("us"),
        F.lit(None).cast("long").alias("tier"),
        F.lit(0).alias("kind"),
        "event_id",
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "kind")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        dim.unionByName(facts)
        .withColumn("pit_tier", F.last("tier", ignorenulls=True).over(w))
        .where(F.col("kind") == 0)
        .select(
            "event_id",
            "user_id",
            "us",
            "value",
            F.col("pit_tier").alias("tier"),
        )
        .orderBy("event_id")
    )
