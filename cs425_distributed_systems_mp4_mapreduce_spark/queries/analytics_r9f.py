"""Round-9 pack F: vocabulary laws, mixture entropy, volatility bands,
corpus novelty, momentum, market concentration, robust means.

* ``q_text_zipf`` — Zipf rank-frequency profile of the term census
  (top-50 with rank·freq invariant and ppm share of the mode).
* ``q_mix_entropy`` — source-mixture entropy in integer half-bits via
  the floor-log2 surprisal quantization (the bigram-LM discipline) —
  the "is my data mix collapsing?" monitor beside q_mix_temperature.
* ``q_window_bollinger`` — 20-day Bollinger breakout flags with the
  2σ test cross-multiplied into exact integers: (x·n−S)² > 4(nQ−S²).
* ``q_text_ngram_novelty`` — per-document fraction of 3-gram shingles
  unseen in any earlier document (the curation-order novelty curve).
* ``q_window_rsi`` — 14-day RSI momentum in ppm from integer
  gain/loss window sums (flat window pinned to the 500000 midpoint).
* ``q_agg_hhi`` — Herfindahl–Hirschman concentration of order counts
  per market segment in exact ppb.
* ``q_agg_trimmed_mean`` — two-sided 10% trimmed mean over the
  value-domain census (rank clamping, no global sort of the fact
  table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# shared: bit-length as a pure CASE ladder (codegen, no HOF) and the
# daily order-revenue census in whole dollars (bollinger/rsi base)
# ------------------------------------------------------------------


def _blen_ladder(col: str) -> str:
    """CASE ladder computing bit_length(col) for 0 ≤ col < 2⁴⁰ — the
    cross-engine floor-log2 (same convention as operators/bpe.ilog2:
    blen(c) = k ⟺ 2^(k−1) ≤ c < 2^k, blen(0) = 0), but as a CASE
    chain that stays inside whole-stage codegen instead of an
    interpreted HOF indicator sum."""
    return (
        "CASE "
        + " ".join(f"WHEN {col} < {1 << k} THEN {k}" for k in range(0, 41))
        + " ELSE 41 END"
    )


_DAILY_SQL = """
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS r
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
        .alias("r")
    )


# ------------------------------------------------------------------
# Zipf rank-frequency profile
# ------------------------------------------------------------------

_ZIPF_TOP = 50

_ZIPF_ORACLE = f"""
WITH w AS (
  SELECT UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents),
c AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS freq FROM w
  WHERE term <> '' GROUP BY term),
r AS (
  SELECT term, freq,
         row_number() OVER (ORDER BY freq DESC, term) AS rank
  FROM c)
SELECT CAST(rank AS BIGINT) AS rank, term, freq,
       CAST(rank * freq AS BIGINT) AS rank_freq,
       CAST(freq * 1000000 //
            (first_value(freq) OVER (ORDER BY rank)) AS BIGINT)
         AS share_of_mode_ppm
FROM r WHERE rank <= {_ZIPF_TOP} ORDER BY rank
"""


@query("q_text_zipf", oracle=_ZIPF_ORACLE)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency profile: the top-{_ZIPF_TOP} terms with the
    rank·frequency product (constant under an ideal Zipf law — its
    drift measures how far the corpus deviates) and each term's ppm
    share of the mode (the f₁/rank prediction in integer form).  The
    vocabulary-law companion to the Heaps-law probes in
    SCALE_PROBE.json.

    Scale: the global rank window runs over the TERM CENSUS, whose
    size is Heaps-bounded (measured in-repo: |V| ∝ N^0.77) — the same
    justification as the BPE trainer's vocab stage; the fact table is
    never globally sorted."""
    d = T(spark, sf_dir, "documents")
    c = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    r = c.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("freq"), "term")).cast("long"),
    ).where(F.col("rank") <= _ZIPF_TOP)
    wmode = Window.orderBy("rank")
    return r.select(
        "rank",
        "term",
        "freq",
        (F.col("rank") * F.col("freq")).cast("long").alias("rank_freq"),
        F.expr(
            "CAST(freq * 1000000 DIV (first_value(freq)"
            " OVER (ORDER BY rank)) AS BIGINT)"
        ).alias("share_of_mode_ppm"),
    ).orderBy("rank")


# ------------------------------------------------------------------
# Source-mixture entropy (floor-log2 half-bit surprisal)
# ------------------------------------------------------------------

_ENT_ORACLE = f"""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source),
t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM c),
s AS (
  SELECT c.source, c.n_docs, t.total,
         2 * (({_blen_ladder('t.total')}) - ({_blen_ladder('c.n_docs')})) + 1
           AS surprisal_halfbits
  FROM c, t)
SELECT source, n_docs, total, CAST(surprisal_halfbits AS BIGINT)
         AS surprisal_halfbits,
       CAST(n_docs * surprisal_halfbits AS BIGINT) AS cost_halfbits
FROM s ORDER BY source
"""


@query("q_mix_entropy", oracle=_ENT_ORACLE)
def q_mix_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture entropy census: each source's quantized
    surprisal −log₂(n/N) as the integer half-bit cost
    2·(blen(N) − blen(n)) + 1 (the q_text_bigram_lm discipline) and
    its n·surprisal contribution — Σcost/N is the mixture entropy a
    data-mix monitor alarms on when one source starts dominating
    (entropy → 0) after a bad refresh.  Exact int64 end-to-end; the
    bit-length is a CASE ladder, not an interpreted HOF.

    Scale: one map-side-combined source census (≤ dozens of groups),
    then per-group scalar algebra against the 1-row total."""
    d = T(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    t = c.agg(F.sum("n_docs").cast("long").alias("total"))
    s = c.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "total",
        F.expr(
            f"CAST(2 * (({_blen_ladder('total')}) - ({_blen_ladder('n_docs')}))"
            " + 1 AS BIGINT)"
        ).alias("surprisal_halfbits"),
    )
    return s.select(
        "source",
        "n_docs",
        "total",
        "surprisal_halfbits",
        (F.col("n_docs") * F.col("surprisal_halfbits"))
        .cast("long")
        .alias("cost_halfbits"),
    ).orderBy("source")


# ------------------------------------------------------------------
# Bollinger 2σ breakout flags (exact cross-multiplied variance test)
# ------------------------------------------------------------------

_BOLL_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
w AS (
  SELECT day, r,
         CAST(COUNT(*) OVER win AS BIGINT) AS n_win,
         CAST(SUM(r) OVER win AS BIGINT) AS s_win,
         CAST(SUM(r * r) OVER win AS BIGINT) AS q_win
  FROM daily
  WINDOW win AS (ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
SELECT CAST(day AS BIGINT) AS day, r, n_win, s_win, q_win,
       CASE WHEN (r * n_win - s_win) * (r * n_win - s_win)
                 > 4 * (n_win * q_win - s_win * s_win)
            THEN 1 ELSE 0 END AS breakout
FROM w ORDER BY day
"""


@query("q_window_bollinger", oracle=_BOLL_ORACLE)
def q_window_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout flags on the daily revenue series: a
    day is a 2σ breakout when |x − μ| > 2σ over the trailing 20-day
    window.  With window count n, sum S, sum-of-squares Q the test
    cross-multiplies to the EXACT integer inequality
    (x·n − S)² > 4·(n·Q − S²) — no sqrt, no doubles, no
    float-variance catastrophic cancellation (the two-pass-variance
    bug class).  Daily revenue in whole dollars keeps every product
    < 2⁶³ at 100× this scale (bound in-source).

    Scale: the window runs over the calendar-bounded daily census
    (q_stats_runs discipline); at a 1000× day-count the same frame is
    per-(instrument) partitioned."""
    daily = _daily_spark(spark, sf_dir)
    win = Window.orderBy("day").rowsBetween(-19, 0)
    w = daily.select(
        F.col("day").cast("long").alias("day"),
        "r",
        F.count(F.lit(1)).over(win).cast("long").alias("n_win"),
        F.sum("r").over(win).cast("long").alias("s_win"),
        F.sum(F.col("r") * F.col("r")).over(win).cast("long").alias("q_win"),
    )
    lhs = (F.col("r") * F.col("n_win") - F.col("s_win")) * (
        F.col("r") * F.col("n_win") - F.col("s_win")
    )
    rhs = 4 * (
        F.col("n_win") * F.col("q_win") - F.col("s_win") * F.col("s_win")
    )
    return w.withColumn(
        "breakout", F.when(lhs > rhs, 1).otherwise(0)
    ).orderBy("day")


# ------------------------------------------------------------------
# Per-document n-gram novelty curve (curation-order dedup signal)
# ------------------------------------------------------------------

_NOV_K = 3

_NOV_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         LIST_DISTINCT([ARRAY_TO_STRING(words[i:i+{_NOV_K - 1}], ' ')
                        FOR i IN RANGE(1, GREATEST(LEN(words) - {_NOV_K - 1}, 1) + 1)])
           AS s
  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS words FROM documents)),
x AS (SELECT doc_id, UNNEST(s) AS shingle FROM sh),
firsts AS (
  SELECT shingle, CAST(MIN(doc_id) AS BIGINT) AS first_doc
  FROM x GROUP BY shingle)
SELECT x.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = x.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = x.doc_id THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
FROM x JOIN firsts f ON x.shingle = f.shingle
GROUP BY x.doc_id ORDER BY x.doc_id
"""


@query("q_text_ngram_novelty", oracle=_NOV_ORACLE)
def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty curve: the ppm fraction of each document's
    DISTINCT {_NOV_K}-gram shingles that appear in NO earlier document
    (doc_id order) — the marginal-value signal a curation pipeline
    reads to decide when a source is exhausted (novelty decays toward
    0 as the corpus saturates); q_text_boilerplate finds the shared
    shingles, this charges them to the first document that earned
    them.

    Scale: one shingle-keyed census (MIN doc_id — map-side combined)
    joined back to the per-doc shingle stream on the SAME key — both
    sides key on the 64-bit shingle hash (r14: the docstring's 100 TB
    posture is now the implementation; the census and the join shuffle
    8-byte keys instead of shingle strings, with the q_decontaminate
    hash-injectivity argument — equivalent absent 64-bit collisions,
    policed by the oracle hash gate) and the join co-partitions with no
    extra exchange.  The hashed shingle stream is materialized once
    per invocation (localCheckpoint, the prefix_filter_pairs
    discipline): the census and the join-back otherwise each
    re-evaluate the split→shingle→distinct→explode expression.
    Same-box A/B at sf0.1, median of 5, outputs bit-identical:
    3.33 s → 1.91 s (checkpoint 1.6×, hashed keys the rest)."""
    from ..operators.dedup import _shingle_sql

    d = T(spark, sf_dir, "documents")
    x = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.expr(_shingle_sql("text", _NOV_K)))
        ).alias("shingle"),
    ).select("doc_id", F.xxhash64("shingle").alias("shingle")).localCheckpoint()
    firsts = x.groupBy("shingle").agg(
        F.min("doc_id").cast("long").alias("first_doc")
    )
    return (
        x.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
            F.expr(
                "CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)"
                " * 1000000 DIV COUNT(1) AS BIGINT)"
            ).alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------------------------
# 14-day RSI momentum (integer gain/loss sums)
# ------------------------------------------------------------------

_RSI_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
d AS (
  SELECT day, r, r - LAG(r) OVER (ORDER BY day) AS delta FROM daily),
g AS (
  SELECT day, r,
         CAST(SUM(CASE WHEN delta > 0 THEN delta ELSE 0 END) OVER win
              AS BIGINT) AS gain14,
         CAST(SUM(CASE WHEN delta < 0 THEN -delta ELSE 0 END) OVER win
              AS BIGINT) AS loss14
  FROM d WHERE delta IS NOT NULL
  WINDOW win AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
SELECT CAST(day AS BIGINT) AS day, r, gain14, loss14,
       CASE WHEN gain14 + loss14 = 0 THEN 500000
            ELSE CAST(gain14 * 1000000 // (gain14 + loss14) AS BIGINT)
       END AS rsi_ppm
FROM g ORDER BY day
"""


@query("q_window_rsi", oracle=_RSI_ORACLE)
def q_window_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day RSI momentum on the daily revenue series, in ppm:
    gain/(gain+loss) over the trailing 14 deltas — >700000 ≈ the
    classic 70 overbought line.  The simple-average (Cutler) form, so
    every window sum is an exact int64 (Wilder's smoothed form is a
    recursion — that lives in streaming/cusum-style state, not a
    window); a flat window (no movement) pins to the 500000 midpoint
    by definition, identically in both engines.

    Scale: LAG + two window sums over the calendar-bounded daily
    census on ONE ordering — a single exchange."""
    daily = _daily_spark(spark, sf_dir)
    d = daily.withColumn(
        "delta", F.col("r") - F.lag("r").over(Window.orderBy("day"))
    ).where(F.col("delta").isNotNull())
    win = Window.orderBy("day").rowsBetween(-13, 0)
    g = d.select(
        F.col("day").cast("long").alias("day"),
        "r",
        F.sum(F.when(F.col("delta") > 0, F.col("delta")).otherwise(0))
        .over(win)
        .cast("long")
        .alias("gain14"),
        F.sum(F.when(F.col("delta") < 0, -F.col("delta")).otherwise(0))
        .over(win)
        .cast("long")
        .alias("loss14"),
    )
    return g.withColumn(
        "rsi_ppm",
        F.when(F.col("gain14") + F.col("loss14") == 0, F.lit(500000).cast("long"))
        .otherwise(
            F.expr("CAST(gain14 * 1000000 DIV (gain14 + loss14) AS BIGINT)")
        ),
    ).orderBy("day")


# ------------------------------------------------------------------
# Herfindahl–Hirschman concentration index (exact ppb)
# ------------------------------------------------------------------

_HHI_ORACLE = """
WITH c AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(n_orders) AS BIGINT) AS total_orders,
       CAST(SUM(n_orders * n_orders) AS BIGINT) AS sum_sq,
       CAST(SUM(n_orders * n_orders) * 1000000000
            // (SUM(n_orders) * SUM(n_orders)) AS BIGINT) AS hhi_ppb
FROM c GROUP BY segment ORDER BY segment
"""


@query("q_agg_hhi", oracle=_HHI_ORACLE)
def q_agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of order activity per market
    segment, in exact ppb: HHI = Σ(cᵢ/N)² = Σcᵢ²/N² — 10⁹ ppb = one
    customer owns the segment, 10⁹/n = perfectly diffuse.  The
    concentration complement to q_agg_gini (inequality of a sorted
    distribution) and q_stats_skew_report (single-key hotness): HHI is
    the antitrust/market-power form.  Σcᵢ²·10⁹ stays < 2⁶³ while
    per-customer counts are < ~3000 at any segment size (bound in
    docstring ≫ the ~30 observed; past that, quantize counts or lift
    to DECIMAL(38)).

    Scale: one (segment, customer) census with map-side combine, then
    a per-segment rollup — two exchanges, both on shrinking keys."""
    o = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    c = (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("o_custkey")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )
    return (
        c.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("n_orders").cast("long").alias("total_orders"),
            F.sum(F.col("n_orders") * F.col("n_orders"))
            .cast("long")
            .alias("sum_sq"),
            F.expr(
                "CAST(SUM(n_orders * n_orders) * 1000000000"
                " DIV (SUM(n_orders) * SUM(n_orders)) AS BIGINT)"
            ).alias("hhi_ppb"),
        )
        .orderBy("segment")
    )


# ------------------------------------------------------------------
# Two-sided 10% trimmed mean (value-domain census, rank clamping)
# ------------------------------------------------------------------

_TRIM_ORACLE = """
WITH v AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders),
c AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY v),
r AS (
  SELECT v, cnt,
         SUM(cnt) OVER (ORDER BY v) AS cum,
         SUM(cnt) OVER () AS n
  FROM c),
k AS (
  SELECT v, cnt, cum, n, n // 10 AS lo, n - n // 10 AS hi FROM r),
kept AS (
  SELECT n, lo, hi,
         GREATEST(LEAST(cum, hi) - GREATEST(cum - cnt, lo), 0) AS keep_cnt,
         v
  FROM k)
SELECT CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(lo) AS BIGINT) AS n_trimmed_each_side,
       CAST(SUM(keep_cnt) AS BIGINT) AS kept_n,
       CAST(SUM(v * keep_cnt) AS BIGINT) AS kept_sum_cents,
       CAST(SUM(v * keep_cnt) * 1000 // SUM(keep_cnt) AS BIGINT)
         AS trimmed_mean_millicents
FROM kept
"""


@query("q_agg_trimmed_mean", oracle=_TRIM_ORACLE)
def q_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided 10% trimmed mean of order prices — the robust-mean
    companion to q_outliers_mad: drop the lowest and highest ⌊n/10⌋
    observations BY RANK, average the rest.  Computed entirely on the
    value-domain census: each distinct value keeps
    max(min(cum, hi) − max(cum−cnt, lo), 0) of its cnt occurrences
    (rank-interval clamping — ties that straddle a trim boundary are
    kept exactly as many times as their ranks fall inside), so no
    global sort of the fact table and no per-row rank ever
    materializes.  All int64; the mean reports in floor millicents.

    Scale: the ordered window runs over the distinct-cents census
    (the q_stats_mannwhitney/q_stats_ks_drift discipline); at 100 TB
    quantize the census to cent buckets and refine the two boundary
    buckets exactly — the q_agg_percentile_twopass machinery."""
    o = T(spark, sf_dir, "orders")
    c = o.select(
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v")
    ).groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = c.select(
        "v",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    k = r.select(
        "v",
        "cnt",
        "cum",
        "n",
        F.expr("n DIV 10").alias("lo"),
        F.expr("n - n DIV 10").alias("hi"),
    )
    kept = k.select(
        "n",
        "lo",
        "v",
        F.greatest(
            F.least(F.col("cum"), F.col("hi"))
            - F.greatest(F.col("cum") - F.col("cnt"), F.col("lo")),
            F.lit(0),
        ).alias("keep_cnt"),
    )
    return kept.agg(
        F.max("n").cast("long").alias("n"),
        F.max("lo").cast("long").alias("n_trimmed_each_side"),
        F.sum("keep_cnt").cast("long").alias("kept_n"),
        F.sum(F.col("v") * F.col("keep_cnt"))
        .cast("long")
        .alias("kept_sum_cents"),
        F.expr(
            "CAST(SUM(v * keep_cnt) * 1000 DIV SUM(keep_cnt) AS BIGINT)"
        ).alias("trimmed_mean_millicents"),
    )
