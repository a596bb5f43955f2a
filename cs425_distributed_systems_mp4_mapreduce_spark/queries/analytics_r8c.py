"""Round-8 third pack: temperature mixture sampling, bounded-staleness
PIT join, multiset set-ops, bit-pack width analysis, composite quality
filter.

All integer-deterministic (cents / ppm / bucket thresholds pinned by
FLOOR), all fully DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# Temperature-scaled source mixture (multilingual data balancing)
# ------------------------------------------------------------------

#: Knuth multiplicative hash + bucket count (operators/sampling.py)
_KNUTH = 2654435761
_MIX_B = 1 << 20

_MIX_ORACLE = f"""
WITH census AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total FROM documents
  GROUP BY source),
thr AS (
  SELECT source, n_total,
         CAST(FLOOR(SQRT(CAST((SELECT MIN(n_total) FROM census) AS DOUBLE)
                         / n_total) * {_MIX_B}) AS BIGINT) AS threshold
  FROM census),
kept AS (
  SELECT d.source, d.doc_id, d.n_chars, t.n_total, t.threshold
  FROM documents d JOIN thr t USING (source)
  WHERE ((d.doc_id % {_MIX_B}) * {_KNUTH}) % {_MIX_B} < t.threshold)
SELECT thr.source, thr.n_total, thr.threshold,
       CAST(COUNT(kept.doc_id) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(kept.n_chars), 0) AS BIGINT) AS kept_chars
FROM thr LEFT JOIN kept ON kept.source = thr.source
GROUP BY thr.source, thr.n_total, thr.threshold
ORDER BY thr.source
"""


@query("q_mix_temperature", oracle=_MIX_ORACLE)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (α = 0.5) — the multilingual /
    multi-source balancing recipe (sample source s with probability ∝
    N_s^α, i.e. keep-rate q_s = sqrt(N_min/N_s): the smallest source
    is kept whole, large sources are downsampled toward the temperature
    mixture; effective masses become ∝ sqrt(N_s)).  Keep decisions are
    a pure function of doc_id (Knuth multiplicative hash vs an integer
    threshold pinned by FLOOR(q_s·2^20)), so the EXACT kept set — not
    just expected rates — is hash-attested, the q_sample_rebalance
    discipline with DATA-DERIVED rates instead of config constants.

    Scale: one census agg (4 groups), thresholds broadcast back on the
    source key, keep test is a map-only integer compare.  The report
    aggregates per source so the check covers every kept row."""
    d = T(spark, sf_dir, "documents")
    census = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    thr = census.withColumn(
        "threshold",
        F.expr(
            f"CAST(FLOOR(SQRT(CAST(MIN(n_total) OVER () AS DOUBLE) / n_total)"
            f" * {_MIX_B}) AS BIGINT)"
        ),
    )
    kept = (
        d.join(F.broadcast(thr), "source")
        .where(
            # doc_id is reduced mod 2^20 BEFORE the Knuth multiply
            # (congruent result mod 2^20) so the product stays below
            # 2^52 — a raw doc_id*2654435761 overflows int64 past
            # ~3.5e9 ids, where DuckDB raises and Spark wraps (ADVICE r8)
            F.expr(f"((doc_id % {_MIX_B}) * {_KNUTH}) % {_MIX_B}")
            < F.col("threshold")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
    )
    return (
        thr.join(kept, "source", "left")
        .fillna({"n_kept": 0, "kept_chars": 0})
        .select("source", "n_total", "threshold", "n_kept", "kept_chars")
        .orderBy("source")
    )


# ------------------------------------------------------------------
# Point-in-time join with a staleness bound (feature-store freshness)
# ------------------------------------------------------------------

_PIT_TOL_US = 7 * 86_400_000_000  # 7 days

_PIT_TOL_ORACLE = f"""
WITH dim AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(FLOOR(value) AS BIGINT) % 5 AS tier
  FROM events WHERE event_type = 'signup'
  QUALIFY row_number() OVER (PARTITION BY user_id, epoch_us(ts)
                             ORDER BY event_id DESC) = 1
),
facts AS (
  SELECT event_id, user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id, f.us,
       CASE WHEN f.us - d.us <= {_PIT_TOL_US} THEN d.tier END AS tier,
       CASE WHEN f.us - d.us <= {_PIT_TOL_US} THEN f.us - d.us END
         AS staleness_us
FROM facts f
ASOF LEFT JOIN dim d
  ON f.user_id = d.user_id AND f.us >= d.us + 1
ORDER BY f.event_id
"""


@query("q_join_pit_tolerance", oracle=_PIT_TOL_ORACLE)
def q_join_pit_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join with a STALENESS BOUND — the feature-store
    freshness contract (q_join_pointintime picks the version strictly
    before each fact; this variant additionally voids matches older
    than 7 days, the "feature too stale to serve" rule).  Same
    scalable union + conditional-window form: one (user, time) sort,
    last(tier)/last(dim us) IGNORE NULLS over preceding rows, then the
    tolerance test converts stale matches to NULL and reports the
    exact staleness µs on fresh ones.  Dims deduplicated per
    (user, instant) — max event_id wins — as in q_join_pointintime
    (ADVICE r7 determinism rule); the oracle is DuckDB's native ASOF
    JOIN plus the same tolerance CASE, an independent implementation
    of the whole contract."""
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
            F.col("us").alias("dim_us"),
            F.lit(1).alias("kind"),
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    facts = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr("ts div 1000").alias("us"),
        F.lit(None).cast("long").alias("tier"),
        F.lit(None).cast("long").alias("dim_us"),
        F.lit(0).alias("kind"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "kind")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    joined = (
        dim.unionByName(facts)
        .withColumn("pit_tier", F.last("tier", ignorenulls=True).over(w))
        .withColumn("pit_us", F.last("dim_us", ignorenulls=True).over(w))
        .where(F.col("kind") == 0)
    )
    fresh = (F.col("pit_us").isNotNull()) & (
        F.col("us") - F.col("pit_us") <= _PIT_TOL_US
    )
    return joined.select(
        "event_id",
        "user_id",
        "us",
        F.when(fresh, F.col("pit_tier")).alias("tier"),
        F.when(fresh, F.col("us") - F.col("pit_us")).alias("staleness_us"),
    ).orderBy("event_id")


# ------------------------------------------------------------------
# Multiset set operations (EXCEPT ALL / INTERSECT ALL)
# ------------------------------------------------------------------

_EXCEPT_ALL_ORACLE = """
WITH a AS (SELECT CAST(FLOOR(o_totalprice) AS BIGINT) // 100 AS hundreds
           FROM orders WHERE o_orderpriority = '1-URGENT'),
b AS (SELECT CAST(FLOOR(o_totalprice) AS BIGINT) // 100 AS hundreds
      FROM orders WHERE o_orderpriority = '2-HIGH'),
surv AS (SELECT hundreds FROM a EXCEPT ALL SELECT hundreds FROM b)
SELECT hundreds, COUNT(*) AS cnt FROM surv GROUP BY hundreds ORDER BY hundreds
"""


@query("q_set_except_all", oracle=_EXCEPT_ALL_ORACLE)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — MULTISET difference (each b-occurrence cancels ONE
    a-occurrence; q_set_except is the DISTINCT form): urgent-order
    cent values minus high-order cent values, surviving multiplicities
    in the output so the bag semantics are hash-visible.  Spark's
    ``exceptAll`` plans as a counted anti-aggregation (no quadratic
    anything); the oracle is DuckDB's native EXCEPT ALL — independent
    implementations of the same bag algebra."""
    o = T(spark, sf_dir, "orders")
    hundreds = F.expr("CAST(FLOOR(o_totalprice) AS BIGINT) DIV 100").alias(
        "hundreds"
    )
    a = o.where("o_orderpriority = '1-URGENT'").select(hundreds)
    b = o.where("o_orderpriority = '2-HIGH'").select(hundreds)
    return (
        a.exceptAll(b)
        .groupBy("hundreds")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("hundreds")
    )


_INTERSECT_ALL_ORACLE = """
WITH a AS (SELECT CAST(FLOOR(o_totalprice) AS BIGINT) // 100 AS hundreds
           FROM orders WHERE o_orderpriority = '1-URGENT'),
b AS (SELECT CAST(FLOOR(o_totalprice) AS BIGINT) // 100 AS hundreds
      FROM orders WHERE o_orderpriority = '2-HIGH'),
surv AS (SELECT hundreds FROM a INTERSECT ALL SELECT hundreds FROM b)
SELECT hundreds, COUNT(*) AS cnt FROM surv GROUP BY hundreds ORDER BY hundreds
"""


@query("q_set_intersect_all", oracle=_INTERSECT_ALL_ORACLE)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — MULTISET intersection (min of the two
    multiplicities per value), the bag twin of q_set_intersect;
    same cohorts and discipline as q_set_except_all."""
    o = T(spark, sf_dir, "orders")
    hundreds = F.expr("CAST(FLOOR(o_totalprice) AS BIGINT) DIV 100").alias(
        "hundreds"
    )
    a = o.where("o_orderpriority = '1-URGENT'").select(hundreds)
    b = o.where("o_orderpriority = '2-HIGH'").select(hundreds)
    return (
        a.intersectAll(b)
        .groupBy("hundreds")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("hundreds")
    )


# ------------------------------------------------------------------
# Bit-pack width analysis (the 4th storage-encoding query)
# ------------------------------------------------------------------

_BITPACK_BLOCK = 16  # orderkeys per block (key-range blocks)

_BITPACK_ORACLE = f"""
WITH v AS (
  SELECT 'l_quantity' AS col, l_orderkey // {_BITPACK_BLOCK} AS block,
         CAST(l_quantity AS BIGINT) AS q FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice_cents', l_orderkey // {_BITPACK_BLOCK},
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'l_discount_cents', l_orderkey // {_BITPACK_BLOCK},
         CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT 'l_partkey', l_orderkey // {_BITPACK_BLOCK},
         CAST(l_partkey AS BIGINT) FROM lineitem),
blocks AS (
  SELECT col, block, COUNT(*) AS n, MIN(q) AS lo, MAX(q) AS hi FROM v
  GROUP BY col, block),
widths AS (
  SELECT col, block, n,
         CAST(list_sum(list_transform(range(0, 40),
              k -> IF(hi - lo >= (1::BIGINT << k), 1, 0))) AS BIGINT)
           AS width
  FROM blocks)
SELECT col, width,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(n) AS BIGINT) AS n_values,
       CAST(SUM((n * width + 7) // 8 + 8) AS BIGINT) AS packed_bytes,
       CAST(SUM(n * 8) AS BIGINT) AS plain_bytes
FROM widths GROUP BY col, width ORDER BY col, width
"""


@query("q_encode_bitpack", oracle=_BITPACK_ORACLE)
def q_encode_bitpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-packing width analysis — the fourth storage-encoding probe
    (beside dict/RLE/delta): per key-range block of lineitem rows and
    per CANDIDATE COLUMN (quantity, price cents, discount cents,
    partkey — the real decision is per column), the frame-of-reference
    width bitlen(max − min) and the packed
    size (n·width bits + an 8-byte reference) versus plain int64 —
    the measurement behind parquet's BIT_PACKED/FOR encodings.
    Blocks derive from the KEY RANGE (l_orderkey DIV {_BITPACK_BLOCK}),
    not physical row position, so the census is layout-independent
    and deterministic; width uses the integer indicator-sum bitlen.

    Scale: one map-side-combined agg to per-block (min, max, n), one
    tiny census over widths — no sort, no window."""
    li = T(spark, sf_dir, "lineitem")
    block = F.expr(f"l_orderkey DIV {_BITPACK_BLOCK}").alias("block")
    cols = [
        ("l_quantity", "CAST(l_quantity AS BIGINT)"),
        ("l_extendedprice_cents", "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"),
        ("l_discount_cents", "CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)"),
        ("l_partkey", "CAST(l_partkey AS BIGINT)"),
    ]
    parts = [
        li.select(F.lit(name).alias("col"), block, F.expr(expr).alias("q"))
        for name, expr in cols
    ]
    v = parts[0]
    for pdf in parts[1:]:
        v = v.unionByName(pdf)
    blocks = v.groupBy("col", "block").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("q").alias("lo"),
        F.max("q").alias("hi"),
    )
    widths = blocks.select(
        "col",
        "n",
        F.expr(
            "CAST(aggregate(sequence(0, 39), 0L,"
            " (acc, k) -> acc + IF(hi - lo >= shiftleft(1L, k), 1L, 0L))"
            " AS BIGINT)"
        ).alias("width"),
    )
    return (
        widths.groupBy("col", "width")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum("n").cast("long").alias("n_values"),
            F.sum(F.expr("(n * width + 7) DIV 8 + 8")).cast("long").alias("packed_bytes"),
            F.sum(F.expr("n * 8")).cast("long").alias("plain_bytes"),
        )
        .orderBy("col", "width")
    )


# ------------------------------------------------------------------
# Composite quality filter (Gopher/C4-style rule ensemble)
# ------------------------------------------------------------------

_QUALITY_ORACLE = """
WITH tok AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents),
per_word AS (
  SELECT doc_id, word, COUNT(*) AS c FROM tok GROUP BY doc_id, word),
sig AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(SUM(c * STRLEN(word)) AS BIGINT) AS n_letters,
         CAST(MAX(c) AS BIGINT) AS top_freq
  FROM per_word GROUP BY doc_id),
scored AS (
  SELECT doc_id, n_words,
         n_distinct * 1000000 // n_words AS distinct_ppm,
         top_freq * 1000000 // n_words AS top_share_ppm,
         n_letters * 1000 // n_words AS mean_word_len_milli
  FROM sig)
SELECT doc_id, n_words, distinct_ppm, top_share_ppm, mean_word_len_milli,
       CAST(n_words >= 30 AND distinct_ppm >= 100000
            AND top_share_ppm <= 300000
            AND mean_word_len_milli BETWEEN 2000 AND 12000 AS INT) AS keep
FROM scored ORDER BY doc_id
"""


@query("q_quality_composite", oracle=_QUALITY_ORACLE)
def q_quality_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality filter — the Gopher/C4-style rule
    ensemble as ONE keep/drop verdict per document: minimum length,
    type-token (distinct-word) ratio, hottest-word share, and mean
    word length, every signal an exact integer (ppm / milli by
    integer division) so both the scorecard and the verdict bit are
    hash-attested.  This is the decision layer the individual signal
    queries (q_text_quality, q_text_repetition, q_text_bigram_lm)
    feed in a production filter chain.

    Scale: one tokenize + two map-side-combined aggregations keyed by
    doc — no joins, no windows, no Python."""
    d = T(spark, sf_dir, "documents")
    per_word = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sig = per_word.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("c") * F.length("word")).cast("long").alias("n_letters"),
        F.max("c").cast("long").alias("top_freq"),
    )
    scored = sig.select(
        "doc_id",
        "n_words",
        F.expr("n_distinct * 1000000 DIV n_words").alias("distinct_ppm"),
        F.expr("top_freq * 1000000 DIV n_words").alias("top_share_ppm"),
        F.expr("n_letters * 1000 DIV n_words").alias("mean_word_len_milli"),
    )
    return scored.select(
        "*",
        F.expr(
            "CAST(n_words >= 30 AND distinct_ppm >= 100000"
            " AND top_share_ppm <= 300000"
            " AND mean_word_len_milli BETWEEN 2000 AND 12000 AS INT)"
        ).alias("keep"),
    ).orderBy("doc_id")
