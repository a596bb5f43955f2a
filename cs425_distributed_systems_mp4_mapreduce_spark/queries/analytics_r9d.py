"""Round-9 pack D: similarity-range search, embedding hygiene,
randomness testing, storage planning, cross-document boilerplate.

* ``q_sim_range_search`` — RANGE similarity query (every vector with
  cosine ≥ t of the query — the threshold dual of top-k retrieval),
  on the proven integer-cosine algebra: cos ≥ t ⟺ dot > 0 AND
  den·dot² ≥ num·|a|²·|q|², all int64.
* ``q_embed_norm_bands`` — embedding L2²-norm band census over the
  int8 codes: the embedding-space hygiene probe (collapsed or
  exploding norms flag a broken encoder before anything downstream).
* ``q_stats_runs`` — Wald–Wolfowitz runs test on daily revenue vs its
  median: the randomness/trend probe complementing q_stats_ks_drift
  (drift between samples) and q_window_cusum (drift within a stream);
  expected-runs is the exact rational 1 + 2·n₁·n₂/n.
* ``q_encode_varint`` — LEB128/varint byte census per column (the 5th
  storage-encoding probe beside delta/dict/RLE/bitpack): byte cost is
  a pure threshold ladder on 7-bit groups, no logs.
* ``q_text_boilerplate`` — CROSS-document repeated 6-gram census (the
  CCNet-style boilerplate detector; q_text_repetition measures
  WITHIN-doc repetition — this finds shingles shared by many docs,
  the removal targets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T
from .ann_xengine import _CODES_SPARK, _CODES_SQL

_DIM = 64

# ------------------------------------------------------------------
# Similarity range search (threshold dual of top-k)
# ------------------------------------------------------------------

#: cosine threshold t = 0.35 → t² = 49/400 in integers
_RANGE_NUM, _RANGE_DEN = 49, 400

_RANGE_ORACLE = f"""
WITH cod AS (
  SELECT vec_id, {_CODES_SQL} AS codes FROM embeddings),
q AS (
  SELECT codes,
         list_sum(list_transform(codes, x -> x * x)) AS n2q
  FROM cod WHERE vec_id = 0),
v AS (
  SELECT vec_id, codes,
         list_sum(list_transform(codes, x -> x * x)) AS n2
  FROM cod WHERE vec_id <> 0),
d AS (
  SELECT v.vec_id, v.n2, q.n2q,
         list_sum(list_transform(range(1, {_DIM} + 1),
             i -> v.codes[i] * q.codes[i])) AS dot
  FROM v CROSS JOIN q)
SELECT vec_id, CAST(dot AS BIGINT) AS dot,
       CAST(n2 AS BIGINT) AS n2
FROM d
WHERE dot > 0 AND {_RANGE_DEN} * dot * dot >= {_RANGE_NUM} * n2 * n2q
ORDER BY vec_id
"""


@query("q_sim_range_search", oracle=_RANGE_ORACLE)
def q_sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE similarity search: every vector with cosine ≥ 0.35 of
    the vec-0 query — the threshold dual of q_sim_topk (retrieval
    asks "the k best"; dedup/clustering ask "everything above t").
    Integer-cosine algebra as in q_dedup_semantic: t² = num/den and
    cos ≥ t ⟺ dot > 0 AND den·dot² ≥ num·|a|²·|q|² — no sqrt, no
    doubles, fully hash-attested.

    Scale: map-only — the query codes ride an Arrow-batched dot
    kernel (one einsum per batch); the threshold filter needs no
    shuffle at all (contrast top-k's TakeOrdered).  At corpus scale
    the same filter runs after an LSH/IVF candidate prune
    (q_sim_ann_*), identical algebra."""
    from ..operators.dedup import codes_dot_udf

    e = T(spark, sf_dir, "embeddings")
    cod = e.select("vec_id", F.expr(_CODES_SPARK).alias("codes"))
    q = cod.filter(F.col("vec_id") == 0).collect()[0]["codes"]
    qv = [int(x) for x in q]
    n2q = sum(x * x for x in qv)
    dot_udf = codes_dot_udf()
    n2_expr = "aggregate(transform(codes, x -> x * x), 0L, (acc, v) -> acc + v)"
    return (
        cod.where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            dot_udf(
                F.col("codes"), F.array(*[F.lit(x) for x in qv])
            ).alias("dot"),
            F.expr(n2_expr).alias("n2"),
        )
        .where(
            (F.col("dot") > 0)
            & (
                _RANGE_DEN * F.col("dot") * F.col("dot")
                >= _RANGE_NUM * F.col("n2") * F.lit(n2q)
            )
        )
        .orderBy("vec_id")
    )


# ------------------------------------------------------------------
# Embedding norm-band census (encoder hygiene)
# ------------------------------------------------------------------

_NORM_BAND = 65536

_NORM_ORACLE = f"""
WITH cod AS (
  SELECT vec_id, {_CODES_SQL} AS codes FROM embeddings),
n AS (
  SELECT vec_id,
         list_sum(list_transform(codes, x -> x * x)) AS n2
  FROM cod)
SELECT CAST(n2 // {_NORM_BAND} AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(MIN(n2) AS BIGINT) AS min_n2,
       CAST(MAX(n2) AS BIGINT) AS max_n2
FROM n GROUP BY 1 ORDER BY band
"""


@query("q_embed_norm_bands", oracle=_NORM_ORACLE)
def q_embed_norm_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2²-norm band census over the proven int8 codes —
    the embedding-space hygiene report (a healthy encoder yields a
    tight norm band; collapsed vectors pile into band 0, exploding
    ones into the top band — both flag encoder bugs before any
    similarity op runs).  All integer: n2 ≤ dim·127² ≈ 10⁶, bands of
    {_NORM_BAND}.

    Scale: map-only n2 + a ≤16-group census."""
    e = T(spark, sf_dir, "embeddings")
    n2_expr = "aggregate(transform(codes, x -> x * x), 0L, (acc, v) -> acc + v)"
    n = e.select(F.expr(_CODES_SPARK).alias("codes")).select(
        F.expr(n2_expr).alias("n2")
    )
    return (
        n.groupBy(F.expr(f"n2 DIV {_NORM_BAND}").alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.min("n2").cast("long").alias("min_n2"),
            F.max("n2").cast("long").alias("max_n2"),
        )
        .orderBy("band")
    )


# ------------------------------------------------------------------
# Wald–Wolfowitz runs test (randomness of the daily series)
# ------------------------------------------------------------------

_RUNS_ORACLE = """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS r
  FROM orders GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
med AS (
  SELECT r AS m FROM (
    SELECT r, row_number() OVER (ORDER BY r, day) AS rn FROM daily) t, nn
  WHERE rn = (nn.n + 1) // 2),
s AS (
  SELECT day, CASE WHEN r > med.m THEN 1 ELSE 0 END AS hi
  FROM daily, med WHERE r <> med.m),
runs AS (
  SELECT hi,
         CASE WHEN LAG(hi) OVER (ORDER BY day) IS DISTINCT FROM hi
              THEN 1 ELSE 0 END AS brk
  FROM s)
SELECT CAST(SUM(brk) AS BIGINT) AS n_runs,
       CAST(SUM(hi) AS BIGINT) AS n_hi,
       CAST(SUM(1 - hi) AS BIGINT) AS n_lo,
       CAST(2 * SUM(hi) * SUM(1 - hi) + COUNT(*) AS BIGINT) AS e_num,
       CAST(COUNT(*) AS BIGINT) AS e_den,
       CAST(2 * SUM(hi) * SUM(1 - hi) + COUNT(*) AS DOUBLE) / COUNT(*)
         AS expected_runs
FROM runs
"""


@query("q_stats_runs", oracle=_RUNS_ORACLE)
def q_stats_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily revenue series vs its
    median — the randomness probe (too FEW runs = trending/clustered,
    too MANY = oscillating): days above/below the exact median (ties
    at the median dropped, the classic treatment), runs counted as
    1 + sign changes via LAG (the first row's NULL lag counts as a
    break, giving exactly that +1), expected runs as the exact
    rational (2·n₁·n₂ + n)/n beside its int64 numerator/denominator.

    Scale: the daily census is calendar-bounded, so every ordered
    window runs over a bounded table (q_stats_ks_drift discipline);
    the median is a rank selection, not a sort of the fact table."""
    from pyspark.sql import Window

    o = T(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')").alias(
            "day"
        )
    ).agg(
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("r")
    )
    nn = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = daily.withColumn(
        "rn", F.row_number().over(Window.orderBy("r", "day"))
    )
    med = (
        ranked.crossJoin(F.broadcast(nn))
        .where(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select(F.col("r").alias("m"))
    )
    s = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("r") != F.col("m"))
        .select("day", F.when(F.col("r") > F.col("m"), 1).otherwise(0).alias("hi"))
    )
    wd = Window.orderBy("day")
    runs = s.withColumn(
        "brk",
        F.when(
            ~F.lag("hi").over(wd).eqNullSafe(F.col("hi")), 1
        ).otherwise(0),
    )
    return runs.agg(
        F.sum("brk").cast("long").alias("n_runs"),
        F.sum("hi").cast("long").alias("n_hi"),
        F.sum(1 - F.col("hi")).cast("long").alias("n_lo"),
        (2 * F.sum("hi") * F.sum(1 - F.col("hi")) + F.count(F.lit(1)))
        .cast("long")
        .alias("e_num"),
        F.count(F.lit(1)).cast("long").alias("e_den"),
        (
            (
                2 * F.sum("hi") * F.sum(1 - F.col("hi"))
                + F.count(F.lit(1))
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("expected_runs"),
    )


# ------------------------------------------------------------------
# Varint (LEB128) byte census (storage planning)
# ------------------------------------------------------------------

_VARINT_LADDER = " ".join(
    f"WHEN v < {1 << (7 * b)} THEN {b}" for b in range(1, 9)
)

_VARINT_ORACLE = f"""
WITH vals AS (
  SELECT 'o_orderkey' AS col, CAST(o_orderkey AS BIGINT) AS v FROM orders
  UNION ALL
  SELECT 'o_custkey', CAST(o_custkey AS BIGINT) FROM orders
  UNION ALL
  SELECT 'total_cents', CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
  FROM orders),
b AS (
  SELECT col, CASE {_VARINT_LADDER} ELSE 9 END AS nb FROM vals)
SELECT col,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(nb) AS BIGINT) AS varint_bytes,
       CAST(COUNT(*) * 8 AS BIGINT) AS fixed_bytes,
       CAST((COUNT(*) * 8 - SUM(nb)) * 1000000 // (COUNT(*) * 8)
            AS BIGINT) AS savings_ppm
FROM b GROUP BY col ORDER BY col
"""


@query("q_encode_varint", oracle=_VARINT_ORACLE)
def q_encode_varint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Varint/LEB128 byte census per column — the fifth
    storage-encoding probe (delta/dict/RLE/bitpack are in-repo): how
    many bytes each value needs at 7 payload bits per byte, as a pure
    integer threshold ladder (no log), plus the savings vs fixed
    int64 in ppm.  The planning census a columnar writer consults
    before picking an encoding.

    Scale: map-only ladder + one 3-group census; the three columns
    stack through one scan."""
    o = T(spark, sf_dir, "orders")
    vals = o.selectExpr(
        "stack(3, 'o_orderkey', CAST(o_orderkey AS BIGINT),"
        " 'o_custkey', CAST(o_custkey AS BIGINT),"
        " 'total_cents', CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))"
        " AS (col, v)"
    )
    return (
        vals.select("col", F.expr(f"CASE {_VARINT_LADDER} ELSE 9 END").alias("nb"))
        .groupBy("col")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("nb").cast("long").alias("varint_bytes"),
            (F.count(F.lit(1)) * 8).cast("long").alias("fixed_bytes"),
            F.expr(
                "CAST((COUNT(1) * 8 - SUM(nb)) * 1000000"
                " DIV (COUNT(1) * 8) AS BIGINT)"
            ).alias("savings_ppm"),
        )
        .orderBy("col")
    )


# ------------------------------------------------------------------
# Cross-document boilerplate shingle census
# ------------------------------------------------------------------

_BP_K = 6
_BP_MIN_DOCS = 3

_BP_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         LIST_DISTINCT([ARRAY_TO_STRING(words[i:i+{_BP_K - 1}], ' ')
                        FOR i IN RANGE(1, GREATEST(LEN(words) - {_BP_K - 1}, 1) + 1)])
           AS s
  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS words FROM documents)),
x AS (SELECT doc_id, UNNEST(s) AS shingle FROM sh),
c AS (
  SELECT shingle,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
  FROM x GROUP BY shingle)
SELECT shingle, n_docs, min_doc_id
FROM c WHERE n_docs >= {_BP_MIN_DOCS}
ORDER BY n_docs DESC, shingle
"""


@query("q_text_boilerplate", oracle=_BP_ORACLE)
def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-document boilerplate detector: {_BP_K}-gram shingles
    appearing in ≥ {_BP_MIN_DOCS} DISTINCT documents, with doc counts
    — the removal-target census (headers, licence blocks, navigation
    chrome) a CCNet-style pipeline subtracts before dedup;
    q_text_repetition measures within-doc repetition, this finds the
    corpus-wide offenders.

    Scale: shingle → distinct-per-doc (JVM HOF, map-side) → one
    shingle-keyed census with map-side combine; the ≥{_BP_MIN_DOCS}
    floor prunes the unique-shingle long tail before any sort.  At
    100 TB the census keys on a 64-bit shingle hash first and only
    materializes strings for survivors (the q_dedup_near staging)."""
    from ..operators.dedup import _shingle_sql

    d = T(spark, sf_dir, "documents")
    x = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.expr(_shingle_sql("text", _BP_K)))
        ).alias("shingle"),
    )
    return (
        x.groupBy("shingle")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
        )
        .where(F.col("n_docs") >= _BP_MIN_DOCS)
        .orderBy(F.desc("n_docs"), "shingle")
    )
