"""Round-9 pack N: vocabulary economics, returns KPIs, and the
quantization-fidelity evaluation of the ANN ladder.

* ``q_text_vocab_coverage`` — token coverage vs vocabulary size: the
  share of all corpus tokens covered by the top-k terms, for literal
  k rungs — the curve that sizes a tokenizer vocabulary (the
  BPE-trainer's stopping rule reads exactly this).
* ``q_lineitem_returns`` — monthly return-rate census: item- and
  revenue-weighted return shares in exact ppm.
* ``q_sim_recall_quantized`` — recall@10 of the int8-code integer
  cosine against a fine fixed-point reference ranking, per query
  vector — the self-evaluation every quantized ANN deployment owes
  its users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T
from .ann_xengine import _CODES_SPARK, _CODES_SQL

_DIM = 64

# ------------------------------------------------------------------
# Token coverage vs vocabulary size
# ------------------------------------------------------------------

_COV_KS = [5, 10, 20]
_COV_KS_SQL = ", ".join(str(k) for k in _COV_KS)

_COV_ORACLE = f"""
WITH c AS (
  SELECT u.term, CAST(COUNT(*) AS BIGINT) AS freq
  FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
  WHERE u.term <> '' GROUP BY 1),
ranked AS (
  SELECT freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS rk,
         SUM(freq) OVER (ORDER BY freq DESC, term
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(freq) OVER () AS total,
         COUNT(*) OVER () AS n_terms
  FROM c),
grid AS (SELECT UNNEST([{_COV_KS_SQL}]) AS k)
SELECT CAST(g.k AS BIGINT) AS k,
       CAST(MAX(r.n_terms) AS BIGINT) AS n_terms,
       CAST(MAX(r.cum) AS BIGINT) AS covered_tokens,
       CAST(MAX(r.total) AS BIGINT) AS total_tokens,
       CAST((1000000 * MAX(r.cum)) // MAX(r.total) AS BIGINT)
         AS coverage_ppm
FROM grid g JOIN ranked r ON r.rk <= g.k
GROUP BY g.k ORDER BY g.k
"""


@query("q_text_vocab_coverage", oracle=_COV_ORACLE)
def q_text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token coverage vs vocabulary size: for each literal rung
    k ∈ {5, 10, 20}, the exact ppm share of ALL corpus tokens covered
    by the k most frequent terms — the curve that sizes a tokenizer
    vocabulary and prices the OOV tail (the Heaps-law probes in
    SCALE_PROBE.json give this curve its growth law; the BPE
    trainer's vocab-size stopping rule reads it).  Frequency ranks
    carry the term total tie-break; coverage at a rung with fewer
    than k terms saturates at the full corpus.

    Scale: one Heaps-bounded term census; the rank window runs over
    the census (never the token stream), and the 3-row literal grid
    ≤-joins against it — a broadcast trivially."""
    d = T(spark, sf_dir, "documents")
    c = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    wo = Window.orderBy(F.desc("freq"), F.asc("term"))
    ranked = c.select(
        "freq",
        F.row_number().over(wo).alias("rk"),
        F.sum("freq").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
        F.sum("freq").over(Window.partitionBy()).alias("total"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_terms"),
    )
    grid = spark.createDataFrame([(k,) for k in _COV_KS], "k long")
    return (
        F.broadcast(grid)
        .join(ranked, ranked.rk <= grid.k)
        .groupBy("k")
        .agg(
            F.max("n_terms").cast("long").alias("n_terms"),
            F.max("cum").cast("long").alias("covered_tokens"),
            F.max("total").cast("long").alias("total_tokens"),
            F.expr(
                "CAST((1000000 * MAX(cum)) DIV MAX(total) AS BIGINT)"
            ).alias("coverage_ppm"),
        )
        .orderBy("k")
    )


# ------------------------------------------------------------------
# Monthly return-rate census (item- and revenue-weighted)
# ------------------------------------------------------------------

_RET_ORACLE = """
WITH li AS (
  SELECT year(l_shipdate) * 12 + month(l_shipdate) AS m,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_r,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem)
SELECT CAST(m AS BIGINT) AS m,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(is_r) AS BIGINT) AS n_returned,
       CAST((1000000 * SUM(is_r)) // COUNT(*) AS BIGINT) AS return_ppm,
       CAST(SUM(cents) AS BIGINT) AS rev_cents,
       CAST((1000000 * SUM(CASE WHEN is_r = 1 THEN cents ELSE 0 END))
            // SUM(cents) AS BIGINT) AS return_rev_ppm
FROM li GROUP BY 1 ORDER BY 1
"""


@query("q_lineitem_returns", oracle=_RET_ORACLE)
def q_lineitem_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly return-rate census: returned-item share AND
    returned-revenue share in exact ppm — the two KPIs diverge
    exactly when expensive items return disproportionately, which is
    the actionable signal.  One map-side-combined pass, calendar-
    bounded output, everything integer.

    Scale: a single aggregation keyed by month index — the canonical
    'touch the fact table once' rollup."""
    li = T(spark, sf_dir, "lineitem").select(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("long")
        .alias("m"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_r"),
        F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    return (
        li.groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("is_r").cast("long").alias("n_returned"),
            F.expr("CAST((1000000 * SUM(is_r)) DIV COUNT(*) AS BIGINT)").alias(
                "return_ppm"
            ),
            F.sum("cents").cast("long").alias("rev_cents"),
            F.expr(
                "CAST((1000000 * SUM(CASE WHEN is_r = 1 THEN cents ELSE 0 END))"
                " DIV SUM(cents) AS BIGINT)"
            ).alias("return_rev_ppm"),
        )
        .orderBy("m")
    )


# ------------------------------------------------------------------
# Quantization recall: int8-code cosine vs fine fixed-point reference
# ------------------------------------------------------------------

_REC_K = 10
_REC_NQ = 8

#: fine fixed-point reference: 1e4-scaled integer components — dot ≤
#: 64·1e8 = 6.4e9, exact int64; the reference ORDER is the double
#: dot/√n2 with vec_id tie-break (deterministic IEEE on exact ints).
_FINE_SPARK = "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000.0 + 0.5d) AS BIGINT))"
_FINE_SQL = "list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000.0 + 0.5) AS BIGINT))"

_REC_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_CODES_SQL} AS codes, {_FINE_SQL} AS fine
  FROM embeddings),
q AS (
  SELECT vec_id AS qid, codes AS qc, fine AS qf
  FROM base WHERE vec_id < {_REC_NQ}),
v AS (
  SELECT vec_id, codes, fine,
         list_sum(list_transform(codes, x -> x * x)) AS cn2,
         list_sum(list_transform(fine, x -> x * x)) AS fn2
  FROM base WHERE vec_id >= {_REC_NQ}),
d AS (
  SELECT q.qid, v.vec_id, v.cn2, v.fn2,
         list_sum(list_transform(range(1, {_DIM} + 1),
                  i -> v.codes[i] * q.qc[i])) AS cdot,
         list_sum(list_transform(range(1, {_DIM} + 1),
                  i -> v.fine[i] * q.qf[i])) AS fdot
  FROM v CROSS JOIN q WHERE v.cn2 > 0 AND v.fn2 > 0),
keyd AS (
  SELECT qid, vec_id,
         CASE WHEN cdot >= 0 THEN (cdot * cdot * 1000000) // cn2
              ELSE -((cdot * cdot * 1000000) // cn2) END AS ckey,
         CAST(fdot AS DOUBLE) / SQRT(CAST(fn2 AS DOUBLE)) AS fkey
  FROM d),
ranked AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY ckey DESC, vec_id)
           AS crn,
         row_number() OVER (PARTITION BY qid ORDER BY fkey DESC, vec_id)
           AS frn
  FROM keyd)
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(SUM(CASE WHEN crn <= {_REC_K} AND frn <= {_REC_K}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       CAST((1000000 * SUM(CASE WHEN crn <= {_REC_K} AND frn <= {_REC_K}
                THEN 1 ELSE 0 END)) // {_REC_K} AS BIGINT) AS recall_ppm
FROM ranked GROUP BY 1 ORDER BY 1
"""


@query("q_sim_recall_quantized", oracle=_REC_ORACLE)
def q_sim_recall_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the int8-code integer cosine against a fine
    1e4-fixed-point reference ranking, per query vector — the
    quantization-fidelity report every int8 ANN deployment owes its
    users (the ANN ladder q_sim_ann_*_xengine PRUNES with these codes;
    this measures what the pruning key costs in ranking fidelity).
    Both rankings are deterministic: the code key is the sign-aware
    integer floor-division key (kNN precedent, ≤1.07e18 < 2⁶³), the
    reference key is one double division over exact int64 dot/norm
    (components ≤ 6.4e9), and both carry the vec_id tie-break.

    Scale: the 8-row query batch broadcasts; the corpus scans once
    computing both keys map-side; two rank windows per query
    partition (q_sim_batch_topk's serving shape)."""
    base = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(_CODES_SPARK).alias("codes"),
        F.expr(_FINE_SPARK).alias("fine"),
    )
    q = base.where(F.col("vec_id") < _REC_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("codes").alias("qc"),
        F.col("fine").alias("qf"),
    )
    v = base.where(F.col("vec_id") >= _REC_NQ).select(
        "vec_id",
        "codes",
        "fine",
        F.expr("aggregate(transform(codes, x -> x * x), 0L, (a, x) -> a + x)")
        .alias("cn2"),
        F.expr("aggregate(transform(fine, x -> x * x), 0L, (a, x) -> a + x)")
        .alias("fn2"),
    )
    d = (
        v.crossJoin(F.broadcast(q))
        .where((F.col("cn2") > 0) & (F.col("fn2") > 0))
        .select(
            "qid",
            "vec_id",
            "cn2",
            "fn2",
            F.expr(
                "aggregate(zip_with(codes, qc, (a, b) -> a * b),"
                " 0L, (a, x) -> a + x)"
            ).alias("cdot"),
            F.expr(
                "aggregate(zip_with(fine, qf, (a, b) -> a * b),"
                " 0L, (a, x) -> a + x)"
            ).alias("fdot"),
        )
    )
    keyd = d.select(
        "qid",
        "vec_id",
        F.expr(
            "CASE WHEN cdot >= 0 THEN (cdot * cdot * 1000000) DIV cn2"
            " ELSE -((cdot * cdot * 1000000) DIV cn2) END"
        ).alias("ckey"),
        F.expr("CAST(fdot AS DOUBLE) / SQRT(CAST(fn2 AS DOUBLE))").alias(
            "fkey"
        ),
    )
    ranked = keyd.select(
        "qid",
        F.row_number()
        .over(Window.partitionBy("qid").orderBy(F.desc("ckey"), F.asc("vec_id")))
        .alias("crn"),
        F.row_number()
        .over(Window.partitionBy("qid").orderBy(F.desc("fkey"), F.asc("vec_id")))
        .alias("frn"),
    )
    hit = F.when((F.col("crn") <= _REC_K) & (F.col("frn") <= _REC_K), 1).otherwise(0)
    return (
        ranked.groupBy(F.col("qid").cast("long").alias("qid"))
        .agg(
            F.sum(hit).cast("long").alias("n_overlap"),
            F.expr(
                f"CAST((1000000 * SUM(CASE WHEN crn <= {_REC_K}"
                f" AND frn <= {_REC_K} THEN 1 ELSE 0 END)) DIV {_REC_K}"
                " AS BIGINT)"
            ).alias("recall_ppm"),
        )
        .orderBy("qid")
    )
