"""Round-8 pack: SemDeDup-style semantic dedup, fully oracled.

``q_dedup_semantic`` completes the dedup family matrix (exact /
MinHash / SimHash / containment / span / incremental / embedding-LSH)
with the EMBEDDING-CLUSTER pruning of Abbas et al. 2023 ("SemDeDup:
Data-efficient learning at web-scale through semantic deduplication"):
assign every vector to a cluster, compute pairwise cosine similarity
ONLY within a cluster, and drop every vector that has a more-canonical
(here: smaller-id) neighbor above the similarity threshold.

Cross-engine provability comes from the proven ANN-ladder recipe
(queries/ann_xengine.py / ivf_xengine.py / pq_xengine.py):

* vectors enter as the int8 codes ``q_embed_quantize`` proved
  bit-identical cross-engine (shared ``_CODES_*`` expressions);
* cluster anchors are data-derived and RNG-free — the code vectors of
  vec_id 0..C-1 (production swaps in KMeans centroids; the
  assign/prune ALGEBRA, which is what the hash proves, is identical);
* cell assignment = integer L2² argmin, ties to the smaller cell id
  (DuckDB: ``arg_min(c, dist*C + c)``);
* the cosine threshold compares in INTEGERS: cos(a,b) >= t with
  t² = num/den  ⟺  dot > 0 AND den·dot² >= num·|a|²·|b|² — no
  sqrt, no doubles, so the kept/dropped partition is bit-deterministic
  on both engines (dot ≤ 127²·64 ≈ 1.03e6, so den·dot² ≤ 2.7e13:
  comfortably int64).

The driver-testdata embeddings are near-random (max pairwise cosine
≈ 0.51), so the threshold is set at 0.40 — the tail of THIS corpus's
similarity distribution — to exercise the pruning algebra on real
rows; a production run on real embeddings uses ~0.95 with the
identical plan.

100 TB shape: the cluster key bounds the quadratic stage exactly as
the LSH bucket / IVF cell does — per-cell pair volume is measured in
SCALE_PROBE.json (``semdedup_cells``) with the C ∝ √N cell-count
discipline.  Since round 9 the DECLARED form's cell assignment runs
through the Arrow-batched numpy argmin (operators/dedup.py
``codes_cell_udf``) — the earlier literal-folded HOF expression
evaluated interpreted per row (198 s at sf0.01, the repo's own
documented HOF pitfall) with bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T
from .ann_xengine import _CODES_SPARK, _CODES_SQL

_DIM = 64
_C = 8  # anchor cells (code vectors of vec_id 0..7)
#: cosine threshold t = 0.40: t² = 4/25 in integers
_T2_NUM, _T2_DEN = 4, 25

_SEMDEDUP_ORACLE = f"""
WITH cod AS (
  SELECT vec_id, {_CODES_SQL} AS codes FROM embeddings),
anch AS (
  SELECT vec_id AS c, codes FROM cod WHERE vec_id < {_C}),
dvc AS (
  SELECT v.vec_id, a.c,
         list_sum(list_transform(range(1, {_DIM} + 1),
             d -> (v.codes[d] - a.codes[d]) * (v.codes[d] - a.codes[d]))) AS dist
  FROM cod v CROSS JOIN anch a),
asg AS (
  SELECT vec_id, arg_min(c, dist * {_C} + c) AS cell
  FROM dvc GROUP BY vec_id),
v AS (
  SELECT asg.vec_id, asg.cell, cod.codes,
         list_sum(list_transform(range(1, {_DIM} + 1),
             d -> cod.codes[d] * cod.codes[d])) AS n2
  FROM asg JOIN cod USING (vec_id)),
pairs AS (
  SELECT a.cell, a.vec_id AS keeper, b.vec_id AS dup,
         list_sum(list_transform(range(1, {_DIM} + 1),
             d -> a.codes[d] * b.codes[d])) AS dot,
         a.n2 AS na2, b.n2 AS nb2
  FROM v a JOIN v b ON a.cell = b.cell AND a.vec_id < b.vec_id)
SELECT dup AS dup_id,
       CAST(MIN(keeper) AS BIGINT) AS keeper_id,
       CAST(MIN(cell) AS INT) AS cell,
       COUNT(*) AS n_neighbors
FROM pairs
WHERE dot > 0 AND {_T2_DEN} * dot * dot >= {_T2_NUM} * na2 * nb2
GROUP BY dup
ORDER BY dup_id
"""


#: max vectors a single pair-enumeration task may own.  Cells above
#: this size are sub-split into s = ceil(m / cap) hash buckets and the
#: within-cell quadratic runs as s·(s+1)/2 independent pair-group
#: tasks of ≈ cap² pairs each (~1e6 at the default) — the
#: q_join_skew_salted salting discipline applied to a self-join.
_CELL_CAP = 1024


def semdedup_frame(
    spark: SparkSession, sf_dir: str, n_cells: int | None = _C,
    cell_cap: int = _CELL_CAP, n_vectors: int | None = None,
) -> DataFrame:
    """Parameterized SemDeDup plan (the query below pins n_cells=8 for
    its oracle; the scale probe runs the SAME plan at the C ∝ √N
    discipline): integer cell assignment against the RNG-free anchor
    codebook, cell-local pairwise integer-cosine threshold test, drop
    rule = "has any smaller-id neighbor above t in my cell" with the
    smallest such neighbor reported as the keeper.

    ``n_cells=None`` derives C = ⌈√N⌉ from the vector count via
    operators/dedup.derive_scale_params — the discipline the
    third-decade A/B measured better than the pinned cell count
    (SCALE_PROBE.json ``q_dedup_semantic_c1414`` 317 s vs ``_c1024``
    388 s at 2M vectors; VERDICT r11 task 5).  The DECLARED query
    keeps its explicit parity C (the oracle hash depends on it), so
    nothing attested changes.  The anchor codebook is the code
    vectors of vec_id 0..C-1, so the derived C also needs those ids
    present — the assert below is the guard.

    Plan: the codebook is a bounded n_cells-row collect; assignment
    is the Arrow-batched numpy kernel operators/dedup.codes_cell_udf
    (the earlier literal-folded HOF form evaluated interpreted per
    row, 198 s at sf0.01); the quadratic stage is a grouped Arrow
    kernel — ONE exact-float64 BLAS matmul per (cell, pair-group) via
    applyInPandas, so candidate pairs never materialize as rows; the
    drop rule is one aggregation.

    MAX-CELL BOUND (the round-9 probe's straggler finding,
    SCALE_PROBE.json ``semdedup_wall.sf10_finding``): the C ∝ √N cell
    discipline bounds AVERAGE pair volume but not the max cell — a
    planted near-dup cluster put 25k of 200k vectors in ONE cell, so
    3.1e8 of the 5.3e8 total pairs ran as a single task (killed at
    >13 min).  Remedy implemented here: every vector gets a
    deterministic sub-bucket b = pmod(xxhash64(vec_id), s) where
    s = ceil(cell_size / cell_cap), and the pair-group key becomes
    (cell, ga, gb) over the s·(s+1)/2 unordered bucket pairs — role A
    replicates a row in bucket b to groups (b, b..s-1), role B to
    groups (0..b, b), so every within-cell pair meets in EXACTLY one
    group: cross-bucket pairs in (min_b, max_b) with the roles fixed
    by bucket order (hence keeper/dup re-derived via min/max),
    same-bucket pairs in the diagonal group (b, b) in both role
    orders (hence the ida < idb mask there).  Per-task pair volume
    is ≤ ~cell_cap² regardless of skew; replication cost is
    (s+1)/2 ≈ m/(2·cap) copies of a 64-byte code row — for the probe's
    hot cell, 25 copies of 25k rows vs 3.1e8 single-task pairs.
    Cells at or under the cap have s = 1 and reduce to the single
    diagonal group, i.e. exactly the pre-bound plan.  The kept/dropped
    RESULT is bucket-independent (the groups partition the same pair
    set), so the parity oracle is unchanged."""
    e = T(spark, sf_dir, "embeddings")
    cod = e.select("vec_id", F.expr(_CODES_SPARK).alias("codes"))

    if n_cells is None:
        from ..operators.dedup import derive_scale_params

        # n_vectors: the same known-count bypass as the *_pairs_auto
        # wrappers' n_docs — skip the derivation count() when the
        # caller just counted the table.
        n = e.select("vec_id").count() if n_vectors is None else int(n_vectors)
        n_cells = derive_scale_params(n)["semdedup_cells"]

    anchors = {
        r["vec_id"]: list(r["codes"])
        for r in cod.filter(F.col("vec_id") < n_cells).collect()
    }
    assert len(anchors) == n_cells, "need anchor vectors 0..C-1"

    from ..operators.dedup import codes_cell_udf

    cell_udf = codes_cell_udf([anchors[c] for c in range(n_cells)])
    n2_expr = "aggregate(transform(codes, x -> x * x), 0L, (acc, v) -> acc + v)"

    from pyspark.sql import Window

    v = cod.select(
        "vec_id",
        cell_udf(F.col("codes")).alias("cell"),
        "codes",
        F.expr(n2_expr).alias("n2"),
    )
    # ONE exchange on cell (a small parquet arrives as 1-2 splits, so
    # this is also what parallelizes the UDF stages — the
    # operators/dedup._parallelize discipline on the key), then the
    # per-cell size via an ORDER-free window on that partitioning —
    # no second scan, no broadcast-join subtree.  xxhash64 keeps the
    # sub-bucket assignment deterministic and independent of any
    # vec_id stride in the data.
    p = spark.sparkContext.defaultParallelism
    v = (
        v.repartition(p, "cell")
        .withColumn(
            "m", F.count(F.lit(1)).over(Window.partitionBy("cell"))
        )
        .withColumn(
            "s", F.expr(f"CAST((m + {cell_cap} - 1) DIV {cell_cap} AS INT)")
        )
        .withColumn(
            "b", F.pmod(F.xxhash64("vec_id"), F.col("s")).cast("int")
        )
    )
    # BOTH pair roles explode from this single subtree (A-memberships
    # (b, b..s-1) and B-memberships (0..b, b), role-tagged) into ONE
    # grouped Arrow kernel: groupBy(cell, ga, gb).applyInPandas hands
    # each pair-group ALL its memberships and the role split happens
    # inside numpy — one scan, one assignment-UDF pass, and exactly
    # two exchanges (the cell window's and the group key's).  A
    # cogrouped two-sided formulation re-computed the whole base per
    # side (the role filters sit under cogroup's own exchanges, so
    # Spark cannot reuse them across sides — verified in the
    # formatted plan), and the earlier join + per-pair Arrow dot
    # materialized every candidate pair as a row — 5.3e8 rows × two
    # 64-byte code arrays ≈ 350 s of transfer at sf10.
    members = (
        "concat("
        " transform(sequence(b, s - 1),"
        "   j -> struct(b AS ga, j AS gb, 0 AS role)),"
        " transform(sequence(0, b),"
        "   i -> struct(i AS ga, b AS gb, 1 AS role)))"
    )
    u = v.select(
        "vec_id",
        "cell",
        "codes",
        "n2",
        F.explode(F.expr(members)).alias("mb"),
    ).select(
        "vec_id", "cell", "codes", "n2",
        F.col("mb.ga").alias("ga"),
        F.col("mb.gb").alias("gb"),
        F.col("mb.role").alias("role"),
    )
    # The pair verification runs as ONE BLAS matmul per pair-group
    # instead of a join that materializes every candidate pair as a
    # row: the blocked A·Bᵀ over ≤cap-sized bucket matrices is exact
    # float64 (the codes_cell_udf argument: every product ≤ 127²,
    # every 64-term sum ≪ 2⁵³; the threshold comparison den·dot² ≥
    # num·|a|²·|b|² stays int64 per the module docstring).  Only
    # threshold-PASSING pairs ever become rows.
    import pandas as pd  # noqa: F401 — used inside the udf

    t2_num, t2_den = _T2_NUM, _T2_DEN

    _empty = pd.DataFrame(
        {
            "cell": pd.Series(dtype="int32"),
            "keeper": pd.Series(dtype="int64"),
            "dup": pd.Series(dtype="int64"),
        }
    )

    def _pair_group(key, pdf):
        import numpy as np

        _cell, ga, gb = int(key[0]), int(key[1]), int(key[2])
        left = pdf[pdf["role"] == 0]
        right = pdf[pdf["role"] == 1]
        if not len(left) or not len(right):
            return _empty
        ma = np.vstack(left["codes"].to_numpy()).astype(np.float64)
        mb = np.vstack(right["codes"].to_numpy()).astype(np.float64)
        dots = (ma @ mb.T).astype(np.int64)  # exact: all terms < 2^53
        na2 = left["n2"].to_numpy(dtype=np.int64)
        nb2 = right["n2"].to_numpy(dtype=np.int64)
        ok = (dots > 0) & (
            t2_den * dots * dots >= t2_num * na2[:, None] * nb2[None, :]
        )
        ida = left["vec_id"].to_numpy(dtype=np.int64)
        idb = right["vec_id"].to_numpy(dtype=np.int64)
        if ga == gb:
            # diagonal groups hold both role orders — keep one
            ok &= ida[:, None] < idb[None, :]
        ii, jj = np.nonzero(ok)
        if not len(ii):
            return _empty
        ka, kb = ida[ii], idb[jj]
        return pd.DataFrame(
            {
                "cell": np.full(len(ii), _cell, dtype=np.int32),
                "keeper": np.minimum(ka, kb),
                "dup": np.maximum(ka, kb),
            }
        )

    pairs = u.groupBy("cell", "ga", "gb").applyInPandas(
        _pair_group, schema="cell int, keeper long, dup long"
    )
    return (
        pairs.groupBy("dup")
        .agg(
            F.min("keeper").alias("keeper_id"),
            F.min("cell").cast("int").alias("cell"),
            F.count(F.lit(1)).alias("n_neighbors"),
        )
        .select(
            F.col("dup").alias("dup_id"), "keeper_id", "cell", "n_neighbors"
        )
        .orderBy("dup_id")
    )


@query("q_dedup_semantic", oracle=_SEMDEDUP_ORACLE)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table — :func:`semdedup_frame` at
    the oracle-pinned parity configuration (n_cells = {_C}; module
    docstring has the full design).  The C ∝ √N scale configuration
    of the SAME plan is wall-clocked in SCALE_PROBE.json's semdedup
    section."""
    return semdedup_frame(spark, sf_dir, _C)


# ------------------------------------------------------------------
# Multimodal near-dup: perceptual difference-hash dedup
# ------------------------------------------------------------------

_PHASH_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         doc_id - CASE WHEN doc_id % 7 = 6 THEN 1 ELSE 0 END AS e
  FROM documents),
d2 AS (SELECT doc_id, e, 4 + e % 13 AS w, 3 + e % 7 AS h FROM dims),
bits AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN
                ((e*11 + ((k % (w-1)) + 1)*31 + (k // (w-1))*57) % 251)
              > ((e*11 + (k % (w-1))*31 + (k // (w-1))*57) % 251)
              THEN (1::BIGINT << k) ELSE 0 END) AS BIGINT) AS phash
  FROM d2, range(60) t(k)
  WHERE k // (w - 1) < h
  GROUP BY doc_id)
SELECT phash, COUNT(*) AS n_images, MIN(doc_id) AS min_doc_id
FROM bits GROUP BY phash
HAVING COUNT(*) > 1
ORDER BY min_doc_id
"""


@query("q_multimodal_phash", oracle=_PHASH_ORACLE)
def q_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection by perceptual difference hash over a
    REAL decode path: textured P6 images (planted duplicates: every
    7th doc carries the previous doc's exact bytes) are synthesized in
    one Arrow stage, PARSED back with the real P6 decoder
    (operators/multimodal.decode_ppm — header tokenization, payload
    validation, numpy reshape), dHash'd (60 horizontal-gradient sign
    bits packed into an int64), and grouped — clusters of >1 image are
    the duplicate report.  The DuckDB oracle brute-forces every pixel
    comparison from the generator's closed form (the audio-decode
    discipline: nothing about the decode is taken on faith), so the
    hash match proves decode → dHash → group end to end.

    100 TB shape: the Python stages are mapInPandas over Arrow
    batches (the only viable shape for codec work); the group-by
    shuffles 12 bytes per image.  A JPEG corpus swaps decode_ppm for
    a codec call and dHash gains the classic 9x8 grayscale resize —
    same plan, same hash algebra."""
    from ..operators.multimodal import make_textured_blobs, ppm_dhash

    d = T(spark, sf_dir, "documents")
    hashes = ppm_dhash(make_textured_blobs(d))
    return (
        hashes.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .where("n_images > 1")
        .orderBy("min_doc_id")
    )


# ------------------------------------------------------------------
# Bigram language-model quality scoring (KenLM-style filter)
# ------------------------------------------------------------------

#: bitlen(c) as an integer indicator sum — the cross-engine floor-log2
#: (operators/bpe.ilog2); 40 bits covers 10^12 bigram occurrences.
def _blen_sql(col: str) -> str:
    return (
        f"list_sum(list_transform(range(0, 40),"
        f" k -> IF({col} >= (1::BIGINT << k), 1, 0)))"
    )


def _blen_spark(col: str) -> str:
    return (
        f"aggregate(sequence(0, 39), 0L,"
        f" (acc, k) -> acc + IF({col} >= shiftleft(1L, k), 1L, 0L))"
    )


_BIGRAM_ORACLE = f"""
WITH w AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
bg0 AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, len(ws)),
                i -> {{'w1': ws[i], 'w2': ws[i + 1]}})) AS p
  FROM w),
bg AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg0),
ctx AS (SELECT w1, COUNT(*) AS cu FROM bg GROUP BY w1),
pair AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY w1, w2),
cost AS (
  SELECT w1, w2,
         2 * ({_blen_sql('cu')} - {_blen_sql('cb')}) + 1 AS cost
  FROM pair JOIN ctx USING (w1))
SELECT bg.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(cost) AS BIGINT) AS total_cost,
       CAST(SUM(cost) AS DOUBLE) / COUNT(*) AS mean_cost
FROM bg JOIN cost USING (w1, w2)
GROUP BY bg.doc_id ORDER BY bg.doc_id
"""


@query("q_text_bigram_lm", oracle=_BIGRAM_ORACLE)
def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality scoring — the KenLM-style corpus
    filter (score each document by its per-bigram conditional
    surprisal under the corpus's own bigram counts; outlier docs are
    gibberish or boilerplate).  cost(w2|w1) quantizes
    −log2 c(w1,w2)/c(w1) as 2·(bitlen(c(w1)) − bitlen(c(w1,w2))) + 1 —
    the same integer floor-log2 discipline as the unigram-LM tokenizer
    (operators/bpe.ilog2), so every doc's total cost is an exact int64
    and the mean an exact int/int division: the whole score table is
    hash-attested, unlike a float log-prob pipeline.

    Scale shape: bigram extraction is a JVM zip_with projection (no
    shuffle); context and pair counts are two map-side-combined aggs
    over the token stream; the re-join onto bigrams shuffles on the
    pair key exactly once.  The 1-word-doc edge (no bigrams) drops
    out of both engines identically via inner joins."""
    d = T(spark, sf_dir, "documents")
    bg = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
                " slice(split(text, ' '), 2, size(split(text, ' ')) - 1),"
                " (a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    ctx = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    pair = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cost = pair.join(ctx, "w1").select(
        "w1",
        "w2",
        (
            2 * (F.expr(_blen_spark("cu")) - F.expr(_blen_spark("cb"))) + 1
        ).alias("cost"),
    )
    return (
        bg.join(cost, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("cost").cast("long").alias("total_cost"),
            (
                F.sum("cost").cast("double") / F.count(F.lit(1))
            ).alias("mean_cost"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------------------------
# Distribution drift: exact two-sample Kolmogorov-Smirnov statistic
# ------------------------------------------------------------------

_KS_ORACLE = """
WITH v AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS in_a,
         CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS in_b
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
n AS (SELECT CAST(SUM(in_a) AS BIGINT) AS na,
             CAST(SUM(in_b) AS BIGINT) AS nb FROM v),
pervalue AS (
  SELECT cents, CAST(SUM(in_a) AS BIGINT) AS ca,
         CAST(SUM(in_b) AS BIGINT) AS cb
  FROM v GROUP BY cents),
ecdf AS (
  SELECT cents,
         CAST(SUM(ca) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_a,
         CAST(SUM(cb) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_b
  FROM pervalue)
SELECT n.na, n.nb,
       CAST(MAX(ABS(cum_a * n.nb - cum_b * n.na)) AS BIGINT) AS d_num,
       CAST(MAX(ABS(cum_a * n.nb - cum_b * n.na)) AS DOUBLE)
         / (n.na * n.nb) AS ks_stat,
       COUNT(*) AS n_values
FROM ecdf, n GROUP BY n.na, n.nb
"""


@query("q_stats_ks_drift", oracle=_KS_ORACLE)
def q_stats_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic between two order
    cohorts (urgent vs low priority) over integer-cent order values —
    the training-data DRIFT detector (compare yesterday's corpus
    snapshot to today's; alarm when D exceeds the sample-size bound).
    D = max over values of |F_a − F_b| computed entirely in integers:
    |cum_a·n_b − cum_b·n_a| with the division deferred to one exact
    int→double divide at the end, so the statistic is bit-identical
    cross-engine (no per-row float ECDFs).

    Scale shape: one map-side-combined agg collapses the corpus to
    per-DISTINCT-VALUE counts, so the ECDF window runs over the VALUE
    DOMAIN (bounded by price range in cents — ~10^5 rows at any
    corpus size), not the row count: the single-partition window is
    bounded by the same argument as q_agg_percentile_twopass's bucket
    census.  An unbounded domain would swap in the two-phase prefix
    scan of q_interval_concurrency."""
    o = T(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    v = o.select(
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.expr("IF(o_orderpriority = '1-URGENT', 1L, 0L)").alias("in_a"),
        F.expr("IF(o_orderpriority = '5-LOW', 1L, 0L)").alias("in_b"),
    )
    n = v.agg(
        F.sum("in_a").cast("long").alias("na"),
        F.sum("in_b").cast("long").alias("nb"),
    )
    pervalue = v.groupBy("cents").agg(
        F.sum("in_a").cast("long").alias("ca"),
        F.sum("in_b").cast("long").alias("cb"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = pervalue.select(
        "cents",
        F.sum("ca").over(w).cast("long").alias("cum_a"),
        F.sum("cb").over(w).cast("long").alias("cum_b"),
    )
    return (
        ecdf.crossJoin(F.broadcast(n))
        .groupBy("na", "nb")
        .agg(
            F.max(F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na")))
            .cast("long")
            .alias("d_num"),
            (
                F.max(
                    F.abs(
                        F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na")
                    )
                ).cast("double")
                / (F.col("na") * F.col("nb"))
            ).alias("ks_stat"),
            F.count(F.lit(1)).alias("n_values"),
        )
        .select("na", "nb", "d_num", "ks_stat", "n_values")
    )


# ------------------------------------------------------------------
# CUSUM changepoint detection (per-user spend shift)
# ------------------------------------------------------------------

#: CUSUM reference (cents): deviations are value - $60; alarm at $150
_CUSUM_K = 6000
_CUSUM_H = 15000

_CUSUM_ORACLE = f"""
WITH p AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) - {_CUSUM_K} AS dev
  FROM events WHERE event_type = 'purchase'),
pr AS (
  SELECT user_id, us, event_id,
         CAST(SUM(dev) OVER w AS BIGINT) AS pref
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
c AS (
  SELECT user_id, us, event_id, pref,
         pref - LEAST(CAST(MIN(pref) OVER w AS BIGINT), 0) AS cusum
  FROM pr
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT user_id, us, cusum AS cusum_cents,
       CAST(cusum > {_CUSUM_H} AS INT) AS alarm
FROM c ORDER BY user_id, us, event_id
"""


@query("q_window_cusum", oracle=_CUSUM_ORACLE)
def q_window_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint detection on per-user purchase
    streams: s_i = max(0, s_(i-1) + (x_i − k)) with reference k = $60
    and alarm threshold h = $150 — the sequential drift detector
    (Page 1954) a data pipeline runs on quality metrics.  The
    recursion is NOT window-expressible directly, but has the exact
    closed form s_i = P_i − min(0, min_(j≤i) P_j) over prefix sums
    P — two stacked windows on the SAME (user, time) sort, zero extra
    shuffles, integer cents throughout (the FLOOR(x·100 + 0.5)
    discipline), so the full alarm trajectory is hash-attested.

    Scale: both windows ride one exchange, partitioned by user —
    bounded partitions, co-partitioned with the rest of the per-user
    pipeline.  Deterministic total order (us, event_id)."""
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    p = e.select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("us"),
        (
            F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)") - _CUSUM_K
        ).alias("dev"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pr = p.withColumn("pref", F.sum("dev").over(w).cast("long"))
    c = pr.withColumn(
        "cusum",
        F.col("pref")
        - F.least(F.min("pref").over(w).cast("long"), F.lit(0)),
    )
    return c.select(
        "user_id",
        "us",
        F.col("cusum").alias("cusum_cents"),
        (F.col("cusum") > _CUSUM_H).cast("int").alias("alarm"),
    ).orderBy("user_id", "us", "event_id")


# ------------------------------------------------------------------
# Tokenizer fertility (pieces per word / bytes per piece, per lang)
# ------------------------------------------------------------------


def _fertility_oracle() -> str:
    from ..operators.bpe import MERGES, merges_values_sql

    n_ranks = len(MERGES)
    return f"""
    WITH RECURSIVE
    merges(rank, pair, merged) AS (VALUES
    {merges_values_sql(MERGES)}),
    tok AS (SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS word
            FROM documents),
    wl AS (SELECT lang, word, COUNT(*) AS n FROM tok GROUP BY lang, word),
    w0 AS (SELECT DISTINCT word FROM wl),
    seed AS (SELECT word,
                    ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS s
             FROM w0),
    enc(word, s, rk) AS (
      SELECT word, s, 1 FROM seed
      UNION ALL
      SELECT e.word,
             CASE WHEN strpos(e.s, m.pair) > 0
                  THEN regexp_replace(e.s, m.pair, m.merged) ELSE e.s END,
             CASE WHEN strpos(e.s, m.pair) > 0 THEN e.rk ELSE e.rk + 1 END
      FROM enc e JOIN merges m ON m.rank = e.rk),
    encoded AS (
      SELECT word,
             CAST(length(string_split(TRIM(s), ' ')) AS BIGINT) AS n_syms
      FROM enc WHERE rk = {n_ranks + 1})
    SELECT wl.lang,
           CAST(SUM(wl.n) AS BIGINT) AS n_words,
           CAST(SUM(wl.n * e.n_syms) AS BIGINT) AS n_pieces,
           CAST(SUM(wl.n * e.n_syms) AS DOUBLE) / SUM(wl.n) AS fertility,
           CAST(SUM(wl.n * STRLEN(wl.word)) AS BIGINT) AS n_bytes,
           CAST(SUM(wl.n * STRLEN(wl.word)) AS DOUBLE)
             / SUM(wl.n * e.n_syms) AS bytes_per_piece
    FROM wl JOIN encoded e USING (word)
    GROUP BY wl.lang ORDER BY wl.lang
    """


@query("q_tokenizer_fertility", oracle=_fertility_oracle())
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY report per language — the standard
    tokenizer-evaluation metric (avg subword pieces per word; high
    fertility = the vocabulary serves that language poorly and
    training costs more tokens per byte), plus bytes-per-piece.
    Uses the checked-in provenance-pinned BPE merge table; the DuckDB
    oracle replays the full canonical encode with the recursive
    rank-stepping CTE, so the corpus-weighted fertility ratios are
    hash-proven (int sums → one exact int/int double division each).

    Scale shape: the encode pandas-UDF touches DISTINCT words only
    (the vocabulary-sized Python stage, operators/bpe.py point 1);
    the corpus-sized work is a split/explode/groupBy.  The final agg
    is per-lang (bounded groups)."""
    from ..operators.bpe import MERGES, bpe_encode_udf

    d = T(spark, sf_dir, "documents")
    wl = (
        d.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    enc = (
        wl.select("word")
        .distinct()
        .withColumn("n_syms", F.size(bpe_encode_udf(MERGES)(F.col("word"))).cast("long"))
    )
    return (
        wl.join(enc, "word")
        .groupBy("lang")
        .agg(
            F.sum("n").cast("long").alias("n_words"),
            F.sum(F.col("n") * F.col("n_syms")).cast("long").alias("n_pieces"),
            (
                F.sum(F.col("n") * F.col("n_syms")).cast("double")
                / F.sum("n")
            ).alias("fertility"),
            F.sum(F.col("n") * F.length("word")).cast("long").alias("n_bytes"),
            (
                F.sum(F.col("n") * F.length("word")).cast("double")
                / F.sum(F.col("n") * F.col("n_syms"))
            ).alias("bytes_per_piece"),
        )
        .orderBy("lang")
    )
