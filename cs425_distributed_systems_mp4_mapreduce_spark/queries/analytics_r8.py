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
discipline, and the literal-folded HOF assignment used for parity at
driver SF swaps for the Arrow-batched numpy matmul assignment
(operators/dedup.py's embedding path) or the persisted partitioned
index (q_sim_ann_ivf_index) at scale, both already in-repo.
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


def _arr(ints) -> str:
    return "array(" + ", ".join(f"{int(x)}L" for x in ints) + ")"


@query("q_dedup_semantic", oracle=_SEMDEDUP_ORACLE)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table (module docstring has the
    full design): integer cell assignment against the RNG-free anchor
    codebook, cell-local pairwise integer-cosine threshold test, drop
    rule = "has any smaller-id neighbor above t in my cell" with the
    smallest such neighbor reported as the keeper.

    Plan: the codebook is a bounded {_C}-row collect; assignment is a
    map-only literal-folded expression; the quadratic stage is an
    equi-self-join ON CELL (bounded per-cell, exactly like
    q_knn_graph's label blocks); the drop rule is one aggregation.
    """
    e = T(spark, sf_dir, "embeddings")
    cod = e.select("vec_id", F.expr(_CODES_SPARK).alias("codes"))

    anchors = {
        r["vec_id"]: list(r["codes"])
        for r in cod.filter(F.col("vec_id") < _C).collect()
    }
    assert len(anchors) == _C, "need anchor vectors 0..C-1"
    cb = f"array({', '.join(_arr(anchors[c]) for c in range(_C))})"

    cell_dist = (
        f"aggregate(sequence(0, {_DIM - 1}), 0L, (acc, j) -> acc +"
        f" (element_at(codes, CAST(j + 1 AS INT)) -"
        f"  element_at(element_at({cb}, CAST(c + 1 AS INT)), CAST(j + 1 AS INT))) *"
        f" (element_at(codes, CAST(j + 1 AS INT)) -"
        f"  element_at(element_at({cb}, CAST(c + 1 AS INT)), CAST(j + 1 AS INT))))"
    )
    cell_expr = (
        f"array_min(transform(sequence(0, {_C - 1}), c ->"
        f" named_struct('d', {cell_dist}, 'c', c))).c"
    )
    n2_expr = "aggregate(transform(codes, x -> x * x), 0L, (acc, v) -> acc + v)"

    v = cod.select(
        "vec_id",
        F.expr(cell_expr).alias("cell"),
        "codes",
        F.expr(n2_expr).alias("n2"),
    )
    a = v.select(
        F.col("vec_id").alias("keeper"),
        "cell",
        F.col("codes").alias("ca"),
        F.col("n2").alias("na2"),
    )
    b = v.select(
        F.col("vec_id").alias("dup"),
        "cell",
        F.col("codes").alias("cb"),
        F.col("n2").alias("nb2"),
    )
    dot = "aggregate(zip_with(ca, cb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    return (
        a.join(b, "cell")
        .where(F.col("keeper") < F.col("dup"))
        .withColumn("dot", F.expr(dot))
        .where(
            f"dot > 0 AND {_T2_DEN} * dot * dot >= {_T2_NUM} * na2 * nb2"
        )
        .groupBy("dup")
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
