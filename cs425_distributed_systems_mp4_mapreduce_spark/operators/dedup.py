"""Deduplication operators for large-scale training-data pipelines.

Five dedup families, each with an explicit 100 TB posture:

- exact        : hash-shuffle on the content key; one shuffle, then a
                 per-partition window.  O(N) network in content bytes →
                 prefer fingerprint-first (dedupe on a 64-bit hash, then
                 verify) when payloads are large.
- minhash-lsh  : shingles → MinHash signatures → banded LSH buckets →
                 candidate join.  Only candidates shuffle; never O(N²).
- simhash      : 64-bit simhash per doc, computed entirely in JVM
                 higher-order functions; near-dup candidates via
                 band-equality self-join + hamming filter (pigeonhole:
                 hamming ≤ 3 ⇒ one of 4 16-bit bands equal).
- ngram-jaccard: token/shingle-set Jaccard for candidate verification.
- embedding    : cosine near-dup via normalized vectors + random
                 hyperplane (sign-bit LSH) bucketing; exact cosine only
                 within buckets.

Reference parity: the reference has NO dedup surface — these are the
north-star extensions (BASELINE.json north_star: "dedup, similarity
search, multimodal columns, text analysis").
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# --------------------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, key_cols: Sequence[str] = ("text",), id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per distinct key (deterministic winner —
    ``dropDuplicates`` keeps an arbitrary row, which can't be
    oracle-checked).  One shuffle on the content key."""
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(id_col)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# --------------------------------------------------------------------------- shingles / jaccard


def shingle_col(text_col: str, k: int = 3) -> Column:
    """k-token shingles of a text column (JVM higher-order fns).
    Documents shorter than k tokens yield one full-text shingle."""
    return F.expr(
        f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - {k - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, {k})))"
    )


def jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard of two arrays — int/int division, bit-exact."""
    da, db = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(da, db)).cast("long")
    union = F.size(F.array_union(da, db)).cast("long")
    return inter / union


# --------------------------------------------------------------------------- minhash LSH


def minhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_tables: int = 16,
    jaccard_threshold: float = 0.5,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash+LSH
    (shingle → HashingTF → MinHashLSH → banded bucket join).

    Returns (id_a, id_b, jaccard_dist) with id_a < id_b for pairs whose
    estimated Jaccard distance ≤ 1 - jaccard_threshold.  The join is
    bucket-local (approxSimilarityJoin explodes hash tables and joins
    on (table, bucket)) — candidate volume scales with collisions, not
    N², which is the property that survives 100 TB.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    toks = df.select(
        F.col(id_col).alias("_id"), shingle_col(text_col, shingle_k).alias("_shingles")
    ).filter(F.size("_shingles") > 0)
    tf = HashingTF(
        inputCol="_shingles", outputCol="_features", numFeatures=num_features, binary=True
    )
    # shingle_col's greatest(..., 1) guarantees >=1 shingle per doc, so
    # MinHashLSH's non-empty-vector requirement holds; the filter above
    # is defense-in-depth for caller-supplied token arrays.
    feat = tf.transform(toks)
    mh = MinHashLSH(inputCol="_features", outputCol="_hashes", numHashTables=num_tables, seed=42)
    model = mh.fit(feat)
    pairs = model.approxSimilarityJoin(
        feat, feat, 1.0 - jaccard_threshold, distCol="jaccard_dist"
    )
    return (
        pairs.filter(F.col("datasetA._id") < F.col("datasetB._id"))
        .select(
            F.col("datasetA._id").alias("id_a"),
            F.col("datasetB._id").alias("id_b"),
            F.col("jaccard_dist"),
        )
    )


# --------------------------------------------------------------------------- simhash


def simhash64(text_col: str = "text") -> Column:
    """64-bit SimHash computed as one JVM expression tree:
    token → xxhash64 → per-bit ±1 vote fold → sign bits packed into a
    long.  No Python, no shuffle; codegen-friendly."""
    votes = (
        f"aggregate(transform(split({text_col}, ' '), t -> xxhash64(t)),"
        f" array_repeat(0L, 64),"
        f" (acc, h) -> zip_with(acc, sequence(0L, 63L),"
        f"   (c, i) -> c + IF(((h >> CAST(i AS INT)) & 1L) = 1L, 1L, -1L)))"
    )
    pack = (
        f"aggregate(zip_with({votes}, sequence(0L, 63L),"
        f" (c, i) -> IF(c > 0L, shiftleft(1L, CAST(i AS INT)), 0L)),"
        f" 0L, (a, b) -> a | b)"
    )
    return F.expr(pack)


def hamming64(a: str, b: str) -> Column:
    return F.expr(f"bit_count({a} ^ {b})")


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash banding: split the 64-bit hash into
    ``max_hamming + 1`` bands; by pigeonhole any pair with hamming ≤
    max_hamming collides on ≥1 band, so the self-join runs per
    (band_idx, band_value) bucket — COMPLETE recall at the declared
    radius, never an all-pairs hamming scan.

    Cost note: more bands ⇒ narrower bands ⇒ denser buckets.  At
    max_hamming=7 the bands are 8 bits and buckets collapse to 256
    values — fine for verification corpora, quadratic-ish on large
    random data.  Keep the radius small (≤3) for discovery at scale."""
    n_bands = max_hamming + 1
    if n_bands > 16:
        raise ValueError("max_hamming > 15 leaves <4-bit bands; use MinHash instead")
    width = 64 // n_bands
    sh = df.select(F.col(id_col).alias("_id"), simhash64(text_col).alias("_sim"))
    # shiftright() function, not the `>>` operator — Spark 4's parser
    # accepts `>>` inside lambda bodies but rejects it at expression
    # top level
    # band b covers bits [b*width, 64) for the final band (no mask:
    # arithmetic shiftright already leaves exactly the top bits, and
    # equality of shifted values ≡ equality of those bits — masking the
    # final band would need a (1<<64)-1 literal at max_hamming=0, which
    # overflows Spark's long parser) and [b*width, (b+1)*width) otherwise
    bands_expr = ", ".join(
        (
            "named_struct('band', {b}, 'val', shiftright(_sim, {off}))".format(
                b=b, off=b * width
            )
            if b == n_bands - 1
            else "named_struct('band', {b}, 'val', shiftright(_sim, {off}) & {mask}L)".format(
                b=b, off=b * width, mask=(1 << width) - 1
            )
        )
        for b in range(n_bands)
    )
    bands = sh.select(
        "_id",
        "_sim",
        F.explode(F.expr(f"array({bands_expr})")).alias("bb"),
    ).select("_id", "_sim", F.col("bb.band").alias("band"), F.col("bb.val").alias("val"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sim").alias("sim_a"),
            F.col("b._sim").alias("sim_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.withColumn("hamming", hamming64("sim_a", "sim_b")).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


# --------------------------------------------------------------------------- embedding cosine


def _plane_matrix(seed: int, dim: int, num_planes: int, num_tables: int):
    """Deterministic (num_tables·num_planes, dim) gaussian plane matrix.
    Derived from (seed, dim) so every executor materializes the
    identical matrix locally — nothing is shipped or broadcast, and the
    same (seed, data) always yields the same buckets."""
    import numpy as np

    return np.random.RandomState(seed).standard_normal(
        (num_tables * num_planes, dim)
    )


def _hyperplane_buckets_udf(num_planes: int, num_tables: int, seed: int):
    """Arrow-batched bucket assignment: vec → array of num_tables
    sign-bit bucket ids (one numpy matmul per batch)."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

# Plain-dict per-dim cache: lru_cache over a local lambda pickles by
    # qualified name and breaks cloudpickle when the UDF ships to
    # executors; a nested def + dict closure pickles by value.
    _plane_cache: dict = {}

    def planes_for(dim):
        if dim not in _plane_cache:
            _plane_cache[dim] = _plane_matrix(seed, dim, num_planes, num_tables)
        return _plane_cache[dim]

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(vecs):
        import numpy as np

        m = np.vstack(vecs.to_numpy()).astype("float64")
        signs = (m @ planes_for(m.shape[1]).T) > 0  # (n, tables·planes)
        weights = 1 << np.arange(num_planes, dtype=np.int64)
        bk = signs.reshape(len(m), num_tables, num_planes) @ weights  # (n, tables)
        return pd.Series(list(bk))

    return _buckets


def embedding_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cosine_threshold: float = 0.9,
    num_planes: int = 8,
    num_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs: MULTI-TABLE random-hyperplane LSH —
    ``num_tables`` independent sign-bit bucketings (OR-amplification),
    exact double cosine only within colliding buckets.

    Per table P(all sign bits equal) = (1 - θ/π)^num_planes; a pair is
    a candidate if it collides in ANY table, so recall at cos 0.9 with
    8 planes × 8 tables is 1-(1-0.29)^8 ≈ 0.94 (a single 16-plane
    table would be ~0.08 — the classic AND-only LSH mistake).  Random
    pairs still collide at ~num_tables·2^-num_planes, keeping candidate
    volume near-linear at 100 TB.

    Bucket assignment is an Arrow-batched pandas UDF: one numpy matmul
    per batch against a plane matrix derived deterministically from
    (seed, dim) inside the executor — no driver-side dim probe, no
    shipping, and the plan size is independent of the embedding
    dimension (the earlier all-literal SQL form embedded tables×planes×
    dim floats in the expression tree, which bloats parse time at
    dim ≥ 1024).  The exact-cosine verification inside buckets stays a
    JVM fold."""
    from .similarity import _cosine_pair  # local import to avoid cycle

    buckets_udf = _hyperplane_buckets_udf(num_planes, num_tables, seed)
    sides = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.posexplode(buckets_udf(F.col(vec_col))).alias("_t", "_bkt"),
    )
    a, b = sides.alias("a"), sides.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._t") == F.col("b._t"))
            & (F.col("a._bkt") == F.col("b._bkt"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._v").alias("_va"),
            F.col("b._v").alias("_vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a", "id_b", _cosine_pair("_va", "_vb").alias("cosine")
    ).filter(F.col("cosine") >= cosine_threshold)
