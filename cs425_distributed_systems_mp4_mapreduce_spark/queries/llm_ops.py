"""Declared queries for the LLM-data-pipeline operators (SURVEY.md §2.2
north-star block): dedup, similarity search, multimodal columns, text
analysis.  Non-SQL-expressible ops (LSH families) have no oracle →
driver rows-only check + planted-fixture unit tests in
tests/test_llm_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.parity import davg, o_davg
from ..functions.text import (
    fingerprint,
    langid_udf,
    o_fingerprint,
    quality_features,
    quality_score,
)
from ..functions.vectors import l2_norm
from ..operators.dedup import (
    embedding_near_pairs,
    exact_dedup,
    jaccard,
    minhash_banded_near_pairs,
    minhash_banded_near_pairs_auto,
    minhash_near_pairs,
    prefix_filter_pairs,
    simhash_near_pairs,
    simhash_xengine_pairs,
)
from ..operators.graph import connected_components
from ..operators.multimodal import (
    attach_blob,
    featurize_blobs,
    make_ppm_blobs,
    make_wav_blobs,
    ppm_features,
    sample_frames,
    wav_features,
)
from ..operators.similarity import pairwise_cosine_within, topk_cosine
from ..registry import query
from ..sources.tables import query_vector
from ..sources.tables import table as T

# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------


@query(
    "q_dedup_exact",
    headline=True,
    oracle="""
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents) WHERE rn = 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: deterministic keep-lowest-id per distinct text
    (0 dups at sf0.01, 8 at sf0.1 — well-defined at every SF)."""
    d = T(spark, sf_dir, "documents")
    return exact_dedup(d, key_cols=("text",), id_col="doc_id").select(
        "doc_id", "lang", "n_chars"
    )


#: brute-force exact-Jaccard oracle at the 0.5 threshold, shared by the
#: pinned-parameter query and its derived-parameter (auto) twin — at
#: every driver SF the corpus count derives the parity width, so both
#: MUST hash-identically against the same oracle.
_NEAR_ORACLE = """
    WITH sh AS (
      SELECT doc_id,
             LIST_DISTINCT([ARRAY_TO_STRING(words[i:i+2], ' ')
                            FOR i IN RANGE(1, GREATEST(LEN(words) - 2, 1) + 1)]) AS s
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS words FROM documents)
    )
    SELECT id_a, id_b, jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(LEN(LIST_INTERSECT(a.s, b.s)) AS BIGINT)
             / CAST(LEN(LIST_DISTINCT(LIST_CONCAT(a.s, b.s))) AS BIGINT) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    ) WHERE jaccard >= 0.5
    """


@query(
    "q_dedup_near",
    headline=True,
    oracle=_NEAR_ORACLE,
)
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash near-dup pairs: banded AND-OR LSH candidates (pure JVM
    xxhash64 signatures, band width r=2 ⇒ a J=0.9 pair is missed with
    (1-0.81)^8 ≈ 1.7e-6) + EXACT shingle-set Jaccard verification.
    The exact verify step makes the output deterministic and
    oracle-checkable by a brute-force SQL self-join: the corpus has a
    similarity gap (pairs sit at J≥0.9 or J<0.3, nothing near the 0.5
    threshold), so LSH recall is the only probabilistic term and the
    fixed seeds pin it."""
    d = T(spark, sf_dir, "documents")
    return minhash_banded_near_pairs(d, jaccard_threshold=0.5)


@query(
    "q_dedup_near_auto",
    oracle=_NEAR_ORACLE,
)
def q_dedup_near_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_dedup_near through the DERIVED-parameter wrapper
    (operators/dedup.minhash_banded_near_pairs_auto): one column-pruned
    count() picks (band_width, num_bands, bucket_cap) via
    derive_scale_params from the corpus count and the 0.5 threshold.
    Below 5e5 docs the derivation lands on the EXACT parity width
    (r=2, b=8 — asserted in tests/test_candidate_scaling.py), so this
    query must hash-identically against the same brute-force oracle as
    the pinned query — which makes the call-time derivation path
    itself driver-attestable (VERDICT r11 task 2's in-repo complement
    to the sf100 ``near_dedup_auto_derived_*`` probe rows, where the
    derivation picks the non-parity widths)."""
    d = T(spark, sf_dir, "documents")
    return minhash_banded_near_pairs_auto(d, jaccard_threshold=0.5)


#: brute-force exact-Jaccard oracle shared by both AllPairs join-key
#: variants — their outputs are REQUIRED to be identical, so attesting
#: each against the same oracle proves the composite-key rewrite exact.
_ALLPAIRS_ORACLE = """
    WITH sh AS (
      SELECT doc_id,
             LIST_DISTINCT([ARRAY_TO_STRING(words[i:i+2], ' ')
                            FOR i IN RANGE(1, GREATEST(LEN(words) - 2, 1) + 1)]) AS s
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS words FROM documents)
    )
    SELECT id_a, id_b, jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(LEN(LIST_INTERSECT(a.s, b.s)) AS BIGINT)
             / CAST(LEN(LIST_DISTINCT(LIST_CONCAT(a.s, b.s))) AS BIGINT) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    ) WHERE jaccard >= 0.8
    """


@query(
    "q_dedup_allpairs",
    headline=True,
    oracle=_ALLPAIRS_ORACLE,
)
def q_dedup_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-dup pairs via prefix filtering with PPJoin length +
    positional refinements — the deterministic complement to
    q_dedup_near's probabilistic MinHash path: zero false negatives BY
    THEOREM, so its brute-force-oracle equality is unconditional, with
    no similarity-gap argument needed.  Run at t=0.8, the high-
    threshold regime the algorithm is built for (prefix ≈ 20% of each
    set; candidate volume measured at 0.1% of all-pairs in
    tests/test_candidate_scaling.py, alongside the honest caveat that
    single-token prefix keys degrade under vocabulary saturation where
    banded multi-token LSH keys do not)."""
    d = T(spark, sf_dir, "documents")
    return prefix_filter_pairs(d, jaccard_threshold=0.8)


@query("q_dedup_allpairs_bucketed", oracle=_ALLPAIRS_ORACLE)
def q_dedup_allpairs_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (token, length-bucket) COMPOSITE-key variant of
    q_dedup_allpairs — the hot-token/vocabulary-saturation remedy
    (operators/dedup.py:prefix_filter_candidate_pairs, VERDICT r4
    task 5).  Registered as its own driver-attested query against the
    SAME brute-force oracle: hash-equality here proves the composite
    rewrite loses no pairs on real data, complementing the
    parametrized completeness property tests.  Use this path when the
    token-frequency tail is heavy and document lengths are diverse
    (the regime scripts/scale_probe.py measures); the single-token
    default wins on small corpora where the ≤5× probe fan-out is not
    yet paid back."""
    d = T(spark, sf_dir, "documents")
    return prefix_filter_pairs(d, jaccard_threshold=0.8, length_buckets=True)


@query(
    "q_dedup_clusters",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             LIST_DISTINCT([ARRAY_TO_STRING(words[i:i+2], ' ')
                            FOR i IN RANGE(1, GREATEST(LEN(words) - 2, 1) + 1)]) AS s
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS words FROM documents)
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(LEN(LIST_INTERSECT(a.s, b.s)) AS BIGINT)
            / CAST(LEN(LIST_DISTINCT(LIST_CONCAT(a.s, b.s))) AS BIGINT) >= 0.5
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ), reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
    )
    SELECT id AS doc_id, MIN(r) AS cluster_id,
           MIN(r) = id AS is_representative
    FROM reach GROUP BY id ORDER BY doc_id
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING — what a training pipeline actually does with
    pair output: banded-MinHash near-dup pairs (q_dedup_near's exact
    verified edges) → distributed connected components (min-label
    propagation, operators/graph.py) → every document labeled with its
    cluster id, representatives = cluster minima (the rows a dedup
    pass would KEEP).  Deterministic end-to-end, so the oracle is a
    brute-force Jaccard self-join + recursive-CTE transitive closure."""
    d = T(spark, sf_dir, "documents")
    edges = minhash_banded_near_pairs(d, jaccard_threshold=0.5).select("id_a", "id_b")
    comps = connected_components(
        edges, nodes=d.select(F.col("doc_id").alias("id"))
    )
    return comps.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("component") == F.col("id")).alias("is_representative"),
    ).orderBy("doc_id")


@query(
    "q_dedup_clusters_star",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             LIST_DISTINCT([ARRAY_TO_STRING(words[i:i+2], ' ')
                            FOR i IN RANGE(1, GREATEST(LEN(words) - 2, 1) + 1)]) AS s
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS words FROM documents)
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(LEN(LIST_INTERSECT(a.s, b.s)) AS BIGINT)
            / CAST(LEN(LIST_DISTINCT(LIST_CONCAT(a.s, b.s))) AS BIGINT) >= 0.5
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ), reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
    )
    SELECT id AS doc_id, MIN(r) AS cluster_id
    FROM reach GROUP BY id ORDER BY doc_id
    """,
)
def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_dedup_clusters computed by the web-scale algorithm instead:
    alternating large-star/small-star (O(log^2 n) rounds on any graph,
    operators/graph.py) over the same banded-MinHash edges, against the
    same recursive-CTE oracle — both clustering algorithms are
    driver-verified to the identical ground truth."""
    from ..operators.graph import connected_components_star

    d = T(spark, sf_dir, "documents")
    edges = minhash_banded_near_pairs(d, jaccard_threshold=0.5).select("id_a", "id_b")
    comps = connected_components_star(
        edges, nodes=d.select(F.col("doc_id").alias("id"))
    )
    return comps.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    ).orderBy("doc_id")


@query("q_dedup_near_ml", oracle=None)
def q_dedup_near_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark ML integration variant of q_dedup_near (HashingTF →
    MinHashLSH.approxSimilarityJoin).  OR-only single-hash tables —
    kept as the ML-pipeline interop surface, but its candidate volume
    is quadratic on low-similarity corpora (see
    tests/test_candidate_scaling.py), so the banded operator is the
    discovery path at scale.  Probabilistic distances → rows-only."""
    d = T(spark, sf_dir, "documents")
    return minhash_near_pairs(d, jaccard_threshold=0.5, num_tables=8)


@query("q_dedup_simhash", oracle=None)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via banding + hamming filter.
    max_hamming=3 matches the 4-band pigeonhole guarantee (hamming ≤
    n_bands-1 ⇒ some band collides), so recall is complete.  Rows-only
    because xxhash64 is JVM-only; the fully-oracled cross-engine twin
    is q_dedup_simhash_xengine below."""
    d = T(spark, sf_dir, "documents")
    return simhash_near_pairs(d, max_hamming=3)


#: DuckDB re-implementation of simhash62_xengine, step for step: the
#: same seeded 31-bit polynomial char folds, 62-bit pack, per-bit vote
#: fold — then BRUTE-FORCE all-pairs hamming.  Spark answers with
#: banded buckets instead; hash equality of the two result sets IS the
#: pigeonhole complete-recall theorem, verified on real data.
_SIMHASH_XENGINE_ORACLE = """
WITH sigs AS (
  SELECT doc_id,
    list_reduce(list_prepend(0::BIGINT,
        list_transform(range(0,62), i ->
          IF(list_sum(list_transform(
               list_transform(string_split(text,' '), t ->
                 (list_reduce(list_prepend(0::BIGINT,
                     list_transform(range(1, length(t)+1),
                                    j -> ascii(substr(t,j,1))::BIGINT)),
                   (a,c) -> (a*31+c) % 2147483648) << 31)
                 | list_reduce(list_prepend(1::BIGINT,
                     list_transform(range(1, length(t)+1),
                                    j -> ascii(substr(t,j,1))::BIGINT)),
                   (a,c) -> (a*37+c) % 2147483648)),
               h -> IF((h >> i) & 1 = 1, 1, -1))) > 0,
             1::BIGINT << i, 0::BIGINT))),
      (a,b) -> a | b) AS sig
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
ORDER BY id_a, id_b
"""


@query("q_dedup_simhash_xengine", oracle=_SIMHASH_XENGINE_ORACLE)
def q_dedup_simhash_xengine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully-oracled SimHash twin: a 62-bit signature built from
    integer arithmetic both engines evaluate identically (seeded
    polynomial char folds — operators/dedup.simhash62_xengine), banded
    4-block discovery on Spark vs brute-force all-pairs in DuckDB.
    The parity check is therefore a THEOREM PROOF on real data:
    banding at radius 3 must recover exactly the brute-force pair set
    (pigeonhole complete recall), and the whole signature pipeline is
    bit-identical cross-engine.  Scale posture unchanged from
    q_dedup_simhash (bucketed self-join, never all-pairs on Spark);
    the char-fold hash is the parity cost, xxhash64 the production
    hash."""
    d = T(spark, sf_dir, "documents")
    return simhash_xengine_pairs(d, max_hamming=3).orderBy("id_a", "id_b")


#: Same 62-bit signature as _SIMHASH_XENGINE_ORACLE, then the per-block
#: bucket census: block i of 4 is bits [15i, 15i+15) (last block takes
#: the 17-bit remainder), buckets grouped per (block, value), stats per
#: block.  sum() over CASE is HUGEINT in DuckDB → cast back to BIGINT.
_GUARD_CENSUS_ORACLE = """
WITH sigs AS (
  SELECT doc_id,
    list_reduce(list_prepend(0::BIGINT,
        list_transform(range(0,62), i ->
          IF(list_sum(list_transform(
               list_transform(string_split(text,' '), t ->
                 (list_reduce(list_prepend(0::BIGINT,
                     list_transform(range(1, length(t)+1),
                                    j -> ascii(substr(t,j,1))::BIGINT)),
                   (a,c) -> (a*31+c) % 2147483648) << 31)
                 | list_reduce(list_prepend(1::BIGINT,
                     list_transform(range(1, length(t)+1),
                                    j -> ascii(substr(t,j,1))::BIGINT)),
                   (a,c) -> (a*37+c) % 2147483648)),
               h -> IF((h >> i) & 1 = 1, 1, -1))) > 0,
             1::BIGINT << i, 0::BIGINT))),
      (a,b) -> a | b) AS sig
  FROM documents
),
blocks AS (
  SELECT b.blk::INT AS blk,
         CASE WHEN b.blk = 3 THEN (sig >> 45) & 131071
              ELSE (sig >> (15 * b.blk::INT)) & 32767 END AS bval
  FROM sigs, range(0, 4) b(blk)
),
buckets AS (
  SELECT blk, bval, count(*) AS bn FROM blocks GROUP BY blk, bval
)
SELECT blk,
       count(*) AS n_buckets,
       max(bn) AS max_bucket,
       CAST(sum(CASE WHEN bn > 1024 THEN 1 ELSE 0 END) AS BIGINT)
         AS buckets_over_cap,
       CAST(sum(CASE WHEN bn > 1024 THEN bn ELSE 0 END) AS BIGINT)
         AS rows_dropped
FROM buckets GROUP BY blk ORDER BY blk
"""


@query("q_dedup_guard_census", oracle=_GUARD_CENSUS_ORACLE)
def q_dedup_guard_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-bucket guard OBSERVABILITY census (VERDICT r10 "What's
    wrong #3": the round-10 bucket_cap guards drop over-cap LSH buckets
    silently; this query is the declared surface that makes the drop
    measurable).  Per signature block: bucket count, max bucket size,
    and exactly what a bucket_cap=1024 guard would skip
    (buckets_over_cap, rows_dropped) — nonzero rows_dropped on a real
    corpus means the operator's band width must grow
    (operators/dedup.derive_scale_params) before trusting the guarded
    candidate set.

    Runs over the CROSS-ENGINE 62-bit simhash blocks
    (operators/dedup.simhash_xengine_block_rows) rather than the
    xxhash64 production keys so the census itself is hash-proven: the
    oracle rebuilds signature → blocks → bucket sizes → stats in pure
    DuckDB integer arithmetic.  The production-key censuses
    (minhash_banded_guard_census / simhash_guard_census /
    embedding_guard_census) share the same `_guard_census` aggregate,
    exercised on planted hot-bucket fixtures in
    tests/test_candidate_scaling.py.  Scale: one partial-aggregating
    groupBy over N·4 block rows — map-side combine survives hot
    buckets, no pair expansion ever."""
    from ..operators.dedup import simhash_xengine_block_rows

    d = T(spark, sf_dir, "documents")
    rows = simhash_xengine_block_rows(d, max_hamming=3)
    per = rows.groupBy("_blk", "_bval").agg(F.count(F.lit(1)).alias("_bn"))
    return (
        per.groupBy(F.col("_blk").alias("blk"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("_bn").alias("max_bucket"),
            F.sum(F.when(F.col("_bn") > 1024, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("buckets_over_cap"),
            F.sum(F.when(F.col("_bn") > 1024, F.col("_bn")).otherwise(F.lit(0)))
            .cast("long")
            .alias("rows_dropped"),
        )
        .orderBy("blk")
    )


@query(
    "q_dedup_ngram",
    oracle="""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(LEN(LIST_INTERSECT(LIST_DISTINCT(STRING_SPLIT(a.text, ' ')),
                                   LIST_DISTINCT(STRING_SPLIT(b.text, ' ')))) AS BIGINT)
           / CAST(LEN(LIST_DISTINCT(LIST_CONCAT(STRING_SPLIT(a.text, ' '),
                                                STRING_SPLIT(b.text, ' ')))) AS BIGINT)
             AS jaccard
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    """,
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard similarity (the verification kernel of n-gram
    dedup) over adjacent doc pairs — int/int division, bit-exact."""
    d = T(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    pairs = a.join(b, F.col("id_b") == F.col("id_a") + 1)
    return pairs.select(
        "id_a",
        "id_b",
        jaccard(F.split("ta", " "), F.split("tb", " ")).alias("jaccard"),
    )


@query("q_dedup_embedding", oracle=None)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding RELATED-pair discovery via random-hyperplane buckets
    (exact cosine only within colliding buckets).

    θ=0.3 is deliberate: the synthetic testdata embeddings contain no
    true near-duplicates (max pairwise cosine 0.51 at sf0.01 / 0.60 at
    sf0.1), so a near-dup threshold would return 0 rows and exercise
    nothing.  This row demonstrates the LSH machinery on pairs the data
    actually has; the near-duplicate use of the same operator (θ=0.95,
    planted dups, full oracle) is q_dedup_embedding_planted."""
    e = T(spark, sf_dir, "embeddings")
    return embedding_near_pairs(e, cosine_threshold=0.3, num_planes=8)


@query(
    "q_dedup_embedding_planted",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id < 20
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.95
    """,
)
def q_dedup_embedding_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding NEAR-DUP dedup at θ=0.95 on a corpus with 20 planted
    exact duplicates (vec 0..19 re-id'd +1,000,000).

    The oracle is the full brute-force cosine self-join — exact, not
    probabilistic — which is a fair gate here because (a) identical
    vectors produce identical sign bits, so LSH recall on exact dups is
    100% by construction, and (b) the testdata has no natural pair
    above cosine 0.61, so LSH output == brute-force output exactly."""
    e = T(spark, sf_dir, "embeddings")
    dups = e.filter(F.col("vec_id") < 20).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    pairs = embedding_near_pairs(e.unionByName(dups), cosine_threshold=0.95)
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------


@query(
    "q_sim_topk",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                        (SELECT qe FROM q)), 6) AS cos_sim
    FROM embeddings
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
    headline=True,
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-k cosine to vec 0 (TakeOrderedAndProject:
    scan + per-partition heap, never a global sort).  Values rounded to
    6 decimals on both sides (engine folds differ ~1e-16).  The query
    vector fetch is memoized per session+dir, so an invocation costs
    one Spark job."""
    e = T(spark, sf_dir, "embeddings")
    return topk_cosine(e, query_vector(spark, sf_dir, 0), k=10)


@query(
    "q_udf_cosine",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                        (SELECT qe FROM q)), 6) AS cos_sim
    FROM embeddings
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
)
def q_udf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same top-k as q_sim_topk but through the VECTORIZED PANDAS UDF
    path (Arrow batches → numpy matmul) — the declared coverage row for
    the pandas-UDF surface; numpy's double dot agrees with the oracle
    fold within ~1e-13, rounded away at 6 decimals."""
    from ..operators.similarity import cosine_pandas_udf

    e = T(spark, sf_dir, "embeddings")
    qvec = query_vector(spark, sf_dir, 0)
    return (
        e.select(
            "vec_id", F.round(cosine_pandas_udf(qvec)(F.col("embedding")), 6).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


@query(
    "q_sim_pairs",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.label AS label, COUNT(*) AS n_pairs, {avg}
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    GROUP BY a.label
    ORDER BY label
    """.format(avg=o_davg("list_cosine_similarity(a.v, b.v)", "avg_cosine")),
)
def q_sim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine within each label, averaged (quadratic in group
    size by design — a verification workload; LSH buckets are the
    discovery path)."""
    e = T(spark, sf_dir, "embeddings")
    pairs = pairwise_cosine_within(e, group_col="label")
    return (
        pairs.groupBy(F.col("g").alias("label"))
        .agg(F.count(F.lit(1)).alias("n_pairs"), davg("cosine", "avg_cosine"))
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Multimodal
# --------------------------------------------------------------------------


@query(
    "q_multimodal",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           {avg_chars},
           {avg_norm}
    FROM documents JOIN embeddings ON doc_id = vec_id
    GROUP BY lang
    ORDER BY lang
    """.format(
        avg_chars=o_davg("n_chars", "avg_chars"),
        avg_norm=o_davg(
            "sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))",
            "avg_norm",
        ),
    ),
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal join: text metadata ⋈ embedding vectors, per-lang
    stats across modalities."""
    d = T(spark, sf_dir, "documents")
    e = T(spark, sf_dir, "embeddings")
    joined = d.join(e, d.doc_id == e.vec_id)
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg("n_chars", "avg_chars"),
            davg(l2_norm("embedding"), "avg_norm"),
        )
        .orderBy("lang")
    )


@query(
    "q_multimodal_binary",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(STRLEN(text)) AS BIGINT) AS sum_bytes
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing end-to-end: text → blob (binary) →
    Arrow-batched mapInPandas featurize → join metadata → aggregate.
    Oracle uses STRLEN (BYTE length in DuckDB) so parity holds for
    non-ASCII text too; the sha1/fake-decode features are unit-tested
    instead."""
    d = T(spark, sf_dir, "documents")
    feats = featurize_blobs(attach_blob(d))
    return (
        feats.join(d.select("doc_id", "lang"), on="doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_bytes").alias("sum_bytes"))
        .orderBy("lang")
    )


@query(
    "q_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(4 + doc_id % 13 AS INT) AS width,
           CAST(3 + doc_id % 7 AS INT) AS height,
           (doc_id * 7)  % 200 + (3 + doc_id % 13) / 2.0 + (2 + doc_id % 7) / 2.0 AS mean_r,
           (doc_id * 13) % 200 + (3 + doc_id % 13) / 2.0 + (2 + doc_id % 7) / 2.0 AS mean_g,
           (doc_id * 29) % 200 + (3 + doc_id % 13) / 2.0 + (2 + doc_id % 7) / 2.0 AS mean_b
    FROM documents ORDER BY doc_id
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end, no codec libraries (round 5,
    closing VERDICT r4 'missing #3' as far as this container allows):
    deterministic binary P6/PPM images are synthesized per doc_id in
    one Arrow-batched stage, cross the Arrow boundary as a binary
    column, and a second mapInPandas stage PARSES them back —
    whitespace-tokenized header, payload-length validation, numpy
    reshape to (h, w, 3), per-channel means.  The gradient fill
    base_c + x + y gives every feature a closed form
    (base_c + (w−1)/2 + (h−1)/2 — integers plus halves, exact in
    float64 on both engines), so the full decode path is value-hash
    attested against DuckDB, not just smoke-tested.  JPEG/PNG would
    swap :func:`decode_ppm` for a codec call; every other line —
    schema, batching, Arrow transfer, feature math — is the
    production path."""
    d = T(spark, sf_dir, "documents")
    return ppm_features(make_ppm_blobs(d)).orderBy("doc_id")


@query(
    "q_multimodal_audio",
    oracle="""
    SELECT d.doc_id,
           CAST(500 + d.doc_id % 500 AS INT) AS n_samples,
           CAST(8000 AS INT) AS sample_rate,
           CAST(MAX(ABS((d.doc_id * 7 + t.i * 3) % 2001 - 1000)) AS INT) AS peak,
           CAST(SUM(((d.doc_id * 7 + t.i * 3) % 2001 - 1000)
                  * ((d.doc_id * 7 + t.i * 3) % 2001 - 1000)) AS DOUBLE)
             / (500 + d.doc_id % 500) AS mean_square
    FROM documents d, range(1000) t(i)
    WHERE t.i < 500 + d.doc_id % 500
    GROUP BY d.doc_id ORDER BY d.doc_id
    """,
)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end, no codec libraries: deterministic
    RIFF/WAVE files (mono PCM16, 8 kHz) are synthesized per doc_id,
    cross the Arrow boundary as binary, and a second mapInPandas stage
    PARSES them — RIFF chunk walking (word-aligned skips, arbitrary
    chunk order), fmt validation, int16 little-endian sample view —
    into (n_samples, rate, peak, mean_square).  The oracle BRUTE-
    FORCES the same waveform sample-by-sample with a correlated
    range() in DuckDB, so nothing about the decode is taken on faith;
    the mean-square numerator is an exact int64 sum, making the final
    double division bit-identical across engines.  A compressed codec
    (MP3/FLAC) would swap :func:`decode_wav` for a codec call; schema,
    batching, and feature math are the production path."""
    d = T(spark, sf_dir, "documents")
    return wav_features(make_wav_blobs(d)).orderBy("doc_id")


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


@query(
    "q_text_tokens",
    oracle="""
    SELECT lang,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT word) AS vocab
    FROM (SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS word
          FROM documents)
    GROUP BY lang
    ORDER BY lang
    """,
    headline=True,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + vocabulary per language (explode stays in
    JVM codegen; two-phase distinct aggs)."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("word"))
    return (
        tok.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("word").alias("vocab"),
        )
        .orderBy("lang")
    )


@query(
    "q_text_tfidf",
    oracle="""
    WITH tok AS (SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS word
                 FROM documents),
         n AS (SELECT COUNT(*) AS n_docs FROM documents),
         dfreq AS (SELECT word, COUNT(DISTINCT doc_id) AS dfv FROM tok GROUP BY word),
         tf AS (SELECT lang, word, COUNT(*) AS tfv FROM tok GROUP BY lang, word)
    SELECT lang, word, tfidf FROM (
      SELECT tf.lang, tf.word,
             ROUND(tf.tfv * LN((SELECT n_docs FROM n) / dfreq.dfv), 6) AS tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY tf.lang
               ORDER BY ROUND(tf.tfv * LN((SELECT n_docs FROM n) / dfreq.dfv), 6) DESC,
                        tf.word) AS rn
      FROM tf JOIN dfreq USING (word))
    WHERE rn <= 5
    ORDER BY lang, tfidf DESC, word
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF in SQL formulation (tf × ln(N/df)), top-5 terms per lang.
    Document frequency joins back on a broadcast of the (tiny) vocab;
    N comes from a 1-row agg cross-joined, not a driver collect."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("word"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = tok.groupBy("word").agg(F.countDistinct("doc_id").alias("dfv"))
    tf = tok.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("tfv"))
    scored = (
        tf.join(F.broadcast(dfreq), on="word")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", F.round(F.col("tfv") * F.log(F.col("n_docs") / F.col("dfv")), 6))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("tfidf"), "word")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "word", "tfidf")
        .orderBy("lang", F.desc("tfidf"), "word")
    )


@query(
    "q_text_bigrams",
    oracle="""
    SELECT bigram, COUNT(*) AS n
    FROM (SELECT toks[i] || ' ' || toks[i + 1] AS bigram
          FROM (SELECT STRING_SPLIT(text, ' ') AS toks FROM documents),
               LATERAL UNNEST(generate_series(1, LEN(toks) - 1)) AS u(i))
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def q_text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigrams (n-gram generation via JVM transform/sequence —
    0-based in Spark, 1-based in the oracle)."""
    d = T(spark, sf_dir, "documents")
    # guard single-token docs: sequence(1, 0) is the DESCENDING [1, 0]
    # in Spark (negative indices -> ANSI INVALID_ARRAY_INDEX crash);
    # emit an empty bigram array instead, like generate_series(1,0)
    bigrams = d.select(
        F.explode(
            F.expr(
                "CASE WHEN size(split(text, ' ')) >= 2 THEN"
                " transform(sequence(1, size(split(text, ' ')) - 1),"
                " i -> concat(split(text, ' ')[i - 1], ' ', split(text, ' ')[i]))"
                " ELSE array() END"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


@query(
    "q_text_quality",
    oracle="""
    SELECT doc_id, lang,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           (CAST(LENGTH(text) AS BIGINT) - (CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) - 1))
             / CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS avg_token_len,
           CAST(LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
             / CAST(GREATEST(LENGTH(text), 1) AS BIGINT) AS alpha_ratio,
           CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                t -> LIST_CONTAINS(['the','a','of','and','to','in','is','on','for','with'], t)))
                AS BIGINT)
             / CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS stopword_ratio,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS BIGINT)
             / CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS distinct_ratio,
           0.4 * (CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                t -> LIST_CONTAINS(['the','a','of','and','to','in','is','on','for','with'], t)))
                AS BIGINT) / CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT))
           + 0.4 * (CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS BIGINT)
                / CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT))
           + 0.2 * (CAST(LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
                / CAST(GREATEST(LENGTH(text), 1) AS BIGINT)) AS quality
    FROM documents
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + composite score — all int-ratio
    arithmetic, bit-exact vs the oracle."""
    d = T(spark, sf_dir, "documents")
    f = quality_features("text")
    return d.select(
        "doc_id",
        "lang",
        f["n_tokens"].alias("n_tokens"),
        f["n_chars"].alias("n_chars"),
        f["avg_token_len"].alias("avg_token_len"),
        f["alpha_ratio"].alias("alpha_ratio"),
        f["stopword_ratio"].alias("stopword_ratio"),
        f["distinct_ratio"].alias("distinct_ratio"),
        quality_score("text").alias("quality"),
    )


@query(
    "q_text_langid",
    oracle="""
    WITH scored AS (
      SELECT lang,
             LENGTH(text) AS n_ch,
             LEN(regexp_extract_all(text, '[一-鿿]')) AS cjk,
             LEN(LIST_FILTER(regexp_split_to_array(LOWER(text), '\\s+'),
                 t -> LIST_CONTAINS(['the','and','of','to','is','in','that','it','for','with'], t))) AS h_en,
             LEN(LIST_FILTER(regexp_split_to_array(LOWER(text), '\\s+'),
                 t -> LIST_CONTAINS(['le','la','les','de','des','et','est','une','que','pour'], t))) AS h_fr,
             LEN(LIST_FILTER(regexp_split_to_array(LOWER(text), '\\s+'),
                 t -> LIST_CONTAINS(['el','la','los','de','y','es','en','que','una','por'], t))) AS h_es,
             LEN(LIST_FILTER(regexp_split_to_array(LOWER(text), '\\s+'),
                 t -> LIST_CONTAINS(['der','die','das','und','ist','von','mit','den','ein','für'], t))) AS h_de
      FROM documents
    ), pred AS (
      SELECT lang,
             CASE
               WHEN n_ch IS NULL OR n_ch = 0 THEN 'und'
               WHEN cjk > 0 AND cjk >= n_ch * 0.2 THEN 'zh'
               WHEN GREATEST(h_en, h_fr, h_es, h_de) = 0 THEN 'und'
               WHEN h_en = GREATEST(h_en, h_fr, h_es, h_de) THEN 'en'
               WHEN h_fr = GREATEST(h_fr, h_es, h_de) THEN 'fr'
               WHEN h_es = GREATEST(h_es, h_de) THEN 'es'
               ELSE 'de'
             END AS lang_pred
      FROM scored
    )
    SELECT lang, lang_pred, COUNT(*) AS n
    FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (Arrow-batched pandas UDF) — confusion
    counts vs the labeled lang column.  The synthetic corpus shares one
    English-ish vocabulary, so accuracy is meaningless here; real
    behavior is unit-tested on real-language sentences.

    FULLY oracled: the heuristic (functions/text._langid_one) is pure
    deterministic arithmetic — CJK-codepoint ratio gate, then stopword
    hit-count argmax with first-wins tie-break in (en, fr, es, de)
    order — so the SQL oracle re-derives the exact prediction with
    nested GREATEST chains (h_en = max → 'en' wins ties, mirroring the
    Python strict-> comparison), and the driver verifies the pandas-UDF
    path end-to-end against it."""
    d = T(spark, sf_dir, "documents")
    return (
        d.select("lang", langid_udf(F.col("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "lang_pred")
    )


@query(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id, {fp} AS fp
    FROM documents
    ORDER BY doc_id
    """.format(fp=o_fingerprint("text")),
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial document fingerprint (order-sensitive
    content hash, pure modular arithmetic → oracle-expressible via
    list_reduce)."""
    d = T(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint("text").alias("fp")).orderBy("doc_id")


@query(
    "q_text_clean",
    oracle="""
    SELECT doc_id, lang, q AS quality FROM (
      SELECT doc_id, lang,
             CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tok,
             CAST(LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
               / CAST(GREATEST(LENGTH(text), 1) AS BIGINT) AS alpha,
             CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS BIGINT)
               / CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS dr,
             0.4 * (CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                  t -> LIST_CONTAINS(['the','a','of','and','to','in','is','on','for','with'], t)))
                  AS BIGINT) / CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT))
             + 0.4 * (CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS BIGINT)
                  / CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT))
             + 0.2 * (CAST(LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
                  / CAST(GREATEST(LENGTH(text), 1) AS BIGINT)) AS q
      FROM documents)
    WHERE n_tok BETWEEN 20 AND 500 AND alpha > 0.5 AND dr > 0.3
    ORDER BY doc_id
    """,
)
def q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cleaning pipeline as ONE declared query: length bounds +
    alphabetic-ratio + lexical-diversity filters over the JVM quality
    features, emitting the retained corpus with its composite score.
    Every predicate is exact int-ratio arithmetic, so the kept-set is
    bit-identical to the oracle — threshold semantics (not just
    feature values) are driver-verified.  At 100 TB this is a single
    scan, no shuffle: filters fuse into one WholeStageCodegen pass."""
    d = T(spark, sf_dir, "documents")
    f = quality_features("text")
    return (
        d.select(
            "doc_id",
            "lang",
            f["n_tokens"].alias("_nt"),
            f["alpha_ratio"].alias("_ar"),
            f["distinct_ratio"].alias("_dr"),
            quality_score("text").alias("quality"),
        )
        .filter(
            F.col("_nt").between(20, 500) & (F.col("_ar") > 0.5) & (F.col("_dr") > 0.3)
        )
        .select("doc_id", "lang", "quality")
        .orderBy("doc_id")
    )


@query(
    "q_embed_centroids",
    oracle="""
    SELECT label, i - 1 AS dim,
           ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 4) AS centroid_v,
           COUNT(*) AS n
    FROM embeddings,
         LATERAL (SELECT UNNEST(generate_series(1, LEN(embedding))) AS i) u
    GROUP BY label, dim
    ORDER BY label, dim
    """,
)
def q_embed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids — distributed vector aggregation
    via posexplode + (label, dim) grouping.  ROUND(.,4) on both sides
    absorbs summation-order float drift.  At 100 TB this is one shuffle
    keyed (label, dim) with map-side partial sums; the alternative
    (aggregate() over zipped arrays per partition) saves the explode
    but loses partial aggregation — the explode form wins at scale."""
    e = T(spark, sf_dir, "embeddings")
    return (
        e.select(
            "label", F.posexplode("embedding").alias("_pos", "_v")
        )
        # posexplode's position is int32; the oracle's arithmetic is
        # int64 — align widths (driver schema compare is strict)
        .select("label", F.col("_pos").cast("long").alias("dim"), "_v")
        .groupBy("label", "dim")
        .agg(
            F.round(F.avg(F.col("_v").cast("double")), 4).alias("centroid_v"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("label", "dim")
    )


@query(
    "q_split_train_test",
    oracle="""
    SELECT split, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM (
      SELECT lang, n_chars,
             CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
                  WHEN (doc_id * 2654435761) % 100 < 90 THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents)
    GROUP BY split, lang ORDER BY split, lang
    """,
)
def q_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/valid/test split via multiplicative
    id hashing (operators/sampling.py) — the production property is
    that assignment is pure arithmetic: same row → same split on every
    run, any cluster size, any partitioning, and externally
    reproducible (the oracle recomputes the exact buckets in SQL).
    ``randomSplit`` satisfies none of these.  Aggregated per
    split × lang so the driver verifies the ASSIGNMENT, not a sample."""
    from ..operators.sampling import knuth_bucket, split_assign

    d = T(spark, sf_dir, "documents")
    split = split_assign(
        d, knuth_bucket(F.col("doc_id")), {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    return (
        split.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split", "lang")
    )


@query(
    "q_sample_rebalance",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE (doc_id * 2654435761) % 100 <
          CASE lang WHEN 'en' THEN 10
                    WHEN 'de' THEN 50 WHEN 'es' THEN 50 WHEN 'fr' THEN 50
                    ELSE 100 END
    GROUP BY lang ORDER BY lang
    """,
)
def q_sample_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rebalancing by deterministic stratified hash sampling:
    downsample the majority language (en → 10%), half-sample the mid
    languages, keep the tail (zh) whole.  Membership is a pure function
    of doc_id (operators/sampling.stratified_hash_sample), so the
    oracle reproduces the EXACT kept-set — the driver verifies sample
    membership, not just expected rates.  Aggregated per lang (count +
    char mass) so the check covers every kept row."""
    from ..operators.sampling import knuth_bucket, stratified_hash_sample

    d = T(spark, sf_dir, "documents")
    s = stratified_hash_sample(
        d,
        "lang",
        knuth_bucket(F.col("doc_id")),
        {"en": 0.10, "de": 0.50, "es": 0.50, "fr": 0.50},
        default_rate=1.0,
    )
    return (
        s.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


@query("q_sample_stratified", oracle=None)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum Bernoulli sampling (sampleBy, fixed seed): 20% of
    each lang.  Membership depends on input layout, so this is
    rows-only by design; per-stratum rates are property-tested in
    tests/test_llm_ops.py."""
    from ..operators.sampling import stratified_sample

    d = T(spark, sf_dir, "documents")
    langs = [r.lang for r in d.select("lang").distinct().collect()]
    s = stratified_sample(d, "lang", {lg: 0.2 for lg in langs})
    return (
        s.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("lang")
    )


@query(
    "q_multimodal_frames",
    oracle="""
    WITH b AS (
      SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS n_bytes FROM documents
    ), f AS (
      SELECT doc_id, n_bytes,
             LEAST(4, CAST(CEIL(n_bytes / 256.0) AS BIGINT)) AS nf
      FROM b WHERE n_bytes > 0
    )
    SELECT doc_id, i AS frame_idx,
           i * (n_bytes // nf) AS "offset",
           LEAST(256, n_bytes - i * (n_bytes // nf)) AS frame_len
    FROM f, LATERAL (SELECT UNNEST(generate_series(0, nf - 1)) AS i) u
    ORDER BY doc_id, frame_idx
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling from binary payloads: 1→N expansion through
    mapInPandas (operators/multimodal.sample_frames), up to 4 evenly-
    spaced 256-byte windows per blob.  frame_len is measured from the
    ACTUAL Python byte slice, and the oracle recomputes every
    offset/length from OCTET_LENGTH alone — so the driver check proves
    real bytes flowed through the Arrow batches with the declared
    windowing arithmetic."""
    d = T(spark, sf_dir, "documents")
    return sample_frames(attach_blob(d)).orderBy("doc_id", "frame_idx")


@query(
    "q_text_levenshtein",
    oracle="""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(SUBSTRING(a.text, 1, 80), SUBSTRING(b.text, 1, 80)) AS BIGINT)
             AS edit_dist
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    ORDER BY id_a
    """,
)
def q_text_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification kernel (fuzzy-dedup's exact check)
    over adjacent doc pairs, on 80-char prefixes — Levenshtein is
    O(len²) per pair, so at scale it runs ONLY inside LSH candidate
    buckets on bounded prefixes, never as a discovery scan; identical
    integer DP in both engines → bit-exact."""
    d = T(spark, sf_dir, "documents")
    a = d.select(F.col("doc_id").alias("id_a"), F.substring("text", 1, 80).alias("ta"))
    b = d.select(F.col("doc_id").alias("id_b"), F.substring("text", 1, 80).alias("tb"))
    return (
        a.join(b, F.col("id_b") == F.col("id_a") + 1)
        .select(
            "id_a",
            "id_b",
            F.levenshtein("ta", "tb").cast("long").alias("edit_dist"),
        )
        .orderBy("id_a")
    )


@query("q_sim_ann_ivf", oracle=None)
def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via IVF coarse quantizer (KMeans cells, probe the 4
    nearest of 16 cells → exact cosine on ~25% of vectors).  Fixed
    seeds make it deterministic per corpus but KMeans isn't
    SQL-expressible → rows-only; recall vs brute force is asserted in
    tests/test_llm_ops.py, and q_sim_topk is the fully-oracled exact
    baseline over the same data."""
    from ..operators.similarity import topk_cosine_ivf

    e = T(spark, sf_dir, "embeddings")
    return topk_cosine_ivf(e, query_vector(spark, sf_dir, 0), k=10)


@query("q_sim_ann_ivf_index", oracle=None)
def q_sim_ann_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 served from a PERSISTED IVF index (the lifecycle
    q_sim_ann_ivf lacks: that query refits KMeans per call; a serving
    workload writes centroids + cell-partitioned vectors once and
    probes the layout).  Build is idempotent per sf_dir (skipped when
    the index exists — KMeans seed fixed, so rebuild ≡ reuse, asserted
    in tests/test_extras.py); the probe's `cell IN (...)` filter
    partition-prunes the parquet scan to n_probe of n_cells
    directories (plan-pinned).  Rows-only for the same reason as
    q_sim_ann_ivf (KMeans isn't SQL-expressible); recall vs the
    oracled exact q_sim_topk and build-vs-refit equality are
    property-tested."""
    import os

    from ..operators.similarity import build_ivf_index, probe_ivf_index
    from .sinks import sink_path

    path = sink_path(sf_dir, "ivf_index")
    if not os.path.exists(os.path.join(path, "vectors", "_SUCCESS")):
        build_ivf_index(T(spark, sf_dir, "embeddings"), path)
    return probe_ivf_index(spark, path, query_vector(spark, sf_dir, 0), k=10)


@query("q_sim_ann_lsh", oracle=None)
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via BucketedRandomProjectionLSH on the unit sphere
    (d² = 2 − 2cos mapping) — the Spark-ML ANN interop path; rows-only
    for the same reason as IVF, recall unit-tested."""
    from ..operators.similarity import topk_cosine_lsh

    e = T(spark, sf_dir, "embeddings")
    return topk_cosine_lsh(e, query_vector(spark, sf_dir, 0), k=10, num_tables=4)


@query(
    "q_grouped_zscore",
    oracle="""
    SELECT doc_id, lang, ROUND((n_chars - m) / sd, 4) AS z
    FROM (SELECT doc_id, lang, n_chars,
                 AVG(n_chars)         OVER (PARTITION BY lang) AS m,
                 STDDEV_SAMP(n_chars) OVER (PARTITION BY lang) AS sd
          FROM documents)
    ORDER BY doc_id
    """,
)
def q_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map analytics as a DECLARED surface: per-lang z-score of
    document length via ``applyInPandas`` — each language group becomes
    one pandas DataFrame (numpy mean/std, ddof=1), the contract real
    feature-engineering UDFs use.  The oracle recomputes with SQL
    window aggregates; ROUND(.,4) absorbs summation-order float drift.
    Scale note: one shuffle on the group key; a group must fit one
    executor's memory — for heavy-tailed groups switch to the
    window-aggregate form the oracle uses."""
    import pandas as pd

    d = T(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "z": ((pdf["n_chars"] - m) / sd).round(4),
            }
        )

    return (
        d.groupBy("lang")
        .applyInPandas(_z, schema="doc_id long, lang string, z double")
        .orderBy("doc_id")
    )


@query(
    "q_sim_batch_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings WHERE vec_id < 10
    ),
    scored AS (
      SELECT q.qid, e.vec_id,
             ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          q.qe), 6) AS cos_sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.qid
    )
    SELECT qid, vec_id, cos_sim FROM (
      SELECT qid, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cos_sim DESC, vec_id) AS rn
      FROM scored)
    WHERE rn <= 5
    ORDER BY qid, cos_sim DESC, vec_id
    """,
)
def q_sim_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched retrieval: top-5 neighbors for TEN query vectors in ONE
    pass — the realistic serving shape (a request batch), versus
    q_sim_topk's single query.  The 10-row query side broadcasts and
    the corpus scans ONCE for all queries (10N scores, not 10 scans);
    per-query top-k is a WindowGroupLimit, so each task forwards ≤5
    candidates per query to the shuffle.  Self-matches excluded
    (a query's nearest neighbor is trivially itself)."""
    from ..functions.vectors import cosine

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qe"),
    )
    scored = (
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("ee"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine("ee", "qe"), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "vec_id", "cos_sim")
        .orderBy("qid", F.desc("cos_sim"), "vec_id")
    )


@query(
    "q_multimodal_resize",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h,
             list_sum(list_transform(range(0, 4),
                      i -> (i * (4 + doc_id % 13)) // 4)) AS sx_sum,
             list_sum(list_transform(range(0, 4),
                      i -> (i * (3 + doc_id % 7)) // 4)) AS sy_sum
      FROM documents)
    SELECT doc_id,
           CAST(w AS INT) AS src_w, CAST(h AS INT) AS src_h,
           CAST(4 AS INT) AS out_w, CAST(4 AS INT) AS out_h,
           (doc_id * 7)  % 200 + sx_sum / 4.0 + sy_sum / 4.0 AS mean_r,
           (doc_id * 13) % 200 + sx_sum / 4.0 + sy_sum / 4.0 AS mean_g,
           (doc_id * 29) % 200 + sx_sum / 4.0 + sy_sum / 4.0 AS mean_b,
           CAST(16 * ((doc_id * 7) % 200 + (doc_id * 13) % 200
                      + (doc_id * 29) % 200)
                + 12 * (sx_sum + sy_sum) AS BIGINT) AS checksum
    FROM g ORDER BY doc_id
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize end-to-end — completes the multimodal verb
    set (decode / feature-extract / RESIZE / frame-sample): binary P6
    images decode, nearest-neighbor downsample to 4×4
    (operators/multimodal.resize_nn — floor index mapping, pure
    integer), per-channel means plus an INTEGER checksum over every
    resized pixel.  Because NN sampling of the gradient fill picks
    pixel values base_c + (x·w)//4 + (y·h)//4, the oracle states the
    resized statistics in closed form — the checksum makes the
    attestation cover all 48 resized samples per image exactly, not
    just their means.  Means are int-sum / 16.0: exact halves/quarters
    in float64, so the doubles hash-match cross-engine."""
    from ..operators.multimodal import make_ppm_blobs, ppm_resize_features

    d = T(spark, sf_dir, "documents")
    return ppm_resize_features(make_ppm_blobs(d)).orderBy("doc_id")


@query(
    "q_graph_bfs",
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
    ), walk(id, d) AS (
      SELECT word, 0 FROM w
      WHERE length(word) = (SELECT MIN(length(word)) FROM w)
      UNION
      SELECT e.dst, walk.d + 1
      FROM walk JOIN edges e ON e.src = walk.id
      WHERE walk.d < 3
    )
    SELECT id AS word, CAST(MIN(d) AS BIGINT) AS hops
    FROM walk GROUP BY id ORDER BY word
    """,
)
def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-hop BFS (≤ 3) over the edit-distance-≤2 word
    graph, seeded at the shortest vocabulary word(s) — hop distance
    through typo-neighbor chains ("which keys are transitively
    confusable with this one"), the graph-traversal question entity
    resolution asks after q_join_fuzzy materializes the edges.

    Engine side: frontier-expansion BFS (operators/graph.bfs_hops —
    a node's hop count is the FIRST round that reaches it; one
    co-partitioned equi-join + visited anti-join per round, lineage
    checkpointed).  The edges come from the same FastSS
    deletion-neighborhood discovery q_join_fuzzy attests.  The oracle
    enumerates ALL ≤3-step walks in a recursive CTE over brute-force
    levenshtein edges and takes MIN(d) per node, so the driver
    hash-compare proves frontier BFS computes true shortest hop
    distances (the corpus graph has real 2-hop chains: a → agg →
    big).  Fifth member of the graph pack (CC ×2, PageRank,
    triangles); richer structure — ties, unreachable nodes, multi-
    source minima — is pinned on synthetic graphs in
    tests/test_llm_ops.py."""
    from ..operators.graph import bfs_hops

    d = T(spark, sf_dir, "documents")
    w = d.select(F.explode(F.split("text", " ")).alias("word")).distinct()
    # reuse the fuzzy-join discovery: blocked candidates + levenshtein
    from .extras import _DELETION_VARIANTS

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
    min_len = w.agg(F.min(F.length("word")).alias("ml"))
    seeds = (
        w.crossJoin(F.broadcast(min_len))
        .filter(F.length("word") == F.col("ml"))
        .select(F.col("word").alias("id"))
    )
    reach = bfs_hops(edges, seeds, max_hops=3)
    return reach.select(
        F.col("id").alias("word"), F.col("hops")
    ).orderBy("word")


@query(
    "q_text_inverted_index",
    oracle="""
    WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word
                 FROM documents)
    SELECT word,
           COUNT(DISTINCT doc_id) AS df,
           COUNT(*) AS tf,
           ARRAY_TO_STRING(list_sort(LIST(DISTINCT doc_id))[:20], ',')
             AS postings_head
    FROM tok GROUP BY word ORDER BY word
    """,
)
def q_text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the retrieval-side corpus operator: per
    token its document frequency, total term frequency, and the sorted
    posting list (head capped at 20 ids and emitted as a string so the
    driver hash covers the actual list content, not just counts).

    Scale: collect_set is a TypedImperativeAggregate →
    ObjectHashAggregate (hash-based, map-side partial merge of sets),
    and posting lists are per-TOKEN — the Heaps-law-bounded key space.
    The head cap mirrors real index builds: full postings go to a
    sink partitioned by term bucket, never through one driver; an
    uncapped variant is the same plan with the slice removed.  No
    silent truncation: `df` carries the true posting length next to
    the capped head."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    return (
        tok.groupBy("word")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf"),
            F.array_join(
                F.slice(F.sort_array(F.collect_set("doc_id")), 1, 20), ","
            ).alias("postings_head"),
        )
        .orderBy("word")
    )


#: BM25 query terms + constants (Robertson k1/b defaults).  The terms
#: are corpus words so the scorer exercises real posting lists.
_BM25_TERMS = ("spark", "hash", "join")
_BM25_K1 = 1.2
_BM25_B = 0.75

_BM25_ORACLE = f"""
WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word
             FROM documents),
stats AS (SELECT COUNT(*) AS n_docs,
                 (SELECT COUNT(*) FROM tok) AS n_tokens
          FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dlen FROM tok GROUP BY doc_id),
dfreq AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM tok
          WHERE word IN {_BM25_TERMS!r} GROUP BY word),
tf AS (SELECT doc_id, word, COUNT(*) AS tfv FROM tok
       WHERE word IN {_BM25_TERMS!r} GROUP BY doc_id, word),
scored AS (
  SELECT tf.doc_id,
         CAST(FLOOR(
           LN(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tfv * ({_BM25_K1} + 1.0))
           / (tf.tfv + {_BM25_K1} * (1.0 - {_BM25_B}
              + {_BM25_B} * dl.dlen
                / (CAST(stats.n_tokens AS DOUBLE) / stats.n_docs)))
           * 1000000.0) AS BIGINT) AS term_score_micros
  FROM tf
  JOIN dfreq USING (word)
  JOIN dl USING (doc_id)
  CROSS JOIN stats)
SELECT doc_id, CAST(SUM(term_score_micros) AS BIGINT) AS score_micros
FROM scored
GROUP BY doc_id
ORDER BY score_micros DESC, doc_id
LIMIT 10
"""


def _bm25_score_df(d: DataFrame) -> DataFrame:
    """(doc_id, score_micros) BM25 scores for _BM25_TERMS — the scoring
    pipeline shared by q_search_bm25 (top-10 lexical) and
    q_search_hybrid_rrf (lexical arm of the fusion)."""
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    stats = d.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        tok.agg(F.count(F.lit(1)).alias("n_tokens"))
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    hits = tok.filter(F.col("word").isin(*_BM25_TERMS))
    dfreq = hits.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    tf = hits.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tfv"))
    scored = (
        tf.join(F.broadcast(dfreq), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tfv") * F.lit(_BM25_K1 + 1.0))
                / (
                    F.col("tfv")
                    + F.lit(_BM25_K1)
                    * (
                        F.lit(1.0 - _BM25_B)
                        + F.lit(_BM25_B)
                        * F.col("dlen")
                        / (F.col("n_tokens").cast("double") / F.col("n_docs"))
                    )
                )
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("term_score_micros"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("term_score_micros").alias("score_micros")
    )


@query("q_search_bm25", oracle=_BM25_ORACLE)
def q_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval over the corpus for a fixed term set —
    the scoring half of the inverted index: idf = ln(1 + (N−df+0.5)/
    (df+0.5)) (the +1 form, always positive), tf saturation with
    k1=1.2, length normalization with b=0.75 against the mean doc
    length.

    Float-parity discipline: each PER-TERM score is one fixed
    expression tree of IEEE mul/div/ln evaluated identically by both
    engines, then floored to integer MICROS — so the cross-term SUM is
    exact int64 arithmetic in any order (a double sum across terms
    would expose summation-order ulps to the hash).  Top-10 by
    (score, doc_id) is TakeOrderedAndProject engine-side.

    Scale: df/doclen/N are broadcast-size side tables; the only
    corpus-sized pass is the token scan; candidate rows are bounded by
    the query terms' posting lists, exactly like a real searcher."""
    return (
        _bm25_score_df(T(spark, sf_dir, "documents"))
        .orderBy(F.desc("score_micros"), "doc_id")
        .limit(10)
    )

_HYBRID_ORACLE = f"""
WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word
             FROM documents),
stats AS (SELECT COUNT(*) AS n_docs,
                 (SELECT COUNT(*) FROM tok) AS n_tokens
          FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dlen FROM tok GROUP BY doc_id),
dfreq AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM tok
          WHERE word IN {_BM25_TERMS!r} GROUP BY word),
tf AS (SELECT doc_id, word, COUNT(*) AS tfv FROM tok
       WHERE word IN {_BM25_TERMS!r} GROUP BY doc_id, word),
scored AS (
  SELECT tf.doc_id,
         CAST(FLOOR(
           LN(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tfv * ({_BM25_K1} + 1.0))
           / (tf.tfv + {_BM25_K1} * (1.0 - {_BM25_B}
              + {_BM25_B} * dl.dlen
                / (CAST(stats.n_tokens AS DOUBLE) / stats.n_docs)))
           * 1000000.0) AS BIGINT) AS term_score_micros
  FROM tf
  JOIN dfreq USING (word)
  JOIN dl USING (doc_id)
  CROSS JOIN stats),
lex AS (SELECT doc_id, CAST(SUM(term_score_micros) AS BIGINT) AS score_micros
        FROM scored GROUP BY doc_id
        ORDER BY score_micros DESC, doc_id LIMIT 20),
lexr AS (SELECT doc_id,
                CAST(row_number() OVER (ORDER BY score_micros DESC, doc_id)
                     AS INTEGER) AS r_lex
         FROM lex),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
      WHERE vec_id = 0),
dense AS (SELECT vec_id AS doc_id,
                 ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                              (SELECT qe FROM q)), 6)
                   AS cos_sim
          FROM embeddings ORDER BY cos_sim DESC, doc_id LIMIT 20),
denser AS (SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id)
                       AS INTEGER) AS r_dense
           FROM dense)
SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, l.r_lex, d.r_dense,
       CAST(COALESCE(1000000 // (60 + l.r_lex), 0)
            + COALESCE(1000000 // (60 + d.r_dense), 0) AS BIGINT)
         AS rrf_micros
FROM lexr l FULL OUTER JOIN denser d ON l.doc_id = d.doc_id
ORDER BY rrf_micros DESC, doc_id LIMIT 10
"""


@query("q_search_hybrid_rrf", oracle=_HYBRID_ORACLE)
def q_search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval — reciprocal-rank fusion of the lexical BM25
    arm (top-20 by integer-micros score, q_search_bm25's scorer) and
    the dense cosine arm (top-20 to the vec-0 query embedding,
    q_sim_topk's scorer), joined on doc_id == vec_id: rrf =
    floor(1e6/(60+r_lex)) + floor(1e6/(60+r_dense)) with a missing arm
    contributing 0 — the fusion is PURE INTEGER arithmetic over ranks,
    so cross-engine parity needs no float discipline beyond what each
    arm already attests.  This is the modern RAG retrieval shape:
    neither arm alone ranks like the fusion.

    Scale: each arm is its already-scaled pipeline (BM25: posting-list
    bounded candidates; dense: scan + per-partition heaps) cut to
    top-k; the fusion joins two k-row frames — driver-scale."""
    d = T(spark, sf_dir, "documents")
    e = T(spark, sf_dir, "embeddings")
    lex = _bm25_score_df(d).orderBy(F.desc("score_micros"), "doc_id").limit(20)
    lexr = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score_micros"), "doc_id"))
        .alias("r_lex"),
    )
    dense = topk_cosine(e, query_vector(spark, sf_dir, 0), k=20)
    denser = dense.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("cos_sim"), "vec_id"))
        .alias("r_dense"),
    )
    return (
        lexr.join(denser, "doc_id", "full")
        .select(
            "doc_id",
            "r_lex",
            "r_dense",
            (
                F.coalesce(F.expr("1000000 DIV (60 + r_lex)"), F.lit(0))
                + F.coalesce(F.expr("1000000 DIV (60 + r_dense)"), F.lit(0))
            )
            .cast("long")
            .alias("rrf_micros"),
        )
        .orderBy(F.desc("rrf_micros"), "doc_id")
        .limit(10)
    )

