"""Round-9 pack Q: text-quality surface metrics and the MinHash
estimator-fidelity evaluation.

* ``q_text_readability`` — Flesch reading-ease / FK grade per
  document from three exact integer censuses (non-space runs, vowel
  groups, sentence terminators).
* ``q_text_sentence_stats`` — sentence-length (tokens per sentence)
  distribution for the corpus.
* ``q_text_vocab_overlap`` — pairwise source-vocabulary Jaccard and
  containment in exact ppm — the "are these two feeds the same
  register?" curation diagnostic.
* ``q_dedup_minhash_error`` — the estimator self-evaluation the
  MinHash dedup family owes its users: 16-permutation MinHash
  Jaccard estimates vs EXACT token-set Jaccard on adjacent-id
  document pairs, both fully integer, so the whole error census is
  hash-oracled (the q_sim_recall_quantized discipline applied to
  q_dedup_near's estimator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# Flesch readability from three integer censuses
# ------------------------------------------------------------------

#: counts via regexp_extract_all so empty strings never divide:
#: words = non-space runs, syllable proxy = vowel groups, sentences =
#: terminator runs clamped to >= 1 (prose without punctuation is one
#: sentence).
_RD_FLESCH = (
    "CASE WHEN words = 0 THEN NULL ELSE "
    "206.835 - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))"
    " - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE)) END"
)
_RD_GRADE = (
    "CASE WHEN words = 0 THEN NULL ELSE "
    "0.39 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))"
    " + 11.8 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))"
    " - 15.59 END"
)

_READ_ORACLE = f"""
WITH c AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
         CAST(length(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS BIGINT) AS syllables,
         CAST(GREATEST(length(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS sentences
  FROM documents)
SELECT doc_id, words, sentences, syllables,
       {_RD_FLESCH} AS flesch,
       {_RD_GRADE} AS fk_grade
FROM c ORDER BY doc_id
"""


@query("q_text_readability", oracle=_READ_ORACLE)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade per document from
    three exact integer censuses — words as non-space runs, the
    classic vowel-group syllable proxy, sentence terminators clamped
    to ≥ 1 — with the two scores as pinned-order double expressions
    over those integers (bit-identical across engines).  Empty
    documents report NULL.  The readability band is the cheapest
    quality prior a curation pipeline has (the Gopher rules of
    q_quality_composite gate on cousins of these ratios).

    Scale: three regexp censuses evaluated in one map-only projection
    — no shuffle at all until the final presentation sort."""
    d = T(spark, sf_dir, "documents")
    c = d.select(
        "doc_id",
        F.expr(
            "CAST(size(regexp_extract_all(text, '[^ ]+', 0)) AS BIGINT)"
        ).alias("words"),
        F.expr(
            "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0))"
            " AS BIGINT)"
        ).alias("syllables"),
        F.expr(
            "CAST(GREATEST(size(regexp_extract_all(text, '[.!?]+', 0)), 1)"
            " AS BIGINT)"
        ).alias("sentences"),
    )
    return c.select(
        "doc_id",
        "words",
        "sentences",
        "syllables",
        F.expr(_RD_FLESCH).alias("flesch"),
        F.expr(_RD_GRADE).alias("fk_grade"),
    ).orderBy("doc_id")


# ------------------------------------------------------------------
# Sentence-length distribution
# ------------------------------------------------------------------

_SENT_ORACLE = """
WITH s AS (
  SELECT UNNEST(string_split_regex(text, '[.!?]+')) AS sent
  FROM documents),
t AS (
  SELECT CAST(length(regexp_extract_all(sent, '[^ ]+')) AS BIGINT)
           AS n_tokens
  FROM s)
SELECT n_tokens, CAST(COUNT(*) AS BIGINT) AS n_sentences
FROM t WHERE n_tokens > 0
GROUP BY n_tokens ORDER BY n_tokens
"""


@query("q_text_sentence_stats", oracle=_SENT_ORACLE)
def q_text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-length distribution: split on terminator runs, count
    tokens per sentence as non-space runs (so empty fragments from
    trailing punctuation vanish by the n_tokens > 0 filter instead of
    relying on either engine's split-edge-case behavior), histogram.
    Very short and very long sentence masses are standard layout /
    boilerplate quality signals.

    Scale: explode + one bounded-domain aggregation (sentence length
    is a small value domain) — map-side combine eats the fan-out."""
    d = T(spark, sf_dir, "documents")
    s = d.select(F.explode(F.split("text", "[.!?]+")).alias("sent"))
    t = s.select(
        F.expr(
            "CAST(size(regexp_extract_all(sent, '[^ ]+', 0)) AS BIGINT)"
        ).alias("n_tokens")
    )
    return (
        t.where(F.col("n_tokens") > 0)
        .groupBy("n_tokens")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sentences"))
        .orderBy("n_tokens")
    )


# ------------------------------------------------------------------
# Pairwise source-vocabulary overlap
# ------------------------------------------------------------------

_OVL_ORACLE = """
WITH v AS (
  SELECT DISTINCT source, u.term
  FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
  WHERE u.term <> ''),
sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM v a JOIN v b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2)
SELECT i.src_a, i.src_b, sa.n AS n_a, sb.n AS n_b, i.n_common,
       CAST((1000000 * i.n_common) // (sa.n + sb.n - i.n_common)
            AS BIGINT) AS jaccard_ppm,
       CAST((1000000 * i.n_common) // LEAST(sa.n, sb.n) AS BIGINT)
         AS containment_ppm
FROM inter i
JOIN sz sa ON sa.source = i.src_a
JOIN sz sb ON sb.source = i.src_b
ORDER BY src_a, src_b
"""


@query("q_text_vocab_overlap", oracle=_OVL_ORACLE)
def q_text_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary overlap: Jaccard and containment
    (overlap over the smaller vocabulary) in exact ppm for every
    source pair — the register/domain-similarity diagnostic that
    decides whether two feeds deduplicate against each other or mix
    as complements.  Everything is an integer count over the
    per-source vocabulary sets.

    Scale: the vocabulary table is Heaps-bounded; the pair expansion
    joins ON TERM (never a cross join), so a term seen in s sources
    fans out to s(s−1)/2 pair rows — bounded by the source count,
    which is a catalog-sized dimension."""
    d = T(spark, sf_dir, "documents")
    v = (
        d.select(
            "source", F.explode(F.split("text", " ")).alias("term")
        )
        .where(F.col("term") != "")
        .distinct()
    )
    sz = v.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a, b = v.alias("a"), v.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sz.select(
        F.col("source").alias("src_a"), F.col("n").alias("n_a")
    )
    sb = sz.select(
        F.col("source").alias("src_b"), F.col("n").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "n_common",
            F.expr(
                "CAST((1000000 * n_common) DIV (n_a + n_b - n_common)"
                " AS BIGINT)"
            ).alias("jaccard_ppm"),
            F.expr(
                "CAST((1000000 * n_common) DIV LEAST(n_a, n_b) AS BIGINT)"
            ).alias("containment_ppm"),
        )
        .orderBy("src_a", "src_b")
    )


# ------------------------------------------------------------------
# MinHash estimator fidelity: estimate vs exact Jaccard
# ------------------------------------------------------------------

_MH_K = 16  # permutations

#: portable md5-prefix hash of (term, seed) — the q_text_feature_hashing
#: cross-engine idiom; 60-bit values, min is exact int64.
_MH_HASH_SPARK = (
    "CAST(conv(substring(md5(concat(term, '#', CAST(seed AS STRING))),"
    " 1, 15), 16, 10) AS BIGINT)"
)
_MH_HASH_SQL = (
    "CAST(('0x' || substr(md5(term || '#' || CAST(seed AS VARCHAR)),"
    " 1, 15)) AS BIGINT)"
)

_MHE_ORACLE = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, u.term
  FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
  WHERE u.term <> ''),
seeds AS (SELECT UNNEST(range(0, {_MH_K})) AS seed),
sig AS (
  SELECT t.doc_id, s.seed,
         MIN({_MH_HASH_SQL}) AS mh
  FROM tok t CROSS JOIN seeds s
  GROUP BY t.doc_id, s.seed),
docs AS (SELECT DISTINCT doc_id FROM tok),
pairs AS (
  SELECT d1.doc_id AS ida, d2.doc_id AS idb
  FROM docs d1 JOIN docs d2 ON d2.doc_id = d1.doc_id + 1),
est AS (
  SELECT p.ida, p.idb,
         CAST(SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT)
           AS m
  FROM pairs p
  JOIN sig sa ON sa.doc_id = p.ida
  JOIN sig sb ON sb.doc_id = p.idb AND sb.seed = sa.seed
  GROUP BY p.ida, p.idb),
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1),
inter AS (
  SELECT p.ida, p.idb, CAST(COUNT(*) AS BIGINT) AS c
  FROM pairs p
  JOIN tok ta ON ta.doc_id = p.ida
  JOIN tok tb ON tb.doc_id = p.idb AND tb.term = ta.term
  GROUP BY p.ida, p.idb),
err AS (
  SELECT e.ida,
         (1000000 * e.m) // {_MH_K} AS est_ppm,
         (1000000 * COALESCE(i.c, 0))
           // (sa.n + sb.n - COALESCE(i.c, 0)) AS exact_ppm
  FROM est e
  LEFT JOIN inter i ON i.ida = e.ida AND i.idb = e.idb
  JOIN sz sa ON sa.doc_id = e.ida
  JOIN sz sb ON sb.doc_id = e.idb)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(ABS(est_ppm - exact_ppm)) AS BIGINT) AS sum_abs_err_ppm,
       CAST(SUM(ABS(est_ppm - exact_ppm)) // COUNT(*) AS BIGINT)
         AS mean_abs_err_ppm,
       CAST(MAX(ABS(est_ppm - exact_ppm)) AS BIGINT) AS max_abs_err_ppm
FROM err
"""


@query("q_dedup_minhash_error", oracle=_MHE_ORACLE)
def q_dedup_minhash_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator fidelity: 16-permutation MinHash Jaccard
    estimates vs the EXACT token-set Jaccard, evaluated on
    adjacent-id document pairs, reported as a mean/max absolute-error
    census in ppm — the self-evaluation every banded-MinHash dedup
    deployment (q_dedup_near) owes its threshold choices, in the
    mold of q_sim_recall_quantized for the ANN ladder.  Signatures
    use the portable md5-prefix hash of (term, seed) so BOTH engines
    compute identical permutations; estimate (m/16) and exact
    (|∩|/|∪|) are integer ppm — the whole census hash-matches.
    Expected |err| ≈ √(J(1−J)/16) ≈ 0.12 at J = 0.5; the banding
    remedy for the variance is r growth (SCALE_PROBE heaps_curves).

    Scale: signatures are one (doc, seed) aggregation — 16 int64 per
    document however long the document; the pair evaluation joins on
    doc_id/seed keys only.  The adjacent-id pair set is a 1-per-doc
    evaluation sample, not the dedup candidate generator."""
    d = T(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .distinct()
    )
    # seed fan-out is a map-side explode of a literal sequence — never
    # a join, so the plan stays cartesian-free
    sig = (
        tok.select(
            "doc_id",
            "term",
            F.explode(F.expr(f"sequence(0L, {_MH_K - 1}L)")).alias("seed"),
        )
        .select("doc_id", "seed", F.expr(_MH_HASH_SPARK).alias("h"))
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("mh"))
    )
    docs = tok.select("doc_id").distinct()
    d1, d2 = docs.alias("d1"), docs.alias("d2")
    pairs = d1.join(
        d2, F.col("d2.doc_id") == F.col("d1.doc_id") + 1
    ).select(
        F.col("d1.doc_id").alias("ida"), F.col("d2.doc_id").alias("idb")
    )
    sa, sb = sig.alias("sa"), sig.alias("sb")
    est = (
        pairs.join(sa, F.col("sa.doc_id") == F.col("ida"))
        .join(
            sb,
            (F.col("sb.doc_id") == F.col("idb"))
            & (F.col("sb.seed") == F.col("sa.seed")),
        )
        .groupBy("ida", "idb")
        .agg(
            F.sum(
                F.when(F.col("sa.mh") == F.col("sb.mh"), 1).otherwise(0)
            )
            .cast("long")
            .alias("m")
        )
    )
    sz = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ta, tb = tok.alias("ta"), tok.alias("tb")
    inter = (
        pairs.join(ta, F.col("ta.doc_id") == F.col("ida"))
        .join(
            tb,
            (F.col("tb.doc_id") == F.col("idb"))
            & (F.col("tb.term") == F.col("ta.term")),
        )
        .groupBy("ida", "idb")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    sza = sz.select(F.col("doc_id").alias("ida"), F.col("n").alias("na"))
    szb = sz.select(F.col("doc_id").alias("idb"), F.col("n").alias("nb"))
    err = (
        est.join(inter, ["ida", "idb"], "left")
        .join(sza, "ida")
        .join(szb, "idb")
        .select(
            F.expr(f"(1000000 * m) DIV {_MH_K}").alias("est_ppm"),
            F.expr(
                "(1000000 * COALESCE(c, 0))"
                " DIV (na + nb - COALESCE(c, 0))"
            ).alias("exact_ppm"),
        )
    )
    return err.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.expr("ABS(est_ppm - exact_ppm)"))
        .cast("long")
        .alias("sum_abs_err_ppm"),
        F.expr(
            "CAST(SUM(ABS(est_ppm - exact_ppm)) DIV COUNT(*) AS BIGINT)"
        ).alias("mean_abs_err_ppm"),
        F.max(F.expr("ABS(est_ppm - exact_ppm)"))
        .cast("long")
        .alias("max_abs_err_ppm"),
    )
