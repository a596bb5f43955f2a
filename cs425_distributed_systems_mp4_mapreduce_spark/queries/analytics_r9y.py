"""Round-9 pack Y: paired-binary change, vocabulary growth, and
filter agreement.

* ``q_stats_mcnemar`` — McNemar's test on paired per-user binaries
  (clicked in the first vs second month-half): the discordant-pair
  statistic as an exact integer rational.
* ``q_text_heaps_curve`` — the Heaps-law type/token curve at literal
  document-prefix rungs — the measured vocabulary-growth law
  (SCALE_PROBE heaps_curves) materialized as a query.
* ``q_stats_kappa`` — Cohen's κ agreement between two deterministic
  document-quality raters (length rule vs stopword rule), fully
  cross-multiplied integer ppm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# McNemar's test on paired month-half click indicators
# ------------------------------------------------------------------

_MCN_ORACLE = """
WITH x AS (
  SELECT user_id,
         MAX(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS early,
         MAX(CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END) AS late
  FROM events WHERE event_type = 'click' GROUP BY user_id),
agg AS (
  SELECT CAST(SUM(CASE WHEN early = 1 AND late = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
         CAST(SUM(CASE WHEN early = 0 AND late = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c,
         CAST(SUM(CASE WHEN early = 1 AND late = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_both,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM x)
SELECT n_users, n_both, b, c,
       CAST(CASE WHEN b + c = 0 THEN NULL
            ELSE (1000000 * (b - c) * (b - c)) // (b + c) END AS BIGINT)
         AS chisq_micros,
       CASE WHEN b + c = 0 THEN NULL
            ELSE CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE)
            END AS chisq
FROM agg
"""


@query("q_stats_mcnemar", oracle=_MCN_ORACLE)
def q_stats_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for paired binary change: did each user click in
    the first month-half vs the second?  Only the DISCORDANT pairs
    (b = early-only, c = late-only) carry information — χ² =
    (b−c)²/(b+c), shipped both as the exact integer micro-rational
    and the pinned double; concordant users are reported but never
    enter the statistic.  Completes the paired family:
    q_stats_sign_test compares paired VALUES, McNemar paired
    INDICATORS.  No discordant pairs reports NULL identically.

    Scale: one (user) max-pivot plus one 1-row combine, both
    map-side-combined."""
    ev = T(spark, sf_dir, "events").where(F.col("event_type") == "click")
    x = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.dayofmonth("event_ts") <= 15, 1).otherwise(0)
        ).alias("early"),
        F.max(
            F.when(F.dayofmonth("event_ts") > 15, 1).otherwise(0)
        ).alias("late"),
    )
    agg = x.agg(
        F.sum(F.when((F.col("early") == 1) & (F.col("late") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("early") == 0) & (F.col("late") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((F.col("early") == 1) & (F.col("late") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_both"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    return agg.select(
        "n_users",
        "n_both",
        "b",
        "c",
        F.expr(
            "CAST(CASE WHEN b + c = 0 THEN NULL"
            " ELSE (1000000 * (b - c) * (b - c)) DIV (b + c) END AS BIGINT)"
        ).alias("chisq_micros"),
        F.expr(
            "CASE WHEN b + c = 0 THEN NULL"
            " ELSE CAST((b - c) * (b - c) AS DOUBLE)"
            " / CAST(b + c AS DOUBLE) END"
        ).alias("chisq"),
    )


# ------------------------------------------------------------------
# Heaps-law type/token curve at document-prefix rungs
# ------------------------------------------------------------------

_HC_RUNGS = [10, 100, 500]
_HC_RUNGS_SQL = ", ".join(str(d) for d in _HC_RUNGS)

_HEAPS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, u.term
  FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
  WHERE u.term <> ''),
grid AS (SELECT UNNEST([{_HC_RUNGS_SQL}]) AS d),
pref AS (
  SELECT g.d, t.term
  FROM grid g JOIN tok t ON t.doc_id < g.d),
agg AS (
  SELECT d,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT term) AS BIGINT) AS n_types
  FROM pref GROUP BY d)
SELECT CAST(g.d AS BIGINT) AS d,
       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.n_types, 0) AS BIGINT) AS n_types,
       CAST(CASE WHEN COALESCE(a.n_tokens, 0) = 0 THEN NULL
            ELSE (1000000 * a.n_types) // a.n_tokens END AS BIGINT)
         AS ttr_ppm
FROM grid g LEFT JOIN agg a ON a.d = g.d
ORDER BY d
"""


@query("q_text_heaps_curve", oracle=_HEAPS_ORACLE)
def q_text_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Heaps-law vocabulary-growth curve materialized as a query:
    types, tokens, and type-token ratio within the first {10, 100,
    500} documents (doc_id order) — the measured curve that sizes
    MinHash key width and the BPE trainer's in-memory tier
    (SCALE_PROBE heaps_curves fits β ≈ 0.77 on growing corpora; this
    query is the per-corpus probe a pipeline runs BEFORE choosing
    those parameters).  Prefixes are literal doc_id bounds, so no
    global ordering or window ever touches the token stream, and the
    deepest rung's filter pushes into the scan.

    Scale: a 3-row literal grid ≤-joins the token stream on doc_id —
    the q_text_vocab_coverage shape; COUNT(DISTINCT) shuffles on the
    Heaps-bounded type domain only."""
    d = T(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
    )
    grid = spark.createDataFrame([(r,) for r in _HC_RUNGS], "d long")
    pref = F.broadcast(grid).join(tok, tok.doc_id < grid.d).select("d", "term")
    agg = pref.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("term").cast("long").alias("n_types"),
    )
    return (
        grid.join(agg, "d", "left")
        .select(
            F.col("d").cast("long").alias("d"),
            F.coalesce(F.col("n_tokens"), F.lit(0))
            .cast("long")
            .alias("n_tokens"),
            F.coalesce(F.col("n_types"), F.lit(0))
            .cast("long")
            .alias("n_types"),
            F.expr(
                "CAST(CASE WHEN COALESCE(n_tokens, 0) = 0 THEN NULL"
                " ELSE (1000000 * n_types) DIV n_tokens END AS BIGINT)"
            ).alias("ttr_ppm"),
        )
        .orderBy("d")
    )


# ------------------------------------------------------------------
# Cohen's kappa between two deterministic quality raters
# ------------------------------------------------------------------

#: rater A: document long enough (>= 20 tokens); rater B: enough
#: stopword glue (>= 3 hits of a tiny literal list) — two cheap
#: quality screens whose AGREEMENT is the meta-signal
_KAPPA_STOPWORDS = ["the", "and", "a", "of", "to"]
_KAPPA_MIN_TOKENS = 20
_KAPPA_MIN_HITS = 3

_KAPPA_SW_SQL = ", ".join(f"'{w}'" for w in _KAPPA_STOPWORDS)

_KAPPA_ORACLE = f"""
WITH r AS (
  SELECT CASE WHEN length(regexp_extract_all(text, '[^ ]+'))
              >= {_KAPPA_MIN_TOKENS} THEN 1 ELSE 0 END AS ra,
         CASE WHEN len(list_filter(string_split(lower(text), ' '),
              t -> list_contains([{_KAPPA_SW_SQL}], t)))
              >= {_KAPPA_MIN_HITS} THEN 1 ELSE 0 END AS rb
  FROM documents),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n11,
         CAST(SUM(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n10,
         CAST(SUM(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n01,
         CAST(SUM(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n00
  FROM r)
SELECT n, n11, n10, n01, n00,
       CAST(CASE WHEN n * n - ((n11 + n10) * (n11 + n01)
                 + (n01 + n00) * (n10 + n00)) = 0 THEN NULL
            WHEN n * (n11 + n00) - ((n11 + n10) * (n11 + n01)
                 + (n01 + n00) * (n10 + n00)) >= 0
              THEN (1000000 * (n * (n11 + n00) - ((n11 + n10) * (n11 + n01)
                   + (n01 + n00) * (n10 + n00))))
                   // (n * n - ((n11 + n10) * (n11 + n01)
                   + (n01 + n00) * (n10 + n00)))
            ELSE -((1000000 * (((n11 + n10) * (n11 + n01)
                   + (n01 + n00) * (n10 + n00)) - n * (n11 + n00)))
                   // (n * n - ((n11 + n10) * (n11 + n01)
                   + (n01 + n00) * (n10 + n00)))) END AS BIGINT)
         AS kappa_ppm
FROM agg
"""


@query("q_stats_kappa", oracle=_KAPPA_ORACLE)
def q_stats_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ agreement between two deterministic document-quality
    raters (a length screen and a stopword-glue screen): κ =
    (pₒ − pₑ)/(1 − pₑ) cross-multiplied into ONE sign-aware integer
    ppm — numerator N·(n₁₁+n₀₀) − Σ marginal products, denominator
    N² − Σ marginal products — so the chance-corrected agreement is
    hash-exact with no float probability anywhere.  κ near 0 means
    the two screens fire independently (keep both); κ near 1 means
    one is redundant.  Degenerate marginals (pₑ = 1) report NULL.

    Scale: two map-only indicator expressions into a 1-row combine —
    no shuffle wider than the final aggregate; marginal products stay
    in int64 to ~3e9 docs, past which the DECIMAL string-pin applies."""
    d = T(spark, sf_dir, "documents")
    sw_array = ", ".join(f"'{w}'" for w in _KAPPA_STOPWORDS)
    r = d.select(
        F.expr(
            f"CASE WHEN size(regexp_extract_all(text, '[^ ]+', 0))"
            f" >= {_KAPPA_MIN_TOKENS} THEN 1 ELSE 0 END"
        ).alias("ra"),
        F.expr(
            f"CASE WHEN size(filter(split(lower(text), ' '),"
            f" t -> array_contains(array({sw_array}), t)))"
            f" >= {_KAPPA_MIN_HITS} THEN 1 ELSE 0 END"
        ).alias("rb"),
    )
    agg = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when((F.col("ra") == 1) & (F.col("rb") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n11"),
        F.sum(F.when((F.col("ra") == 1) & (F.col("rb") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n10"),
        F.sum(F.when((F.col("ra") == 0) & (F.col("rb") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n01"),
        F.sum(F.when((F.col("ra") == 0) & (F.col("rb") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n00"),
    )
    pe_prod = (
        "((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))"
    )
    return agg.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr(
            f"CAST(CASE WHEN n * n - {pe_prod} = 0 THEN NULL"
            f" WHEN n * (n11 + n00) - {pe_prod} >= 0"
            f"   THEN (1000000 * (n * (n11 + n00) - {pe_prod}))"
            f"        DIV (n * n - {pe_prod})"
            f" ELSE -((1000000 * ({pe_prod} - n * (n11 + n00)))"
            f"        DIV (n * n - {pe_prod})) END AS BIGINT)"
        ).alias("kappa_ppm"),
    )
