"""Round-9 pack V: the sign test, Hartley's variance-ratio screen,
and URL normalization.

* ``q_stats_sign_test`` — the paired sign test on the Wilcoxon
  pairing (per-user early/late month-half spend): distribution-free
  even of the symmetry assumption, all integer.
* ``q_stats_fmax`` — Hartley's Fmax (max/min group variance across
  the five order priorities): the cheap homoscedasticity screen that
  decides whether q_stats_anova's pooled variance is trustworthy.
* ``q_scalar_url`` — URL canonicalization census: scheme/host/path/
  query parsing with regexp on BOTH engines (Spark's parse_url has
  no DuckDB twin), lowercased host, query-string stripped — the
  dedup key normalization every web-crawl pipeline runs first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# Paired sign test on early/late month-half spend
# ------------------------------------------------------------------

_SIGN_Z = (
    "CASE WHEN n_pos + n_neg = 0 THEN NULL ELSE "
    "(CAST(n_pos AS DOUBLE) - CAST(n_neg AS DOUBLE))"
    " / SQRT(CAST(n_pos + n_neg AS DOUBLE)) END"
)

_SIGN_ORACLE = f"""
WITH pairs AS (
  SELECT user_id,
         SUM(CASE WHEN day(ts) <= 15
             THEN CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)
             ELSE 0 END) AS a,
         SUM(CASE WHEN day(ts) > 15
             THEN CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)
             ELSE 0 END) AS b
  FROM events GROUP BY user_id),
agg AS (
  SELECT CAST(SUM(CASE WHEN b > a THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN b < a THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
         CAST(SUM(CASE WHEN b = a THEN 1 ELSE 0 END) AS BIGINT) AS n_tie
  FROM pairs)
SELECT n_pos, n_neg, n_tie,
       CAST(CASE WHEN n_pos + n_neg = 0 THEN NULL
            ELSE (1000000 * n_pos) // (n_pos + n_neg) END AS BIGINT)
         AS pos_ppm,
       {_SIGN_Z} AS z_stat
FROM agg
"""


@query("q_stats_sign_test", oracle=_SIGN_ORACLE)
def q_stats_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test on the q_stats_wilcoxon_signed pairing (per-
    user early vs late month-half spend): counts of positive/negative
    differences (ties reported, excluded per the classical
    procedure), the positive share in exact ppm, and the normal-
    approximation z = (n⁺ − n⁻)/√(n⁺ + n⁻) as one pinned double.
    The sign test drops even Wilcoxon's symmetry assumption —
    the right default when the paired differences are skewed.

    Scale: one (user) aggregation + one 1-row combine, both
    map-side-combined."""
    ev = T(spark, sf_dir, "events")
    micros = F.expr("CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)")
    pairs = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.dayofmonth("event_ts") <= 15, micros).otherwise(0)
        ).alias("a"),
        F.sum(
            F.when(F.dayofmonth("event_ts") > 15, micros).otherwise(0)
        ).alias("b"),
    )
    agg = pairs.agg(
        F.sum(F.when(F.col("b") > F.col("a"), 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.sum(F.when(F.col("b") < F.col("a"), 1).otherwise(0))
        .cast("long")
        .alias("n_neg"),
        F.sum(F.when(F.col("b") == F.col("a"), 1).otherwise(0))
        .cast("long")
        .alias("n_tie"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        "n_tie",
        F.expr(
            "CAST(CASE WHEN n_pos + n_neg = 0 THEN NULL"
            " ELSE (1000000 * n_pos) DIV (n_pos + n_neg) END AS BIGINT)"
        ).alias("pos_ppm"),
        F.expr(_SIGN_Z).alias("z_stat"),
    )


# ------------------------------------------------------------------
# Hartley's Fmax across the five order priorities
# ------------------------------------------------------------------

_FM_PRIORITIES = [
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
]
_FM_GRP = (
    "CASE "
    + " ".join(
        f"WHEN o_orderpriority = '{p}' THEN {i + 1}"
        for i, p in enumerate(_FM_PRIORITIES)
    )
    + " END"
)
#: per-group sample variance as a pinned double from the exact
#: moments; degenerate groups (n < 2) report NULL and drop from the
#: max/min via the CASE ladders below.
_FM_VAR = {
    i: (
        f"CASE WHEN n{i} < 2 THEN NULL ELSE "
        f"(CAST(q{i} AS DOUBLE) - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE)"
        f" / CAST(n{i} AS DOUBLE)) / (CAST(n{i} AS DOUBLE) - 1.0) END"
    )
    for i in range(1, 6)
}
_FM_VMAX = "GREATEST(" + ", ".join(f"v{i}" for i in range(1, 6)) + ")"
_FM_VMIN = "LEAST(" + ", ".join(f"v{i}" for i in range(1, 6)) + ")"

_FM_MOM_COLS = ",\n         ".join(
    f"CAST(SUM(CASE WHEN grp = {i} THEN 1 ELSE 0 END) AS BIGINT) AS n{i},"
    f" CAST(SUM(CASE WHEN grp = {i} THEN v ELSE 0 END) AS BIGINT) AS s{i},"
    f" CAST(CAST(SUM(CASE WHEN grp = {i} THEN CAST(v AS HUGEINT) * v"
    f" ELSE 0 END) AS VARCHAR) AS DOUBLE) AS q{i}"
    for i in range(1, 6)
)

_FMAX_ORACLE = f"""
WITH o AS (
  SELECT {_FM_GRP} AS grp,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders),
mom AS (
  SELECT {_FM_MOM_COLS}
  FROM o WHERE grp IS NOT NULL),
vars_ AS (
  SELECT {", ".join(f"{_FM_VAR[i]} AS v{i}" for i in range(1, 6))},
         n1, n2, n3, n4, n5
  FROM mom)
SELECT n1, n2, n3, n4, n5, v1, v2, v3, v4, v5,
       CASE WHEN {_FM_VMIN} IS NULL OR {_FM_VMIN} = 0.0 THEN NULL
            ELSE {_FM_VMAX} / {_FM_VMIN} END AS fmax
FROM vars_
"""


@query("q_stats_fmax", oracle=_FMAX_ORACLE)
def q_stats_fmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hartley's Fmax — the largest-to-smallest group-variance ratio
    across the five order priorities: the one-number
    homoscedasticity screen run BEFORE trusting q_stats_anova's
    pooled variance (its formal counterpart is q_stats_brown_forsythe;
    Fmax is the cheap first look).  Group variances are pinned double
    expressions over exact moments (Σv² HUGEINT/decimal string-
    pinned); GREATEST/LEAST skip NULL (degenerate) groups identically
    on both engines, and an all-degenerate or zero-variance floor
    reports NULL.

    Scale: one map-side-combined aggregation over the fact scan —
    the q_stats_anova 1-row shape."""
    o = T(spark, sf_dir, "orders").select(
        F.expr(_FM_GRP).alias("grp"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v"),
    ).where(F.col("grp").isNotNull())
    dec = F.col("v").cast("decimal(19,0)")
    zero = F.lit(0).cast("decimal(38,0)")
    mom = o.agg(
        *[
            x
            for i in range(1, 6)
            for x in (
                F.sum(F.when(F.col("grp") == i, 1).otherwise(0))
                .cast("long")
                .alias(f"n{i}"),
                F.sum(F.when(F.col("grp") == i, F.col("v")).otherwise(0))
                .cast("long")
                .alias(f"s{i}"),
                F.sum(F.when(F.col("grp") == i, dec * dec).otherwise(zero))
                .cast("string")
                .cast("double")
                .alias(f"q{i}"),
            )
        ]
    )
    vars_ = mom.select(
        *[F.expr(_FM_VAR[i]).alias(f"v{i}") for i in range(1, 6)],
        *[f"n{i}" for i in range(1, 6)],
    )
    return vars_.select(
        "n1",
        "n2",
        "n3",
        "n4",
        "n5",
        "v1",
        "v2",
        "v3",
        "v4",
        "v5",
        F.expr(
            f"CASE WHEN {_FM_VMIN} IS NULL OR {_FM_VMIN} = 0.0 THEN NULL"
            f" ELSE {_FM_VMAX} / {_FM_VMIN} END"
        ).alias("fmax"),
    )


# ------------------------------------------------------------------
# URL canonicalization census
# ------------------------------------------------------------------

#: deterministic synthetic URL per document (the corpus carries no
#: URL column): scheme and tracking query vary by doc_id so the
#: normalization has real work to do.
_URL_EXPR_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END"
    " || '://WWW.' || source || '.Example.COM/' || lang"
    " || '/doc-' || CAST(doc_id AS VARCHAR)"
    " || CASE WHEN doc_id % 2 = 0"
    "    THEN '?utm_source=feed&session=' || CAST(doc_id AS VARCHAR)"
    "    ELSE '' END"
)
_URL_EXPR_SPARK = (
    "CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END"
    " || '://WWW.' || source || '.Example.COM/' || lang"
    " || '/doc-' || CAST(doc_id AS STRING)"
    " || CASE WHEN doc_id % 2 = 0"
    "    THEN '?utm_source=feed&session=' || CAST(doc_id AS STRING)"
    "    ELSE '' END"
)

#: regexp parsing shared by both engines: scheme, host, path, query
_URL_HOST_RE = "^[a-zA-Z]+://([^/?]+)"
_URL_PATH_RE = "^[a-zA-Z]+://[^/?]+(/[^?]*)"

_URL_ORACLE = f"""
WITH u AS (
  SELECT doc_id, {_URL_EXPR_SQL} AS url FROM documents),
parsed AS (
  SELECT doc_id,
         lower(regexp_extract(url, '{_URL_HOST_RE}', 1)) AS host,
         regexp_extract(url, '{_URL_PATH_RE}', 1) AS path,
         CASE WHEN url LIKE '%?%' THEN 1 ELSE 0 END AS had_query
  FROM u),
canon AS (
  SELECT CASE WHEN host LIKE 'www.%' THEN substr(host, 5) ELSE host END
           AS chost,
         had_query
  FROM parsed)
SELECT chost AS host,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(SUM(had_query) AS BIGINT) AS n_with_query
FROM canon GROUP BY 1 ORDER BY 1
"""


@query("q_scalar_url", oracle=_URL_ORACLE)
def q_scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization census — the normalization every
    web-crawl dedup runs before hashing keys: lowercase the host,
    strip the www. prefix, detect (and in the canonical key, drop)
    tracking query strings.  Parsing is shared REGEXP on both engines
    (Spark's parse_url has no DuckDB twin — the portable-idiom rule
    that picked md5-prefix over murmur3); URLs are synthesized
    deterministically from document columns, mixed-case and
    tracking-parameter pollution included.

    Scale: map-only string expressions into a host-bounded census —
    no shuffle wider than the host domain."""
    d = T(spark, sf_dir, "documents")
    u = d.select("doc_id", F.expr(_URL_EXPR_SPARK).alias("url"))
    parsed = u.select(
        F.expr(f"lower(regexp_extract(url, '{_URL_HOST_RE}', 1))").alias(
            "host"
        ),
        F.expr(
            "CASE WHEN url LIKE '%?%' THEN 1 ELSE 0 END"
        ).alias("had_query"),
    )
    canon = parsed.select(
        F.expr(
            "CASE WHEN host LIKE 'www.%' THEN substr(host, 5) ELSE host END"
        ).alias("host"),
        "had_query",
    )
    return (
        canon.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum("had_query").cast("long").alias("n_with_query"),
        )
        .orderBy("host")
    )
