"""Round-9 pack R: graph-structure metrics over the co-purchase graph
and the AMS F₂ sketch twin.

* ``q_graph_clustering_coeff`` — per-node local clustering
  coefficient (closed wedges / possible wedges) in exact ppm, on the
  q_graph_triangles sampled edge set.
* ``q_graph_assortativity`` — degree assortativity: Pearson over the
  directed edge list of (deg(u), deg(v)), exact integer moments.
* ``q_graph_reciprocity`` — a genuinely DIRECTED relation derived
  from line-number precedence within orders ("a is picked before b"),
  with the share of edges whose reverse also occurs.
* ``q_sketch_ams_f2`` — the Alon-Matias-Szegedy second-frequency-
  moment sketch built from first principles with md5-parity signs,
  evaluated against the EXACT F₂ twin in the same query (the
  Bloom/KMV/HLL xengine discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# Local clustering coefficient (sampled co-purchase graph)
# ------------------------------------------------------------------

_CC_EDGES_SQL = """
li AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
  FROM lineitem WHERE l_orderkey % 10 = 0),
e AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
adj AS (
  SELECT u AS src, v AS dst FROM e
  UNION ALL
  SELECT v AS src, u AS dst FROM e)
"""

_CLUST_ORACLE = f"""
WITH {_CC_EDGES_SQL},
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM adj GROUP BY 1),
tri AS (
  SELECT a.src AS node, CAST(COUNT(*) AS BIGINT) AS n_tri
  FROM adj a
  JOIN adj b ON b.src = a.src AND a.dst < b.dst
  JOIN e ON e.u = a.dst AND e.v = b.dst
  GROUP BY 1)
SELECT d.node, d.deg,
       CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
       CAST(CASE WHEN d.deg < 2 THEN NULL
            ELSE (1000000 * 2 * COALESCE(t.n_tri, 0))
                 // (d.deg * (d.deg - 1)) END AS BIGINT) AS coeff_ppm
FROM deg d LEFT JOIN tri t ON t.node = d.node
ORDER BY d.node
"""


@query("q_graph_clustering_coeff", oracle=_CLUST_ORACLE)
def q_graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient on the sampled
    co-purchase graph (the q_graph_triangles edge set): closed wedges
    over possible wedges, 2·tri/(deg·(deg−1)), in exact ppm — the
    community-density fingerprint that separates hub-and-spoke
    catalogs from clique-y bundles.  Degree-1 nodes report NULL (no
    wedge exists); isolated triangle membership comes from the
    canonical u<v edge list, so each triangle counts once per corner.

    Scale: the wedge join is Σdeg² on the SAMPLED graph — the same
    bound q_graph_triangles carries; the coefficient itself adds one
    broadcast-sized degree join.  At 100 TB the sample rate is the
    knob (hub salting per q_stats_skew_report if one part dominates)."""
    li = (
        T(spark, sf_dir, "lineitem")
        .where(F.expr("l_orderkey % 10 = 0"))
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a_, b_ = li.alias("a"), li.alias("b")
    e = (
        a_.join(
            b_,
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
    )
    adj = e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    deg = adj.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    aa, ab = adj.alias("wa"), adj.alias("wb")
    tri = (
        aa.join(
            ab,
            (F.col("wb.src") == F.col("wa.src"))
            & (F.col("wa.dst") < F.col("wb.dst")),
        )
        .join(
            e.alias("ce"),
            (F.col("ce.u") == F.col("wa.dst"))
            & (F.col("ce.v") == F.col("wb.dst")),
        )
        .groupBy(F.col("wa.src").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("n_tri"), F.lit(0))
            .cast("long")
            .alias("n_tri"),
            F.expr(
                "CAST(CASE WHEN deg < 2 THEN NULL"
                " ELSE (1000000 * 2 * COALESCE(n_tri, 0))"
                " DIV (deg * (deg - 1)) END AS BIGINT)"
            ).alias("coeff_ppm"),
        )
        .orderBy("node")
    )


# ------------------------------------------------------------------
# Degree assortativity (Pearson over the directed edge list)
# ------------------------------------------------------------------

_AS_R = (
    "CASE WHEN n * sx2 - sx * sx <= 0 OR n * sy2 - sy * sy <= 0 THEN NULL"
    " ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    "       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (SQRT(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)"
    "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    "    * SQRT(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)"
    "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END"
)

_ASSORT_ORACLE = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
adj AS (
  SELECT u AS src, v AS dst FROM e
  UNION ALL
  SELECT v AS src, u AS dst FROM e),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM adj GROUP BY 1),
x AS (
  SELECT du.deg AS dx, dv.deg AS dy
  FROM adj a
  JOIN deg du ON du.node = a.src
  JOIN deg dv ON dv.node = a.dst),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dx) AS BIGINT) AS sx,
         CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(dx * dy) AS BIGINT) AS sxy,
         CAST(SUM(dx * dx) AS BIGINT) AS sx2,
         CAST(SUM(dy * dy) AS BIGINT) AS sy2
  FROM x)
SELECT n, sx, sxy, sx2,
       {_AS_R} AS assortativity
FROM agg
"""


@query("q_graph_assortativity", oracle=_ASSORT_ORACLE)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: the Pearson
    correlation of (deg(u), deg(v)) over the DIRECTED edge list (each
    undirected edge contributes both orientations, the standard
    Newman estimator) — negative values mean hubs attach to leaves
    (the disassortative shape that makes hub-salting pay, per
    q_stats_skew_report), positive means rich-club.  All five moments
    are exact int64; r is one pinned-order double expression with the
    zero-variance guard reporting NULL identically.

    Scale: degrees are one aggregation, the moment pass is one join
    of the edge list against the (broadcastable) degree table — no
    wedge join anywhere, so this runs on the FULL graph."""
    li = (
        T(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a_, b_ = li.alias("a"), li.alias("b")
    e = (
        a_.join(
            b_,
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
    )
    adj = e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    deg = adj.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    du = deg.select(F.col("node").alias("src"), F.col("deg").alias("dx"))
    dv = deg.select(F.col("node").alias("dst"), F.col("deg").alias("dy"))
    x = adj.join(F.broadcast(du), "src").join(F.broadcast(dv), "dst")
    agg = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.expr("dx * dy")).cast("long").alias("sxy"),
        F.sum(F.expr("dx * dx")).cast("long").alias("sx2"),
        F.sum(F.expr("dy * dy")).cast("long").alias("sy2"),
    )
    return agg.select(
        "n", "sx", "sxy", "sx2", F.expr(_AS_R).alias("assortativity")
    )


# ------------------------------------------------------------------
# Reciprocity of the line-number precedence relation
# ------------------------------------------------------------------

_RECIP_ORACLE = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey
   AND a.l_linenumber < b.l_linenumber
   AND a.l_partkey <> b.l_partkey),
r AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_recip
  FROM e JOIN e rev ON rev.u = e.v AND rev.v = e.u),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
SELECT n.n_edges, r.n_recip,
       CAST(CASE WHEN n.n_edges = 0 THEN NULL
            ELSE (1000000 * r.n_recip) // n.n_edges END AS BIGINT)
         AS reciprocity_ppm
FROM n CROSS JOIN r
"""


@query("q_graph_reciprocity", oracle=_RECIP_ORACLE)
def q_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity of a genuinely DIRECTED relation: part a precedes
    part b (lower line number) in some order — the edge set where
    "a→b and b→a both occur" measures how order-position encodes
    real structure vs arbitrary entry order (reciprocity 1e6 means
    position carries no information).  Both counts are exact; the
    share is one integer ppm.

    Scale: the directed edge set is the q_entity-style same-key
    self-join (never cross-order); the reciprocal count is one
    self-equi-join on the reversed key."""
    li = T(spark, sf_dir, "lineitem")
    a_, b_ = li.alias("a"), li.alias("b")
    e = (
        a_.join(
            b_,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    rev = e.select(F.col("u").alias("v"), F.col("v").alias("u"))
    n_recip = e.join(rev, ["u", "v"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_recip")
    )
    n_edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return n_edges.crossJoin(n_recip).select(
        "n_edges",
        "n_recip",
        F.expr(
            "CAST(CASE WHEN n_edges = 0 THEN NULL"
            " ELSE (1000000 * n_recip) DIV n_edges END AS BIGINT)"
        ).alias("reciprocity_ppm"),
    )


# ------------------------------------------------------------------
# AMS F2 sketch with exact twin
# ------------------------------------------------------------------

_AMS_COPIES = 8

_AMS_HASH_SQL = (
    "CAST(('0x' || substr(md5(term || '#' || CAST(seed AS VARCHAR)),"
    " 1, 15)) AS BIGINT)"
)
_AMS_HASH_SPARK = (
    "CAST(conv(substring(md5(concat(term, '#', CAST(seed AS STRING))),"
    " 1, 15), 16, 10) AS BIGINT)"
)

_AMS_ORACLE = f"""
WITH c AS (
  SELECT u.term, CAST(COUNT(*) AS BIGINT) AS f
  FROM documents, UNNEST(string_split(text, ' ')) AS u(term)
  WHERE u.term <> '' GROUP BY 1),
signs AS (
  SELECT c.term, c.f, s.seed,
         CASE WHEN {_AMS_HASH_SQL} % 2 = 0 THEN 1 ELSE -1 END AS sgn
  FROM c CROSS JOIN (SELECT UNNEST(range(0, {_AMS_COPIES})) AS seed) s),
sk AS (
  SELECT seed, CAST(SUM(f * sgn) AS BIGINT) AS x
  FROM signs GROUP BY seed),
est AS (
  SELECT CAST(SUM(x * x) // {_AMS_COPIES} AS BIGINT) AS est_mean,
         CAST(MIN(x * x) AS BIGINT) AS est_min,
         CAST(MAX(x * x) AS BIGINT) AS est_max
  FROM sk),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
         CAST(SUM(f * f) AS BIGINT) AS f2_exact
  FROM c)
SELECT e.n_terms, e.f2_exact, s.est_mean, s.est_min, s.est_max,
       CAST(CASE WHEN e.f2_exact = 0 THEN NULL
            ELSE (1000000 * s.est_mean) // e.f2_exact END AS BIGINT)
         AS ratio_ppm
FROM exact e CROSS JOIN est s
"""


@query("q_sketch_ams_f2", oracle=_AMS_ORACLE)
def q_sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) second-frequency-moment sketch from
    first principles: 8 estimator copies, ±1 signs from the parity of
    the portable md5-prefix hash of (term, seed), each copy's X =
    Σ f(term)·sign is a plain mergeable integer sum, E[X²] = F₂.  The
    mean estimate ships beside the EXACT F₂ = Σf² twin and their
    ratio in ppm — the Bloom/KMV/HLL xengine discipline: the whole
    estimator, its inputs, and its error are hash-attested.  F₂ is
    the self-join size / skew functional (q_stats_skew_report's
    denominator), which is why a one-pass mergeable sketch of it
    matters at 100 TB.

    Scale: the sign fan-out is a map-side explode over the
    Heaps-bounded term census (8 ints of state per copy TOTAL —
    that's the entire point of AMS); X² stays in int64 to ~3e9
    corpus tokens, past which the DECIMAL string-pin applies."""
    d = T(spark, sf_dir, "documents")
    c = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    signs = c.select(
        "term",
        "f",
        F.explode(F.expr(f"sequence(0L, {_AMS_COPIES - 1}L)")).alias("seed"),
    ).select(
        "f",
        "seed",
        F.expr(
            f"CASE WHEN {_AMS_HASH_SPARK} % 2 = 0 THEN 1 ELSE -1 END"
        ).alias("sgn"),
    )
    sk = signs.groupBy("seed").agg(
        F.sum(F.expr("f * sgn")).cast("long").alias("x")
    )
    est = sk.agg(
        F.expr(f"CAST(SUM(x * x) DIV {_AMS_COPIES} AS BIGINT)").alias(
            "est_mean"
        ),
        F.min(F.expr("x * x")).cast("long").alias("est_min"),
        F.max(F.expr("x * x")).cast("long").alias("est_max"),
    )
    exact = c.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum(F.expr("f * f")).cast("long").alias("f2_exact"),
    )
    return exact.crossJoin(est).select(
        "n_terms",
        "f2_exact",
        "est_mean",
        "est_min",
        "est_max",
        F.expr(
            "CAST(CASE WHEN f2_exact = 0 THEN NULL"
            " ELSE (1000000 * est_mean) DIV f2_exact END AS BIGINT)"
        ).alias("ratio_ppm"),
    )
