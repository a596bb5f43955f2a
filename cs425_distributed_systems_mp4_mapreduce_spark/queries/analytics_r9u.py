"""Round-9 pack U: interval estimation, exact vector-hygiene
outliers, and a fixed-point Markov power iteration.

* ``q_stats_binom_ci`` — Wilson 95% score interval per event type
  from exact integer counts (the A/B dashboard's error bars).
* ``q_embed_dim_outliers`` — per-dimension 4σ outlier census over
  the fixed-point embedding components, with the z² test evaluated
  as an EXACT integer cross-multiplication (no float variance).
* ``q_events_markov_power`` — stationary-distribution power
  iteration on the event-type transition matrix, three unrolled
  steps in floored-micros integer arithmetic — deterministic on
  both engines, the PageRank recursion at dimension k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# Wilson 95% score interval per event type
# ------------------------------------------------------------------

_BC_THRESH = 2.5  # conversion: value > threshold
_BC_Z = 1.96

#: Wilson bounds as ONE pinned double expression over (x, n):
#: (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)
_BC_P = "(CAST(x AS DOUBLE) / CAST(n AS DOUBLE))"
_BC_Z2N = f"({_BC_Z!r} * {_BC_Z!r} / CAST(n AS DOUBLE))"
_BC_RAD = (
    f"({_BC_Z!r} * SQRT({_BC_P} * (1.0 - {_BC_P}) / CAST(n AS DOUBLE)"
    f" + {_BC_Z!r} * {_BC_Z!r}"
    f" / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))"
)
_BC_LO = f"(({_BC_P} + {_BC_Z2N} / 2.0 - {_BC_RAD}) / (1.0 + {_BC_Z2N}))"
_BC_HI = f"(({_BC_P} + {_BC_Z2N} / 2.0 + {_BC_RAD}) / (1.0 + {_BC_Z2N}))"

_BINCI_ORACLE = f"""
WITH c AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN value > {_BC_THRESH!r} THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY 1)
SELECT event_type, n, x,
       CAST((1000000 * x) // n AS BIGINT) AS p_ppm,
       {_BC_LO} AS wilson_lo,
       {_BC_HI} AS wilson_hi
FROM c ORDER BY event_type
"""


@query("q_stats_binom_ci", oracle=_BINCI_ORACLE)
def q_stats_binom_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score interval for the per-event-type conversion
    rate (value > 2.5): the interval the A/B dashboards of
    q_stats_two_proportion should draw as error bars — better-behaved
    than the Wald interval near 0/1 and at small n.  Counts are exact
    int64; the point estimate ships in exact ppm; the two bounds are
    single pinned-order double expressions over (x, n), so they
    hash-match bit-for-bit.

    Scale: one map-side-combined aggregation keyed by the bounded
    event-type domain."""
    ev = T(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value") > _BC_THRESH, 1).otherwise(0))
        .cast("long")
        .alias("x"),
    )
    return c.select(
        "event_type",
        "n",
        "x",
        F.expr("CAST((1000000 * x) DIV n AS BIGINT)").alias("p_ppm"),
        F.expr(_BC_LO).alias("wilson_lo"),
        F.expr(_BC_HI).alias("wilson_hi"),
    ).orderBy("event_type")


# ------------------------------------------------------------------
# Per-dimension 4-sigma outlier census, exact integers
# ------------------------------------------------------------------

_DO_SIGMA = 4  # flag |x − μ| > 4σ

_DIMOUT_ORACLE = f"""
WITH comp AS (
  SELECT CAST(t.i + 1 AS BIGINT) AS dim,
         CAST(FLOOR(list_extract(CAST(embedding AS DOUBLE[]),
              CAST(t.i + 1 AS INT)) * 10000.0 + 0.5) AS BIGINT) AS v
  FROM embeddings, range(64) t(i)),
mom AS (
  SELECT dim,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(v * v) AS BIGINT) AS q
  FROM comp GROUP BY dim),
flag AS (
  SELECT c.dim,
         CASE WHEN CAST(c.v * m.n - m.s AS HUGEINT)
                   * CAST(c.v * m.n - m.s AS HUGEINT)
                   > {_DO_SIGMA * _DO_SIGMA}
                     * CAST(m.n * m.q - m.s * m.s AS HUGEINT)
              THEN 1 ELSE 0 END AS is_out
  FROM comp c JOIN mom m ON m.dim = c.dim)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(is_out) AS BIGINT) AS n_outliers
FROM flag GROUP BY dim ORDER BY dim
"""


@query("q_embed_dim_outliers", oracle=_DIMOUT_ORACLE)
def q_embed_dim_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension 4σ outlier census over the fixed-point embedding
    components — the vector-hygiene screen that catches a corrupted
    encoder dimension before it poisons every downstream cosine
    (complements q_embed_dimstats' moments and q_embed_norm_bands'
    row-level screen).  The z² > 16 test is evaluated as the EXACT
    integer cross-multiplication (v·n − s)² > 16·(n·q − s²) — no
    float mean or variance anywhere, so the census hash-matches;
    (v·n−s)² is compared in int128/decimal (it passes 2⁶³ beyond ~9e5
    vectors at this component scale).

    Scale: one component census (posexplode is map-side), one
    64-row moment table broadcast back onto the component stream."""
    base = T(spark, sf_dir, "embeddings").select(
        F.posexplode(
            F.expr(
                "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)"
                " * 10000.0 + 0.5d) AS BIGINT))"
            )
        ).alias("dim0", "v")
    ).select((F.col("dim0") + 1).alias("dim"), "v")
    mom = base.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.expr("v * v")).cast("long").alias("q"),
    )
    flag = base.join(F.broadcast(mom), "dim").select(
        "dim",
        F.expr(
            f"CASE WHEN CAST(v * n - s AS DECIMAL(19,0))"
            f" * CAST(v * n - s AS DECIMAL(19,0))"
            f" > CAST({_DO_SIGMA * _DO_SIGMA} AS DECIMAL(19,0))"
            f" * CAST(n * q - s * s AS DECIMAL(19,0))"
            f" THEN 1 ELSE 0 END"
        ).alias("is_out"),
    )
    return (
        flag.groupBy(F.col("dim").cast("long").alias("dim"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("is_out").cast("long").alias("n_outliers"),
        )
        .orderBy("dim")
    )


# ------------------------------------------------------------------
# Markov power iteration on the event-type transition matrix
# ------------------------------------------------------------------

_MK_ITERS = 3


def _mk_iter_sql(t: int) -> str:
    """π_{t+1}[j] = Σ_i (π_t[i] · c_ij) // r_i, per-term floored."""
    return f"""
pi{t + 1} AS (
  SELECT tr.dst AS et,
         CAST(SUM((p.pi * tr.c) // tr.r) AS BIGINT) AS pi
  FROM transf tr JOIN pi{t} p ON p.et = tr.src
  GROUP BY tr.dst)"""


_MARKOV_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id) AS nxt
  FROM events),
trans0 AS (
  SELECT event_type AS src, nxt AS dst, CAST(COUNT(*) AS BIGINT) AS c
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
trans AS (
  SELECT src, dst, c,
         CAST(SUM(c) OVER (PARTITION BY src) AS BIGINT) AS r
  FROM trans0),
types AS (SELECT DISTINCT src AS et FROM trans
          UNION SELECT DISTINCT dst FROM trans),
transf AS (
  SELECT src, dst, c, r FROM trans
  UNION ALL
  SELECT et, et, CAST(1 AS BIGINT), CAST(1 AS BIGINT)
  FROM types WHERE et NOT IN (SELECT src FROM trans)),
k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM types),
pi0 AS (
  SELECT t.et, CAST(1000000 // k.k AS BIGINT) AS pi
  FROM types t CROSS JOIN k),
{",".join(_mk_iter_sql(t) for t in range(_MK_ITERS))}
SELECT p0.et AS event_type, p0.pi AS pi0,
       CAST(COALESCE(p3.pi, 0) AS BIGINT) AS pi{_MK_ITERS}_micros
FROM pi0 p0 LEFT JOIN pi{_MK_ITERS} p3 ON p3.et = p0.et
ORDER BY event_type
"""


@query("q_events_markov_power", oracle=_MARKOV_ORACLE)
def q_events_markov_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary behavior profile: three unrolled power-iteration
    steps of π ← πP on the event-type transition matrix, in
    FLOORED-MICROS integer arithmetic — each term (π[i]·c_ij)//r_i is
    an exact integer, so the trajectory is deterministic on both
    engines with no float matrix anywhere (the PageRank recursion at
    dimension k = |event types|, where exact integer fixed-point is
    affordable and hash-provable).  The state space is the UNION of
    sources and destinations: types that receive no transitions
    report 0 mass, and ABSORBING types (observed only as a
    destination) carry an implicit self-loop P[i][i] = 1 — they hold
    their π share instead of leaking it, so the reported
    distribution conserves the mass that flows into them (round-10
    fix; previously src-only types defined the space and inbound
    mass to absorbing types silently vanished).

    Scale: the transition census is one (user, time) exchange (the
    q_events_transitions shape); each iteration is a k²-row join —
    catalog-sized, broadcast."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.expr("ts div 1000"), F.col("event_id")
    )
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    )
    trans0 = (
        seq.where(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    trans = trans0.select(
        "src",
        "dst",
        "c",
        F.sum("c").over(Window.partitionBy("src")).cast("long").alias("r"),
    )
    types = (
        trans0.select(F.col("src").alias("et"))
        .union(trans0.select(F.col("dst").alias("et")))
        .distinct()
    )
    # absorbing types (never a src) get an implicit self-loop row
    # c = r = 1, i.e. P[i][i] = 1 — mass flowing in is retained, not
    # silently dropped from the reported distribution
    selfloops = types.join(
        trans0.select(F.col("src").alias("et")).distinct(),
        "et",
        "left_anti",
    ).select(
        F.col("et").alias("src"),
        F.col("et").alias("dst"),
        F.lit(1).cast("long").alias("c"),
        F.lit(1).cast("long").alias("r"),
    )
    trans = trans.unionByName(selfloops)
    k = types.agg(F.count(F.lit(1)).cast("long").alias("k"))
    pi = types.crossJoin(F.broadcast(k)).select(
        "et", F.expr("CAST(1000000 DIV k AS BIGINT)").alias("pi")
    )
    pi0 = pi
    for _ in range(_MK_ITERS):
        pi = (
            trans.join(
                F.broadcast(pi.withColumnRenamed("et", "src")), "src"
            )
            .groupBy(F.col("dst").alias("et"))
            .agg(
                F.sum(F.expr("(pi * c) DIV r")).cast("long").alias("pi")
            )
        )
    return (
        pi0.select("et", F.col("pi").alias("pi0"))
        .join(
            pi.select("et", F.col("pi").alias("pif")), "et", "left"
        )
        .select(
            F.col("et").alias("event_type"),
            "pi0",
            F.coalesce(F.col("pif"), F.lit(0))
            .cast("long")
            .alias(f"pi{_MK_ITERS}_micros"),
        )
        .orderBy("event_type")
    )
