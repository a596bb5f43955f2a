"""Round-9 pack S: three operators Spark has no built-in for, each
re-expressed as a deterministic plan with a full DuckDB oracle.

* ``q_sim_mmr`` — Maximal Marginal Relevance diversified top-5: the
  greedy argmax recursion unrolled into five plan stages (the
  q_graph_kcore_peel discipline applied to retrieval re-ranking).
* ``q_window_atr`` — Average True Range over daily OHLC bars of the
  event-value series, smoothed by the exact dyadic EMA stencil
  (q_window_ewma's IEEE-pinned weights applied to integer TRs).
* ``q_stats_page_hinkley`` — the Page-Hinkley drift detector made
  FULLY integer: floored-micros incremental means, integer deviation
  cumsum, and the prefix-minus-running-min closed form shared with
  q_window_cusum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# MMR diversified top-k (unrolled greedy)
# ------------------------------------------------------------------

_MMR_DIM = 64
_MMR_QID = 0      # query vector
_MMR_POOL = 20    # relevance candidate pool
_MMR_K = 5        # diversified picks
_MMR_LAMBDA = 0.5

#: 1e4 fixed-point integer components (the q_sim_recall_quantized
#: _FINE discipline): dots are exact int64, the cosine is ONE pinned
#: double division per pair.
_MMR_FINE_SPARK = (
    "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000.0"
    " + 0.5d) AS BIGINT))"
)
_MMR_FINE_SQL = (
    "list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000.0"
    " + 0.5) AS BIGINT))"
)


def _mmr_stage_sql(k: int) -> str:
    """CTE pair for greedy pick k (k >= 2): candidates not yet
    selected, scored 0.5*rel - 0.5*max(sim to selected)."""
    prev_sel = " UNION ALL ".join(
        f"SELECT vec_id FROM sel{j}" for j in range(1, k)
    )
    return f"""
rem{k} AS (
  SELECT c.vec_id, c.rel FROM cand c
  WHERE c.vec_id NOT IN (SELECT vec_id FROM ({prev_sel}))),
score{k} AS (
  SELECT r.vec_id, r.rel,
         {_MMR_LAMBDA!r} * r.rel - {_MMR_LAMBDA!r} * MAX(s.sim) AS score
  FROM rem{k} r
  JOIN sims s ON s.ia = r.vec_id
   AND s.ib IN (SELECT vec_id FROM ({prev_sel}))
  GROUP BY r.vec_id, r.rel),
sel{k} AS (
  SELECT vec_id, rel, score FROM score{k}
  ORDER BY score DESC, vec_id LIMIT 1)"""


_MMR_ORACLE = f"""
WITH base AS (
  SELECT vec_id, {_MMR_FINE_SQL} AS fine FROM embeddings),
nrm AS (
  SELECT vec_id, fine,
         list_sum(list_transform(fine, x -> x * x)) AS n2
  FROM base),
q AS (SELECT fine AS qf, n2 AS qn2 FROM nrm WHERE vec_id = {_MMR_QID}),
rel AS (
  SELECT v.vec_id,
         CAST(list_sum(list_transform(range(1, {_MMR_DIM} + 1),
              i -> v.fine[i] * q.qf[i])) AS DOUBLE)
           / (SQRT(CAST(v.n2 AS DOUBLE)) * SQRT(CAST(q.qn2 AS DOUBLE)))
           AS rel,
         v.fine, v.n2
  FROM nrm v CROSS JOIN q
  WHERE v.vec_id <> {_MMR_QID} AND v.n2 > 0 AND q.qn2 > 0),
cand AS (
  SELECT vec_id, rel, fine, n2 FROM rel
  ORDER BY rel DESC, vec_id LIMIT {_MMR_POOL}),
sims AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         CAST(list_sum(list_transform(range(1, {_MMR_DIM} + 1),
              i -> a.fine[i] * b.fine[i])) AS DOUBLE)
           / (SQRT(CAST(a.n2 AS DOUBLE)) * SQRT(CAST(b.n2 AS DOUBLE)))
           AS sim
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
sel1 AS (
  SELECT vec_id, rel, {_MMR_LAMBDA!r} * rel AS score FROM cand
  ORDER BY rel DESC, vec_id LIMIT 1),
{", ".join(_mmr_stage_sql(k) for k in range(2, _MMR_K + 1))}
SELECT * FROM (
  {" UNION ALL ".join(
      f"SELECT CAST({k} AS BIGINT) AS pick, vec_id, rel, score FROM sel{k}"
      for k in range(1, _MMR_K + 1)
  )}
) ORDER BY pick
"""


@query("q_sim_mmr", oracle=_MMR_ORACLE)
def q_sim_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking — the diversified top-k
    every RAG retrieval stack bolts onto its ANN hits: greedily pick
    argmax of λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), λ = ½, five
    picks from the top-20 relevance pool of query vector 0.  The
    greedy recursion is UNROLLED into five plan stages (the
    q_graph_kcore_peel discipline) — each stage anti-joins the
    selected set, joins the bounded pairwise-sim table, and takes one
    row by (score DESC, vec_id) — so the whole re-ranker is a single
    deterministic plan with a full DuckDB oracle.  Cosines are one
    pinned double division over exact 1e4-fixed-point int64 dots
    (the q_sim_recall_quantized discipline).

    Scale: the corpus is touched ONCE (the relevance scan); greedy
    stages run on the 20-row pool and its 20×19 sim matrix — both
    SF-independent, all joins broadcast.  At 100 TB the pool comes
    from the ANN ladder (q_sim_ann_ivf) instead of the exact scan;
    the re-ranker is unchanged."""
    base = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_MMR_FINE_SPARK).alias("fine")
    )
    nrm = base.select(
        "vec_id",
        "fine",
        F.expr(
            "aggregate(transform(fine, x -> x * x), 0L, (a, x) -> a + x)"
        ).alias("n2"),
    )
    q = nrm.where(F.col("vec_id") == _MMR_QID).select(
        F.col("fine").alias("qf"), F.col("n2").alias("qn2")
    )
    rel = (
        nrm.where((F.col("vec_id") != _MMR_QID) & (F.col("n2") > 0))
        .crossJoin(F.broadcast(q.where(F.col("qn2") > 0)))
        .select(
            "vec_id",
            F.expr(
                f"CAST(aggregate(zip_with(fine, qf, (a, b) -> a * b),"
                f" 0L, (a, x) -> a + x) AS DOUBLE)"
                f" / (SQRT(CAST(n2 AS DOUBLE)) * SQRT(CAST(qn2 AS DOUBLE)))"
            ).alias("rel"),
            "fine",
            "n2",
        )
    )
    # materialize the 20-row pool ONCE (r14, guide §5 / the
    # q_dedup_allpairs localCheckpoint discipline): every unrolled
    # greedy stage references cand/sims/pool, and without the barrier
    # each of the 5 stages re-derives the FULL corpus scan + top-k sort
    # inside its own subtree (the plan nests stage k-1 inside stage k's
    # anti-join), multiplying the relevance pass ~9x.
    cand = rel.orderBy(F.desc("rel"), F.asc("vec_id")).limit(_MMR_POOL).localCheckpoint()
    a, b = cand.alias("a"), cand.alias("b")
    sims = (
        F.broadcast(a)
        .join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            F.expr(
                "CAST(aggregate(zip_with(a.fine, b.fine, (x, y) -> x * y),"
                " 0L, (acc, x) -> acc + x) AS DOUBLE)"
                " / (SQRT(CAST(a.n2 AS DOUBLE)) * SQRT(CAST(b.n2 AS DOUBLE)))"
            ).alias("sim"),
        )
    )
    pool = cand.select("vec_id", "rel")
    sel = (
        pool.orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(1)
        .select(
            F.lit(1).cast("long").alias("pick"),
            "vec_id",
            "rel",
            (F.lit(_MMR_LAMBDA) * F.col("rel")).alias("score"),
        )
    )
    picks = [sel]
    selected_ids = sel.select("vec_id")
    for k in range(2, _MMR_K + 1):
        rem = pool.join(F.broadcast(selected_ids), "vec_id", "left_anti")
        scored = (
            rem.join(F.broadcast(sims), rem.vec_id == sims.ia)
            .join(
                F.broadcast(selected_ids.withColumnRenamed("vec_id", "ib")),
                "ib",
            )
            .groupBy(rem.vec_id, "rel")
            .agg(
                (
                    F.lit(_MMR_LAMBDA) * F.col("rel")
                    - F.lit(_MMR_LAMBDA) * F.max("sim")
                ).alias("score")
            )
        )
        pick_k = (
            scored.orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(1)
            .select(
                F.lit(k).cast("long").alias("pick"),
                "vec_id",
                "rel",
                "score",
            )
        )
        picks.append(pick_k)
        selected_ids = selected_ids.unionAll(pick_k.select("vec_id"))
    out = picks[0]
    for p in picks[1:]:
        out = out.unionAll(p)
    return out.orderBy("pick")


# ------------------------------------------------------------------
# ATR over daily OHLC bars (dyadic EMA stencil)
# ------------------------------------------------------------------

_ATR_DEPTH = 8
_ATR_US_PER_DAY = 86_400_000_000

_ATR_STENCIL_SQL = " + ".join(
    f"CAST(COALESCE(LAG(tr, {j}) OVER (ORDER BY di), 0) AS DOUBLE)"
    f" * {0.5 ** (j + 1)!r}"
    for j in range(_ATR_DEPTH)
)

_ATR_ORACLE = f"""
WITH e AS (
  SELECT epoch_us(ts) // {_ATR_US_PER_DAY} AS di,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v,
         epoch_us(ts) AS us, event_id
  FROM events WHERE value IS NOT NULL),
r AS (
  SELECT di, v,
         ROW_NUMBER() OVER (PARTITION BY di ORDER BY us, event_id)
           AS rk_open,
         ROW_NUMBER() OVER (PARTITION BY di ORDER BY us DESC, event_id DESC)
           AS rk_close
  FROM e),
bars AS (
  SELECT di,
         MAX(CASE WHEN rk_open = 1 THEN v END) AS open,
         MAX(v) AS high,
         MIN(v) AS low,
         MAX(CASE WHEN rk_close = 1 THEN v END) AS close
  FROM r GROUP BY di),
tr AS (
  SELECT di, high, low, close,
         CASE WHEN LAG(close) OVER (ORDER BY di) IS NULL THEN high - low
              ELSE GREATEST(high - low,
                            ABS(high - LAG(close) OVER (ORDER BY di)),
                            ABS(low - LAG(close) OVER (ORDER BY di))) END
           AS tr
  FROM bars)
SELECT CAST(di AS BIGINT) AS di, CAST(tr AS BIGINT) AS tr_micros,
       CAST(FLOOR(({_ATR_STENCIL_SQL}) + 0.5) AS BIGINT) AS atr_micros
FROM tr ORDER BY di
"""


@query("q_window_atr", oracle=_ATR_ORACLE)
def q_window_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average True Range over daily OHLC bars of the event-value
    series: TR = max(high−low, |high−prev close|, |low−prev close|)
    in exact micros (first bar degrades to high−low), smoothed by the
    exact dyadic EMA stencil — weights 2⁻¹..2⁻⁸ scale IEEE mantissas
    exactly and the summation order is pinned, the q_window_ewma
    twin-exactness recipe — so the volatility trajectory
    hash-matches bit-for-bit.  The Wilder 1/14 smoothing constant is
    deliberately replaced by the dyadic α = ½ ladder: same estimator
    family, cross-engine exact.

    Scale: one daily-bar census of the fact scan (rank/min/max per
    calendar day), then two windows over the calendar-bounded bar
    series."""
    ev = T(spark, sf_dir, "events").where(F.col("value").isNotNull())
    e = ev.select(
        F.expr(f"(ts div 1000) div {_ATR_US_PER_DAY}").alias("di"),
        F.expr("CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)").alias("v"),
        F.expr("ts div 1000").alias("us"),
        "event_id",
    )
    wo = Window.partitionBy("di").orderBy("us", "event_id")
    wc = Window.partitionBy("di").orderBy(F.desc("us"), F.desc("event_id"))
    r = e.select(
        "di",
        "v",
        F.row_number().over(wo).alias("rk_open"),
        F.row_number().over(wc).alias("rk_close"),
    )
    bars = r.groupBy("di").agg(
        F.max(F.when(F.col("rk_open") == 1, F.col("v"))).alias("open"),
        F.max("v").alias("high"),
        F.min("v").alias("low"),
        F.max(F.when(F.col("rk_close") == 1, F.col("v"))).alias("close"),
    )
    tr = bars.select(
        "di",
        F.expr(
            "CASE WHEN LAG(close) OVER (ORDER BY di) IS NULL THEN high - low"
            " ELSE GREATEST(high - low,"
            " ABS(high - LAG(close) OVER (ORDER BY di)),"
            " ABS(low - LAG(close) OVER (ORDER BY di))) END"
        ).alias("tr"),
    )
    stencil = " + ".join(
        f"CAST(COALESCE(LAG(tr, {j}) OVER (ORDER BY di), 0) AS DOUBLE)"
        f" * {0.5 ** (j + 1)!r}"
        for j in range(_ATR_DEPTH)
    )
    return tr.select(
        F.col("di").cast("long").alias("di"),
        F.col("tr").cast("long").alias("tr_micros"),
        F.expr(
            f"CAST(FLOOR(({stencil}) + 0.5) AS BIGINT)"
        ).alias("atr_micros"),
    ).orderBy("di")


# ------------------------------------------------------------------
# Page-Hinkley drift detector, fully integer
# ------------------------------------------------------------------

_PH_US_PER_DAY = 86_400_000_000
_PH_LAMBDA_MICROS = 10_000_000  # alarm at PH > 10 events·µ

_PH_ORACLE = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {_PH_US_PER_DAY} AS di,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1),
b AS (SELECT MIN(di) AS lo, MAX(di) AS hi FROM daily),
spine AS (SELECT UNNEST(generate_series(lo, hi)) AS di FROM b),
series AS (
  SELECT s.di, COALESCE(d.cnt, 0) AS x,
         ROW_NUMBER() OVER (ORDER BY s.di) AS i
  FROM spine s LEFT JOIN daily d ON s.di = d.di),
pref AS (
  SELECT di, x, i,
         SUM(x) OVER (ORDER BY di
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM series),
dev AS (
  SELECT di, x,
         CAST((1000000 * p) // i AS BIGINT) AS mean_micros,
         CAST(1000000 * x - (1000000 * p) // i AS BIGINT) AS d
  FROM pref),
m AS (
  SELECT di, x, mean_micros,
         SUM(d) OVER (ORDER BY di
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mt
  FROM dev)
SELECT CAST(di AS BIGINT) AS di, x, mean_micros,
       CAST(mt - MIN(mt) OVER (ORDER BY di
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS ph_micros,
       CAST(CASE WHEN mt - MIN(mt) OVER (ORDER BY di
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            > {_PH_LAMBDA_MICROS} THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM m ORDER BY di
"""


@query("q_stats_page_hinkley", oracle=_PH_ORACLE)
def q_stats_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley upward-drift detector over the gap-filled daily
    event-count series, made FULLY integer: the incremental mean is
    the floored-micros rational (1e6·prefix)/i, the deviation cumsum
    mₜ is an exact integer running window, and PHₜ = mₜ − min_{i≤t} mᵢ
    is the same prefix-minus-running-min closed form q_window_cusum
    uses — two stacked integer windows on one sort, no recursion.
    The alarm fires when PH exceeds the literal λ.  Unlike CUSUM's
    fixed reference value, PH self-references the series' own running
    mean — the detector of choice when the baseline is unknown.

    Scale: the series is CALENDAR-bounded; the fact table is touched
    once by the daily census.  1e6·prefix stays in int64 to ~9e12
    cumulative events."""
    ev = T(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr(f"(ts div 1000) div {_PH_US_PER_DAY}").alias("di")
        )
        .groupBy("di")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    spine = daily.agg(
        F.min("di").alias("lo"), F.max("di").alias("hi")
    ).select(F.explode(F.expr("sequence(lo, hi)")).alias("di"))
    series = (
        spine.join(daily, "di", "left")
        .select(
            "di",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("x"),
            F.row_number().over(Window.orderBy("di")).alias("i"),
        )
    )
    wrun = Window.orderBy("di").rowsBetween(Window.unboundedPreceding, 0)
    pref = series.select(
        "di", "x", "i", F.sum("x").over(wrun).alias("p")
    )
    dev = pref.select(
        "di",
        "x",
        F.expr("(1000000 * p) DIV i").alias("mean_micros"),
        F.expr("1000000 * x - (1000000 * p) DIV i").alias("d"),
    )
    m = dev.select(
        "di", "x", "mean_micros", F.sum("d").over(wrun).alias("mt")
    )
    ph = F.col("mt") - F.min("mt").over(wrun)
    return m.select(
        F.col("di").cast("long").alias("di"),
        "x",
        "mean_micros",
        ph.cast("long").alias("ph_micros"),
        F.when(ph > _PH_LAMBDA_MICROS, 1)
        .otherwise(0)
        .cast("long")
        .alias("alarm"),
    ).orderBy("di")
