"""Round-7 third pack: the two global-order primitives that need a
DISTRIBUTED decomposition at 100 TB — exact percentile without a full
sort (two-pass bucket refine) and a global running sum without a
single-partition window (two-phase prefix scan) — each hash-oracled
against an independent single-pass DuckDB formulation, so the driver
proves the distributed decomposition computes the same answer as the
naive global-order form.

- ``q_agg_percentile_twopass``: the fourth point on the quantile cost
  curve (beside the exact sort q_agg_percentile, the hash-sample
  estimate q_agg_percentile_sampled, and the t-digest sketch): pass A
  histograms values into fixed-width buckets (one map-side-combined
  aggregation, ~10³ groups whatever the corpus size) and locates the
  bucket containing the target rank; pass B sorts ONLY that bucket
  (~n/buckets rows) and indexes the residual offset.  This is how you
  get an EXACT global percentile at 100 TB: no global sort, no
  shuffling every value to one group — and the bucket filter pushes
  down to the second scan.

- ``q_interval_concurrency``: sweep-line interval-overlap counting
  (max concurrent 30-minute event windows per day) with the running
  sum computed as a TWO-PHASE prefix scan: range-partition boundary
  points by time, per-partition partial sums, a driver-scale offsets
  table (one row per partition) broadcast back, then within-partition
  windows — the decomposition q_sample_systematic's docstring points
  at for unpartitioned streams, implemented and value-hash-proven
  against DuckDB's global ``SUM() OVER (ORDER BY t)``.  Partition
  boundaries come from range sampling and are NOT deterministic; the
  prefix sums are invariant to them, which is exactly what the
  cross-engine hash attests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

#: pass-A histogram bucket width for q_agg_percentile_twopass, in
#: cents: 2^16 ≈ $655 per bucket → ~10³ buckets over the o_totalprice
#: range at any SF (bucket count scales with VALUE RANGE, not rows).
_PCTL_BUCKET = 65536

#: interval length for q_interval_concurrency: each event holds a
#: resource for 30 minutes (µs).
_CONC_LEN_US = 1_800_000_000


@query(
    "q_agg_percentile_twopass",
    oracle=f"""
    WITH t AS (
      SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    nk AS (SELECT COUNT(*) AS n, (9 * COUNT(*) + 9) // 10 AS k FROM t),
    r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM t)
    SELECT nk.n, nk.k, r.cents AS p90_cents
    FROM r, nk WHERE r.rn = nk.k
    """,
)
def q_agg_percentile_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global p90 (discrete, 1-based rank k = ceil(0.9·n)) of
    order totals WITHOUT a global sort: pass A buckets cents into
    fixed 2^16-wide histogram cells and walks the (metadata-scale)
    cumulative counts to the cell containing rank k; pass B sorts only
    that cell's rows and picks the residual offset.  The oracle is the
    independent naive form — a full row_number() sort — so the hash
    match proves the two-pass refinement is exact, rank arithmetic
    included.

    Scale: pass A is one map-side-combined agg to ~10³ groups; the
    1-row (bucket, offset) selection broadcasts into pass B, whose
    filter prunes the scan to ~n/10³ rows before the only sort.  The
    single-partition row_number over one cell is bounded by the cell
    population; for a pathological value distribution you recurse the
    same two passes inside the cell (same arithmetic, one more scan).
    Values are exact 2-decimal → integer cents throughout."""
    o = T(spark, sf_dir, "orders").select(
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents")
    )
    nk = o.agg(F.count(F.lit(1)).alias("n")).select(
        "n", F.expr("(9 * n + 9) DIV 10").alias("k")
    )
    buckets = (
        o.groupBy(F.expr(f"cents DIV {_PCTL_BUCKET}").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "cum",
            F.sum("cnt").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
    )
    sel = (
        buckets.crossJoin(F.broadcast(nk))
        .where("cum >= k AND cum - cnt < k")
        .select("bucket", F.expr("k - (cum - cnt)").alias("off"), "n", "k")
    )
    rn = F.row_number().over(Window.orderBy("cents"))
    return (
        o.withColumn("bucket", F.expr(f"cents DIV {_PCTL_BUCKET}"))
        .join(F.broadcast(sel), "bucket")
        .withColumn("rn", rn)
        .where(F.col("rn") == F.col("off"))
        .select("n", "k", F.col("cents").alias("p90_cents"))
    )


@query(
    "q_interval_concurrency",
    oracle=f"""
    WITH pts AS (
      SELECT epoch_us(ts) AS t, 1 AS d FROM events
      UNION ALL
      SELECT epoch_us(ts) + {_CONC_LEN_US}, -1 FROM events
    ),
    net AS (SELECT t, CAST(SUM(d) AS BIGINT) AS net FROM pts GROUP BY t),
    cum AS (
      SELECT t, CAST(SUM(net) OVER (ORDER BY t) AS BIGINT) AS conc FROM net
    )
    SELECT t // 86400000000 AS day,
           MAX(conc) AS max_concurrency,
           COUNT(*) AS n_points
    FROM cum GROUP BY day ORDER BY day
    """,
)
def q_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max concurrent 30-minute event intervals per day — sweep-line
    overlap counting: ±1 boundary points, net delta per distinct
    timestamp, then a GLOBAL running sum computed as a distributed
    two-phase prefix scan (range-partition by time → per-partition
    partial sums → broadcast the one-row-per-partition cumulative
    offsets back → within-partition windows).  Half-open intervals:
    an end and a start at the same instant net out before the
    concurrency is read.  The oracle computes the same running sum as
    DuckDB's single global ``SUM() OVER (ORDER BY t)``, so the hash
    match proves the partition decomposition is exact.

    The partition key is derived DETERMINISTICALLY from the data
    (equal-width range buckets between the broadcast 1-row min/max of
    t), not from ``spark_partition_id`` over a sampled
    ``repartitionByRange`` — the earlier form fed one nondeterministic
    exchange into two plan subtrees (offsets and cumulative sums) and
    was only correct while Spark happened to reuse the exchange; an
    AQE replan or plan divergence would have given the two subtrees
    different pid→offset mappings (ADVICE r7).  With the key computed
    from t itself, both subtrees agree by construction under any
    physical plan.

    Scale: this is the pattern that replaces the single-partition
    global window — every stage is bounded: one shuffle to group
    boundary points, one bucket exchange, a #buckets-row offsets
    table broadcast back, and per-bucket sorts.  Equal-width buckets
    assume roughly uniform event times (true here); a skewed corpus
    would persist sampled quantile boundaries first."""
    e = T(spark, sf_dir, "events").select(F.expr("ts div 1000").alias("us"))
    pts = e.select(F.col("us").alias("t"), F.lit(1).alias("d")).unionByName(
        e.select((F.col("us") + _CONC_LEN_US).alias("t"), F.lit(-1).alias("d"))
    )
    net = pts.groupBy("t").agg(F.sum("d").cast("long").alias("net"))
    rng = net.agg(F.min("t").alias("lo"), F.max("t").alias("hi"))
    parts = net.crossJoin(F.broadcast(rng)).withColumn(
        "pid", F.expr("CAST(((t - lo) * 16) DIV (hi - lo + 1) AS INT)")
    )
    offs = (
        parts.groupBy("pid")
        .agg(F.sum("net").alias("s"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("s").over(
                    Window.orderBy("pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("pid", "off")
    )
    within = (
        Window.partitionBy("pid")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        parts.select("pid", "t", "net")
        .join(F.broadcast(offs), "pid")
        .withColumn("conc", (F.sum("net").over(within) + F.col("off")).cast("long"))
    )
    return (
        cum.groupBy(F.expr("t DIV 86400000000").alias("day"))
        .agg(
            F.max("conc").alias("max_concurrency"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .orderBy("day")
    )


@query(
    "q_dedup_containment",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
      FROM documents
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS n_shared
      FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id <> b.doc_id
      GROUP BY ida, idb
    )
    SELECT ida AS contained_id, idb AS container_id,
           n_shared, sa.n AS n_contained
    FROM inter JOIN sz sa ON sa.doc_id = ida
    WHERE sa.n >= 25 AND n_shared * 10 >= sa.n * 9
    ORDER BY contained_id, container_id
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC containment dedup: pairs where >= 90% of doc A's
    distinct tokens appear in doc B (|A∩B| / |A| >= 0.9, A >= 25
    tokens) — the "A is mostly inside B" predicate a training pipeline
    uses to drop quoted/boilerplate-subset documents, which Jaccard
    misses when B is much larger (the union term washes the overlap
    out).  The threshold compares in integers (10·inter >= 9·|A|), so
    the emitted pair set is bit-deterministic.

    Scale shape (r13 rewrite — this function now IS the production
    form the earlier docstring only described): the raw token
    equi-join aggregates Σ f_w² rows to get every pair's exact
    intersection — 470M intermediate rows on this deliberately
    tiny-vocabulary corpus at sf0.1, measured 259 s.  The rewrite
    applies the CONTAINED-side prefix filter (exact by pigeonhole: if
    |A∩B| ≥ o := ⌈0.9·|A|⌉ — integers, (9n+9) div 10, no float
    epsilon — and none of A's |A|−o+1 rarest tokens were in B, the
    shared tokens would all fit in the remaining o−1 < o slots), so
    only A's rarest-token postings join against B's full postings;
    survivors get an EXACT |A∩B| via array_intersect on the per-doc
    token-hash arrays, materialized once per invocation with
    localCheckpoint (the q_dedup_allpairs discipline).  Tokens ride as
    xxhash64 int64s end to end — one string hash per (doc, token),
    then 8-byte keys through the join, the rank window, and the verify
    intersect (strings measured 3× slower in the verify) — the same
    hash-injectivity argument q_decontaminate documents: equivalent
    absent 64-bit collisions (~(2·|doc|)²/2⁶⁵ per pair), and the
    oracle hash gate itself polices the assumption.  The rarity order
    is (global frequency, token-hash) — any FIXED total order
    preserves the theorem, and the brute-force oracle attests the
    rewrite is value-exact (verified bit-identical at sf0.01 AND
    sf0.1: 4,220,160 rows, equal order-insensitive checksums).
    Measured 259 s → 43 s at sf0.1; candidates 12.9M vs the true
    4.2M output (the output itself is Θ(N²·density) on this corpus —
    no discovery scheme can beat its own result size).

    r14 bitmask fast path (VERDICT r13 item 5, guide §1.2): when the
    GLOBAL vocabulary fits one machine word (V ≤ 64 distinct tokens —
    exactly the saturated-corpus regime where prefix filtering
    degenerates, because every "rare" token's posting list is still
    Θ(N)), each doc's token set packs into a single int64 bitmask
    (bit k = presence of the k-th token in the deterministic
    token-hash order) and |A∩B| is ``bit_count(ma & mb)`` — two ALU
    ops per pair in whole-stage codegen, replacing the posting join +
    12.9M-row array_intersect verify entirely.  The mask path is
    EXACT, not approximate: the dictionary maps distinct tokens to
    distinct bits, so popcount of the AND is precisely the
    intersection size (same xxhash64-injectivity caveat as above).
    The V-gate is one scalar count over the checkpointed sets table —
    the same runtime-adaptivity class as AQE: it picks a PLAN, never
    values; both branches are oracle-attested on the corpora and by
    the planted two-regime test in tests/test_allpairs_properties.py.
    At V > 64 the r13 prefix-filter path runs unchanged — that is the
    regime where rare-token postings are actually selective."""
    d = T(spark, sf_dir, "documents")
    from ..operators.dedup import _parallelize

    base = _parallelize(d.select("doc_id", "text"))
    sets = base.select(
        "doc_id",
        F.size(F.array_distinct(F.split("text", " "))).cast("long").alias("n"),
        F.expr(
            "transform(array_distinct(split(text, ' ')), w -> xxhash64(w))"
        ).alias("_h"),
    ).localCheckpoint()
    vocab = sets.select(F.explode("_h").alias("w")).distinct()
    if vocab.count() <= 64:
        pos = vocab.select(
            "w", (F.row_number().over(Window.orderBy("w")) - 1).alias("pos")
        )
        masks = (
            sets.select("doc_id", "n", F.explode("_h").alias("w"))
            .join(F.broadcast(pos), "w")
            .groupBy("doc_id", "n")
            .agg(F.expr("bit_or(shiftleft(1L, pos))").alias("m"))
        )
        a = masks.where("n >= 25").select(
            F.col("doc_id").alias("ida"), "n", F.col("m").alias("ma")
        )
        b = masks.select(F.col("doc_id").alias("idb"), F.col("m").alias("mb"))
        return (
            a.join(F.broadcast(b), F.col("ida") != F.col("idb"))
            .withColumn("n_shared", F.expr("CAST(bit_count(ma & mb) AS BIGINT)"))
            .where("n_shared * 10 >= n * 9")
            .select(
                F.col("ida").alias("contained_id"),
                F.col("idb").alias("container_id"),
                "n_shared",
                F.col("n").alias("n_contained"),
            )
            .orderBy("contained_id", "container_id")
        )
    tok = sets.select(
        "doc_id", "n", F.explode_outer("_h").alias("w")
    ).filter(F.col("w").isNotNull())
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    wnd = Window.partitionBy("doc_id").orderBy("f", "w")
    ranked = tok.join(freq, "w").withColumn("pos", F.row_number().over(wnd) - 1)
    prefix = ranked.filter(
        (F.col("n") >= 25)
        & (F.col("pos") < F.col("n") - F.expr("CAST((9*n + 9) DIV 10 AS INT)") + 1)
    ).select(F.col("doc_id").alias("ida"), "w")
    ball = tok.select(F.col("doc_id").alias("idb"), "w")
    cand = (
        prefix.join(ball, "w")
        .where(F.col("ida") != F.col("idb"))
        .select("ida", "idb")
        .distinct()
    )
    sa = sets.select(F.col("doc_id").alias("ida"), F.col("_h").alias("_ha"), "n")
    sb = sets.select(F.col("doc_id").alias("idb"), F.col("_h").alias("_hb"))
    return (
        cand.join(sa, "ida")
        .join(sb, "idb")
        .withColumn("n_shared", F.size(F.array_intersect("_ha", "_hb")).cast("long"))
        .where("n >= 25 AND n_shared * 10 >= n * 9")
        .select(
            F.col("ida").alias("contained_id"),
            F.col("idb").alias("container_id"),
            "n_shared",
            F.col("n").alias("n_contained"),
        )
        .orderBy("contained_id", "container_id")
    )


@query(
    "q_agg_deciles_twopass",
    oracle="""
    WITH t AS (
      SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    nk AS (SELECT COUNT(*) AS n FROM t),
    ks AS (SELECT i AS decile, (i * nk.n + 9) // 10 AS k
           FROM generate_series(1, 9) g(i), nk),
    r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM t)
    SELECT ks.decile, ks.k, r.cents AS value_cents
    FROM ks JOIN r ON r.rn = ks.k
    ORDER BY ks.decile
    """,
)
def q_agg_deciles_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL NINE deciles (discrete, rank k_i = ceil(i·n/10)) in the SAME
    two passes as q_agg_percentile_twopass — the production argument
    for histogram-refine: the pass-A histogram is computed once and
    amortizes over every requested quantile, the 9 (bucket, offset)
    selections broadcast together, and pass B's row_number partitions
    BY (BUCKET, DECILE): the broadcast join with `sel` duplicates a
    bucket's rows once per decile that landed in it, so ranking must
    run per (bucket, decile) copy — partitioning by bucket alone ranks
    over the duplicated set and returns wrong rows whenever two deciles
    share a 65536-cent bucket (pinned by
    tests/test_analytics_r8.py::test_deciles_twopass_colliding_bucket).
    Unlike the single-percentile form there is no global-ordering
    window anywhere — every stage is partitioned.
    Oracle = the naive full sort indexed at all nine ranks.

    Scale: pass A one map-side-combined agg (~10³ groups); pass B
    scans only rows in at most 9 buckets (~9n/10³), sorted per bucket
    in parallel.  Adding quantiles is free until the bucket set
    grows."""
    o = T(spark, sf_dir, "orders").select(
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents")
    )
    ks = (
        o.agg(F.count(F.lit(1)).alias("n"))
        .select(
            "n",
            F.explode(F.expr("sequence(1L, 9L)")).alias("decile"),
        )
        .select("decile", F.expr("(decile * n + 9) DIV 10").alias("k"))
    )
    buckets = (
        o.groupBy(F.expr(f"cents DIV {_PCTL_BUCKET}").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "cum",
            F.sum("cnt").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
    )
    sel = (
        buckets.crossJoin(F.broadcast(ks))
        .where("cum >= k AND cum - cnt < k")
        .select("decile", "k", "bucket", F.expr("k - (cum - cnt)").alias("off"))
    )
    rn = F.row_number().over(
        Window.partitionBy("bucket", "decile").orderBy("cents")
    )
    return (
        o.withColumn("bucket", F.expr(f"cents DIV {_PCTL_BUCKET}"))
        .join(F.broadcast(sel), "bucket")
        .withColumn("rn", rn)
        .where(F.col("rn") == F.col("off"))
        .select("decile", "k", F.col("cents").alias("value_cents"))
        .orderBy("decile")
    )
