"""Round-8 second pack: sessionization, skew diagnostics, mergeable
Bloom/KMV sketch twins, feature hashing, autocorrelation.

Design rules (the repo's established disciplines, applied throughout):
integer/cents arithmetic with FLOOR(x·100 + 0.5); floor-log2 by
indicator sums; the ``_XE`` affine+xor-shift cross-engine hash for
sketch twins (queries/sketches.py provenance); md5-prefix→int for
portable STRING hashing (the q_dedup_incremental precedent — DuckDB
computes the same digest, unlike xxhash64); exact-decimal sums cast
through VARCHAR for float-producing statistics (q_stats_corr_matrix
discipline).  Every query carries a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

# ------------------------------------------------------------------
# Batch sessionization (gaps-and-islands, 30-minute inactivity gap)
# ------------------------------------------------------------------

_SESSION_GAP_US = 1_800_000_000

_SESSIONIZE_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
marked AS (
  SELECT *,
         CASE WHEN us - lag(us) OVER w > {_SESSION_GAP_US}
                OR lag(us) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
runs AS (
  SELECT *,
         CAST(SUM(new_session) OVER (PARTITION BY user_id
              ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_seq
  FROM marked)
SELECT user_id, session_seq,
       MIN(us) AS session_start_us,
       MAX(us) - MIN(us) AS duration_us,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases
FROM runs
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


@query("q_events_sessionize", oracle=_SESSIONIZE_ORACLE)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH sessionization by inactivity gap (30 min) — the
    gaps-and-islands form every clickstream warehouse runs nightly
    (q_stream_session is the live session_window twin; this is the
    replayable batch formulation with per-session stats): mark a new
    session when the gap to the previous event exceeds the threshold,
    number sessions with a running sum, aggregate start/duration/
    depth/purchases per session.  Deterministic total order
    (us, event_id); all values integer µs.

    Scale: two windows and one aggregation on the SAME (user, time)
    shuffle — one exchange total, bounded per-user partitions,
    co-partitioned with the rest of the per-user pipeline."""
    e = T(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts div 1000").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    new_session = F.when(
        F.lag("us").over(w).isNull()
        | (F.col("us") - F.lag("us").over(w) > _SESSION_GAP_US),
        1,
    ).otherwise(0)
    runs = e.withColumn("new_session", new_session).withColumn(
        "session_seq",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    return (
        runs.groupBy("user_id", "session_seq")
        .agg(
            F.min("us").alias("session_start_us"),
            (F.max("us") - F.min("us")).alias("duration_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_purchases"),
        )
        .orderBy("user_id", "session_seq")
    )


# ------------------------------------------------------------------
# Join-key skew report (the decision input for salting / AQE tuning)
# ------------------------------------------------------------------

_SKEW_ORACLE = """
WITH freq AS (
  SELECT o_custkey, COUNT(*) AS f FROM orders GROUP BY o_custkey),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(f) AS BIGINT) AS n_rows,
         CAST(MAX(f) AS BIGINT) AS max_freq
  FROM freq),
byf AS (
  SELECT f, COUNT(*) AS keys_at_f FROM freq GROUP BY f),
cum AS (
  SELECT f,
         CAST(SUM(keys_at_f) OVER (ORDER BY f
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_keys
  FROM byf)
SELECT tot.n_keys, tot.n_rows, tot.max_freq,
       CAST(MIN(cum.f) AS BIGINT) AS p99_freq,
       CAST(tot.max_freq * 1000000 // tot.n_rows AS BIGINT)
         AS top1_share_ppm
FROM cum, tot
WHERE cum.cum_keys * 100 >= tot.n_keys * 99
GROUP BY tot.n_keys, tot.n_rows, tot.max_freq
"""


@query("q_stats_skew_report", oracle=_SKEW_ORACLE)
def q_stats_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics over orders.o_custkey — the report a
    pipeline reads BEFORE choosing broadcast / salting / AQE skew
    hints (q_join_skew_salted is the remedy; this is the detector):
    key count, row count, the hottest key's frequency and row share
    (ppm, integer), and the exact p99 key frequency.

    The p99 is computed over the FREQUENCY-OF-FREQUENCY table (group
    keys by their count, cumulate over distinct counts), so the
    quantile window runs over the distinct-frequency domain —
    typically tiny (hundreds of values however many keys exist), the
    same domain-bounded argument as q_agg_percentile_twopass's
    histogram.  Everything integer; one exchange for the key count,
    one tiny one for the census."""
    freq = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    tot = freq.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("f").cast("long").alias("n_rows"),
        F.max("f").cast("long").alias("max_freq"),
    )
    byf = freq.groupBy("f").agg(F.count(F.lit(1)).alias("keys_at_f"))
    cum = byf.withColumn(
        "cum_keys",
        F.sum("keys_at_f")
        .over(Window.orderBy("f").rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("cum_keys") * 100 >= F.col("n_keys") * 99)
        .groupBy("n_keys", "n_rows", "max_freq")
        .agg(
            F.min("f").cast("long").alias("p99_freq"),
            F.expr("CAST(max(max_freq) * 1000000 DIV max(n_rows) AS BIGINT)")
            .alias("top1_share_ppm"),
        )
        .select("n_keys", "n_rows", "max_freq", "p99_freq", "top1_share_ppm")
    )


# ------------------------------------------------------------------
# Bloom filter — mergeable membership sketch, fully hash-proven
# ------------------------------------------------------------------

#: cross-engine hash (queries/sketches.py provenance: two affine
#: rounds mod the Mersenne prime interleaved with xor-shift folds)
_XE_P = 2147483647
_B_A1, _B_B1 = 1104335282, 747730126
_B_A2, _B_B2 = 1342251277, 578033794
#: filter geometry: 4096 bits as 62-bit words (62, not 64, so
#: 1 << bit never touches the int64 sign bit on either engine);
#: k = 3 probes by Kirsch-Mitzenmacher double hashing.
_BLOOM_BITS = 4096
_BLOOM_WORD = 62
_BLOOM_K = 3


def _xe_sql(expr: str) -> str:
    return (
        f"xor((({_B_A2} * xor((({_B_A1} * ({expr}) + {_B_B1}) % {_XE_P}),"
        f" (({_B_A1} * ({expr}) + {_B_B1}) % {_XE_P}) >> 15) + {_B_B2})"
        f" % {_XE_P}),"
        f" (({_B_A2} * xor((({_B_A1} * ({expr}) + {_B_B1}) % {_XE_P}),"
        f" (({_B_A1} * ({expr}) + {_B_B1}) % {_XE_P}) >> 15) + {_B_B2})"
        f" % {_XE_P}) >> 13)"
    )


def _xe_spark(col):
    h1 = F.pmod(F.lit(_B_A1) * col + F.lit(_B_B1), F.lit(_XE_P))
    h2 = h1.bitwiseXOR(F.shiftright(h1, 15))
    h3 = F.pmod(F.lit(_B_A2) * h2 + F.lit(_B_B2), F.lit(_XE_P))
    return h3.bitwiseXOR(F.shiftright(h3, 13))


_BLOOM_ORACLE = f"""
WITH members AS (SELECT DISTINCT o_custkey AS k FROM orders),
hk AS (
  SELECT k, {_xe_sql('k')} AS hv, {_xe_sql('k + 1000000007')} AS hv2
  FROM members),
pos AS (
  SELECT k, ((hv + i * hv2) % {_BLOOM_BITS}) AS p
  FROM hk, range({_BLOOM_K}) t(i)),
words AS (
  SELECT p // {_BLOOM_WORD} AS word,
         CAST(bit_or(1::BIGINT << (p % {_BLOOM_WORD})) AS BIGINT) AS bits
  FROM pos GROUP BY 1),
cand AS (
  SELECT c_custkey AS k FROM customer
  UNION ALL
  SELECT c_custkey + 50000000 FROM customer),
probes AS (
  SELECT cand.k,
         CASE WHEN m.k IS NULL THEN 0 ELSE 1 END AS is_member
  FROM cand LEFT JOIN members m ON m.k = cand.k),
ph AS (
  SELECT k, is_member, {_xe_sql('k')} AS hv,
         {_xe_sql('k + 1000000007')} AS hv2
  FROM probes),
ppos AS (
  SELECT k, is_member, ((hv + i * hv2) % {_BLOOM_BITS}) AS p
  FROM ph, range({_BLOOM_K}) t(i)),
tested AS (
  SELECT ppos.k, ppos.is_member,
         CAST(SUM(CASE WHEN (COALESCE(w.bits, 0)
                             & (1::BIGINT << (ppos.p % {_BLOOM_WORD})))
                       <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM ppos LEFT JOIN words w ON w.word = ppos.p // {_BLOOM_WORD}
  GROUP BY ppos.k, ppos.is_member)
SELECT CAST(SUM(is_member) AS BIGINT) AS n_members,
       CAST(SUM(1 - is_member) AS BIGINT) AS n_nonmembers,
       CAST(SUM(CASE WHEN is_member = 1 AND hits < {_BLOOM_K}
                THEN 1 ELSE 0 END) AS BIGINT) AS false_negatives,
       CAST(SUM(CASE WHEN is_member = 0 AND hits = {_BLOOM_K}
                THEN 1 ELSE 0 END) AS BIGINT) AS false_positives
FROM tested
"""


@query("q_sketch_bloom_xengine", oracle=_BLOOM_ORACLE)
def q_sketch_bloom_xengine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully-oracled BLOOM FILTER twin — the membership sketch behind
    q_join_bloom_pruned's runtime pruning, here built from first
    principles so the algebra is hash-proven: members = custkeys with
    orders; the probe set is every customer key plus a shifted
    guaranteed-non-member cohort (so the false-positive measurement
    is never vacuous); 3 bit positions per key by Kirsch-Mitzenmacher
    double hashing over the cross-engine hash; the filter is 4096 bits
    packed into 62-bit words by a bit_or aggregation (62 so the shift
    never reaches the sign bit on either engine).  Every customer key
    then probes the filter: members MUST all hit (false_negatives is
    the in-query zero-FN theorem, hash-attested), and the measured
    false-positive count on true non-members is the sketch's only
    approximation — deterministic, so it hash-matches too (and lands
    on theory: at sf0.01 the filter holds n=1500 keys * k=3 bits in
    m=4096 -> (1-e^(-kn/m))^k ~ 0.30 predicted, 469/1500 = 0.31
    measured; production sizes m ~ 10n*k for ~1% FPR — the geometry
    is a constant, the algebra is what the hash proves).

    Scale: the filter state is {_BLOOM_BITS // _BLOOM_WORD + 1} words
    TOTAL, built by one map-side-combining bit_or agg (mergeable by
    OR across shards/days — the re-aggregation primitive) and
    broadcast to the probe side; probe cost is a map-only bit test."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    members = o.select(F.col("o_custkey").alias("k")).distinct()
    i_arr = F.array(*[F.lit(i) for i in range(_BLOOM_K)])

    def positions(df):
        return df.select(
            "*",
            _xe_spark(F.col("k")).alias("hv"),
            _xe_spark(F.col("k") + F.lit(1000000007)).alias("hv2"),
        ).select(
            "*",
            F.explode(i_arr).alias("i"),
        ).withColumn("p", F.pmod(F.col("hv") + F.col("i") * F.col("hv2"), F.lit(_BLOOM_BITS)))

    words = (
        positions(members)
        .groupBy(F.expr(f"p DIV {_BLOOM_WORD}").alias("word"))
        .agg(
            F.expr(
                f"CAST(bit_or(shiftleft(1L, CAST(p % {_BLOOM_WORD} AS INT)))"
                f" AS BIGINT)"
            ).alias("bits")
        )
    )
    cand = c.select(F.col("c_custkey").alias("k")).unionAll(
        c.select((F.col("c_custkey") + F.lit(50000000)).alias("k"))
    )
    probes = cand.join(
        members.withColumn("is_member", F.lit(1)), "k", "left"
    ).fillna({"is_member": 0})
    tested = (
        positions(probes)
        .withColumn("word", F.expr(f"p DIV {_BLOOM_WORD}"))
        # LEFT join: a probe whose word has no set bits anywhere must
        # still contribute a (miss) row, or n_nonmembers / the FPR
        # denominator silently undercount (ADVICE r8)
        .join(F.broadcast(words), "word", "left")
        .withColumn(
            "hit",
            F.expr(
                f"CAST((coalesce(bits, 0L) & "
                f"shiftleft(1L, CAST(p % {_BLOOM_WORD} AS INT)))"
                f" <> 0 AS INT)"
            ),
        )
        .groupBy("k", "is_member")
        .agg(F.sum("hit").cast("long").alias("hits"))
    )
    return tested.agg(
        F.sum("is_member").cast("long").alias("n_members"),
        F.sum(1 - F.col("is_member")).cast("long").alias("n_nonmembers"),
        F.sum(
            F.when((F.col("is_member") == 1) & (F.col("hits") < _BLOOM_K), 1).otherwise(0)
        )
        .cast("long")
        .alias("false_negatives"),
        F.sum(
            F.when((F.col("is_member") == 0) & (F.col("hits") == _BLOOM_K), 1).otherwise(0)
        )
        .cast("long")
        .alias("false_positives"),
    )


# ------------------------------------------------------------------
# KMV (k minimum values) distinct sketch — fully hash-proven
# ------------------------------------------------------------------

_KMV_K = 64

_KMV_ORACLE = f"""
WITH keys AS (SELECT DISTINCT o_custkey AS k FROM orders),
h AS (SELECT k, {_xe_sql('k')} AS hv FROM keys),
dh AS (SELECT DISTINCT hv FROM h),
kth AS (
  SELECT CAST(hv AS BIGINT) AS kth_min FROM dh
  ORDER BY hv LIMIT 1 OFFSET {_KMV_K - 1}),
halves AS (
  SELECT hv, hv % 2 AS half FROM dh),
ka AS (SELECT hv FROM halves WHERE half = 0 ORDER BY hv LIMIT {_KMV_K}),
kb AS (SELECT hv FROM halves WHERE half = 1 ORDER BY hv LIMIT {_KMV_K}),
merged AS (
  SELECT CAST(hv AS BIGINT) AS kth_merged FROM
  (SELECT hv FROM ka UNION ALL SELECT hv FROM kb) u
  ORDER BY hv LIMIT 1 OFFSET {_KMV_K - 1})
SELECT (SELECT COUNT(*) FROM keys) AS n_exact,
       kth.kth_min,
       ROUND(({_KMV_K} - 1) * {_XE_P}.0 / kth.kth_min, 4) AS est,
       ROUND(({_KMV_K} - 1) * {_XE_P}.0 / merged.kth_merged, 4) AS est_merged
FROM kth, merged
"""


@query("q_sketch_kmv_xengine", oracle=_KMV_ORACLE)
def q_sketch_kmv_xengine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully-oracled KMV (k-minimum-values / bottom-k) distinct-count
    sketch — the third mergeable cardinality structure beside the HLL
    twin and the exact bitmap: keep the {_KMV_K} smallest distinct
    hash values; est = (k−1)·P / kth_min (Bar-Yossef et al. 2002).
    The merge theorem is demonstrated in-query: bottom-k of each
    hash-parity half, unioned, re-bottom-k'd, must reproduce the
    global bottom-k (set identity) — est_merged hash-matches est's
    inputs.  The estimate's division is one int→double op on
    hash-attested integers, so all four columns match bit-for-bit.

    Scale: sketch state is k values TOTAL; the bottom-k is
    TakeOrderedAndProject (per-partition heaps, no global sort);
    merge = union + re-heap, the re-aggregation primitive."""
    o = T(spark, sf_dir, "orders")
    keys = o.select(F.col("o_custkey").alias("k")).distinct()
    dh = keys.select(_xe_spark(F.col("k")).alias("hv")).distinct()
    # Degenerate-input guard (ADVICE r8): with fewer than k distinct
    # hashes the DuckDB oracle's OFFSET k-1 yields ZERO rows; a bare
    # limit(k).agg(max) here would still emit one (wrong) row.  Keep
    # the kth row only when the bottom-k is actually full, so both
    # engines agree on tiny corpora (n >= k is the sketch's stated
    # precondition; below it the report is empty by construction).
    kth = (
        dh.orderBy("hv")
        .limit(_KMV_K)
        .agg(
            F.max("hv").cast("long").alias("kth_min"),
            F.count(F.lit(1)).alias("_n"),
        )
        .where(F.col("_n") == _KMV_K)
        .select("kth_min")
    )
    ka = dh.where(F.pmod(F.col("hv"), F.lit(2)) == 0).orderBy("hv").limit(_KMV_K)
    kb = dh.where(F.pmod(F.col("hv"), F.lit(2)) == 1).orderBy("hv").limit(_KMV_K)
    merged = (
        ka.unionAll(kb)
        .orderBy("hv")
        .limit(_KMV_K)
        .agg(
            F.max("hv").cast("long").alias("kth_merged"),
            F.count(F.lit(1)).alias("_n"),
        )
        .where(F.col("_n") == _KMV_K)
        .select("kth_merged")
    )
    n_exact = keys.agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        n_exact.crossJoin(kth)
        .crossJoin(merged)
        .select(
            "n_exact",
            "kth_min",
            F.round(
                F.lit(float(_KMV_K - 1)) * F.lit(float(_XE_P)) / F.col("kth_min"), 4
            ).alias("est"),
            F.round(
                F.lit(float(_KMV_K - 1)) * F.lit(float(_XE_P)) / F.col("kth_merged"),
                4,
            ).alias("est_merged"),
        )
    )


# ------------------------------------------------------------------
# Feature hashing (HashingTF with a portable hash)
# ------------------------------------------------------------------

_FH_DIM = 1024

_FH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents),
hashed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) % {_FH_DIM}
           AS bucket
  FROM tok),
cells AS (
  SELECT doc_id, bucket, COUNT(*) AS tf FROM hashed GROUP BY doc_id, bucket)
SELECT bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       CAST(MAX(tf) AS BIGINT) AS max_tf
FROM cells GROUP BY bucket ORDER BY bucket
"""


@query("q_text_feature_hashing", oracle=_FH_ORACLE)
def q_text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the HashingTF trick): project an unbounded
    vocabulary onto {_FH_DIM} fixed buckets by hashing tokens — the
    step that makes bag-of-words features JOINABLE and fixed-width at
    any corpus size (no vocabulary dictionary to build, ship, or keep
    consistent).  The hash is the md5-prefix→int portable form (the
    q_dedup_incremental precedent — Spark ``conv(substring(md5))``
    and DuckDB ``('0x' || substr(md5))::BIGINT`` compute the SAME
    integer), so the entire bucket census is hash-attested, collisions
    and all — exactly what Spark ML's HashingTF cannot offer an
    oracle for (murmur3 has no DuckDB twin).

    Scale: tokenize is a generator projection; the (doc, bucket)
    aggregation map-side combines; the final census is {_FH_DIM}
    bounded groups."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    hashed = tok.select(
        "doc_id",
        F.pmod(
            F.expr("CAST(conv(substring(md5(word), 1, 15), 16, 10) AS BIGINT)"),
            F.lit(_FH_DIM),
        ).alias("bucket"),
    )
    cells = hashed.groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("tf"))
    return (
        cells.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.max("tf").cast("long").alias("max_tf"),
        )
        .orderBy("bucket")
    )


# ------------------------------------------------------------------
# Lag-1 autocorrelation of the daily revenue series
# ------------------------------------------------------------------

_AUTOCORR_ORACLE = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS r
  FROM orders GROUP BY 1),
pairs AS (
  SELECT r AS y,
         lag(r) OVER (ORDER BY d) AS x
  FROM daily),
p AS (SELECT x, y FROM pairs WHERE x IS NOT NULL),
s AS (
  SELECT COUNT(*) AS n,
         CAST(CAST(SUM(CAST(x AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(y AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
              AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
              AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
              AS VARCHAR) AS DOUBLE) AS sxy
  FROM p)
SELECT n,
       (n * sxy - sx * sy)
         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS autocorr_lag1
FROM s
"""


@query("q_timeseries_autocorr", oracle=_AUTOCORR_ORACLE)
def q_timeseries_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily-revenue series — the
    stationarity probe a forecasting pipeline runs before model
    choice.  Daily revenue is an exact integer-cent sum; the lagged
    pairs go through EXACT DECIMAL sums cast via VARCHAR to double
    (the q_stats_corr_matrix parity discipline: the decimal sums are
    exact integers, the string round-trip pins the double conversion,
    and the final Pearson expression is a handful of correctly-rounded
    IEEE ops on identical inputs), so the float statistic
    hash-matches cross-engine.

    Scale: the day census is one map-side-combined agg (bounded by
    the calendar domain — thousands of rows at any corpus size); the
    lag window and the moment sums run over that bounded series."""
    o = T(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .cast("long")
            .alias("r")
        )
    )
    pairs = daily.select(
        F.col("r").alias("y"), F.lag("r").over(Window.orderBy("d")).alias("x")
    ).where(F.col("x").isNotNull())
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    d2d = lambda col, name: col.cast("string").cast("double").alias(name)  # noqa: E731
    s = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        d2d(F.sum(dec("x")), "sx"),
        d2d(F.sum(dec("y")), "sy"),
        d2d(F.sum(dec("x") * dec("x")), "sxx"),
        d2d(F.sum(dec("y") * dec("y")), "syy"),
        d2d(F.sum(dec("x") * dec("y")), "sxy"),
    )
    return s.select(
        "n",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("autocorr_lag1"),
    )
