"""Standalone VANILLA-PySpark baseline re-measurement (BASELINE.md).

Independent of the engine package: each query is the obvious vanilla
DataFrame formulation.  Protocol = bench.py's: 1 warm-up + N timed
runs, median; materialization = collect() for <=10k rows else count().
"""

import json
import statistics
import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
N_RUNS = 7

spark = (
    SparkSession.builder.master("local[32]")
    .appName("baseline")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

T = lambda name: spark.read.parquet(f"{SF}/{name}.parquet")


def q_agg_pricing():
    li = T("lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc).alias("sum_disc_price"),
            F.sum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_join_inner():
    o, c = T("orders"), T("customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


def q_join_threeway():
    li, o, c, n = T("lineitem"), T("orders"), T("customer"), T("nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def q_filter_regex():
    li = T("lineitem")
    return li.filter(F.col("l_returnflag").rlike("R")).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"
    )


def q_topk_revenue():
    li, o, c = T("lineitem"), T("orders"), T("customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


def q_agg_distinct_users():
    return T("events").agg(F.countDistinct("user_id").alias("n_users"))


def q_window_rank():
    o = T("orders")
    w_total = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    w_ties = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w_total).alias("rn"),
            F.rank().over(w_ties).alias("rnk"),
            F.dense_rank().over(w_ties).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


def q_maplejuice_wordcount():
    d = T("documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_stream_tumbling():
    e = T("events")
    # ts shipped as bigint ns in the original testdata, timestamp[us]
    # after the round-3 regeneration — the vanilla formulation handles
    # whichever schema is on disk
    if dict(e.dtypes).get("ts") == "bigint":
        ts = (F.col("ts") / 1e9).cast("timestamp")
    else:
        ts = F.col("ts").cast("timestamp")
    return (
        e.groupBy(F.window(ts, "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )


def q_dedup_exact():
    d = T("documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "n_chars")
    )


def q_sim_topk():
    e = T("embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    lit = F.array(*[F.lit(float(x)) for x in qv])
    dot = F.aggregate(
        F.zip_with(F.col("embedding").cast("array<double>"), lit, lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nrm = F.sqrt(F.aggregate(
        F.zip_with(F.col("embedding").cast("array<double>"),
                   F.col("embedding").cast("array<double>"), lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    qn = sum(float(x) * float(x) for x in qv) ** 0.5
    return (
        e.select("vec_id", F.round(dot / (nrm * qn), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


def q_text_tokens():
    d = T("documents")
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


def q_dedup_near():
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = T("documents")
    toks = d.select(
        F.col("doc_id").alias("_id"),
        F.expr(
            "transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)),"
            " i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
        ).alias("_sh"),
    )
    tf = HashingTF(inputCol="_sh", outputCol="_f", numFeatures=1 << 18, binary=True)
    feat = tf.transform(toks)
    mh = MinHashLSH(inputCol="_f", outputCol="_h", numHashTables=8, seed=42)
    model = mh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, 0.5, distCol="jaccard_dist")
    return pairs.filter(F.col("datasetA._id") < F.col("datasetB._id")).select(
        F.col("datasetA._id").alias("id_a"),
        F.col("datasetB._id").alias("id_b"),
        "jaccard_dist",
    )


def q_window_running():
    o = T("orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum("o_totalprice").over(w).alias("running_total"),
    )


def q_tpch_q18():
    li, o, c = T("lineitem"), T("orders"), T("customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_orderdate").cast("timestamp").cast("long").alias("orderdate_s"),
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q_decontaminate():
    d = T("documents")
    sh = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(split(text, ' ')) - 3, 1)),"
                " i -> concat_ws(' ', slice(split(text, ' '), i, 4)))"
            )
        ).alias("s"),
    )
    bench = sh.filter(F.col("doc_id") % 25 == 0).select("s").distinct()
    train = sh.filter(F.col("doc_id") % 25 != 0)
    return (
        train.join(bench, "s")
        .groupBy("doc_id")
        .agg(F.count_distinct("s").alias("n_shared"))
    )


def q_tpch_q9():
    # vanilla formulation: no broadcast hints, plain double arithmetic
    p = T("part").filter(F.col("p_name").like("%ge%"))
    li, s, o, n = T("lineitem"), T("supplier"), T("orders"), T("nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.8 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q_dedup_allpairs():
    # vanilla EXACT formulation: the obvious token-key self-join (no
    # prefix/length/positional filters) + exact Jaccard verify
    d = T("documents")
    sh = d.select("doc_id", F.expr(
        "array_distinct(transform(sequence(1, greatest(size(split(text,' '))-2,1)),"
        " i -> concat_ws(' ', slice(split(text,' '), i, 3))))").alias("s"))
    tok = sh.select("doc_id", F.explode("s").alias("t"))
    cand = (tok.alias("a").join(tok.alias("b"), "t")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b")).distinct())
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("_sa"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("_sb"))
    return (cand.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.size(F.array_intersect("_sa", "_sb")).cast("long")
                        / F.size(F.array_union("_sa", "_sb")).cast("long"))
            .filter(F.col("jaccard") >= 0.8)
            .select("id_a", "id_b", "jaccard"))


def _ev_us():
    """events with a µs epoch column under either on-disk ts schema."""
    e = T("events")
    if dict(e.dtypes).get("ts") == "bigint":
        return e.withColumn("ts_us", F.expr("ts div 1000"))
    return e.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))


def q_window_locf():
    # vanilla LOCF: last_value ignoreNulls over a running frame —
    # added r5 to track the sort-within-shuffle window shape
    e = _ev_us().select(
        "event_id", "user_id", "ts_us",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "value_sparse"),
    )
    w = (Window.partitionBy("user_id").orderBy("ts_us", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return e.withColumn(
        "value_filled", F.last("value_sparse", ignorenulls=True).over(w)
    ).orderBy("user_id", "ts_us", "event_id")


def q_events_funnel():
    # vanilla ordered funnel: three user-keyed min-aggs chained by
    # joins — added r5 to track the multi-stage co-partitioned shape
    e = _ev_us().select("user_id", "ts_us", "event_type")
    tv = (e.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts_us").alias("t_v")))
    tc = (e.join(tv, "user_id")
          .filter((F.col("event_type") == "click") & (F.col("ts_us") >= F.col("t_v")))
          .groupBy("user_id").agg(F.min("ts_us").alias("t_c")))
    tp = (e.join(tc, "user_id")
          .filter((F.col("event_type") == "purchase") & (F.col("ts_us") >= F.col("t_c")))
          .groupBy("user_id").agg(F.min("ts_us").alias("t_p")))
    return (tv.agg(F.count(F.lit(1)).alias("n_viewed"))
            .crossJoin(tc.agg(F.count(F.lit(1)).alias("n_clicked")))
            .crossJoin(tp.agg(F.count(F.lit(1)).alias("n_purchased"))))


def q_secondary_sort():
    # vanilla secondary sort: the canonical window-ordered
    # collect_list formulation (ordered window + per-row list, then a
    # dedup aggregate) — added r7; two shuffles + a per-partition sort
    # where the engine form needs one hash shuffle
    li = T("lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_shipdate", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    lst = li.withColumn("lst", F.collect_list("l_linenumber").over(w))
    return (
        lst.groupBy("l_orderkey")
        .agg(F.first("lst").alias("lst"))
        .select(
            "l_orderkey",
            F.size("lst").cast("long").alias("n_lines"),
            F.array_join(
                F.expr("transform(lst, x -> cast(x as string))"), ","
            ).alias("line_seq"),
        )
        .orderBy("l_orderkey")
    )


def q_text_classifier():
    # vanilla hashed-bigram classifier: the obvious PySpark form of
    # custom per-doc scoring is a (pandas) UDF doing the arithmetic in
    # Python — added r7; the engine form keeps it in JVM expressions
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    import hashlib

    @pandas_udf(LongType())
    def score(texts: pd.Series) -> pd.Series:
        hexd = "0123456789abcdef"
        out = []
        for tx in texts:
            toks = tx.split(" ")
            s = 0
            for x, y in zip(toks, toks[1:]):
                h = hashlib.md5((x + " " + y).encode()).hexdigest()
                k = hexd.index(h[0]) * 16 + hexd.index(h[1])
                s += (k * 49979687 + 104729) % 2147483647 % 2001 - 1000
            out.append(s)
        return pd.Series(out, dtype="int64")

    d = T("documents")
    return (
        d.select("doc_id", score("text").alias("score_raw"))
        .withColumn("keep", F.col("score_raw") > 0)
        .orderBy("doc_id")
    )


QUERIES = [
    q_agg_pricing, q_join_inner, q_join_threeway, q_filter_regex,
    q_topk_revenue, q_agg_distinct_users, q_window_rank,
    q_maplejuice_wordcount, q_stream_tumbling, q_dedup_exact,
    q_sim_topk, q_text_tokens, q_dedup_near, q_window_running,
    q_tpch_q18, q_decontaminate, q_tpch_q9, q_dedup_allpairs,
    q_window_locf, q_events_funnel, q_secondary_sort,
    q_text_classifier,
]

results = {}
# global JIT warm-up pass (same protocol as bench.py): without it the
# first-listed queries absorb the fresh JVM's JIT cost
for fn in QUERIES:
    fn().count()
def materialize(df, collect):
    # protocol 2 (same as bench.py): checksum agg forces full
    # evaluation of every output column; count() alone lets Catalyst
    # prune result-only windows/projections
    if collect:
        df.collect()
    else:
        df.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()


for fn in QUERIES:
    n = fn().count()  # warm-up + cardinality
    collect = n <= 10_000
    times = []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        materialize(fn(), collect)
        times.append(time.perf_counter() - t0)
    results[fn.__name__] = {
        "median_ms": round(statistics.median(times) * 1000, 1),
        "min_ms": round(min(times) * 1000, 1),
        "max_ms": round(max(times) * 1000, 1),
        "rows": n,
        "materialize": "collect" if collect else "checksum",
    }
    print(fn.__name__, json.dumps(results[fn.__name__]), flush=True)

print("FINAL", json.dumps(results))
spark.stop()
