"""Incremental view maintenance (IVM): keep a materialized aggregate
view in sync with a changing fact table by applying DELTAS — never
re-aggregating the base.

This is the standing-pipeline shape of every `[spec A2]` juice
aggregate: a nightly 100 TB corpus does not recompute `revenue per
customer` from scratch when 0.1% of orders arrive or are cancelled;
it maintains

    MV_new = MV_base (+) agg(inserts) (-) agg(deletes)

where ``(+)/(-)`` merge per group key.  SUM/COUNT are self-maintainable
under both insertions and retractions (the classic counting algorithm:
Gupta/Mumick/Subrahmanian, "Maintaining views incrementally",
SIGMOD '93), so the merge is exact — and because our parity discipline
aggregates in DECIMAL (functions/parity.py), ``base + ins − del`` is
bit-identical to a from-scratch recompute, which is precisely what the
DuckDB oracle does.  The oracle checking refresh == recompute IS the
IVM correctness theorem for this view class.

Scale posture (the whole point): the refresh path shuffles
  * agg(Δ)  — proportional to |Δ| (the day's batch), not |base|;
  * the merge — an outer join keyed on the GROUP key, proportional to
    |MV| (#groups), which for per-customer/per-month views is orders of
    magnitude below the fact table.
The base aggregate here is computed once in-query only to SIMULATE
pre-existing state at test SF; a deployment stores the MV with the
partitioned/bucketed sink lifecycle already in this repo
(queries/sinks.py, and the build-once/serve-many pattern of
q_sim_ann_ivf_index) so the merge join co-locates without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parity import DEC, _dec2dbl, o_dsum
from ..registry import query
from ..sources.tables import table as T

#: deterministic change-batch carving of `orders` (mirrored in the
#: oracles): rows with o_orderkey % 20 == 19 arrive as INSERTS after
#: the base snapshot; rows with % 20 == 0 are later CANCELLED
#: (retractions).  Final state ≡ orders WHERE o_orderkey % 20 <> 0.
_INS, _DEL = 19, 0


def _agg(df: DataFrame) -> DataFrame:
    """(custkey, n, rev) partial aggregate with EXACT decimal revenue —
    kept decimal (not double) so merge arithmetic stays associative."""
    return df.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev"),
    )


@query(
    "q_mv_incremental",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders,
           {o_dsum("o_totalprice", "revenue")}
    FROM orders
    WHERE o_orderkey % 20 <> {_DEL}
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def q_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-view IVM with inserts AND retractions: maintain
    revenue/order-count per customer through a change batch, merging
    ``MV_base + agg(ins) − agg(del)`` per key and dropping groups whose
    count reaches zero (a customer whose every order was cancelled must
    DISAPPEAR, not linger with a 0 row).  The oracle recomputes the
    final state from scratch — refresh must match it bit-for-bit."""
    o = T(spark, sf_dir, "orders")
    key = F.col("o_orderkey") % 20
    base = o.filter(key != _INS)
    inserts = o.filter(key == _INS)
    deletes = base.filter(key == _DEL)

    mv = _agg(base)
    # net delta per key first: one small frame, one merge join.  n is
    # signed; rev is signed exact decimal.
    delta = (
        _agg(inserts).select("o_custkey", "n", "rev")
        .unionByName(
            _agg(deletes).select(
                "o_custkey", (-F.col("n")).alias("n"), (-F.col("rev")).alias("rev")
            )
        )
        .groupBy("o_custkey")
        .agg(F.sum("n").alias("dn"), F.sum("rev").alias("drev"))
    )
    zero = F.lit(0).cast("decimal(38,6)")
    merged = (
        mv.join(delta, "o_custkey", "full")
        .select(
            "o_custkey",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias(
                "n_orders"
            ),
            (
                F.coalesce(F.col("rev").cast("decimal(38,6)"), zero)
                + F.coalesce(F.col("drev").cast("decimal(38,6)"), zero)
            ).alias("rev"),
        )
        .filter(F.col("n_orders") > 0)
    )
    return merged.select(
        "o_custkey", "n_orders", _dec2dbl(F.col("rev")).alias("revenue")
    ).orderBy("o_custkey")


#: join-view delta carving of `lineitem`: suppkey stripe 0 arrives
#: after the base snapshot (insert-only join IVM).
_JOIN_DELTA_STRIPE = 0


@query(
    "q_mv_incremental_join",
    oracle=f"""
    SELECT date_part('month', o_orderdate) AS order_month,
           o_orderpriority,
           COUNT(*) AS n_items,
           {o_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY order_month, o_orderpriority
    ORDER BY order_month, o_orderpriority
    """,
)
def q_mv_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-view IVM (delta-join): the view aggregates
    ``lineitem ⋈ orders`` by order month × priority; when a batch of
    line items lands, the refresh joins ONLY the delta against orders
    (ΔV = Δlineitem ⋈ orders — exact because `orders` is unchanged in
    the batch, the insert-only case of the counting algorithm) and
    merges the per-group partials into the stored MV.  At 100 TB the
    delta-side join is a bucketed orderkey lookup over ~0.1% of facts;
    the merge touches |MV| = months×priorities rows.  Oracle =
    from-scratch recompute over the full join."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    stripe = F.col("l_suppkey") % 10
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)

    def view_agg(items: DataFrame) -> DataFrame:
        return (
            items.join(o, items.l_orderkey == o.o_orderkey)
            .groupBy(
                # bigint to match DuckDB's date_part return type
                F.month("o_orderdate").cast("bigint").alias("order_month"),
                "o_orderpriority",
            )
            .agg(F.count(F.lit(1)).alias("n"), F.sum(rev).alias("rev"))
        )

    mv = view_agg(li.filter(stripe != _JOIN_DELTA_STRIPE))
    dv = view_agg(li.filter(stripe == _JOIN_DELTA_STRIPE))
    keys = ["order_month", "o_orderpriority"]
    zero = F.lit(0).cast("decimal(38,6)")
    merged = mv.join(dv, keys, "full").select(
        *keys,
        (
            F.coalesce(mv["n"], F.lit(0)) + F.coalesce(dv["n"], F.lit(0))
        ).alias("n_items"),
        (
            F.coalesce(mv["rev"].cast("decimal(38,6)"), zero)
            + F.coalesce(dv["rev"].cast("decimal(38,6)"), zero)
        ).alias("rev"),
    )
    return merged.select(
        "order_month",
        "o_orderpriority",
        "n_items",
        _dec2dbl(F.col("rev")).alias("revenue"),
    ).orderBy("order_month", "o_orderpriority")
