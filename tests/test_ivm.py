"""IVM-specific properties beyond the registry-wide oracle parity
(tests/test_parity.py already hash-checks refresh == from-scratch
recompute for both q_mv_* queries).  These pin the semantics that the
sf-parity corpus might not exercise:

* full retraction: a customer whose EVERY order is cancelled must
  disappear from the refreshed MV (not linger as a 0/NULL row);
* the merged counts/sums are exactly base + inserts − deletes per key
  (checked in-Spark against an independent recompute at smoke SF, so
  the invariant holds even if the DuckDB oracle were wrong).
"""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from cs425_distributed_systems_mp4_mapreduce_spark.queries.ivm import (
    q_mv_incremental,
    q_mv_incremental_join,
)


def _write_orders(spark, path, rows):
    spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_totalprice double"
    ).coalesce(1).write.parquet(path)


def test_fully_cancelled_customer_disappears(spark, tmp_path):
    # custkey 1: both orders have orderkey % 20 == 0 → both cancelled.
    # custkey 2: one surviving base order (key 1), one cancelled (20),
    #            one late insert (key 39 → % 20 == 19).
    _write_orders(spark, str(tmp_path / "orders.parquet"), [
        (20, 1, 100.0), (40, 1, 50.0),
        (1, 2, 10.0), (60, 2, 7.5), (39, 2, 2.25),
    ])
    out = {r.o_custkey: r for r in q_mv_incremental(spark, str(tmp_path)).collect()}
    assert 1 not in out, "fully-retracted group must be dropped"
    assert out[2].n_orders == 2
    assert out[2].revenue == pytest.approx(12.25, abs=0)


def test_refresh_equals_inspark_recompute(spark):
    """base + Δins − Δdel == recompute, verified WITHOUT DuckDB: an
    independent single-pass Spark aggregate over the final state."""
    from pyspark.sql import functions as F

    from cs425_distributed_systems_mp4_mapreduce_spark.functions.parity import (
        DEC, _dec2dbl,
    )
    from cs425_distributed_systems_mp4_mapreduce_spark.sources.tables import table as T

    got = q_mv_incremental(spark, SF_SMOKE).toPandas()
    o = T(spark, SF_SMOKE, "orders").filter(F.col("o_orderkey") % 20 != 0)
    want = (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dec2dbl(F.sum(F.col("o_totalprice").cast(DEC))).alias("revenue"),
        )
        .orderBy("o_custkey")
        .toPandas()
    )
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_join_view_refresh_equals_inspark_recompute(spark):
    from pyspark.sql import functions as F

    from cs425_distributed_systems_mp4_mapreduce_spark.functions.parity import (
        DEC, _dec2dbl,
    )
    from cs425_distributed_systems_mp4_mapreduce_spark.sources.tables import table as T

    got = q_mv_incremental_join(spark, SF_SMOKE).toPandas()
    li = T(spark, SF_SMOKE, "lineitem")
    o = T(spark, SF_SMOKE, "orders")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.month("o_orderdate").cast("bigint").alias("order_month"),
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dec2dbl(F.sum(rev)).alias("revenue"),
        )
        .orderBy("order_month", "o_orderpriority")
        .toPandas()
    )
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))
