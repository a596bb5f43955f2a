"""Bucketed co-located join: pre-shuffling at write time eliminates the
join-time Exchange — the 100 TB pattern for repeated joins on the same
key (SURVEY.md §4.3 'pre-partitioning')."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    wh = str(tmp_path / "wh")
    # warehouse.dir is a static conf; external-table paths below make
    # it irrelevant
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        (o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .option("path", f"{wh}/orders_b").saveAsTable("orders_b"))
        (li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .option("path", f"{wh}/lineitem_b").saveAsTable("lineitem_b"))
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        joined.collect()
        plan = str(joined._jdf.queryExecution().executedPlan())
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan[:1500]}"
        assert joined.count() == li.count()
        # contrast: the unbucketed same join DOES shuffle both sides
        plain = li.join(o, li.l_orderkey == o.o_orderkey)
        plain.collect()
        assert "Exchange" in str(plain._jdf.queryExecution().executedPlan())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
