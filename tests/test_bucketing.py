"""Bucketed co-located join: pre-shuffling at write time eliminates the
join-time Exchange — the 100 TB pattern for repeated joins on the same
key (SURVEY.md §4.3 'pre-partitioning')."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_SMOKE, SF_T2


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


def test_zorder_layout_prunes_files_on_both_dimensions(spark):
    """The z-ordered sink must give file-level min/max pruning on BOTH
    dimensions, where a linear sort serves only its leading key —
    measured from the parquet footers, not asserted from theory."""
    import glob

    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from cs425_distributed_systems_mp4_mapreduce_spark.queries.sinks import (
        sink_path,
        write_zordered,
    )
    from cs425_distributed_systems_mp4_mapreduce_spark.sources.tables import table as T
    from conftest import SF_T2

    li = T(spark, SF_T2, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    zdir = sink_path(SF_T2, "lineitem_zorder_test")
    ldir = sink_path(SF_T2, "lineitem_linear_test")
    write_zordered(li, "l_partkey", "l_suppkey", zdir)
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    def overlapping(d, col, lo, hi):
        hit = total = 0
        for f in glob.glob(f"{d}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                total += 1
                idx = [
                    i
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                ][0]
                st = md.row_group(rg).column(idx).statistics
                hit += int(st.min <= hi and st.max >= lo)
        return hit, total

    z_supp, z_total = overlapping(zdir, "l_suppkey", 10, 20)
    z_part, _ = overlapping(zdir, "l_partkey", 100, 200)
    l_supp, l_total = overlapping(ldir, "l_suppkey", 10, 20)
    l_part, _ = overlapping(ldir, "l_partkey", 100, 200)

    # linear layout: perfect on its own key, useless on the other
    assert l_part <= 0.25 * l_total, (l_part, l_total)
    assert l_supp == l_total, "uniform keys should hit every file"
    # z-order: real pruning on BOTH dimensions
    assert z_supp <= 0.5 * z_total, (z_supp, z_total)
    assert z_part <= 0.5 * z_total, (z_part, z_total)
    # and strictly better than linear on the secondary dimension
    assert z_supp < l_supp


def test_compaction_reduces_file_count_to_size_target(spark):
    """q_sink_compact's layout claim, measured: 48 fragment files
    collapse to ⌈bytes/1MiB⌉ files, every compacted file is a real
    parquet part, and no rows are lost or duplicated."""
    import os

    from cs425_distributed_systems_mp4_mapreduce_spark.queries.sinks import (
        sink_path,
    )
    from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

    all_queries()["q_sink_compact"].fn(spark, SF_T2).collect()
    frag = sink_path(SF_T2, "events_fragmented")
    comp = sink_path(SF_T2, "events_compacted")
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    n_comp = len([f for f in os.listdir(comp) if f.endswith(".parquet")])
    total = sum(
        os.path.getsize(os.path.join(frag, f))
        for f in os.listdir(frag)
        if f.endswith(".parquet")
    )
    expect = max(1, -(-total // (1 << 20)))
    assert n_frag == 48
    assert n_comp == expect, (n_comp, expect, total)
    assert n_comp < n_frag
    assert (
        spark.read.parquet(comp).count() == spark.read.parquet(frag).count()
    )
