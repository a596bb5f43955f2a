"""Mini-t2 on ADVERSARIAL join inputs: NULL join keys, duplicate
keys, and dangling foreign keys injected into real-schema copies of
the sf0.001 tables.  The join family's Spark form and DuckDB oracle
must agree on NULL-key semantics (equality joins never match NULLs;
null-safe compares in table-diff/merge DO) — the generated corpus has
perfect FK integrity and zero NULLs, so the driver gate cannot see
any of this.
"""

from __future__ import annotations

import hashlib
import shutil
from pathlib import Path

import duckdb
import pandas as pd
import pytest

from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

SRC = Path("/root/testdata/sf0.001")

QUERIES = [
    "q_join_inner",
    "q_join_left",
    "q_join_semi",
    "q_join_anti",
    "q_join_full",
    "q_table_diff",
    "q_merge_upsert",
]


@pytest.fixture(scope="module")
def nasty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nasty_joins")
    for t in [
        "region", "nation", "supplier", "part", "lineitem",
        "events", "documents", "embeddings",
    ]:
        shutil.copy(SRC / f"{t}.parquet", d / f"{t}.parquet")

    cust = pd.read_parquet(SRC / "customer.parquet")
    orders = pd.read_parquet(SRC / "orders.parquet")

    # customers: one NULL key, one duplicated existing key, one key no
    # order references
    extra_c = cust.head(3).copy()
    extra_c["c_custkey"] = pd.array(
        [pd.NA, int(cust["c_custkey"].iloc[0]), 99_999_999], dtype="Int64"
    )
    cust2 = pd.concat([cust, extra_c], ignore_index=True)
    cust2["c_custkey"] = cust2["c_custkey"].astype("Int64")

    # orders: one NULL custkey, one orphan custkey (no such customer),
    # one duplicate orderkey with different values (upsert fodder)
    extra_o = orders.head(3).copy()
    extra_o["o_custkey"] = pd.array(
        [pd.NA, 88_888_888, int(orders["o_custkey"].iloc[0])], dtype="Int64"
    )
    extra_o.loc[extra_o.index[2], "o_orderkey"] = int(
        orders["o_orderkey"].iloc[0]
    )
    extra_o.loc[extra_o.index[2], "o_totalprice"] = 123456.78
    orders2 = pd.concat([orders, extra_o], ignore_index=True)
    orders2["o_custkey"] = orders2["o_custkey"].astype("Int64")
    orders2["o_orderkey"] = orders2["o_orderkey"].astype("int64")

    cust2.to_parquet(d / "customer.parquet")
    orders2.to_parquet(d / "orders.parquet")
    return str(d)


def _vhash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1).round(9)
    rows = sorted(df.astype(str).apply("|".join, axis=1))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", QUERIES)
def test_join_query_parity_on_adversarial_corpus(spark, nasty_dir, name):
    spec = all_queries()[name]
    got = spec.fn(spark, nasty_dir).toPandas()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{nasty_dir}/{t}.parquet')"
        )
    want = con.execute(spec.oracle).df()
    assert len(got) == len(want), (name, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), name
    assert _vhash(got) == _vhash(want), (
        f"{name}: engines diverge on adversarial join inputs\n"
        f"spark rows={len(got)}:\n{got.head(20).to_string()}\n"
        f"duck rows={len(want)}:\n{want.head(20).to_string()}"
    )
