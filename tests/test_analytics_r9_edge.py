"""Mini-t2 on DEGENERATE inputs for the round-9 stats/graph packs:
single-day series (empty pair sets), single-group designs (k−1 = 0),
single-nation contingency tables, matchless band joins — both engines
must agree on the shapes the generated corpus never produces, because
a NULL-vs-NaN or empty-vs-1-row divergence here is exactly the class
of cross-engine drift ADVICE r8 flagged on KMV's under-k case.
"""

from __future__ import annotations

import datetime as dt
import hashlib

import duckdb
import pandas as pd
import pytest

from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

#: (query, tables needed) — all run against the degenerate corpus
CASES = [
    ("q_stats_kendall", ("orders",)),       # 1 day -> zero pairs
    ("q_stats_theilsen", ("orders",)),      # 1 day -> zero pairs
    ("q_stats_kruskal", ("orders",)),       # one group only
    ("q_stats_anova", ("orders",)),         # k = 1 -> 0/0 statistics
    ("q_stats_brown_forsythe", ("orders",)),
    ("q_stats_cohens_d", ("orders",)),      # one side empty
    ("q_window_macd", ("orders",)),         # 1-day stencil warmup
    ("q_agg_pareto_coverage", ("orders",)),
    ("q_customer_migration", ("orders",)),
    ("q_stats_cramers_v", ("customer",)),   # single nation: chi2 = 0
    ("q_join_band", ("supplier", "customer")),  # no pair within delta
    ("q_graph_degree_census", ("lineitem",)),   # single-part orders: no edges
    ("q_graph_powerlaw_slope", ("lineitem",)),
    ("q_graph_kcore_peel", ("lineitem",)),
    ("q_rules_association", ("lineitem",)),
    ("q_orders_abc", ("lineitem",)),
]


@pytest.fixture(scope="module")
def degenerate_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_r9")
    day = dt.datetime(2024, 1, 1)
    # ONE calendar day, ONE priority, one customer -> empty pair sets,
    # single-group pivots, empty second migration half
    pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_custkey": [7, 7],
            "o_orderdate": pd.Series([day, day], dtype="datetime64[us]"),
            "o_totalprice": [10.0, 20.0],
            "o_orderpriority": ["3-MEDIUM", "3-MEDIUM"],
        }
    ).to_parquet(d / "orders.parquet")
    # one nation only -> row margin == N -> every chi2 delta is 0
    pd.DataFrame(
        {
            "c_custkey": [1, 2, 3],
            "c_nationkey": [0, 0, 0],
            "c_mktsegment": ["AUTOMOBILE", "BUILDING", "AUTOMOBILE"],
            "c_acctbal": [100.0, 200.0, 300.0],
        }
    ).to_parquet(d / "customer.parquet")
    # supplier balances all > $1 away from every customer balance
    pd.DataFrame(
        {
            "s_suppkey": [1],
            "s_nationkey": [0],
            "s_acctbal": [5000.0],
        }
    ).to_parquet(d / "supplier.parquet")
    # every order holds ONE part -> the co-purchase graph has no edges
    pd.DataFrame(
        {
            "l_orderkey": [1, 2, 3],
            "l_partkey": [11, 22, 33],
            "l_extendedprice": [1.0, 2.0, 3.0],
        }
    ).to_parquet(d / "lineitem.parquet")
    return str(d)


def _vhash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1).round(9)
    rows = sorted(df.astype(str).apply("|".join, axis=1))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name,tables", CASES, ids=[c[0] for c in CASES])
def test_r9_query_parity_on_degenerate_corpus(spark, degenerate_dir, name, tables):
    spec = all_queries()[name]
    got = spec.fn(spark, degenerate_dir).toPandas()
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{degenerate_dir}/{t}.parquet')"
        )
    want = con.execute(spec.oracle).df()
    assert len(got) == len(want), (name, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), name
    assert _vhash(got) == _vhash(want), (
        f"{name}: engines diverge on the degenerate corpus\n"
        f"spark:\n{got.head(25).to_string()}\nduck:\n{want.head(25).to_string()}"
    )
