"""Round-10 int64 overflow audit: >2M-row census regression fixtures
(VERDICT r9 task 4).  The 100x wall probe caught q_stats_kruskal's
all-tied guard computing integer n³ unconditionally (fixed r9, commit
0e5fe59); this file pins the whole BUG CLASS — any cubic/quartic
integer moment or tie-correction term over row-count-sized integers —
at a census multiplicity past the int64 cube boundary (t³ > 2⁶³ once
t > 2 097 152).

Per family: a synthetic fixture with one >2.09e6-multiplicity census
value, the Spark plan run end-to-end (ANSI mode would raise
ARITHMETIC_OVERFLOW on any unguarded int64 cube), exact expected
values computed in Python big-int arithmetic, and bit-exact
cross-engine parity against the registered DuckDB oracle on the SAME
fixture.  Families whose terms are provably sub-cubic (Mann-Whitney
2n², Friedman 24n², Jarque-Bera Σv⁴ ≤ 6.25e6·n) get the same fixture
scale as documented-bound evidence rather than decimal casts.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pytest

from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

from test_parity import assert_frames_match

#: one census value past the int64 cube boundary (2 097 152³ = 2⁶³)
HOT = 2_200_000
COLD = 5_000


def overflow_census_parity(spark, tmp_path, qname, tables):
    """THE pack-discipline helper (SURVEY §5.2 overflow-census bullet):
    run the registered Spark query and its DuckDB oracle on a fixture
    dir carrying a planted >2 097 152-multiplicity census value (the
    int64 cube boundary — use the HOT constant above), assert
    bit-exact parity, return the Spark rows for big-int expected-value
    asserts.  Any new stats query with a cubic-or-higher integer
    census term must ship a test built on this helper."""
    spec = all_queries()[qname]
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT *"
            f" FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    sdf = spec.fn(spark, str(tmp_path)).toPandas()
    ddf = con.execute(spec.oracle).df()
    con.close()
    assert_frames_match(sdf, ddf, 0.0)
    return sdf


def _orders(tmp_path, prices_cents, priorities):
    pd.DataFrame(
        {
            "o_orderkey": np.arange(len(prices_cents), dtype=np.int64),
            "o_totalprice": np.asarray(prices_cents, dtype=np.float64)
            / 100.0,
            "o_orderpriority": priorities,
            "o_orderdate": "1995-01-01",
        }
    ).to_parquet(str(tmp_path / "orders.parquet"), index=False)


def test_kruskal_tie_cube_past_int64(spark, tmp_path):
    """2.19e6 orders tied on one price: t³ ≈ 1.05e19 > 2⁶³.  The
    DECIMAL(38,0)/HUGEINT tie sum must survive where the plain int64
    form raises ARITHMETIC_OVERFLOW under ANSI, and H stays finite
    (t_max < n, so the all-tied guard does not fire)."""
    t1, t2 = HOT - 2 * COLD, COLD
    prices = np.concatenate(
        [
            np.full(t1, 1000, dtype=np.int64),
            np.full(t2, 2000, dtype=np.int64),
            np.full(t2, 3000, dtype=np.int64),
        ]
    )
    prio = np.concatenate(
        [
            np.full(t1, "1-URGENT"),
            np.full(t2, "5-LOW"),
            np.full(t2, "2-HIGH"),
        ]
    )
    _orders(tmp_path, prices, prio)
    r = overflow_census_parity(spark, tmp_path, "q_stats_kruskal", ["orders"])
    assert len(r) == 1
    exact = (t1**3 - t1) + 2 * (t2**3 - t2)
    assert exact > 2**63, "fixture must cross the int64 cube boundary"
    assert r["tie_t"].iloc[0] == float(exact)
    assert np.isfinite(r["h"].iloc[0])


def test_wilcoxon_tie_cube_past_int64(spark, tmp_path):
    """2.2e6 users all tied on one |d|: Σ(t³−t) = n³−n ≈ 1.06e19 >
    2⁶³ — the decimal-summed tie_cubes and the z denominator (which
    stays positive: n(n+1)(2n+1)/24 > (n³−n)/48) both survive."""
    n = HOT
    ts = pd.Series(
        np.full(n, dt.datetime(2024, 1, 5)), dtype="datetime64[us]"
    )
    pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": np.arange(n, dtype=np.int64),
            "event_type": "click",
            "value": 2.5,
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    r = overflow_census_parity(spark, tmp_path, "q_stats_wilcoxon_signed", ["events"])
    assert len(r) == 1
    exact = n**3 - n
    assert exact > 2**63
    assert r["n_pairs"].iloc[0] == n
    assert r["wd"].iloc[0] == 0  # every d is negative
    assert r["tie_cubes"].iloc[0] == float(exact)
    assert np.isfinite(r["z_stat"].iloc[0]) and r["z_stat"].iloc[0] < 0


def test_mannwhitney_2n_squared_bound(spark, tmp_path):
    """Documented-bound family: 2.2e6 rows split across the two
    priorities, fully separated values — 2R_A hits its n_A·(t_A+1)
    extreme and the 2U identity holds exactly (no cubic term exists
    in this statistic; exact to ~2.1e9 rows)."""
    half = HOT // 2
    prices = np.concatenate(
        [
            np.full(half, 1000, dtype=np.int64),
            np.full(half, 2000, dtype=np.int64),
        ]
    )
    prio = np.concatenate(
        [np.full(half, "1-URGENT"), np.full(half, "5-LOW")]
    )
    _orders(tmp_path, prices, prio)
    r = overflow_census_parity(spark, tmp_path, "q_stats_mannwhitney", ["orders"])
    row = r.iloc[0]
    assert row["n_a"] == half and row["n_b"] == half
    assert row["two_u_a"] == 0  # all A strictly below all B
    assert row["two_u_b"] == 2 * half * half
    assert row["two_r_a"] == half * (half + 1)


def test_cvm_decimal_sum_past_int64(spark, tmp_path):
    """Adversarial fully-separated CvM at 2.2e6 rows per side: the
    single nonzero census term (a+b)·(CA·m)² ≈ 5.2e31 is far past
    2⁶³ but inside DECIMAL(38,0)/HUGEINT — the string-pinned num
    must equal the Python big-int exactly."""
    n = HOT
    pd.DataFrame(
        {
            "l_orderkey": np.arange(2 * n, dtype=np.int64),
            "l_returnflag": np.concatenate(
                [np.full(n, "R"), np.full(n, "A")]
            ),
            "l_extendedprice": np.concatenate(
                [np.full(n, 1.0), np.full(n, 2.0)]
            ),
        }
    ).to_parquet(str(tmp_path / "lineitem.parquet"), index=False)
    r = overflow_census_parity(spark, tmp_path, "q_stats_cvm", ["lineitem"])
    row = r.iloc[0]
    assert row["n"] == n and row["m"] == n
    exact = n * (n * n) ** 2  # weight · gap² at the first census row
    assert exact > 2**63
    assert row["num"] == float(exact)
    assert np.isfinite(row["cvm_t"])


def test_friedman_quadratic_pivot_bound(spark, tmp_path):
    """Documented-bound family: 2.2e6 single-click users — ranks
    (6, 3, 3) per block, pivot f_num = 12n² ≈ 5.8e13 (int64-safe to
    ~6.2e8 blocks), statistic = 2n exactly."""
    n = HOT
    ts = pd.Series(
        np.full(n, dt.datetime(2024, 2, 1)), dtype="datetime64[us]"
    )
    pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": np.arange(n, dtype=np.int64),
            "event_type": "click",
            "value": 1.0,
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    r = overflow_census_parity(spark, tmp_path, "q_stats_friedman", ["events"])
    row = r.iloc[0]
    assert row["n_users"] == n
    assert (row["r1"], row["r2"], row["r3"]) == (6 * n, 3 * n, 3 * n)
    assert row["f_num"] == 12 * n * n
    assert row["f_den"] == 6 * n
    assert row["friedman_stat"] == float(2 * n)


def test_jarque_bera_quartic_bound(spark, tmp_path):
    """Documented-bound family: Σv⁴ at 2.2e6 rows of the max quantity
    50 stays ≈ 1.4e13 ≪ 2⁶³ (the documented 6.25e6·n bound); moments
    match Python big-int arithmetic exactly."""
    half = HOT // 2
    q = np.concatenate(
        [np.full(half, 1, dtype=np.int64), np.full(half, 50, dtype=np.int64)]
    )
    pd.DataFrame(
        {
            "l_orderkey": np.arange(2 * half, dtype=np.int64),
            "l_quantity": q.astype(np.float64),
        }
    ).to_parquet(str(tmp_path / "lineitem.parquet"), index=False)
    r = overflow_census_parity(spark, tmp_path, "q_stats_jarque_bera", ["lineitem"])
    row = r.iloc[0]
    assert row["n"] == 2 * half
    assert row["s4"] == half * (1 + 50**4)
    assert np.isfinite(row["jb_stat"])
