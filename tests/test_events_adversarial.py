"""Mini-t2 on an ADVERSARIAL events table: NULL user_ids, NULL and
duplicate values, tied timestamps, single-event users — the window /
robust-stats family must agree with its DuckDB oracle on data the
generated corpus never produces (it has no NULLs at all).
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

QUERIES = [
    "q_window_locf",
    "q_outliers_mad",
    "q_events_funnel",
    "q_agg_distinct_users",
    "q_events_retention",
    "q_events_transitions",
    "q_rollup_time",
    "q_join_interval_self",
]


@pytest.fixture(scope="module")
def nasty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nasty_events")
    base = pd.Timestamp("2026-01-01")
    rows = []
    eid = 0

    def ev(user, etype, us, value):
        nonlocal eid
        rows.append((eid, base + pd.Timedelta(microseconds=us), user, etype, value, "{}"))
        eid += 1

    # user 1: normal funnel with TIED timestamps (click at the same
    # instant as the view — >= boundary semantics)
    ev(1, "view", 1000, 1.0)
    ev(1, "click", 1000, 2.0)
    ev(1, "purchase", 999, 3.0)   # purchase BEFORE click: must not count
    ev(1, "purchase", 2000, 4.0)
    # user 2: click before any view
    ev(2, "click", 10, 5.0)
    ev(2, "view", 20, None)       # NULL value
    # user 3: NULL user id events
    ev(None, "view", 30, 7.0)
    ev(None, "click", 40, 8.0)
    # user 4: single event, extreme value (outlier fodder).  1e9 is
    # the largest decade safely inside the decimal-parity domain
    # (|x| < 1e12, functions/parity.py) — a 1e12 probe value verifies
    # the domain is enforced LOUDLY (ANSI NUMERIC_VALUE_OUT_OF_RANGE
    # naming the parity cast), not silently nulled into a wrong sum.
    ev(4, "view", 50, 1e9)
    # user 5: many duplicate values at one timestamp
    for _ in range(6):
        ev(5, "view", 60, 42.0)
    # user 6: purchases only (LOCF fill source), mixed sign values
    ev(6, "purchase", 70, -1.5)
    ev(6, "view", 80, 0.0)
    ev(6, "purchase", 90, -0.0)

    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["event_id"] = pdf["event_id"].astype("int64")
    pdf["user_id"] = pdf["user_id"].astype("Int64")
    pdf.to_parquet(d / "events.parquet")
    return str(d)


def _vhash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1).round(9)
    rows = sorted(df.astype(str).apply("|".join, axis=1))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", QUERIES)
def test_events_query_parity_on_adversarial_corpus(spark, nasty_dir, name):
    spec = all_queries()[name]
    got = spec.fn(spark, nasty_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{nasty_dir}/events.parquet')"
    )
    want = con.execute(spec.oracle).df()
    assert len(got) == len(want), (name, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), name
    assert _vhash(got) == _vhash(want), (
        f"{name}: engines diverge on adversarial events\n"
        f"spark:\n{got.head(25).to_string()}\nduck:\n{want.head(25).to_string()}"
    )
