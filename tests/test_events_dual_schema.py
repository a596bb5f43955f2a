"""normalize_events must present IDENTICAL (ts, event_ts) under both
parquet schemas the driver has shipped for events.ts across rounds:
TIMESTAMP(NANOS) (read as Long ns under nanosAsLong=true → the bigint
branch) and plain timestamp[µs] (the NTZ branch).  The current
testdata only exercises whichever schema this round shipped; this test
fabricates BOTH from the same instants so the other branch cannot rot
unnoticed until a regeneration flips the schema again (it cost part of
round 3 the first time).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cs425_distributed_systems_mp4_mapreduce_spark.sources.tables import (
    normalize_events,
)

INSTANTS_US = [
    0,
    1,
    1_700_000_000_000_000,
    1_700_000_123_456_789,
]


def test_both_schemas_normalize_identically(spark, tmp_path):
    legacy = spark.createDataFrame(
        [(i, us * 1000) for i, us in enumerate(INSTANTS_US)],
        "event_id long, ts long",
    )
    modern = spark.createDataFrame(
        [
            (i, dt.datetime.fromtimestamp(us / 1e6, dt.timezone.utc).replace(tzinfo=None))
            for i, us in enumerate(INSTANTS_US)
        ],
        "event_id long, ts timestamp_ntz",
    )
    # roundtrip through parquet so each takes the real loader path
    lp, mp = str(tmp_path / "legacy"), str(tmp_path / "modern")
    legacy.write.parquet(lp)
    modern.write.parquet(mp)
    out_l = normalize_events(spark.read.parquet(lp)).orderBy("event_id")
    out_m = normalize_events(spark.read.parquet(mp)).orderBy("event_id")
    rows_l = [(r.event_id, r.ts, r.event_ts) for r in out_l.collect()]
    rows_m = [(r.event_id, r.ts, r.event_ts) for r in out_m.collect()]
    assert rows_l == rows_m
    # and the ns Long is exactly 1000x the µs instant on both paths
    for rows in (rows_l, rows_m):
        for (i, ts_ns, _), us in zip(rows, INSTANTS_US):
            assert ts_ns == us * 1000, (i, ts_ns, us)
