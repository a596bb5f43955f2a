"""Streaming == batch assertions (SURVEY.md §5.2): each streaming
operator replayed over a chunked file source must reproduce its batch
twin's results — Spark's unified-API promise, checked concretely."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries
from cs425_distributed_systems_mp4_mapreduce_spark.streaming.windows import (
    events_stream,
    replay_dir,
    run_stream_to_memory,
    session_stats_stream,
    sliding_counts_stream,
    stream_dedup,
    tumbling_counts_stream,
)
from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def chunks(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_replay"))
    return replay_dir(spark, SF_SMOKE, out, n_chunks=6)


def _pdf(df, sort_cols):
    return (
        df.toPandas()
        .sort_values(sort_cols, kind="mergesort")
        .reset_index(drop=True)
    )


def test_stream_tumbling_equals_batch(spark, chunks):
    got = run_stream_to_memory(
        tumbling_counts_stream(events_stream(spark, chunks)), spark, "tumb"
    ).drop("sum_value")
    want = (
        all_queries()["q_stream_tumbling"].fn(spark, SF_SMOKE).drop("sum_value")
    )
    g = _pdf(got, ["window_start_s", "event_type"])
    w = _pdf(want, ["window_start_s", "event_type"])
    pd.testing.assert_frame_equal(g, w)
    # sums compared with float tolerance (stream path uses plain
    # double sum, not the oracle-parity decimal detour)
    got_s = run_stream_to_memory(
        tumbling_counts_stream(events_stream(spark, chunks)), spark, "tumb2"
    )
    ws = all_queries()["q_stream_tumbling"].fn(spark, SF_SMOKE)
    gs = _pdf(got_s, ["window_start_s", "event_type"])["sum_value"]
    ww = _pdf(ws, ["window_start_s", "event_type"])["sum_value"]
    assert (abs(gs - ww) < 1e-6).all()


def test_stream_sliding_equals_batch(spark, chunks):
    got = run_stream_to_memory(
        sliding_counts_stream(events_stream(spark, chunks)), spark, "slide"
    )
    want = all_queries()["q_stream_sliding"].fn(spark, SF_SMOKE)
    pd.testing.assert_frame_equal(
        _pdf(got, ["window_start_s", "event_type"]),
        _pdf(want, ["window_start_s", "event_type"]),
    )


def test_stream_session_equals_batch_twin(spark, chunks):
    """Native session_window (streaming) vs lag-gap SQL formulation
    (batch twin) — same gap semantics, so same (user, start, end, n)."""
    got = run_stream_to_memory(
        session_stats_stream(events_stream(spark, chunks)), spark, "sess"
    ).select("user_id", "session_start_s", "n_events")
    twin = (
        all_queries()["q_stream_session"]
        .fn(spark, SF_SMOKE)
        .select("user_id", F.col("start_s").alias("session_start_s"), "n_events")
    )
    pd.testing.assert_frame_equal(
        _pdf(got, ["user_id", "session_start_s"]),
        _pdf(twin, ["user_id", "session_start_s"]),
    )


def test_stream_dedup_drops_reprocessed_duplicates(spark, chunks, tmp_path):
    """Feed the SAME chunk directory twice (simulating at-least-once
    redelivery) — dropDuplicatesWithinWatermark keeps one row per
    event_id."""
    import shutil, os

    doubled = str(tmp_path / "doubled")
    os.makedirs(doubled)
    for i, f in enumerate(sorted(os.listdir(chunks))):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(chunks, f), os.path.join(doubled, f"a{i}.parquet"))
            shutil.copy(os.path.join(chunks, f), os.path.join(doubled, f"b{i}.parquet"))
    # watermark must cover the whole replayed span: the dedup guarantee
    # only holds for duplicates arriving within the watermark window —
    # with a 1h watermark over a 30-day replay, state for old event_ids
    # is evicted and redelivered rows can re-emit (micro-batch packing
    # makes that race nondeterministic)
    got = run_stream_to_memory(
        stream_dedup(events_stream(spark, doubled), keys=["event_id"], watermark="40 days"),
        spark,
        "dedup",
        output_mode="append",
    )
    n_unique = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id")
        .distinct()
        .count()
    )
    assert got.count() == n_unique


def test_watermark_present_in_plan(spark, chunks):
    s = tumbling_counts_stream(events_stream(spark, chunks), watermark="10 minutes")
    assert "watermark" in s._jdf.queryExecution().analyzed().toString().lower()
