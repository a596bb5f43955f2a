"""Arbitrary stateful streaming, v2 API: transformWithStateInPandas.

Spark 4's successor to applyInPandasWithState (streaming/stateful.py
keeps the v1 form): state is declared as named, typed handles
(ValueState/ListState/MapState) with per-state TTL instead of one
opaque tuple, timers are first-class, and the processor is an object
with a lifecycle (init/handleInputRows/close) rather than a closure.
Both APIs express the reference's "arbitrary user reduce over a keyed
stream" surface; this one is where Spark is headed, so the engine
covers both.

Scale posture: identical to v1 — state keyed and shuffled by user_id,
RocksDB-backed per partition on a real cluster, TTL bounds state on an
unbounded stream.

Environment note: running a TWS query needs (a) the RocksDB state
store provider (pinned below) and (b) the ``protobuf`` package for the
state-server protocol.  This container ships no protobuf, so the
stream==batch test (tests/test_stateful_and_props.py) skips here and
runs wherever the dependency exists; the operator itself is complete.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"

#: TTL after which an idle user's state is evicted (the v2 analogue of
#: v1's GroupStateTimeout — bounded state on an unbounded stream)
STATE_TTL_MS = 30 * 60 * 1000


class UserTotalsProcessor(StatefulProcessor):
    """Per-user running (count, sum) with TTL'd ValueState — the same
    user-activity tracker as stateful.user_activity_stream, on the v2
    handle/lifecycle API."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n long, s double", ttlDurationMs=STATE_TTL_MS
        )

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues):
        n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
        self._totals.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    def close(self) -> None:
        pass


def ensure_rocksdb_state_store(spark) -> None:
    """transformWithState queries run ONLY on the RocksDB state store
    (the HDFS-backed default crashes the TWS worker at startup).  The
    provider conf is read at QUERY START and applies session-wide, so
    callers opt in EXPLICITLY before .start() rather than having the
    stream builder mutate shared session state as a side effect —
    other streaming queries on the session would silently switch
    providers too."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )


def user_activity_stream_v2(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, sum) via transformWithStateInPandas;
    emits updated totals every micro-batch the user appears in.
    timeMode=None: totals need no timers — TTL alone bounds state.
    Call :func:`ensure_rocksdb_state_store` on the session before
    starting the query."""
    return events.groupBy("user_id").transformWithStateInPandas(
        UserTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
