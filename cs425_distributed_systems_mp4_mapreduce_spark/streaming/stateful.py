"""Arbitrary stateful streaming: applyInPandasWithState.

The escape hatch when built-in windows/dedup can't express the state
machine — the streaming analogue of the maple/juice user-function
surface.  Demo operator: per-user running counters with a session-idle
timeout, the canonical "user activity tracker" shape.

Scale posture: state is keyed (shuffled by user_id), lives in the state
store per partition, and is evicted via GroupStateTimeout — bounded
state on an unbounded stream.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


#: idle period after which a user's state is evicted (bounds state on
#: an unbounded stream — without this every user_id ever seen lives in
#: the state store forever)
IDLE_TIMEOUT_MS = 30 * 60 * 1000


def _track_user(key, batches: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    if state.hasTimedOut:
        # idle eviction: emit the final totals as a tombstone row and
        # drop the state entry
        n, s = state.get if state.exists else (0, 0.0)
        state.remove()
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_value": [s]})
        return
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_value": [s]})


def user_activity_stream(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, sum) maintained as explicit state;
    emits updated totals every micro-batch the user appears in, and
    evicts state for users idle longer than IDLE_TIMEOUT_MS
    (processing-time timeout → bounded state)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

