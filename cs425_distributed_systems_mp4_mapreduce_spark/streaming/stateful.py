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
from pyspark.sql import functions as F
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



# ---------------------------------------------------------------- transitions

TRANSITION_OUTPUT = "user_id long, from_type string, to_type string"
TRANSITION_STATE = "ts long, eid long, etype string"


def _track_transitions(key, batches: Iterator[pd.DataFrame], state: GroupState):
    """Per-user event-type transition emitter: remembers the LAST event
    (ts, event_id, event_type) across micro-batches and emits one
    (from, to) row per consecutive pair — the streaming form of
    LAG(event_type) OVER (PARTITION BY user ORDER BY ts, event_id),
    which batch windows can express but streams cannot without state.

    Rows inside a micro-batch are sorted by (ts, event_id); chaining
    across batches is exact as long as the source delivers in event-
    time order per key (true for a log/bus; the replay harness range-
    partitions chunks on ts).  State is ONE tuple per user; idle users
    are evicted on timeout, losing at most the single pair that would
    span the eviction boundary — the documented trade for bounded
    state on an unbounded stream."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame({"user_id": [], "from_type": [], "to_type": []})
        return
    rows = pd.concat(list(batches), ignore_index=True).sort_values(
        ["ts", "event_id"], kind="mergesort"
    )
    prev = state.get if state.exists else None
    froms: list[str] = []
    tos: list[str] = []
    for ts, eid, etype in zip(rows["ts"], rows["event_id"], rows["event_type"]):
        if prev is not None:
            froms.append(prev[2])
            tos.append(str(etype))
        prev = (int(ts), int(eid), str(etype))
    if prev is not None:
        state.update(prev)
        state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(froms),
            "from_type": froms,
            "to_type": tos,
        }
    )


def transition_stream(events: DataFrame) -> DataFrame:
    """Streaming event-type transition pairs (batch twin:
    queries/analytics_r4.q_events_transitions — stream==batch asserted
    in tests/test_streaming.py).  Each transition is emitted exactly
    once, in the micro-batch that completes the pair."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track_transitions,
        outputStructType=TRANSITION_OUTPUT,
        stateStructType=TRANSITION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------- sequences

SEQUENCE_OUTPUT = "user_id long, seq string"
#: two predecessor slots (slot 1 = older, slot 2 = most recent);
#: ts = -1 marks an empty slot — GroupState tuples are fixed-shape
SEQUENCE_STATE = (
    "ts1 long, eid1 long, et1 string, ts2 long, eid2 long, et2 string"
)


def _track_sequences(key, batches: Iterator[pd.DataFrame], state: GroupState):
    """Per-user order-3 sequence emitter — the streaming form of the
    double-LEAD chain in queries/analytics_r7b.q_events_sequences:
    remembers the last TWO events across micro-batches and emits one
    'a>b>c' row per event that has two predecessors.  Same ordering
    and eviction contract as :func:`_track_transitions`; state is two
    tuples per user, so an unbounded stream holds O(users) state."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame({"user_id": [], "seq": []})
        return
    rows = pd.concat(list(batches), ignore_index=True).sort_values(
        ["ts", "event_id"], kind="mergesort"
    )
    if state.exists:
        ts1, eid1, et1, ts2, eid2, et2 = state.get
        p1 = None if ts1 < 0 else (ts1, eid1, et1)
        p2 = None if ts2 < 0 else (ts2, eid2, et2)
    else:
        p1 = p2 = None
    seqs: list[str] = []
    for ts, eid, etype in zip(rows["ts"], rows["event_id"], rows["event_type"]):
        cur = (int(ts), int(eid), str(etype))
        if p1 is not None and p2 is not None:
            seqs.append(f"{p1[2]}>{p2[2]}>{cur[2]}")
        p1, p2 = p2, cur
    flat = (p1 or (-1, -1, "")) + (p2 or (-1, -1, ""))
    state.update(flat)
    state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    yield pd.DataFrame({"user_id": [user_id] * len(seqs), "seq": seqs})


def sequence_stream(events: DataFrame) -> DataFrame:
    """Streaming order-3 event sequences (batch twin:
    queries/analytics_r7b.q_events_sequences without the top-20 cut —
    stream==batch asserted in tests/test_streaming.py).  Each
    sequence is emitted exactly once, in the micro-batch its third
    event arrives."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track_sequences,
        outputStructType=SEQUENCE_OUTPUT,
        stateStructType=SEQUENCE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ------------------------------------------------------------------
# Streaming CUSUM changepoint detection (VERDICT r8 task 5)
# ------------------------------------------------------------------

# alarm is LONG, not int: pyspark 4.1.2's applyInPandasWithState
# Arrow writer hard-crashes the python worker (silent EOF, no
# traceback) on 32-bit integer output columns — observed 100% repro
# on this box; the batch twin casts to long in the comparison.
CUSUM_OUTPUT = "user_id long, us long, cusum_cents long, alarm long"
#: two scalars of state per user — the prefix sum of deviations and
#: min(0, running min of prefixes): exactly what the batch closed form
#: cusum_i = P_i − min(0, min_{j≤i} P_j) needs to continue across
#: micro-batches (the OHLC "bounded state per key" discipline).
CUSUM_STATE = "pref long, runmin long"

#: must equal queries/analytics_r8's _CUSUM_K/_CUSUM_H (imported there
#: lazily to avoid a package cycle; equality asserted in
#: tests/test_streaming.py)
CUSUM_K = 6000
CUSUM_H = 15000


def _track_cusum(key, batches: Iterator[pd.DataFrame], state: GroupState):
    """Per-user one-sided CUSUM: s_i = max(0, s_{i-1} + (x_i − k)),
    maintained incrementally via the prefix-sum − running-min closed
    form — the same two stacked quantities q_window_cusum computes
    with batch windows, here carried as TWO LONGS of state per user.
    Emits the full alarm trajectory (one row per purchase event, in
    the micro-batch it arrives)."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(
            {"user_id": [], "us": [], "cusum_cents": [], "alarm": []}
        )
        return
    rows = pd.concat(list(batches), ignore_index=True).sort_values(
        ["ts", "event_id"], kind="mergesort"
    )
    pref, runmin = state.get if state.exists else (0, 0)
    import numpy as np

    # integer cents via the FLOOR(x*100 + 0.5) discipline — double ops
    # are correctly-rounded IEEE, so this matches Spark/DuckDB exactly
    devs = (
        np.floor(rows["value"].to_numpy(dtype="float64") * 100.0 + 0.5)
        .astype(np.int64)
        - CUSUM_K
    )
    out_us, out_cusum = [], []
    for ts, dev in zip(rows["ts"].to_numpy(dtype="int64"), devs):
        pref += int(dev)
        if pref < runmin:
            runmin = pref
        out_us.append(int(ts) // 1000)
        out_cusum.append(pref - runmin)
    state.update((int(pref), int(runmin)))
    state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out_us),
            "us": out_us,
            "cusum_cents": out_cusum,
            "alarm": [int(c > CUSUM_H) for c in out_cusum],  # emitted as long
        }
    )


def cusum_stream(events: DataFrame) -> DataFrame:
    """Streaming CUSUM changepoint detector (batch twin:
    queries/analytics_r8.q_window_cusum, fully DuckDB-oracled;
    stream==batch asserted in tests/test_streaming.py).  State is two
    longs per user regardless of event volume, evicted on idle
    timeout — bounded state on an unbounded stream, the property that
    lets a quality-monitoring pipeline track millions of live users."""
    return (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track_cusum,
            outputStructType=CUSUM_OUTPUT,
            stateStructType=CUSUM_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---------------------------------------------------------------- interarrival

GAP_OUTPUT = "user_id long, gap_us long"
#: one (last-µs-timestamp, last-event-id) tuple per user
GAP_STATE = "tus long, eid long"


def _track_gaps(key, batches: Iterator[pd.DataFrame], state: GroupState):
    """Per-user inter-arrival gap emitter — the streaming form of
    tus − LAG(tus) OVER (PARTITION BY user ORDER BY tus, event_id)
    (batch twin: queries/analytics_r9e.q_events_interarrival's gap
    stage).  Rows sort by (µs, event_id) inside each micro-batch —
    the batch window's exact key; gap values depend only on the
    sorted µs multiset, so tie order never changes a gap.  State is
    ONE tuple per user with the usual idle eviction (losing at most
    the single gap spanning the eviction boundary)."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame({"user_id": [], "gap_us": []})
        return
    rows = pd.concat(list(batches), ignore_index=True)
    rows["tus"] = rows["ts"] // 1000
    rows = rows.sort_values(["tus", "event_id"], kind="mergesort")
    prev = state.get if state.exists else None
    gaps: list[int] = []
    for tus, eid in zip(rows["tus"], rows["event_id"]):
        if prev is not None:
            gaps.append(int(tus) - prev[0])
        prev = (int(tus), int(eid))
    if prev is not None:
        state.update(prev)
        state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    yield pd.DataFrame({"user_id": [user_id] * len(gaps), "gap_us": gaps})


def interarrival_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user inter-arrival gaps in exact µs (batch twin:
    the fully-oracled q_events_interarrival — its log₂ bucket census
    over these gaps is asserted stream==batch in
    tests/test_streaming.py).  Each gap is emitted exactly once, in
    the micro-batch that completes its pair — the live feed a
    rate-limiter or session-timeout tuner consumes."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track_gaps,
        outputStructType=GAP_OUTPUT,
        stateStructType=GAP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------- ewma

EWMA_OUTPUT = "user_id long, event_id long, ewma_micros long"
#: the 7 previous values (most recent first), zero-filled — 0.0 is
#: EXACTLY the batch form's COALESCE(LAG(value, j), 0.0), so a fresh
#: key needs no warm-up special case.  7 doubles of state per user:
#: the "8-value ring buffer" the q_window_ewma docstring promises
#: (the 8th slot is the in-flight current value).
EWMA_STATE = ", ".join(f"v{j} double" for j in range(1, 8))

#: must equal queries/analytics_r7b._EWMA_DEPTH (asserted in
#: tests/test_streaming.py — no import here to avoid a package cycle)
EWMA_DEPTH = 8


def _track_ewma(key, batches: Iterator[pd.DataFrame], state: GroupState):
    """Per-user trailing EWMA (α = ½, depth 8): for each event, the
    SAME left-to-right dyadic stencil q_window_ewma evaluates with
    batch LAG windows — term j is value_{i−j} · 2^−(j+1), missing
    lags are 0.0 — accumulated in the identical IEEE order, so the
    floored integer micros match the oracled batch twin bit-for-bit."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame({"user_id": [], "event_id": [], "ewma_micros": []})
        return
    rows = pd.concat(list(batches), ignore_index=True).sort_values(
        ["ts", "event_id"], kind="mergesort"
    )
    prev = list(state.get) if state.exists else [0.0] * (EWMA_DEPTH - 1)
    import math

    out_eid, out_micros = [], []
    for eid, val in zip(
        rows["event_id"].to_numpy(dtype="int64"),
        rows["value"].to_numpy(dtype="float64"),
    ):
        acc = float(val) * 0.5  # term j=0, exactly the batch's terms[0]
        for j in range(1, EWMA_DEPTH):
            acc = acc + prev[j - 1] * (0.5 ** (j + 1))
        out_eid.append(int(eid))
        out_micros.append(int(math.floor(acc * 1_000_000.0 + 0.5)))
        prev = [float(val)] + prev[: EWMA_DEPTH - 2]
    state.update(tuple(prev))
    state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out_eid),
            "event_id": out_eid,
            "ewma_micros": out_micros,
        }
    )


def ewma_stream(events: DataFrame) -> DataFrame:
    """Streaming trailing EWMA smoother (batch twin: the fully-oracled
    q_window_ewma; stream==batch asserted in tests/test_streaming.py).
    State is the fixed 7-value tail per user — the ring buffer the
    batch docstring promises — evicted on idle timeout: bounded state
    on an unbounded stream, emitting each smoothed point exactly once
    in the micro-batch its event arrives."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track_ewma,
        outputStructType=EWMA_OUTPUT,
        stateStructType=EWMA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------- page-hinkley

PH_OUTPUT = (
    "di long, x long, mean_micros long, ph_micros long, alarm long,"
    " seq long"
)
#: fold state over CLOSED days (i/p/mt/runmin), the OPEN day's
#: (last_di, cur_cnt), and the emission counter seq — 7 longs total,
#: regardless of stream length.
PH_STATE = (
    "last_di long, i long, p long, mt long, runmin long,"
    " cur_cnt long, seq long"
)

#: must equal queries/analytics_r9s's _PH_US_PER_DAY /
#: _PH_LAMBDA_MICROS (pinned copies, no import cycle; equality
#: asserted in tests/test_streaming.py — the cusum_stream precedent)
PH_US_PER_DAY = 86_400_000_000
PH_LAMBDA_MICROS = 10_000_000


def _ph_close(x: int, i0: int, p0: int, mt0: int, runmin0: int):
    """Fold one finished day of count x into the Page-Hinkley
    recurrence — the EXACT batch algebra of q_stats_page_hinkley:
    floored-micros incremental mean (1e6·p)//i, integer deviation
    cumsum mt, running min of mt (initialized AT the first day, since
    the batch MIN window includes the current row)."""
    i = i0 + 1
    p = p0 + x
    mean = (1_000_000 * p) // i
    mt = mt0 + (1_000_000 * x - mean)
    runmin = mt if i == 1 else min(runmin0, mt)
    return i, p, mt, runmin, mean


def _track_ph(key, batches: Iterator[pd.DataFrame], state: GroupState):
    """Global daily Page-Hinkley drift detector as 7 longs of state:
    incoming events bucket into UTC days; a day CLOSES when a later
    day arrives (gap days fold in as x = 0, reproducing the batch
    spine join), and the still-open day re-emits a PROVISIONAL row
    per micro-batch — update-mode semantics, so the latest seq per
    di is the authoritative trajectory row (the batch twin equals
    that max-seq projection exactly).  Requires the time-ordered
    replay discipline (replay_dir's range partitioning): a day never
    reopens after a later day has been seen — ENFORCED below (an
    out-of-order day raises instead of silently corrupting the
    mt/runmin trajectory).

    Unlike the per-user EWMA/CUSUM trackers, this state is NEVER
    evicted: it is the single GLOBAL detector (7 longs total), so an
    idle-timeout eviction would not bound memory — it would discard
    the only series and restart the detector from day 1 after any
    30-minute quiet gap, silently diverging from the batch twin.
    ph_stream therefore runs with NoTimeout (ADVICE r10)."""
    rows = pd.concat(list(batches), ignore_index=True)
    if state.exists:
        last_di, i0, p0, mt0, runmin0, cur_cnt, seq = (
            int(v) for v in state.get
        )
        has_open = True
    else:
        last_di = i0 = p0 = mt0 = runmin0 = cur_cnt = seq = 0
        has_open = False
    out: list[tuple] = []

    def emit(di, x, i0, p0, mt0, runmin0):
        """Row for day di of count x on top of the closed-fold state."""
        nonlocal seq
        i, p, mt, runmin, mean = _ph_close(x, i0, p0, mt0, runmin0)
        ph = mt - runmin
        out.append((di, x, mean, ph, int(ph > PH_LAMBDA_MICROS), seq))
        seq += 1
        return i, p, mt, runmin

    days = (rows["ts"].to_numpy(dtype="int64") // 1000) // PH_US_PER_DAY
    import numpy as np

    uniq, cnts = np.unique(days, return_counts=True)
    for d, c in zip(uniq, cnts):
        d, c = int(d), int(c)
        if has_open:
            if d < last_di:
                # np.unique sorts within the batch, so this can only
                # be a CROSS-batch violation: a replay delivered a day
                # older than the already-open one.  The closed-day fold
                # cannot reopen a day; fail loudly rather than move
                # last_di backwards and emit a wrong trajectory.
                raise ValueError(
                    f"ph_stream requires time-ordered replay: got day "
                    f"{d} after day {last_di} was already open"
                )
            if d == last_di:
                cur_cnt += c
                continue
            # close the open day, then fold the zero-count gap days
            i0, p0, mt0, runmin0 = emit(last_di, cur_cnt, i0, p0, mt0, runmin0)
            for z in range(last_di + 1, d):
                i0, p0, mt0, runmin0 = emit(z, 0, i0, p0, mt0, runmin0)
        last_di, cur_cnt, has_open = d, c, True
    if has_open:
        # provisional row for the still-open day (NOT folded into the
        # closed state — a later batch may still grow it)
        emit(last_di, cur_cnt, i0, p0, mt0, runmin0)
        state.update(
            (last_di, i0, p0, mt0, runmin0, cur_cnt, seq)
        )
    yield pd.DataFrame(
        out,
        columns=["di", "x", "mean_micros", "ph_micros", "alarm", "seq"],
    )


def ph_stream(events: DataFrame) -> DataFrame:
    """Streaming Page-Hinkley upward-drift detector (batch twin: the
    fully-oracled q_stats_page_hinkley; stream==batch asserted in
    tests/test_streaming.py as the max-seq-per-day projection).
    Unlike cusum_stream's fixed reference value, PH self-references
    the series' own running mean — the same two stacked scalars
    (deviation cumsum + its running min) plus the incremental-mean
    pair, carried as 7 longs under ONE group key (the detector
    monitors a global daily series; a production deployment keys by
    metric id for thousands of concurrent detectors, same state
    shape — THERE an idle timeout would evict cold keys, but the
    single global detector must never be evicted: see _track_ph's
    docstring, hence NoTimeout)."""
    # the constant key must be a materialized COLUMN — stateful
    # grouping cannot bind a bare literal grouping expression
    return events.withColumn("g", F.lit(0)).groupBy("g").applyInPandasWithState(
        _track_ph,
        outputStructType=PH_OUTPUT,
        stateStructType=PH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
