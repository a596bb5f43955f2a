"""CDC-style keyed upsert over a micro-batched stream (foreachBatch
MERGE into a versioned parquet state table).

The shape every change-data-capture / materialized-view pipeline needs:
a stream of events folds into a per-key state table where "latest"
columns overwrite (last-write-wins on event time) and additive columns
accumulate (counts).  Spark has no built-in MERGE sink for plain
parquet, so ``foreachBatch`` + an explicit merge is the documented
pattern (Structured Streaming guide, foreachBatch section) — the same
code drives Delta/Iceberg ``MERGE INTO`` on a real lakehouse.

Versioned-snapshot discipline: each batch writes a COMPLETE new state
snapshot under ``v{batch:05d}`` and readers pick the highest version —
a two-line stand-in for a copy-on-write table format's commit log.
Never read-and-overwrite the same path: Spark plans lazily, so an
overwrite of an input path corrupts the read (classic footgun).

Scale posture: the merge is one hash shuffle of (prior state ∪ batch
delta) on the key — state never rescans the event history, and the
per-batch cost is O(|state| + |delta|), the same asymptotics as
compaction in a merge-on-read format.  Determinism: "latest" is
max_by over the total order (ts_us, event_id) — never file order.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KEYS = ["user_id", "event_type"]

_LAST_ORD = "struct(last_ts_us, last_event_id)"


def _summarize(batch: DataFrame) -> DataFrame:
    """Collapse raw events to one row per key: latest fields by
    (ts_us, event_id) + additive count."""
    e = batch.withColumn("ts_us", F.expr("ts div 1000"))
    return e.groupBy(*KEYS).agg(
        F.expr("max_by(event_id, struct(ts_us, event_id))").alias("last_event_id"),
        F.max("ts_us").alias("last_ts_us"),
        F.expr("max_by(value, struct(ts_us, event_id))").alias("last_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


def _merge(state: DataFrame | None, delta: DataFrame) -> DataFrame:
    """MERGE semantics: unmatched keys insert; matched keys take the
    later (ts_us, event_id) for last_* and sum the counts."""
    if state is None:
        return delta
    both = state.unionByName(delta)
    return both.groupBy(*KEYS).agg(
        F.expr(f"max_by(last_event_id, {_LAST_ORD})").alias("last_event_id"),
        F.max("last_ts_us").alias("last_ts_us"),
        F.expr(f"max_by(last_value, {_LAST_ORD})").alias("last_value"),
        F.sum("n_events").alias("n_events"),
    )


def _vnum(name: str) -> int:
    """Numeric batch id of a ``v{batch_id}`` snapshot dir name."""
    return int(name[1:])


def _latest_version_dir(
    state_path: str, below: str | None = None
) -> str | None:
    """Newest ``v*`` snapshot dir, optionally restricted to versions
    strictly below ``below``.  Versions compare NUMERICALLY
    (``int(name[1:])``), never lexically: the names are zero-padded to
    5 digits, so at batch_id >= 100000 the name grows to 6 digits and
    a lexical order would invert ('v100000' < 'v99999') — silently
    replaying against the wrong base on a long-running stream."""
    if not os.path.isdir(state_path):
        return None
    lim = _vnum(below) if below is not None else None
    vs = sorted(
        (
            d
            for d in os.listdir(state_path)
            if d.startswith("v") and (lim is None or _vnum(d) < lim)
        ),
        key=_vnum,
    )
    return os.path.join(state_path, vs[-1]) if vs else None


def read_state(
    spark: SparkSession, state_path: str, below: str | None = None
) -> DataFrame | None:
    cur = _latest_version_dir(state_path, below)
    return spark.read.parquet(cur) if cur else None


def vacuum(state_path: str, keep: int = 2) -> list[str]:
    """Drop all but the newest ``keep`` snapshot versions (the VACUUM
    every copy-on-write table format needs — without it a minutely
    trigger leaves a full table copy per batch).  ``keep >= 2`` so a
    reader that resolved the previous version an instant ago never has
    its files deleted mid-read.  Returns the removed version names."""
    import shutil

    if not os.path.isdir(state_path):
        return []
    vs = sorted(
        (d for d in os.listdir(state_path) if d.startswith("v")), key=_vnum
    )
    drop = vs[: -keep] if keep else vs
    for d in drop:
        shutil.rmtree(os.path.join(state_path, d), ignore_errors=True)
    return drop


def upsert_sink(state_path: str, keep: int = 2):
    """foreachBatch function: fold each micro-batch into the state
    table as a new snapshot version, then vacuum old versions.

    Replay idempotence (the foreachBatch contract is AT-LEAST-once):
    the base state is the newest version STRICTLY BELOW this batch's
    own ``v{batch_id}`` — never the global latest.  If the previous
    attempt crashed after writing its snapshot but before the
    checkpoint committed, the replay would otherwise (a) merge the
    delta a second time on top of its own output (double-counted
    n_events, wrong last_*), and (b) lazily read from the very
    directory ``mode("overwrite")`` is rewriting — the read-overwrite
    corruption the module docstring warns about.  Re-deriving
    v{batch_id} from v<batch_id makes the overwrite a no-op rewrite of
    identical content: exactly-once state from at-least-once calls
    (the batchId-idempotence pattern in the Structured Streaming
    guide's foreachBatch section).  ``keep >= 2`` in vacuum guarantees
    the strictly-below base still exists at replay time."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        mine = f"v{batch_id:05d}"
        base = read_state(spark, state_path, below=mine)
        merged = _merge(base, _summarize(batch))
        merged.write.mode("overwrite").parquet(
            os.path.join(state_path, mine)
        )
        vacuum(state_path, keep)

    return fn


def run_cdc_upsert(
    spark: SparkSession,
    events: DataFrame,
    state_path: str,
    checkpoint: str,
    timeout_s: int = 120,
) -> DataFrame:
    """Drive the streaming upsert to completion over a finite replay
    source and return the final state table."""
    q = (
        events.writeStream.foreachBatch(upsert_sink(state_path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_s)
    if not finished:
        # stopping mid-replay and returning the last committed
        # snapshot would silently present a PARTIAL state table as
        # final (review r12; run_stream_to_memory raises identically)
        q.stop()
        raise TimeoutError(
            f"CDC upsert replay did not finish within {timeout_s}s —"
            " the state table at this point is mid-replay, not final"
        )
    state = read_state(spark, state_path)
    assert state is not None, "stream produced no state"
    return state
