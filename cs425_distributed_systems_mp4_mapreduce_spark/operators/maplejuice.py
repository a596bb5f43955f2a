"""MapleJuice parity layer: the reference's user-function surface.

The reference engine runs arbitrary user executables in two phases
[spec: SURVEY.md §2.1 A1/A2 — the checkout at /root/reference was
empty, semantics from the published CS425 MP4 assignment]:

  maple <maple_exe> <num_maples> <prefix> <sdfs_src_dir>
      maple_exe: input line -> [(key, value), ...]
  juice <juice_exe> <num_juices> <prefix> <sdfs_dest> delete_input={0,1}
      juice_exe: (key, all values for key) -> (key, value_out)

with the key→task assignment done by a hash partitioner
(``hash(key) % num_juices`` [spec: A3]) or a range partitioner (sorted
contiguous key ranges [spec: A4]).

Spark-first mapping — NOT a port of the reference's scheduler:
- the maple phase is ``flatMap`` over an RDD of lines;
- the per-key intermediate files (``prefix_K``) ARE the shuffle, so
  they disappear into ``partitionBy + groupByKey`` (Spark materializes
  shuffle files itself; ``delete_input`` is therefore a no-op);
- task counts map to RDD partition counts;
- fault tolerance (leader reassignment of failed tasks [spec: A7]) is
  Spark lineage re-execution — nothing to build.

The layer exists because the reference's power is *arbitrary user
functions*, not a fixed algebra; everything expressible there is
expressible here.  For anything relational, prefer the DataFrame
queries (JVM codegen ≫ Python lambdas); this API is the escape hatch,
and its Python functions run batch-parallel per partition.

Scale note: ``juice`` groups ALL values for a key on one task — the
reference's semantics.  A hot key therefore skews, exactly as it did in
the reference; ``reduce_by_key`` offers the combiner-style alternative
(associative merge, map-side partial reduction) which is what you want
at 100 TB whenever the juice function is a fold.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Iterable, Tuple

from pyspark.rdd import RDD, portable_hash


def _pipe_env(env: dict | None) -> dict:
    """Child-process environment for ``rdd.pipe``.

    PySpark passes ``env`` VERBATIM to ``Popen(..., env=env)`` — an
    empty dict therefore launches the exe with NO environment at all,
    so a command like ``python foo.py`` dies with FileNotFoundError
    (no PATH to resolve ``python``).  Inherit the driver's environment
    and overlay the caller's vars, matching Hadoop streaming's
    behavior (task env = node env + user -cmdenv overrides).  Local
    mode: driver env == worker env; on a cluster the exe should be
    shipped via ``addFile`` and referenced absolutely anyway (see
    maple_pipe docstring)."""
    return {**os.environ, **(env or {})}

KV = Tuple[Any, Any]


def _partition(pairs: RDD, num_tasks: int, partitioner: str) -> RDD:
    if partitioner == "hash":
        # [spec: A3] hash(key) % num_juices
        return pairs.partitionBy(num_tasks, portable_hash)
    if partitioner == "range":
        # [spec: A4] sorted keys split into contiguous ranges.
        # sortByKey samples key ranges and installs a RangePartitioner;
        # the subsequent groupByKey reuses it (no second shuffle).
        return pairs.sortByKey(numPartitions=num_tasks)
    raise ValueError(f"unknown partitioner {partitioner!r} (want 'hash' or 'range')")


def maple(
    lines: RDD,
    maple_exe: Callable[[Any], Iterable[KV]],
    num_maples: int,
) -> RDD:
    """Map phase [spec: A1]: run ``maple_exe`` over every input record
    across ``num_maples`` parallel tasks; returns the (key, value) pair
    RDD (the reference's ``prefix_K`` intermediate files, pre-shuffle).
    """
    if lines.getNumPartitions() != num_maples:
        lines = lines.repartition(num_maples)
    return lines.flatMap(maple_exe)


def juice(
    pairs: RDD,
    juice_exe: Callable[[Any, list], KV],
    num_juices: int,
    partitioner: str = "hash",
    delete_input: bool = True,  # noqa: ARG001 - API parity; Spark manages shuffle files
) -> RDD:
    """Reduce phase [spec: A2]: partition the key set over
    ``num_juices`` tasks (hash [A3] or range [A4]), feed each key and
    ALL its values to ``juice_exe``, return the (key, out) RDD.

    The range path groups by streaming over each SORTED partition
    (equal keys are adjacent after sortByKey), NOT via groupByKey —
    groupByKey's default hash partitioner compares unequal to
    sortByKey's RangePartitioner closure and would silently re-shuffle
    by hash, destroying the range partitioning it claims to test."""
    parted = _partition(pairs, num_juices, partitioner)
    if partitioner == "range":

        def _group_sorted(it):
            cur_key, vals = None, None
            for k, v in it:
                if vals is not None and k != cur_key:
                    yield juice_exe(cur_key, vals)
                    vals = None
                if vals is None:
                    cur_key, vals = k, []
                vals.append(v)
            if vals is not None:
                yield juice_exe(cur_key, vals)

        return parted.mapPartitions(_group_sorted, preservesPartitioning=True)
    # hash: partitionBy already used (num_juices, portable_hash); pass
    # num_juices explicitly — a bare groupByKey() would default to
    # spark.default.parallelism on a cluster, fail Partitioner equality,
    # and re-shuffle away the A3 key→task assignment.
    return parted.groupByKey(num_juices).map(lambda kv: juice_exe(kv[0], list(kv[1])))


def reduce_by_key(
    pairs: RDD,
    merge: Callable[[Any, Any], Any],
    num_juices: int,
    partitioner: str = "hash",
) -> RDD:
    """Combiner-style juice for associative+commutative merges: partial
    reduction happens map-side before the shuffle (reduceByKey), so a
    hot key ships one partial per map task instead of every value —
    the scalable form of A2."""
    part = (
        portable_hash
        if partitioner == "hash"
        else None  # range: let sortByKey below own the partitioning
    )
    if partitioner == "range":
        return pairs.reduceByKey(merge).sortByKey(numPartitions=num_juices)
    return pairs.reduceByKey(merge, numPartitions=num_juices, partitionFunc=part)


def _parse_kv_line(line: str) -> KV:
    """``key\\tvalue`` → (key, value); value may itself contain tabs
    (only the FIRST tab frames the key, as in Hadoop streaming)."""
    k, _, v = line.partition("\t")
    return (k, v)


def maple_pipe(
    lines: RDD,
    maple_cmd: str,
    num_maples: int,
    env: dict | None = None,
) -> RDD:
    """Map phase with a true PROCESS-BOUNDARY user function [spec: A1]:
    ``maple_cmd`` is an arbitrary executable (shell command line) that
    reads input lines on stdin and emits ``key\\tvalue`` lines on
    stdout — the reference's ``maple_exe`` contract, which the
    callable-based :func:`maple` cannot honour for a user with a legacy
    binary.  ``rdd.pipe`` is the exact Spark equivalent: one process
    per partition, lines streamed through, output lines re-collected.

    Framing contract (Hadoop streaming's): records are newline-framed,
    key/value tab-framed on the first tab.  Input lines must therefore
    be newline-free and keys tab-free — same constraint the reference's
    line-oriented SDFS files impose.

    Cluster note: ship the executable with ``spark.sparkContext.
    addFile(exe)`` (then reference it via ``SparkFiles.get``) so every
    executor node has it; on local mode a repo path works as-is.

    Scale: the child process is per-PARTITION, not per-record — pipe
    startup cost amortizes over the partition, data streams through
    pipes without materializing, and Spark's lineage re-runs a failed
    pipe task exactly like a failed maple task [spec: A7]."""
    if lines.getNumPartitions() != num_maples:
        lines = lines.repartition(num_maples)
    # checkCode=True: a crashing exe fails the task LOUDLY (and Spark
    # re-runs it [spec: A7]) instead of silently truncating output.
    return lines.pipe(
        maple_cmd, env=_pipe_env(env), checkCode=True
    ).map(_parse_kv_line)


def juice_pipe(
    pairs: RDD,
    juice_cmd: str,
    num_juices: int,
    partitioner: str = "hash",
    env: dict | None = None,
) -> RDD:
    """Reduce phase with a process-boundary user function [spec: A2]:
    ``juice_cmd`` reads SORTED ``key\\tvalue`` lines on stdin (equal
    keys adjacent — the engine guarantees it, exactly what Hadoop
    streaming guarantees a reducer) and emits ``key\\tvalue`` output
    lines on key boundaries.

    The key→task assignment keeps the reference's partitioners: hash
    [spec: A3] via ``repartitionAndSortWithinPartitions`` (one shuffle;
    the sort is Spark's spill-aware ExternalSorter, so a juice
    partition larger than memory sorts on disk rather than OOMing —
    the 100 TB-safe form of "group all values for a key") or range
    [spec: A4] via ``sortByKey`` (sampled RangePartitioner, partitions
    are globally ordered AND internally sorted)."""
    kv = pairs.map(lambda p: (str(p[0]), str(p[1])))
    if partitioner == "hash":
        parted = kv.repartitionAndSortWithinPartitions(
            numPartitions=num_juices, partitionFunc=portable_hash
        )
    elif partitioner == "range":
        parted = kv.sortByKey(numPartitions=num_juices)
    else:
        raise ValueError(
            f"unknown partitioner {partitioner!r} (want 'hash' or 'range')"
        )
    lines = parted.map(lambda p: f"{p[0]}\t{p[1]}")
    return lines.pipe(
        juice_cmd, env=_pipe_env(env), checkCode=True
    ).map(_parse_kv_line)


def maple_juice_pipe(
    lines: RDD,
    maple_cmd: str,
    juice_cmd: str,
    num_maples: int,
    num_juices: int,
    partitioner: str = "hash",
) -> RDD:
    """Full external-executable job [spec: A1-A4]: maple exe →
    (shuffle+sort) → juice exe, both across a real process boundary."""
    return juice_pipe(
        maple_pipe(lines, maple_cmd, num_maples),
        juice_cmd,
        num_juices,
        partitioner,
    )


def maple_juice(
    lines: RDD,
    maple_exe: Callable[[Any], Iterable[KV]],
    juice_exe: Callable[[Any, list], KV],
    num_maples: int,
    num_juices: int,
    partitioner: str = "hash",
) -> RDD:
    """Full job: maple → (shuffle) → juice, the reference's two-command
    pipeline as one call."""
    return juice(maple(lines, maple_exe, num_maples), juice_exe, num_juices, partitioner)
