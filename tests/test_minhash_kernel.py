"""Bit-exactness pins for the numpy MinHash banding kernel.

The kernel (operators/minhash_kernel.py) replaces the interpreted-HOF
signature/banding expressions with vectorized numpy xxhash64 — these
tests prove every hashing primitive AND the end-to-end band rows are
byte-identical to Spark's own expression evaluation, so every banded
minhash query's oracle hash is preserved by construction.
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from cs425_distributed_systems_mp4_mapreduce_spark.operators.dedup import (
    _minhash_band_rows,
)
from cs425_distributed_systems_mp4_mapreduce_spark.operators import minhash_kernel as mk

RNG = random.Random(0xDEDA14)


def _rand_longs(n):
    # spread across the full signed-64 range incl. sign-bit edge cases
    edge = [0, 1, -1, 2**63 - 1, -(2**63), 42, -42]
    vals = edge + [RNG.randint(-(2**63), 2**63 - 1) for _ in range(n - len(edge))]
    return vals[:n]


def test_xxh64_long_matches_spark(spark):
    vals = _rand_longs(512)
    df = spark.createDataFrame([(v,) for v in vals], "h long")
    expect = [r[0] for r in df.select(F.xxhash64("h")).collect()]
    got = mk.xxh64_long(
        np, np.array(vals, dtype=np.int64).view(np.uint64), np.uint64(42)
    ).view(np.int64)
    assert list(got) == expect


def test_xxh64_long_int_fold_matches_spark(spark):
    # xxhash64(h:long, i:int) == hashInt(i, hashLong(h, 42)) — the
    # exact shape of the signature seed fold
    vals = _rand_longs(128)
    seeds = list(range(0, 40)) + [2**31 - 1]
    df = spark.createDataFrame(
        [(v, s) for v in vals for s in seeds], "h long, i int"
    )
    expect = [r[0] for r in df.select(F.xxhash64("h", "i")).collect()]
    h = np.array([v for v in vals for _ in seeds], dtype=np.int64).view(np.uint64)
    i = np.array([s for _ in vals for s in seeds], dtype=np.uint64)
    with np.errstate(over="ignore"):
        got = mk.xxh64_int(np, i, mk.xxh64_long(np, h, np.uint64(42))).view(
            np.int64
        )
    assert list(got) == expect


def test_band_fold_matches_spark(spark):
    # xxhash64(array<long>, j:int) folds elements then the int index
    rows = [
        ([RNG.randint(-(2**63), 2**63 - 1) for _ in range(r)], j)
        for r in (1, 2, 3, 4)
        for j in range(8)
        for _ in range(8)
    ]
    df = spark.createDataFrame(rows, "a array<long>, j int")
    expect = [r[0] for r in df.select(F.xxhash64("a", "j")).collect()]
    got = []
    with np.errstate(over="ignore"):
        for a, j in rows:
            h = np.uint64(42)
            for e in a:
                h = mk.xxh64_long(
                    np, np.uint64(np.int64(e).view(np.uint64)), h
                )
            got.append(int(mk.xxh64_int(np, np.uint64(j), h).view(np.int64)))
    assert got == expect


@pytest.mark.parametrize("num_bands,band_width", [(8, 2), (4, 4), (16, 3)])
def test_band_rows_bit_identical_to_expression_path(spark, num_bands, band_width):
    # end-to-end: kernel band rows == the historical HOF expression
    # band rows for the same hashed-shingle inputs, incl. a null and an
    # empty text ("" still yields one shingle via greatest(..., 1))
    texts = [
        (i, " ".join(f"w{RNG.randint(0, 30)}" for _ in range(RNG.randint(1, 40))))
        for i in range(200)
    ] + [(1000, ""), (1001, None)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = _minhash_band_rows(df, "doc_id", "text", 3, num_bands, band_width)

    # the pre-kernel expression form, verbatim
    from cs425_distributed_systems_mp4_mapreduce_spark.operators.dedup import (
        _hashed_shingle_rows,
    )

    k_total = num_bands * band_width
    sigs = _hashed_shingle_rows(df, "doc_id", "text", 3).select(
        "_id",
        F.expr(
            f"transform(sequence(0, {k_total - 1}),"
            f" i -> array_min(transform(_h, h -> xxhash64(h, i))))"
        ).alias("_sigs"),
    )
    expect = sigs.select(
        "_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {num_bands - 1}),"
                f" j -> xxhash64(slice(_sigs, j * {band_width} + 1, {band_width}), j))"
            )
        ).alias("_band", "_bv"),
    )
    key = lambda r: (r["_id"] if r["_id"] is not None else -1, r["_band"])  # noqa: E731
    g = sorted(got.collect(), key=key)
    e = sorted(expect.collect(), key=key)
    assert [tuple(r) for r in g] == [tuple(r) for r in e]
