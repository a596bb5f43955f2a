"""Bit-exactness pin for the numpy pairwise-cosine kernel.

``pairwise_cosine_within`` (r14) replaces the self-join +
interpreted-HOF cosine fold with a per-group numpy kernel whose
per-dimension rank-1 accumulation reproduces the JVM fold's
left-to-right IEEE addition order.  This test proves the kernel's
cosines are byte-identical to the historical expression form on the
real sf0.01 embeddings — every pair, raw doubles, no rounding.
"""

from __future__ import annotations

from conftest import SF_T2
from pyspark.sql import functions as F

from cs425_distributed_systems_mp4_mapreduce_spark.operators.similarity import (
    _cosine_pair,
    pairwise_cosine_within,
)
from cs425_distributed_systems_mp4_mapreduce_spark.sources.tables import table as T


def _expression_form(df):
    a = df.select(
        F.col("label").alias("g"), F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
    )
    b = df.select(
        F.col("label").alias("g"), F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
    )
    pairs = a.join(b, on="g").filter(F.col("id_a") < F.col("id_b"))
    return pairs.select("g", "id_a", "id_b", _cosine_pair("va", "vb").alias("cosine"))


def test_pairwise_cosine_kernel_bit_identical(spark):
    e = T(spark, SF_T2, "embeddings")
    got = sorted(map(tuple, pairwise_cosine_within(e).collect()))
    want = sorted(map(tuple, _expression_form(e).collect()))
    assert len(got) == len(want) and len(got) > 0
    # raw double equality, not approx: the kernel must reproduce the
    # fold's exact IEEE result for EVERY pair
    assert got == want
