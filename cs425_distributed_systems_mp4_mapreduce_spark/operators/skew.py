"""Skew mitigation helpers (SURVEY.md §4.3: the reference's hot-key
problem — one juice task per key — re-solved the Spark way).

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on by default here); these
helpers cover the two patterns AQE cannot: skewed *aggregation* keys,
and broadcast-salting a dimension for a skewed shuffled join.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Append a salt in [0, n_salts) derived from ROW CONTENT.

    Content-derived (xxhash64 over all columns), NOT
    monotonically_increasing_id: the latter depends on partition layout
    and row order, so a task retry after partial shuffle fetch could
    re-salt rows differently and double-count/drop them downstream —
    the classic shuffle-retry hazard.  Content hashing is stable across
    retries; identical rows sharing a salt is harmless for aggregation
    (sums merge) and joins (same output either way)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: list[Column],
    final_aggs: Callable[[DataFrame], list[Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed keys: groupBy(key, salt) spreads
    a hot key over n_salts reducers, then a second (tiny) aggregation
    merges the partials.  Identity: the partial aggs must be
    re-aggregatable (sum→sum, count→sum, min→min, ...)."""
    stage1 = salted(df, n_salts).groupBy(*keys, "_salt").agg(*partial_aggs)
    return stage1.groupBy(*keys).agg(*final_aggs(stage1))


def replicate_broadcast_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Salted join for a skewed fact against a small dimension: salt the
    fact side, replicate the dim n_salts times (explode), join on
    (key, salt) — every hot key spreads over n_salts tasks.  (With a
    genuinely small dim, plain broadcast is simpler; this is the
    pattern for when the dim is just past broadcast size.)"""
    fact = salted(skewed, n_salts)
    dim_rep = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    # frame-qualified key columns, not bare F.col: when the two key
    # names coincide (the common case) bare references are ambiguous
    # after the join and Spark raises AMBIGUOUS_REFERENCE (review r12)
    return fact.join(
        dim_rep,
        (fact[key] == dim_rep[dim_key]) & (fact["_salt"] == dim_rep["_salt"]),
    ).drop("_salt")
