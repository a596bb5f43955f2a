"""Dataset splitting and sampling for training pipelines.

The production requirement for a train/test split at 100 TB is NOT
randomness — it is REPRODUCIBILITY: the same row must land in the same
split on every run, on any cluster size, after any repartition, and
when the dataset grows (new rows get splits; old rows never move).
``randomSplit`` fails all of these (per-partition RNG); hash-based
assignment satisfies them by construction.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Knuth's multiplicative hash constant (2^32 / phi) — a full-period
#: multiplier giving well-mixed low buckets for sequential ids
KNUTH = 2654435761


def knuth_bucket(key: Column, buckets: int = 100) -> Column:
    """Multiplicative-hash bucket of an integer key — plain int64
    arithmetic, so an external system (or a SQL oracle) reproduces the
    exact assignment.  Keys must stay < 2^31 to avoid int64 overflow
    under ANSI mode; for larger or non-integer keys use
    :func:`hash_bucket` (xxhash64)."""
    return F.pmod(key.cast("long") * F.lit(KNUTH), F.lit(buckets))


def hash_bucket(cols, buckets: int = 10_000, seed: int = 42) -> Column:
    """xxhash64 bucket over arbitrary columns (strings, composites).
    Stable across runs/partitionings/cluster sizes; NOT reproducible
    outside Spark (xxhash64 seeding is engine-specific), so use
    :func:`knuth_bucket` when an external oracle must agree."""
    return F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(buckets))


def split_assign(
    df: DataFrame,
    bucket: Column,
    fractions: Mapping[str, float],
    buckets: int = 100,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a split label from cumulative bucket ranges:
    fractions {train: .8, valid: .1, test: .1} → buckets [0,80) train,
    [80,90) valid, [90,100) test.  One narrow projection, no shuffle,
    no RNG."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    # CASE WHEN bucket < 80 THEN train WHEN bucket < 90 THEN valid ...
    # — ordered when-chain, first match wins, so each range is
    # [cumulative_lo, cumulative_hi)
    names = list(fractions)
    expr = None
    lo = 0
    for name in names:
        hi = buckets if name == names[-1] else lo + round(fractions[name] * buckets)
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    return df.withColumn(split_col, expr)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    bucket: Column,
    rates: Mapping[str, float],
    default_rate: float = 1.0,
    buckets: int = 100,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its hash
    bucket < rate[stratum]·buckets.  Unlike ``sampleBy`` (per-partition
    RNG) membership is a pure function of the row's key — same rows
    kept on every run, any cluster size, any layout, and an external
    SQL engine reproduces the exact sample.  This is the production
    form of corpus rebalancing (e.g. downsample the majority language)
    at 100 TB: one narrow filter, fully pushed down, no RNG state."""
    default_thr = F.lit(int(round(default_rate * buckets)))
    expr = None
    for stratum, rate in rates.items():
        cond = F.col(strata_col) == F.lit(stratum)
        thr = F.lit(int(round(rate * buckets)))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    # empty rates = uniform sampling at default_rate (None.otherwise
    # crashed here — review r12)
    thresh = default_thr if expr is None else expr.otherwise(default_thr)
    return df.filter(bucket < thresh)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: Mapping[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``).  Deterministic
    for a fixed seed AND fixed input partitioning — unlike hash
    splits, row membership shifts if the input layout changes; use for
    one-shot analysis sampling, not reproducible splits."""
    return df.sampleBy(strata_col, dict(fractions), seed)
