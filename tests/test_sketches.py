"""Property tests for the count-min heavy-hitters family
(queries/sketches.py) — the guarantees that justify its rows-only
status: overestimate-only error, exact recall of φ-heavy keys, sketch
mergeability, and the CMS error bound, all on a COLLIDING geometry
(tiny W) so the assertions exercise real collisions, not the
collision-free regime the sf corpora happen to sit in."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from cs425_distributed_systems_mp4_mapreduce_spark.queries.sketches import (
    cms_estimate,
    cms_sketch,
    local_heavy_candidates,
)

from conftest import SF_T2


def _skewed_keys(spark):
    """Zipf-flavored synthetic stream: key i appears ~1000/i times,
    200 distinct keys, ~1175 rows; forced onto 7 partitions."""
    rows = [(f"key{i:03d}",) for i in range(1, 201) for _ in range(1000 // (i * 5) + 1)]
    return spark.createDataFrame(rows, "k string").repartition(7)


def _exact_counts(df):
    return {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_cms_never_underestimates_under_collisions(spark):
    """est(k) >= true(k) for EVERY key, even at W=16 where 200 keys
    collide heavily — counts only collide upward."""
    df = _skewed_keys(spark)
    exact = _exact_counts(df)
    sketch = cms_sketch(df, d=3, w=16)
    allk = df.select("k").distinct()
    est = {r["k"]: r["est"] for r in cms_estimate(allk, sketch, d=3, w=16).collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact), {
        k: (est[k], exact[k]) for k in exact if est[k] < exact[k]
    }


def test_cms_error_bound(spark):
    """est(k) <= true(k) + eps*N with eps = e/W: the textbook bound,
    checked exactly on this corpus at a geometry (d=5, W=64) where the
    probabilistic guarantee has real slack to cover."""
    import math

    df = _skewed_keys(spark)
    exact = _exact_counts(df)
    n = sum(exact.values())
    w = 64
    eps = math.e / w
    sketch = cms_sketch(df, d=5, w=w)
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(df.select("k").distinct(), sketch, d=5, w=w).collect()
    }
    viol = {k: (est[k], exact[k]) for k in exact if est[k] > exact[k] + eps * n}
    assert not viol, f"CMS bound violated for {len(viol)} keys: {viol}"


def test_cms_sketches_merge_losslessly(spark):
    """sum of two half-stream sketches over (seed, bucket) == the
    whole-stream sketch, bit-for-bit — the re-aggregation property the
    module docstring sells (daily -> monthly without rescanning)."""
    df = _skewed_keys(spark).withColumn(
        "half", (F.xxhash64("k") % 2 == 0).cast("int")
    )
    whole = cms_sketch(df, d=3, w=32).orderBy("seed", "bucket").collect()
    parts = [
        cms_sketch(df.filter(F.col("half") == i).select("k"), d=3, w=32)
        for i in (0, 1)
    ]
    merged = (
        parts[0]
        .unionByName(parts[1])
        .groupBy("seed", "bucket")
        .agg(F.sum("c").alias("c"))
        .orderBy("seed", "bucket")
        .collect()
    )
    assert [tuple(r) for r in merged] == [tuple(r) for r in whole]


def test_pigeonhole_candidates_have_exact_recall(spark):
    """Every globally phi-heavy key is emitted by the shuffle-free
    per-partition candidate pass, under an ADVERSARIAL partitioning
    that spreads each key across all partitions (round-robin), the
    worst case for a local-threshold recall claim."""
    df = _skewed_keys(spark).repartition(11)  # round-robin spread
    exact = _exact_counts(df)
    n = sum(exact.values())
    phi = 0.02
    heavy = {k for k, c in exact.items() if c >= phi * n}
    assert heavy, "corpus must contain phi-heavy keys for the test to bite"
    cand = {r["k"] for r in local_heavy_candidates(df, phi).collect()}
    assert heavy <= cand, f"missed heavy keys: {heavy - cand}"


def test_query_matches_exact_twin_at_t2(spark):
    """At the declared geometry (W=1024 >> 150 users) the sketch is
    collision-free, so q_topk_frequent must equal the exact twin's
    top-20 exactly — pins the two declared queries to each other."""
    from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

    qs = all_queries()
    sk = qs["q_topk_frequent"].fn(spark, SF_T2).toPandas()
    ex = qs["q_topk_frequent_exact"].fn(spark, SF_T2).toPandas()
    pd.testing.assert_frame_equal(
        sk.rename(columns={"est_events": "n_events"}), ex, check_exact=True
    )


def test_cms_xengine_collisions_are_exercised(spark):
    """The cross-engine CMS twin runs at W=64 precisely so collisions
    are REAL at sf0.01: every estimate must still be >= exact (the
    one-sided CMS theorem the `overestimates` column carries into the
    driver hash), and at least one top-20 estimate must strictly
    exceed its exact count — otherwise the parity only proves the
    collision-free identity case."""
    from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

    df = all_queries()["q_topk_frequent_xengine"].fn(spark, SF_T2).toPandas()
    assert bool(df["overestimates"].all())
    assert (df["est_events"] >= df["n_exact"]).all()
    assert (df["est_events"] > df["n_exact"]).any(), (
        "W=64 geometry produced zero collisions — the parity is vacuous"
    )


def test_hll_xengine_estimate_and_merge(spark):
    """The cross-engine HLL twin: raw harmonic estimate within the
    3-sigma HLL bound (sigma = 1.04/sqrt(m) = 26% at m=16) of the
    exact distinct count, the hash-parity-half merge is LOSSLESS
    (est_merged identical to est — greatest of per-half maxima equals
    the max over the union), and all 16 registers are touched at
    n=1500 so the (m - nz) empty-register term is not silently
    untested elsewhere."""
    from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

    row = (
        all_queries()["q_sketch_hll_xengine"].fn(spark, SF_T2).toPandas().iloc[0]
    )
    rel_err = abs(row["est"] - row["n_exact"]) / row["n_exact"]
    assert rel_err <= 3 * 1.04 / 4.0, f"rel_err {rel_err:.3f} outside 3-sigma"
    assert row["est_merged"] == row["est"]
    assert row["nonzero_registers"] == 16
