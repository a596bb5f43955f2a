"""Iterative operators must keep their plan FLAT across rounds
(VERDICT r3 item 6).

The localCheckpoint discipline in operators/graph.py exists because a
driver-side DataFrame loop otherwise doubles its logical plan every
round — Catalyst analysis time explodes after ~10 rounds and a 50-round
CC run never finishes planning.  These tests pin that discipline: the
ANALYZED-plan node count of the loop's result must be identical no
matter how many rounds executed (from round 2 onward every round's
output is a LogicalRDD scan of the previous checkpoint, so the tree
shape is round-count-invariant).  Deleting a localCheckpoint makes the
high-iteration plan strictly larger and these fail.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

from cs425_distributed_systems_mp4_mapreduce_spark.operators.graph import (
    connected_components,
    connected_components_star,
    pagerank,
)


def _plan_nodes(df) -> int:
    """Node count of the analyzed logical plan (stable metric; string
    length varies with RDD ids embedded in LogicalRDD names)."""
    qe = df._jdf.queryExecution()
    return int(qe.analyzed().treeString().count("\n")) + 1


def _chain(spark, n: int):
    """Path graph 0-1-2-...-n-1: worst case for min-label (needs n-1
    rounds), so low/high max_iter genuinely execute different counts."""
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )


def test_connected_components_plan_flat_across_rounds(spark):
    edges = _chain(spark, 16)
    # strict=False: the truncated 3-round run is DELIBERATE here (it
    # measures plan flatness, and the non-convergence assertion below
    # is the point); production callers get the strict raise instead
    few = connected_components(edges, max_iter=3, strict=False)
    # 17, not 15: the 16-chain needs 15 propagation rounds PLUS one
    # changed==0 verification round before strict can prove convergence
    many = connected_components(edges, max_iter=17)
    assert _plan_nodes(few) == _plan_nodes(many), (
        "CC plan grew with iteration count — localCheckpoint lineage "
        "truncation is broken"
    )
    # and the extra rounds did real work: 15 rounds fully converge the
    # 16-chain to one component, 3 rounds cannot
    assert many.select("component").distinct().count() == 1
    assert few.select("component").distinct().count() > 1


def test_connected_components_star_plan_flat_across_rounds(spark):
    edges = _chain(spark, 32)
    few = connected_components_star(edges, max_iter=1, strict=False)
    many = connected_components_star(edges, max_iter=50)
    assert _plan_nodes(few) == _plan_nodes(many), (
        "star-CC plan grew with iteration count — localCheckpoint "
        "lineage truncation is broken"
    )
    assert many.select("component").distinct().count() == 1


def test_pagerank_plan_flat_across_iterations(spark):
    edges = spark.createDataFrame(
        [(i, (i + 1) % 10) for i in range(10)], "src long, dst long"
    )
    few = pagerank(edges, iterations=2)
    many = pagerank(edges, iterations=8)
    assert _plan_nodes(few) == _plan_nodes(many), (
        "PageRank plan grew with iteration count — localCheckpoint "
        "lineage truncation is broken"
    )
    # sanity: ranks on a 10-cycle are uniform and sum to 1
    total = sum(r["rank"] for r in many.collect())
    assert abs(total - 1.0) < 1e-9
