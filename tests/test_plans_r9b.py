"""Plan pins for the round-9 pack O–W heavies: the scale properties
each docstring claims (map-side explode fan-outs, equi wedge joins,
shuffle-free moment pivots, join-free indicator chains, bounded
greedy stages) must be visible in the physical plan, not assumed."""

from __future__ import annotations

from conftest import SF_T2  # noqa: F401  (session fixture wiring)
from test_plans import plan_of


def test_minhash_error_is_all_equi_and_exploded(spark):
    # the seed fan-out must be a Generate (map-side explode of a
    # literal sequence), never a join; every join in the pair
    # evaluation is equi — no nested loop anywhere
    p = plan_of(spark, "q_dedup_minhash_error")
    assert "Generate" in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_clustering_coeff_wedge_join_is_equi(spark):
    # the wedge join rides the shared-center equi key (plus the a<b
    # filter); the canonical-edge close is another equi join — no
    # nested loop in the whole triangle pass
    p = plan_of(spark, "q_graph_clustering_coeff")
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert "HashAggregate" in p, p


def test_welch_t_single_pass_no_window(spark):
    # the two-group moment pivot is ONE map-side-combined aggregation:
    # no window operator, no hash exchange (the q_stats_anova pin)
    p = plan_of(spark, "q_stats_welch_t")
    assert "Window" not in p, p
    assert "hashpartitioning" not in p, p


def test_friedman_ranks_without_window(spark):
    # doubled midranks come from unrolled pairwise CASE comparisons —
    # the plan must carry NO window operator, and exactly one (user)
    # exchange for the block pivot
    p = plan_of(spark, "q_stats_friedman")
    assert "Window" not in p, p
    assert p.count("hashpartitioning(user_id") == 1, p


def test_aroon_is_join_free(spark):
    # the argmax-key trick replaces the "bars since high" self-join:
    # windows only, zero joins of any kind
    p = plan_of(spark, "q_window_aroon")
    assert "Join" not in p, p
    assert "Window" in p, p


def test_mmr_greedy_stages_stay_bounded(spark):
    # the pool is a TakeOrderedAndProject (top-20 by relevance); the
    # only nested loops are the declared 1-row query cross and the
    # pool-pair sim matrix; no row-at-a-time Python anywhere
    p = plan_of(spark, "q_sim_mmr")
    assert "TakeOrderedAndProject" in p, p
    assert "BatchEvalPython" not in p, p


def test_markov_iterations_are_broadcast_joins(spark):
    # each power-iteration step joins the k²-row transition census
    # against the k-row pi vector — broadcast-hash, never shuffled
    # wide; the only nested loops are the two allowlisted 1-row
    # type-count scalar crosses (2 nodes = 4 formatted-plan mentions)
    p = plan_of(spark, "q_events_markov_power")
    assert "BroadcastHashJoin" in p, p
    assert p.count("BroadcastNestedLoopJoin") <= 4, p
