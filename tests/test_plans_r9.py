"""Plan pins for the round-9 pack I/J/K heavies: the scale properties
each docstring claims (bucketed equi band join, broadcast-hash rule
enrichment with a TakeOrdered top-N, shuffle-free moment pivots,
census-bounded nested loops ONLY where declared) must be visible in
the physical plan, not assumed."""

from __future__ import annotations

from conftest import SF_T2  # noqa: F401  (session fixture wiring)
from test_plans import plan_of


def test_band_join_is_equi_not_nested_loop(spark):
    # the whole point of the width-δ bucketing: the |Δ| ≤ δ predicate
    # must ride an EQUI join on the bucket key, never a nested loop
    p = plan_of(spark, "q_join_band")
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p, p


def test_kendall_nested_loop_is_the_declared_census_pair(spark):
    # tau's O(days²) pair table IS a nested loop — but over the
    # calendar-bounded census only: exactly one BNLJ, and the fact
    # scan aggregates (map-side combine) before it
    p = plan_of(spark, "q_stats_kendall")
    # formatted plans mention each node twice (tree line + detail
    # section) -> exactly ONE physical BNLJ node
    assert p.count("BroadcastNestedLoopJoin") == 2, p
    assert "HashAggregate" in p, p


def test_rules_topn_is_take_ordered(spark):
    # the top-50 by lift must be a TakeOrderedAndProject (streaming
    # top-k per partition + driver merge), never a global sort
    # materialization; the only allowed nested loop is the allowlisted
    # 1-row basket-count scalar broadcast
    p = plan_of(spark, "q_rules_association")
    assert "TakeOrderedAndProject" in p, p
    # one node = two formatted-plan mentions: only the allowlisted
    # 1-row scalar cross may nest-loop
    assert p.count("BroadcastNestedLoopJoin") <= 2, p


def test_anova_single_pass_no_window(spark):
    # the moment pivot is ONE map-side-combined aggregation: no window
    # operator, no hash exchange wider than the 1-row final aggregate
    p = plan_of(spark, "q_stats_anova")
    assert "Window" not in p, p
    assert "hashpartitioning" not in p, p


def test_cramers_v_no_cartesian(spark):
    # zero cells come from exploding the FIXED segment domain per
    # nation — the plan must carry a Generate (explode), and no
    # cartesian/nested-loop join anywhere
    p = plan_of(spark, "q_stats_cramers_v")
    assert "Generate" in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_trigrams_single_user_exchange_and_topn(spark):
    # two LAGs ride ONE (user) hash exchange; the path census top-N is
    # a TakeOrderedAndProject
    p = plan_of(spark, "q_events_trigrams")
    assert "TakeOrderedAndProject" in p, p
    assert p.count("hashpartitioning(user_id") == 1, p


def test_bounce_shares_sessionize_shape(spark):
    # the session pass must stay on one (user, time) exchange: both
    # windows and the per-session aggregate reuse a single user_id
    # hash partitioning (the q_events_sessionize pin), plus one more
    # for the calendar-bounded daily rollup
    p = plan_of(spark, "q_events_bounce")
    assert p.count("hashpartitioning(user_id") == 1, p
