"""Every registered query must RUN at the smoke scale (sf0.001).

The parity suite proves correctness at sf0.01; this sweep catches the
degenerate-data failure class that scale hides: empty groups, zero
candidate pairs, single-value min==max normalizations, one-row
windows.  A query that crashes on tiny data would crash the driver's
smoke phase — and "works only when there's enough data" is a latent
bug at ANY scale (a filtered partition can be empty on a real
cluster too).
"""

from __future__ import annotations

import pytest

from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries
from conftest import SF_SMOKE


@pytest.mark.slow
def test_every_query_runs_at_smoke_scale(spark):
    failures = []
    for name, spec in all_queries().items():
        try:
            spec.fn(spark, SF_SMOKE).count()
        except Exception as ex:  # noqa: BLE001 - collecting all failures
            failures.append((name, str(ex).splitlines()[0][:140]))
    assert not failures, failures
