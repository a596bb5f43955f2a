"""The bench's production-form (double-sum) variants must compute the
same result as their declared decimal-parity twins — same rows, values
within float-summation noise."""

from __future__ import annotations

import numpy as np
import pytest

from cs425_distributed_systems_mp4_mapreduce_spark.queries.fast_variants import (
    FAST_VARIANTS,
)
from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries
from conftest import SF_T2


@pytest.mark.parametrize("name", sorted(FAST_VARIANTS))
def test_fast_variant_matches_declared(spark, name):
    fast = FAST_VARIANTS[name](spark, SF_T2).toPandas()
    slow = all_queries()[name].fn(spark, SF_T2).toPandas()
    assert sorted(fast.columns) == sorted(slow.columns)
    assert len(fast) == len(slow)
    cols = sorted(fast.columns)
    # align rows on NON-float keys only — float sums differ by ulps
    # between the two accumulator types, which would scramble a sort
    keys = [c for c in cols if fast[c].dtype.kind != "f"]
    f = fast[cols].sort_values(keys).reset_index(drop=True)
    s = slow[cols].sort_values(keys).reset_index(drop=True)
    for c in cols:
        a, b = f[c].to_numpy(), s[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b, rtol=1e-9, atol=1e-6), (name, c)
        else:
            assert (a == b).all(), (name, c)
