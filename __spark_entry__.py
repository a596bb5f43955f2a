"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``cs425_distributed_systems_mp4_mapreduce_spark``
package (registry: ``registry.py``; query modules: ``queries/``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cs425_distributed_systems_mp4_mapreduce_spark.api import (  # noqa: E402,F401
    entry,
    oracle_sql,
    queries,
)
