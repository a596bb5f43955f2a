#!/usr/bin/env python
"""Dump .explain("formatted") for headline queries (bench form — the
FAST_VARIANTS production twin where one exists — plus the declared form
when they differ) into plans/r14/<query>_<suffix>.txt.

Usage: python scripts/capture_plans_r14.py before|after [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cs425_distributed_systems_mp4_mapreduce_spark.queries.fast_variants import (  # noqa: E402
    FAST_VARIANTS,
)
from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries  # noqa: E402
from cs425_distributed_systems_mp4_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    headline = {n: s for n, s in all_queries().items() if s.headline}
    for name, spec in sorted(headline.items()):
        if only and name not in only:
            continue
        fn = FAST_VARIANTS.get(name, spec.fn)
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        parts = [f"== {name} (bench form) ==\n\n{plan}"]
        if name in FAST_VARIANTS:
            ddf = spec.fn(spark, sf_dir)
            dplan = ddf._sc._jvm.PythonSQLUtils.explainString(
                ddf._jdf.queryExecution(), "formatted"
            )
            parts.append(f"\n\n== {name} (declared decimal-parity form) ==\n\n{dplan}")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write("".join(parts))
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
