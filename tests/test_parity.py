"""Local simulation of the driver's t2 gate: run every registered query
on Spark at sf0.01 AND its DuckDB oracle, compare row-count + schema
(column names) + values (order-insensitive).

This is deliberately STRICTER than the driver: with the exact-decimal
aggregation discipline (functions/parity.py) float results should be
bit-identical, so the default comparison is exact; specs may declare a
small atol for genuinely non-bit-exact ops (e.g. cosine similarity
where DuckDB computes in float32).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

from conftest import SF_T2

SPECS = list(all_queries().values())


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all columns; normalize dtypes."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]) and not df[c].isna().any():
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].where(df[c].notna(), "\x00NULL").astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, atol: float):
    assert len(spark_pdf) == len(duck_pdf), (
        f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"columns: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    )
    # STRICT dtype parity pre-normalization: a width/resolution skew
    # (int32 vs int64, ns vs µs timestamps, HUGEINT promotion) reads as
    # a schema difference to a strict driver comparator even when the
    # values match
    for c in spark_pdf.columns:
        assert str(spark_pdf[c].dtype) == str(duck_pdf[c].dtype), (
            f"dtype of {c!r}: spark={spark_pdf[c].dtype} duck={duck_pdf[c].dtype}"
        )
    s = canonicalize(spark_pdf)
    d = canonicalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            a = sv.to_numpy(dtype="float64")
            b = dv.to_numpy(dtype="float64")
            both_nan = np.isnan(a) & np.isnan(b)
            diff = np.abs(a - b)
            diff[both_nan] = 0.0
            maxdiff = float(np.nanmax(diff)) if len(diff) else 0.0
            if atol == 0.0:
                assert np.array_equal(
                    a[~both_nan], b[~both_nan]
                ), f"column {c!r} not bit-identical; max |diff| = {maxdiff:g}"
            else:
                assert maxdiff <= atol, f"column {c!r} max |diff| = {maxdiff:g} > atol={atol:g}"
        else:
            eq = sv.eq(dv) | (sv.isna() & dv.isna())
            assert eq.all(), (
                f"column {c!r} mismatch at rows {list(eq[~eq].index[:5])}:"
                f" spark={sv[~eq].head(3).tolist()} duck={dv[~eq].head(3).tolist()}"
            )


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spark, duck, spec):
    sdf = spec.fn(spark, SF_T2)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert len(spark_pdf) >= 0
        assert len(spark_pdf.columns) > 0
        return
    duck_pdf = duck.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, spec.atol)


def test_entry_smoke(spark):
    from cs425_distributed_systems_mp4_mapreduce_spark.api import entry

    df = entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert not math.isnan(rows[0]["revenue"])


def test_stddev_singleton_group_null_both_engines(spark):
    """Review r12: stddev_from's unguarded (n-1) division aborted the
    whole job under Spark 4 ANSI mode for any 1-row group, where
    builtin stddev_samp yields NULL.  Both the Spark helper and the
    DuckDB twin must now agree on NULL for singletons and on the
    value for real groups."""
    import duckdb

    from cs425_distributed_systems_mp4_mapreduce_spark.functions.parity import (
        dstddev_cols,
        o_dstddev,
        stddev_from,
    )

    df = spark.createDataFrame(
        [("a", 1.00), ("b", 2.00), ("b", 4.00)], "g string, v double"
    )
    sx, sx2, n = dstddev_cols("v")
    got = {
        r["g"]: r["sd"]
        for r in df.groupBy("g")
        .agg(stddev_from(sx, sx2, n).alias("sd"))
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES ('a', 1.00), ('b', 2.00), ('b', 4.00)) v(g, v)")
    want = {
        g: sd
        for g, sd in con.execute(
            f"SELECT g, {o_dstddev('v', 'sd')} FROM t GROUP BY g"
        ).fetchall()
    }
    assert got["a"] is None and want["a"] is None
    assert got["b"] == want["b"] and abs(got["b"] - 2**0.5) < 1e-12
