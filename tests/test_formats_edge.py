"""Adversarial interchange roundtrips: the values that break naive
CSV/JSON pipelines — NaN / ±Inf / −0.0 doubles, unicode, embedded
newlines, quotes, delimiters, empty strings vs NULLs — must survive
write→read bit-for-bit (or be documented as unrepresentable).  ORC is
columnar/typed so everything must survive; CSV needs quoting +
multiLine on read; JSONL needs nothing special except NaN/Inf opt-ins.
"""

from __future__ import annotations

import math

import pytest

NASTY_ROWS = [
    (1, "plain", 1.5),
    (2, "comma, inside", -0.0),
    (3, 'quote " inside', float("nan")),
    (4, "newline\ninside", float("inf")),
    (5, "tab\tand unicode: héllo wörld — ≤≥ 中文 🎉", float("-inf")),
    (6, "", 0.0),
    (7, None, None),
    (8, "trailing space ", 1e300),
    (9, "\\backslash\\", 5e-324),  # min subnormal double
]
SCHEMA = "id long, s string, x double"


def _df(spark):
    return spark.createDataFrame(NASTY_ROWS, SCHEMA)


def _assert_same(back_rows):
    got = {r["id"]: (r["s"], r["x"]) for r in back_rows}
    assert set(got) == {r[0] for r in NASTY_ROWS}
    for rid, s, x in NASTY_ROWS:
        gs, gx = got[rid]
        assert gs == s, (rid, repr(gs), repr(s))
        if x is None:
            assert gx is None, (rid, gx)
        elif math.isnan(x):
            assert math.isnan(gx), (rid, gx)
        else:
            assert gx == x and math.copysign(1, gx) == math.copysign(1, x), (
                rid, gx, x,
            )


def test_orc_roundtrip_nasty(spark, tmp_path):
    from cs425_distributed_systems_mp4_mapreduce_spark.sources.formats import (
        read_orc,
        write_orc,
    )

    p = str(tmp_path / "nasty_orc")
    write_orc(_df(spark), p)
    _assert_same(read_orc(spark, p).collect())


def test_csv_roundtrip_nasty(spark, tmp_path):
    from cs425_distributed_systems_mp4_mapreduce_spark.sources.formats import (
        read_csv,
        write_csv,
    )

    p = str(tmp_path / "nasty_csv")
    write_csv(_df(spark), p)
    _assert_same(read_csv(spark, p, SCHEMA, multiline=True).collect())


def test_jsonl_roundtrip_nasty(spark, tmp_path):
    from cs425_distributed_systems_mp4_mapreduce_spark.sources.formats import (
        read_json,
        write_json,
    )

    p = str(tmp_path / "nasty_jsonl")
    write_json(_df(spark), p)
    _assert_same(read_json(spark, p, SCHEMA).collect())
