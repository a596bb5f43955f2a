"""Schema-drift tripwire (VERDICT r3 item 2).

The driver regenerates /root/testdata between rounds; a silent schema
change (events.ts ns->us between r2 and r3) previously cost a chunk of
a round to diagnose. This file collects FIRST (test_00_ prefix) and
asserts every table's parquet footer schema and row count against the
values recorded in FIXTURES.md, failing with a readable diff.

Pure pyarrow — no SparkSession — so it runs in milliseconds and a
drift is a 1-minute diagnosis, not an hour of chasing downstream
parity failures.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA_ROOT", "/root/testdata")

# (column, arrow type string) per table — authoritative, from FIXTURES.md.
# NOTE: events.ts was timestamp[ns] in rounds 1-2, timestamp[us] since the
# round-3 regeneration. sources/tables.normalize_events absorbs either.
EXPECTED_SCHEMAS = {
    "region": [("r_regionkey", "int32"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int32"),
        ("n_name", "string"),
        ("n_regionkey", "int32"),
    ],
    "supplier": [
        ("s_suppkey", "int64"),
        ("s_name", "string"),
        ("s_nationkey", "int32"),
        ("s_acctbal", "double"),
    ],
    "customer": [
        ("c_custkey", "int64"),
        ("c_name", "string"),
        ("c_nationkey", "int32"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "part": [
        ("p_partkey", "int64"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int32"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "int64"),
        ("o_custkey", "int64"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", ("timestamp[us]", "timestamp[ms]", "timestamp[ns]")),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "int64"),
        ("l_partkey", "int64"),
        ("l_suppkey", "int64"),
        ("l_linenumber", "int32"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", ("timestamp[us]", "timestamp[ms]", "timestamp[ns]")),
    ],
    "events": [
        ("event_id", "int64"),
        # either clock is absorbed by normalize_events; anything ELSE
        # (e.g. int64 epoch, string) is a drift worth failing loudly on
        ("ts", ("timestamp[us]", "timestamp[ms]", "timestamp[ns]")),
        ("user_id", "int64"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "int64"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "int64"),
    ],
    "embeddings": [
        ("vec_id", "int64"),
        ("embedding", "list<element: float>"),
        ("label", "int32"),
    ],
}

# Row counts per FIXTURES.md. A count change alone (same schema) shifts
# every oracle hash, so it must also fail fast and visibly.
EXPECTED_ROWS = {
    "sf0.001": {
        "region": 5, "nation": 25, "supplier": 10, "customer": 150,
        "part": 200, "orders": 1500, "lineitem": 6000, "events": 1000,
        "documents": 500, "embeddings": 500,
    },
    "sf0.01": {
        "region": 5, "nation": 25, "supplier": 100, "customer": 1500,
        "part": 2000, "orders": 15000, "lineitem": 60000, "events": 10000,
        "documents": 500, "embeddings": 500,
    },
    "sf0.1": {
        "region": 5, "nation": 25, "supplier": 1000, "customer": 15000,
        "part": 20000, "orders": 150000, "lineitem": 600000,
        "events": 100000, "documents": 5000, "embeddings": 2000,
    },
}

SF_DIRS = [sf for sf in EXPECTED_ROWS if os.path.isdir(os.path.join(TESTDATA, sf))]


def _footer(sf: str, table: str) -> pq.ParquetFile:
    path = os.path.join(TESTDATA, sf, f"{table}.parquet")
    if os.path.isdir(path):
        part = sorted(glob.glob(os.path.join(path, "*.parquet")))[0]
        return pq.ParquetFile(part)
    return pq.ParquetFile(path)


@pytest.mark.parametrize("sf", SF_DIRS)
def test_schemas_match_fixtures(sf):
    diffs = []
    for table, expected in EXPECTED_SCHEMAS.items():
        try:
            schema = _footer(sf, table).schema_arrow
        except Exception as exc:  # missing table is itself a drift
            diffs.append(f"{sf}/{table}: UNREADABLE ({exc})")
            continue
        actual = [(f.name, str(f.type)) for f in schema]
        if len(actual) != len(expected):
            diffs.append(
                f"{sf}/{table}: column count {len(actual)} != "
                f"{len(expected)}\n  actual:   {actual}\n  expected: {expected}"
            )
            continue
        for (a_name, a_type), (e_name, e_type) in zip(actual, expected):
            ok_types = e_type if isinstance(e_type, tuple) else (e_type,)
            if a_name != e_name or a_type not in ok_types:
                diffs.append(
                    f"{sf}/{table}.{e_name}: actual ({a_name!r}, {a_type!r}) "
                    f"!= expected ({e_name!r}, one of {ok_types})"
                )
    assert not diffs, (
        "TESTDATA SCHEMA DRIFT — the driver regenerated parquet with a new "
        "schema. Update FIXTURES.md + this test, then re-check oracle "
        "parity:\n" + "\n".join(diffs)
    )


@pytest.mark.parametrize("sf", SF_DIRS)
def test_row_counts_match_fixtures(sf):
    diffs = []
    for table, expected_n in EXPECTED_ROWS[sf].items():
        try:
            n = _footer(sf, table).metadata.num_rows
        except Exception as exc:
            diffs.append(f"{sf}/{table}: UNREADABLE ({exc})")
            continue
        if n != expected_n:
            diffs.append(f"{sf}/{table}: {n} rows != expected {expected_n}")
    assert not diffs, (
        "TESTDATA ROW-COUNT DRIFT (regenerated data — oracle hashes will "
        "differ for value-dependent fixtures):\n" + "\n".join(diffs)
    )
