"""The reference's SQL mini-frontend, compiled to DataFrame plans.

The reference recognizes exactly two query shapes [spec: SURVEY.md §3.1
entry point 2 — MP4 assignment, source unavailable] and compiles each to
a maple/juice exe pair:

  1. ``SELECT ALL FROM <Dataset> WHERE <regex>``
     — filter: lines matching the regex anywhere (maple = grep,
       juice = identity).
  2. ``SELECT ALL FROM <D1>, <D2> WHERE <D1>.<fieldA> = <D2>.<fieldB>``
     — inner equi-join with per-key cross product (maple = tag by key,
       juice = per-key cross product).

Here the same two shapes compile to Catalyst logical plans instead of
exe pairs — filter pushdown, join-strategy selection, and AQE come for
free, which is the whole point of building Spark-first.  The regex
filter applies to the "raw line" like the reference: we render each row
as a delimited line (concat_ws over all columns) and RLIKE it, unless
the table has a natural text column (documents.text).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import table as load_table

_FILTER_RE = re.compile(
    r"^\s*SELECT\s+ALL\s+FROM\s+(\w+)\s+WHERE\s+(.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_JOIN_RE = re.compile(
    r"^\s*SELECT\s+ALL\s+FROM\s+(\w+)\s*,\s*(\w+)\s+WHERE\s+"
    r"(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$",
    re.IGNORECASE,
)

#: tables whose "line" is a single natural text column
_TEXT_COLUMN = {"documents": "text"}


@dataclass(frozen=True)
class MapleJuiceQuery:
    kind: str  # "filter" | "join"
    dataset: Optional[str] = None
    regex: Optional[str] = None
    left: Optional[str] = None
    right: Optional[str] = None
    left_field: Optional[str] = None
    right_field: Optional[str] = None


def parse_maplejuice_sql(query: str) -> MapleJuiceQuery:
    m = _JOIN_RE.match(query)
    if m:
        d1, d2, t1, f1, t2, f2 = m.groups()
        if d1.lower() == d2.lower():
            # the grammar has no aliases, so a self-join is inherently
            # ambiguous — and the name-keyed dict below would silently
            # collapse both join fields to the second one (review r12)
            raise ValueError(
                f"self-join on '{d1.lower()}' is not expressible: the "
                "MapleJuice frontend has no table aliases [spec: A6 "
                "joins two distinct datasets]"
            )
        pairs = {t1.lower(): f1, t2.lower(): f2}
        if set(pairs) != {d1.lower(), d2.lower()}:
            raise ValueError(
                f"join condition references {sorted(pairs)} but FROM lists "
                f"{[d1.lower(), d2.lower()]}"
            )
        return MapleJuiceQuery(
            kind="join",
            left=d1.lower(),
            right=d2.lower(),
            left_field=pairs[d1.lower()],
            right_field=pairs[d2.lower()],
        )
    m = _FILTER_RE.match(query)
    if m:
        dataset, regex = m.groups()
        return MapleJuiceQuery(kind="filter", dataset=dataset.lower(), regex=regex)
    raise ValueError(
        "unsupported query; the MapleJuice frontend accepts "
        "'SELECT ALL FROM <ds> WHERE <regex>' or "
        "'SELECT ALL FROM <d1>, <d2> WHERE <d1>.<f> = <d2>.<f>'"
    )


def _as_line(df: DataFrame, name: str) -> DataFrame:
    """Render rows as the reference's delimited text lines.  Each
    column is coalesced to '' BEFORE concat_ws: both Spark's and
    DuckDB's concat_ws silently SKIP null arguments (dropping the
    delimiter too), which would shift field positions for rows with
    nulls — a delimited text line keeps an empty field's delimiter
    (review r12; the q_maplejuice_sql_filter oracle coalesces
    identically)."""
    if name in _TEXT_COLUMN:
        return df.withColumn("_line", F.col(_TEXT_COLUMN[name]))
    return df.withColumn(
        "_line",
        F.concat_ws(
            "|",
            *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns],
        ),
    )


def run_maplejuice_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Execute a MapleJuice SQL string against the testdata tables."""
    q = parse_maplejuice_sql(query)
    if q.kind == "filter":
        df = load_table(spark, sf_dir, q.dataset)
        # find-anywhere regex on the rendered line, like the
        # reference's grep-style maple_exe (Spark RLIKE is unanchored).
        return _as_line(df, q.dataset).filter(F.col("_line").rlike(q.regex)).drop("_line")
    left = load_table(spark, sf_dir, q.left).alias("l")
    right = load_table(spark, sf_dir, q.right).alias("r")
    cond = F.col(f"l.{q.left_field}") == F.col(f"r.{q.right_field}")
    # inner equi-join; duplicate keys produce the per-key cross product,
    # identical to the reference's juice-side nested loop [spec: A6].
    return left.join(right, cond, "inner")
