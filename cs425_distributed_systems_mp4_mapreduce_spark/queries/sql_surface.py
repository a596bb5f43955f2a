"""The spark.sql surface: one declared query executed as literal SQL
text over registered temp views — proving a reference user could bring
plain SQL (not just the DataFrame API) and get the same Catalyst plans.
The SQL string is shared with the DuckDB oracle, modulo the
decimal-parity sum macro."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.parity import o_dsum, s_dsum
from ..registry import query
from ..sources.tables import load_tables

_SQL = """
    SELECT c_mktsegment,
           n_name,
           COUNT(DISTINCT o_orderkey) AS n_orders,
           {rev}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderstatus <> 'P'
    GROUP BY c_mktsegment, n_name
    ORDER BY c_mktsegment, n_name
"""


@query(
    "q_sql_surface",
    oracle=_SQL.format(rev=o_dsum("l_extendedprice * (1 - l_discount)", "revenue")),
)
def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by (segment, nation) — THE SAME SQL text runs on Spark
    (temp views) and DuckDB (parquet views); the only difference is the
    dialect name of the string type inside the parity cast (STRING vs
    VARCHAR).  Filter pushdown/join selection all come from Catalyst
    exactly as in the DataFrame forms."""
    load_tables(spark, sf_dir)
    return spark.sql(
        _SQL.format(rev=s_dsum("l_extendedprice * (1 - l_discount)", "revenue"))
    )


_CORR_SQL = """
    SELECT c1.c_custkey, c1.c_nationkey, c1.c_acctbal
    FROM customer c1
    WHERE c1.c_acctbal > (
        SELECT {cast_open}SUM(CAST(c2.c_acctbal AS DECIMAL(18,6))){cast_close}
               / COUNT(c2.c_acctbal)
        FROM customer c2
        WHERE c2.c_nationkey = c1.c_nationkey)
    ORDER BY c1.c_custkey
"""


@query(
    "q_subquery_correlated",
    oracle=_CORR_SQL.format(
        cast_open="CAST(CAST(", cast_close=" AS VARCHAR) AS DOUBLE)"
    ),
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their nation's
    average balance.  Catalyst DECORRELATES this into an aggregate +
    join (no per-row re-execution) — the rewrite the reference's
    frontend had no notion of [spec: SURVEY §4.2 'subquery
    decorrelation'].  The subquery's average uses the decimal parity
    form so the comparison boundary is identical on both engines."""
    load_tables(spark, sf_dir)
    return spark.sql(
        _CORR_SQL.format(cast_open="CAST(CAST(", cast_close=" AS STRING) AS DOUBLE)")
    )


@query(
    "q_udtf_wordcount",
    oracle="""
    SELECT w AS word, COUNT(*) AS n
    FROM (SELECT UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> '')) AS w
          FROM documents WHERE text IS NOT NULL AND text <> '')
    GROUP BY w ORDER BY word
    """,
)
def q_udtf_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordCount through a Python UDTF (Spark 4 table function): the
    maple phase (line → words) runs as a LATERAL table function inside
    SQL, the juice phase is a plain GROUP BY — driver-verified against
    a pure-SQL UNNEST oracle, so the Arrow UDTF expansion itself is
    value-checked, not just unit-tested.

    At scale the UDTF is a per-partition Arrow pipe (no shuffle before
    the GROUP BY, partial aggregation after) — same shape as the
    explode() form, with the flexibility of arbitrary Python row
    expansion the reference's maple API promised."""
    from ..functions.udtfs import SplitWords

    spark.udtf.register("split_words", SplitWords)
    load_tables(spark, sf_dir)
    return spark.sql(
        "SELECT word, COUNT(*) AS n"
        " FROM documents, LATERAL split_words(text)"
        " GROUP BY word ORDER BY word"
    )
