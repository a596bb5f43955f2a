"""Mini-t2 on an ADVERSARIAL documents corpus: the driver's parity
gate only ever sees the generated testdata, so cross-engine text
semantics (Java vs DuckDB regex/split/lower behavior on unicode,
emoji, CJK, zero-width characters, huge tokens, repeated separators)
are untested by it.  This harness writes a nasty documents.parquet and
runs each text-family query's Spark form AND its DuckDB oracle over
the SAME directory — any divergence is a real latent parity bug that
would surface the day the corpus stops being ASCII.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

NASTY_DOCS = [
    (0, "plain ascii words here", "en", "src0"),
    (1, "héllo wörld naïve café résumé", "fr", "src0"),
    (2, "中文 文本 分析 中文", "zh", "src1"),
    (3, "emoji 🎉 in 🎉 text 🎉", "en", "src1"),
    (4, "MiXeD CaSe MIXED mixed case", "en", "src2"),
    (5, "a b a b a b a b", "en", "src2"),
    (6, "single", "en", "src3"),
    (7, "tab\tseparated\tnot\tspace", "en", "src3"),
    (8, "trailing space ", "en", "src4"),
    (9, "quote\"and'apostrophe", "en", "src4"),
    (10, "ünïcödé ünïcödé dedup ünïcödé", "de", "src5"),
    (11, "x" * 500 + " tiny", "en", "src5"),
    (12, "plain ascii words here", "en", "src6"),  # exact dup of 0
]

#: text-family queries whose Spark form and oracle must agree on ANY
#: corpus, not just the generated one
QUERIES = [
    "q_text_tokens",
    "q_text_bigrams",
    "q_text_fingerprint",
    "q_dedup_exact",
    "q_text_selfinfo",
    "q_maplejuice_wordcount",
]


@pytest.fixture(scope="module")
def nasty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nasty_corpus")
    pdf = pd.DataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in NASTY_DOCS],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["n_chars"].astype("int64")
    pdf.to_parquet(d / "documents.parquet")
    return str(d)


def _vhash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1).round(9)
    rows = sorted(df.astype(str).apply("|".join, axis=1))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", QUERIES)
def test_text_query_parity_on_adversarial_corpus(spark, nasty_dir, name):
    spec = all_queries()[name]
    got = spec.fn(spark, nasty_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{nasty_dir}/documents.parquet')"
    )
    want = con.execute(spec.oracle).df()
    assert len(got) == len(want), (name, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), name
    assert _vhash(got) == _vhash(want), (
        f"{name}: engines diverge on adversarial text\n"
        f"spark:\n{got.head(20)}\nduck:\n{want.head(20)}"
    )
