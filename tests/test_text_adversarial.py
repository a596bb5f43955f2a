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
    # NFD text + its NFC twin: raw-distinct, identical after NFC
    (13, "cafe\u0301 re\u0301sume\u0301 nfd forms", "fr", "src7"),
    (14, "caf\u00e9 r\u00e9sum\u00e9 nfd forms", "fr", "src7"),
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
    "q_text_nfc",
    "q_dedup_simhash_xengine",
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


_SIG_SQL = """
SELECT list_reduce(list_prepend(0::BIGINT,
    list_transform(range(0,62), i ->
      IF(list_sum(list_transform(
           list_transform(string_split(t,' '), tok ->
             (list_reduce(list_prepend(0::BIGINT,
                 list_transform(range(1, length(tok)+1),
                                j -> ascii(substr(tok,j,1))::BIGINT)),
               (a,c) -> (a*31+c) % 2147483648) << 31)
             | list_reduce(list_prepend(1::BIGINT,
                 list_transform(range(1, length(tok)+1),
                                j -> ascii(substr(tok,j,1))::BIGINT)),
               (a,c) -> (a*37+c) % 2147483648)),
           h -> IF((h >> i) & 1 = 1, 1, -1))) > 0,
         1::BIGINT << i, 0::BIGINT))),
  (a,b) -> a | b) AS sig
FROM (SELECT ? AS t)
"""


def _xengine_sigs(spark, texts):
    from pyspark.sql import functions as F

    from cs425_distributed_systems_mp4_mapreduce_spark.operators.dedup import (
        simhash62_xengine,
    )

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(F.col("text"), simhash62_xengine("text").alias("sig")).collect()
    return {r.text: r.sig for r in rows}


def test_simhash_xengine_parity_unicode(spark):
    """Unicode tripwire for the cross-engine simhash
    (operators/dedup.simhash62_xengine): both engines walk CODEPOINTS
    in length/substr/ascii, so signatures must agree across every
    probed character class — including combining marks and ZWJ emoji
    sequences (all pinned with explicit \\u escapes; a terminal can
    silently normalize e+U+0301 to U+00E9 between invocations, which
    masquerades as an engine divergence).  If either engine moves to
    grapheme-cluster semantics this fails loudly instead of silently
    corrupting the q_dedup_simhash_xengine oracle."""
    texts = [
        "plain ascii words here",
        "h\u00e9llo na\u00efve caf\u00e9",      # precomposed accents
        "e\u0301 combining mark",                 # e + COMBINING ACUTE
        "\u65e5\u672c\u8a9e \u30c6\u30b9\u30c8",  # CJK
        "emoji \U0001f642 x",                     # single-codepoint emoji
        "zwj \U0001f469\u200d\U0001f4bb seq",   # multi-codepoint ZWJ emoji
    ]
    # NFC vs NFD are DIFFERENT codepoint sequences and must hash
    # differently on both sides (not an engine bug - a data property).
    nfc, nfd = "caf\u00e9", "cafe\u0301"
    con = duckdb.connect()
    spark_sigs = _xengine_sigs(spark, texts + [nfc, nfd])
    for t in texts:
        duck_sig = con.execute(_SIG_SQL, [t]).fetchone()[0]
        assert duck_sig == spark_sigs[t], f"cross-engine divergence on {t!r}"
    assert spark_sigs[nfc] != spark_sigs[nfd]
    assert (con.execute(_SIG_SQL, [nfc]).fetchone()[0]
            != con.execute(_SIG_SQL, [nfd]).fetchone()[0])


def test_nfc_audit_detects_denormalized_and_merges(spark, nasty_dir):
    """On the corpus with an NFD doc (13) and its NFC twin (14): the
    audit must count the denormalized doc AND show that normalization
    merges the pair (unique-after-NFC < raw doc count for fr)."""
    from cs425_distributed_systems_mp4_mapreduce_spark.queries.pipeline_ops import (
        q_text_nfc,
    )

    rows = {r.lang: r for r in q_text_nfc(spark, nasty_dir).collect()}
    fr = rows["fr"]
    assert fr.n_denormalized >= 1, "NFD doc not detected"
    assert fr.n_unique_nfc < fr.n_docs, "NFC merge did not deduplicate"


def _py_simhash62(text: str) -> int:
    """Pure-Python reference model of operators/dedup.simhash62_xengine
    — the third, engine-independent implementation; Spark and DuckDB
    must both match it."""
    def fold(tok, seed, mult):
        acc = seed
        for ch in tok:
            acc = (acc * mult + ord(ch)) % 2147483648
        return acc

    votes = [0] * 62
    for tok in text.split(" "):
        h = (fold(tok, 0, 31) << 31) | fold(tok, 1, 37)
        for i in range(62):
            votes[i] += 1 if (h >> i) & 1 else -1
    sig = 0
    for i in range(62):
        if votes[i] > 0:
            sig |= 1 << i
    return sig


def test_simhash_xengine_matches_python_model_on_random_strings(spark):
    """Seeded-random fuzz: 60 printable-ASCII strings (incl. empties,
    runs of spaces, long tokens) → the Spark expression tree, the
    DuckDB SQL, and the pure-Python model must agree exactly.  Three
    independent implementations agreeing on random inputs is the
    strongest cheap evidence the 62-bit signature semantics are what
    the docstring claims."""
    import random
    import string

    rng = random.Random(425)
    alphabet = string.ascii_letters + string.digits + string.punctuation
    texts = ["", " ", "  double  spaces  ", "x" * 300]
    for _ in range(56):
        n_tok = rng.randint(1, 12)
        texts.append(" ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 20)))
            for _ in range(n_tok)
        ))
    spark_sigs = _xengine_sigs(spark, texts)
    con = duckdb.connect()
    for t in set(texts):
        want = _py_simhash62(t)
        assert spark_sigs[t] == want, f"spark != python model on {t!r}"
        duck = con.execute(_SIG_SQL, [t]).fetchone()[0]
        assert duck == want, f"duckdb != python model on {t!r}"


def _py_fingerprint(text: str) -> int:
    """Pure-Python model of functions/text.fingerprint (rolling
    polynomial token fold, mod 1e9+7)."""
    mod = 1_000_000_007
    h = 0
    for tok in text.split(" "):
        th = 0
        for ch in tok:
            th = (th * 31 + ord(ch)) % mod
        h = (h * 33 + th) % mod
    return h


def test_fingerprint_matches_python_model_on_random_strings(spark):
    """Triple-implementation fuzz for the rolling fingerprint — the
    same technique that caught the simhash empty-token fold bug.
    char_hash shares the sequence(1, 0)-is-descending quirk but is
    SAFE by accident of its constants (seed 0, ascii('') = 0 make the
    two bogus iterations the identity 0*31+0); this test pins that
    accident so a future seed/multiplier change re-breaks loudly."""
    import random
    import string

    from pyspark.sql import functions as F

    from cs425_distributed_systems_mp4_mapreduce_spark.functions.text import (
        fingerprint,
        o_fingerprint,
    )

    rng = random.Random(426)
    alphabet = string.ascii_letters + string.digits + string.punctuation
    texts = ["", " ", "  a  b  ", "trail ", "x" * 200]
    for _ in range(55):
        texts.append(" ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 15)))
            for _ in range(rng.randint(1, 10))
        ))
    df = spark.createDataFrame([(t,) for t in set(texts)], "text string")
    got = {r.text: r.fp for r in df.select("text", fingerprint("text").alias("fp")).collect()}
    con = duckdb.connect()
    sql = f"SELECT {o_fingerprint('txt')} AS fp FROM (SELECT ? AS txt)"
    for t in set(texts):
        want = _py_fingerprint(t)
        assert got[t] == want, f"spark != python model on {t!r}"
        assert con.execute(sql, [t]).fetchone()[0] == want, f"duckdb != model on {t!r}"

def test_bpeish_tokens_no_whitespace_tokens(spark):
    """Review r12: BPEISH_PATTERN embedded in an F.expr SQL literal
    had its \\s escape-processed to a bare 's', so whitespace runs
    were emitted as symbol tokens (inflating every token count).  The
    Column-API form must tokenize 'ab cd-9' as [ab, cd, -, 9] with no
    space token, and never emit a token containing whitespace."""
    from pyspark.sql import functions as F

    from cs425_distributed_systems_mp4_mapreduce_spark.functions.text import (
        bpeish_tokens,
    )

    df = spark.createDataFrame([("ab cd-9",), ("x  y\tz!",)], "text string")
    rows = df.select(bpeish_tokens("text").alias("t")).collect()
    assert rows[0]["t"] == ["ab", "cd", "-", "9"]
    for r in rows:
        assert all(tok.strip() == tok and tok != "" for tok in r["t"])
