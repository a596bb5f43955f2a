"""Tokenizer-grade text stack: GPT-2-style regex pre-tokenization and
a fully-oracled canonical BPE encoder (operators/bpe.py).

Completes the north-star "token counting (whitespace + a BPE-ish
regex)" item: q_text_tokens (llm_ops.py) is the whitespace form; the
queries here add the regex pre-tokenizer every modern LLM tokenizer
runs first, and real byte-pair encoding on top of it.

Cross-engine status — all three queries are FULLY value-hash-oracled,
which is rare for tokenizers: the pre-tokenizer because Java regex and
DuckDB's RE2 agree on ordered alternation and the \\p{L}/\\p{N}
classes (verified; the GPT-2 lookaheads are simplified away so the
pattern stays inside RE2's feature set), and BPE because canonical
greedy merging is deterministic and DuckDB can replay it exactly with
a rank-stepping recursive CTE (first-occurrence regexp_replace until
the current rank's pair is absent, then advance — equivalence to the
GPT-2 merge loop argued and fuzz-pinned in operators/bpe.py +
tests/test_tokenizer.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bpe import (
    MERGES,
    PIECES,
    bpe_encode_udf,
    merges_values_sql,
    pieces_values_sql,
    wordpiece_segment_udf,
)
from ..registry import query
from ..sources.tables import table as T

# GPT-2-ish pre-tokenizer, RE2 ∩ Java-regex safe: ordered alternation
# of contraction suffixes, letter runs, digit runs, punctuation runs,
# whitespace runs.  (GPT-2's exact pattern needs lookahead, which RE2
# lacks; dropping it changes only how trailing spaces attach, not the
# class inventory — and both engines run THIS pattern, so the oracle
# compares like with like.)
_PRETOKEN_PAT = r"('(?:s|t|re|ve|m|ll|d)|\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+|\s+)"
_PRETOKEN_PAT_SQL = _PRETOKEN_PAT.replace("'", "''")

_N_RANKS = len(MERGES)

# Shared DuckDB CTE: canonical BPE over the distinct-word table.
# seed = ' c h a r s ' (sentinel spaces make every pair occurrence
# ' l r ' a substring match); the recursion holds a (word, symbols,
# rank) state and applies the CURRENT rank's pair one leftmost
# occurrence at a time (regexp_replace without 'g' = first match),
# advancing the rank only when the pair is absent.  Iterated leftmost
# single-merges == one greedy non-overlapping pass, and rank-order
# passes == the GPT-2 min-rank loop (operators/bpe.py docstring), so
# the CTE IS canonical BPE, not an approximation of it.
_BPE_CTE = f"""
  merges(rank, pair, merged) AS (VALUES
  {merges_values_sql(MERGES)}),
  tok AS (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents),
  w0 AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY word),
  seed AS (SELECT word,
                  ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS s
           FROM w0),
  enc(word, s, rk) AS (
    SELECT word, s, 1 FROM seed
    UNION ALL
    SELECT e.word,
           CASE WHEN strpos(e.s, m.pair) > 0
                THEN regexp_replace(e.s, m.pair, m.merged) ELSE e.s END,
           CASE WHEN strpos(e.s, m.pair) > 0 THEN e.rk ELSE e.rk + 1 END
    FROM enc e JOIN merges m ON m.rank = e.rk),
  encoded AS (
    SELECT word, TRIM(s) AS encoding FROM enc WHERE rk = {_N_RANKS + 1})
"""


@query(
    "q_text_pretokenize",
    oracle=f"""
    WITH srcs AS (
      SELECT 'text' AS src, text AS s FROM documents
      UNION ALL
      SELECT 'props' AS src, 'it''s ' || props AS s FROM events),
    tok AS (
      SELECT src,
             UNNEST(regexp_extract_all(s, '{_PRETOKEN_PAT_SQL}', 1)) AS tok
      FROM srcs)
    SELECT src,
           CASE WHEN left(tok, 1) = '''' THEN 'contraction'
                WHEN regexp_matches(tok, '^\\p{{L}}') THEN 'word'
                WHEN regexp_matches(tok, '^\\p{{N}}') THEN 'number'
                WHEN regexp_matches(tok, '^\\s') THEN 'space'
                ELSE 'punct' END AS tok_class,
           COUNT(*) AS n,
           COUNT(DISTINCT tok) AS n_distinct,
           CAST(SUM(length(tok)) AS BIGINT) AS n_chars
    FROM tok
    GROUP BY src, tok_class
    ORDER BY src, tok_class
    """,
)
def q_text_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2-style regex pre-tokenization over two corpora: document
    bodies (plain words) and event props JSON (braces, quotes, digits
    — prefixed with a literal "it's " so the contraction class is
    exercised on real driver data).  Token-class census: count,
    distinct tokens, total characters per class.

    Scale: the regex runs inside JVM codegen per input partition (no
    UDF, no shuffle until the tiny class-level agg); class census n_chars
    conservation (Σ n_chars == Σ length(s)) is the lossless-ness
    tripwire pinned in tests/test_tokenizer.py."""
    d = T(spark, sf_dir, "documents").select(
        F.lit("text").alias("src"), F.col("text").alias("s")
    )
    e = T(spark, sf_dir, "events").select(
        F.lit("props").alias("src"), F.concat(F.lit("it's "), F.col("props")).alias("s")
    )
    tok = d.unionByName(e).select(
        "src",
        F.explode(F.regexp_extract_all("s", F.lit(_PRETOKEN_PAT), 1)).alias("tok"),
    )
    tok_class = (
        F.when(F.col("tok").startswith("'"), "contraction")
        .when(F.col("tok").rlike(r"^\p{L}"), "word")
        .when(F.col("tok").rlike(r"^\p{N}"), "number")
        .when(F.col("tok").rlike(r"^\s"), "space")
        .otherwise("punct")
    )
    return (
        tok.withColumn("tok_class", tok_class)
        .groupBy("src", "tok_class")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("tok").alias("n_distinct"),
            F.sum(F.length("tok")).alias("n_chars"),
        )
        .orderBy("src", "tok_class")
    )


@query(
    "q_text_bpe",
    oracle=f"""
    WITH RECURSIVE
    {_BPE_CTE}
    SELECT w0.word, w0.n,
           CAST(length(string_split(encoding, ' ')) AS BIGINT) AS n_syms,
           encoding
    FROM encoded JOIN w0 USING (word)
    ORDER BY word
    """,
)
def q_text_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical BPE encoding of the corpus vocabulary (checked-in
    merge table trained on this corpus by the distributed trainer —
    operators/bpe.py MERGES, provenance test-pinned): per distinct
    word, its corpus frequency, subword count, and the full encoded
    symbol sequence.

    The whole tokenizer is value-hash-oracled: DuckDB re-derives every
    encoding through the recursive-CTE replay of the same merge loop,
    so a single wrong merge order, overlap, or tie-break anywhere
    flips the hash.

    Scale shape (the reason this query is vocabulary-shaped rather
    than token-shaped): BPE is a pure per-word function, so only
    DISTINCT words — Heaps-law bounded — ever cross the Arrow boundary
    into the Python encoder; the corpus-sized token stream stays JVM
    split/explode/count.  q_text_bpe_tokens adds the broadcast
    join-back that re-weights encodings by the stream."""
    d = T(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    enc = wc.withColumn("syms", bpe_encode_udf(MERGES)(F.col("word")))
    return enc.select(
        "word",
        "n",
        F.size("syms").cast("long").alias("n_syms"),
        F.array_join("syms", " ").alias("encoding"),
    ).orderBy("word")


@query(
    "q_text_bpe_tokens",
    oracle=f"""
    WITH RECURSIVE
    {_BPE_CTE}
    SELECT sym, COUNT(*) AS n
    FROM (SELECT UNNEST(string_split(e.encoding, ' ')) AS sym
          FROM tok JOIN encoded e USING (word))
    GROUP BY sym
    ORDER BY n DESC, sym
    """,
)
def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-weighted BPE token counting — the actual "token count"
    a training pipeline budgets with: encode the distinct vocabulary
    (Python, vocabulary-sized), broadcast-join the encodings back onto
    the corpus token stream (JVM, corpus-sized), explode and count
    subword symbols.

    Scale: the join-back broadcasts the vocabulary side — at 100 TB
    the stream never shuffles until the symbol-level agg, whose key
    space is the BPE vocabulary (bounded by construction).  The oracle
    replays both the encoder AND the re-weighting, so the hash covers
    the full stream accounting, not just the per-word map."""
    d = T(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("word"))
    wc = tok.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    enc = wc.withColumn("syms", bpe_encode_udf(MERGES)(F.col("word")))
    return (
        tok.join(F.broadcast(enc.select("word", "syms")), "word")
        .select(F.explode("syms").alias("sym"))
        .groupBy("sym")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "sym")
    )


@query(
    "q_text_wordpiece",
    oracle=f"""
    WITH RECURSIVE
    pieces(piece, plen) AS (VALUES {pieces_values_sql(PIECES)}),
    tok AS (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents),
    w0 AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY word),
    -- longest matching piece per (word, position): precomputed OUTSIDE
    -- the recursion (recursive terms cannot aggregate), so the walk
    -- below is pure path-following
    best AS (
      SELECT word, pos, piece, plen FROM (
        SELECT w0.word, u.pos, p.piece, p.plen,
               ROW_NUMBER() OVER (PARTITION BY w0.word, u.pos
                                  ORDER BY p.plen DESC) AS rn
        FROM w0,
             LATERAL UNNEST(generate_series(1, length(w0.word))) AS u(pos),
             pieces p
        WHERE substr(w0.word, u.pos, p.plen) = p.piece)
      WHERE rn = 1),
    walk(word, pos, seg, np) AS (
      SELECT word, 1, '', 0 FROM w0
      UNION ALL
      SELECT w.word, w.pos + b.plen,
             CASE WHEN w.seg = '' THEN b.piece
                  ELSE w.seg || ' ' || b.piece END,
             w.np + 1
      FROM walk w JOIN best b ON b.word = w.word AND b.pos = w.pos)
    SELECT w0.word, w0.n,
           CAST(walk.np AS BIGINT) AS n_pieces,
           walk.seg AS segmentation
    FROM walk JOIN w0 USING (word)
    WHERE walk.pos = length(w0.word) + 1
    ORDER BY word
    """,
)
def q_text_wordpiece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece-style greedy longest-match segmentation (BERT's
    maximal munch, minus the '##' marker) of the corpus vocabulary,
    over a piece vocabulary DERIVED from the BPE merge table (every
    merged symbol + the single-char fallback alphabet — derivation is
    import-time, so it cannot drift from MERGES).

    Third fully-oracled tokenizer family beside BPE and the regex
    pre-tokenizer: greediness makes the segmentation deterministic,
    so DuckDB replays it exactly — per-position longest matches are
    precomputed relationally (window over a word×position×piece
    join), then a recursive CTE just FOLLOWS the pointers, one piece
    per level.  Same 100 TB shape as q_text_bpe: only distinct words
    touch Python; the segmenter is O(len·maxlen) per word via a set
    lookup (a trie at production vocab sizes — same asymptotics)."""
    d = T(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    seg = wc.withColumn("ps", wordpiece_segment_udf(PIECES)(F.col("word")))
    return seg.select(
        "word",
        "n",
        F.size("ps").cast("long").alias("n_pieces"),
        F.array_join("ps", " ").alias("segmentation"),
    ).orderBy("word")


# bitlen(f) as a DuckDB integer indicator sum (the cross-engine floor-
# log2 — operators/bpe.ilog2); 40 bits covers any corpus this side of
# 10^12 piece occurrences.
_BLEN_SQL = (
    "list_sum(list_transform(range(0, 40),"
    " k -> IF(f >= (1::BIGINT << k), 1, 0)))"
)


@query(
    "q_text_unigram",
    oracle=f"""
    WITH RECURSIVE
    pv(piece, plen) AS (VALUES {pieces_values_sql(PIECES)}),
    tok AS (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents),
    w0 AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY word),
    f AS (
      SELECT p.piece, p.plen,
             SUM(w0.n * ((length(w0.word)
                          - length(replace(w0.word, p.piece, '')))
                         // p.plen)) AS f
      FROM w0, pv p
      GROUP BY 1, 2
      HAVING SUM(w0.n * ((length(w0.word)
                          - length(replace(w0.word, p.piece, '')))
                         // p.plen)) >= 1),
    blmax AS (SELECT MAX({_BLEN_SQL}) AS mbl FROM f),
    costs AS (
      SELECT piece, plen, 2 * (blmax.mbl - {_BLEN_SQL}) + 1 AS cost
      FROM f, blmax),
    walk(word, pos, cost, seg) AS (
      SELECT word, 1, 0::BIGINT, '' FROM w0
      UNION ALL
      SELECT w.word, w.pos + c.plen, w.cost + c.cost,
             CASE WHEN w.seg = '' THEN c.piece
                  ELSE w.seg || ' ' || c.piece END
      FROM walk w JOIN costs c ON substr(w.word, w.pos, c.plen) = c.piece),
    done AS (
      SELECT word, cost, seg,
             ROW_NUMBER() OVER (PARTITION BY word
                                ORDER BY cost, seg) AS rn
      FROM walk WHERE pos = length(word) + 1)
    SELECT w0.word, w0.n, d.cost AS total_cost,
           CAST(length(string_split(d.seg, ' ')) AS BIGINT) AS n_pieces,
           d.seg AS segmentation
    FROM done d JOIN w0 USING (word)
    WHERE d.rn = 1
    ORDER BY word
    """,
)
def q_text_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SentencePiece-style unigram-LM segmentation — the FOURTH fully
    oracled tokenizer family (regex pre-tokenize, BPE, WordPiece,
    unigram): per distinct word, the MIN-COST segmentation over the
    shared piece vocabulary under integer-quantized unigram costs.

    Model build is part of the query: piece frequencies are corpus-
    weighted non-overlapping substring counts (the replace()-delta
    trick — identical left-to-right semantics in both engines), costs
    are 2·(bitlen(max_f) − bitlen(f)) + 1 (floor-log2 by integer
    indicator sums, operators/bpe.unigram_costs — no libm anywhere,
    which is what makes a *probabilistic* tokenizer hash-provable).
    Spark runs true right-to-left Viterbi DP with (cost, string)
    lexicographic states; DuckDB enumerates EVERY segmentation path in
    a recursive CTE and takes ROW_NUMBER ORDER BY (cost, seg) — so the
    driver hash-compare is an optimality proof: the DP must find the
    global minimum of the full path space, tie-break included, for
    all 31 words.

    Scale: same vocabulary-shaped posture as the other tokenizers —
    the corpus-sized pass is one JVM split/explode/count; the model
    (≤ |pieces| rows) is a sanctioned bounded collect (same class as
    the BPE trainer argmax); Viterbi touches DISTINCT words only,
    O(len·maxlen) per word.  The oracle's exponential enumeration is
    oracle-side only — the engine never enumerates paths."""
    from ..operators.bpe import unigram_costs, viterbi_segment_udf

    d = T(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pv = spark.createDataFrame(
        [(p, len(p)) for p in PIECES], "piece string, plen int"
    )
    occ = (
        wc.crossJoin(F.broadcast(pv))
        .select(
            "piece",
            F.expr(
                "n * ((length(word) - length(replace(word, piece, '')))"
                " div plen)"
            ).alias("occ"),
        )
        .groupBy("piece")
        .agg(F.sum("occ").alias("f"))
        .filter(F.col("f") >= 1)
    )
    freqs = {r["piece"]: r["f"] for r in occ.collect()}  # vocabulary-sized
    costs = unigram_costs(freqs)
    seg = wc.withColumn("vs", viterbi_segment_udf(costs)(F.col("word")))
    return seg.select(
        "word",
        "n",
        F.col("vs.cost").alias("total_cost"),
        F.size("vs.pieces").cast("long").alias("n_pieces"),
        F.array_join("vs.pieces", " ").alias("segmentation"),
    ).orderBy("word")
