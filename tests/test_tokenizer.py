"""Tokenizer stack (operators/bpe.py + queries/tokenizer.py).

The parity suite (test_parity.py) hash-checks the three tokenizer
queries against their DuckDB twins on the driver corpus; these tests
check the THEOREMS the oracles rely on, on adversarial inputs the
corpus never produces:

- the recursive-CTE replay (rank-stepping + first-occurrence
  regexp_replace) equals canonical greedy BPE for ANY word and ANY
  trained merge table — fuzzed over random corpora, because the
  overlap cases (runs of identical symbols, merges that chain into
  each other) are exactly where naive replace-based implementations
  silently diverge (a global-replace form loses on 'aaaa');
- the distributed trainer (JVM fold loop) equals an independent
  reference trainer, and the checked-in MERGES constant is exactly
  its output on the sf0.01 corpus (provenance pin);
- the regex pre-tokenizer is lossless (class census chars == input
  chars).
"""

from __future__ import annotations

import collections

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from cs425_distributed_systems_mp4_mapreduce_spark.operators.bpe import (
    MERGES,
    _bpe_train_inmemory,
    bpe_train,
    bpe_train_delta,
    bpe_train_permerge,
    encode_word,
    merges_values_sql,
)

from conftest import SF_T2


# ------------------------------------------------------------------
# Reference trainer: independent implementation (dict-of-lists scan
# merging), deliberately sharing no code with operators/bpe.py's
# fold-based distributed trainer.
# ------------------------------------------------------------------


def _reference_train(vocab: dict[str, int], n_merges: int, min_count: int = 2):
    words = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pc = collections.Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += vocab[w]
        if not pc:
            break
        pair = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[pair] < min_count:
            break
        merges.append(pair)
        left, right = pair
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _duckdb_encode(words: list[str], merges) -> dict[str, list[str]]:
    """Replay the q_text_bpe oracle's recursive CTE on an arbitrary
    word list (same SQL shape, same rank-stepping semantics)."""
    if not merges:
        return {w: list(w) for w in words}
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    q = f"""
    WITH RECURSIVE
    merges(rank, pair, merged) AS (VALUES {merges_values_sql(merges)}),
    w0(word) AS (VALUES {vals}),
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
      FROM enc e JOIN merges m ON m.rank = e.rk)
    SELECT word, TRIM(s) FROM enc WHERE rk = {len(merges) + 1}
    """
    out = {w: s.split(" ") for w, s in con.sql(q).fetchall()}
    con.close()
    return out


# ------------------------------------------------------------------
# Canonical-BPE pins: the overlap cases where replace-based forms
# diverge from the GPT-2 scan.
# ------------------------------------------------------------------


def test_encode_word_overlap_pins():
    assert encode_word("aaa", [("a", "a")]) == ["aa", "a"]
    assert encode_word("aaaa", [("a", "a")]) == ["aa", "aa"]
    assert encode_word("aaaaa", [("a", "a")]) == ["aa", "aa", "a"]
    # chained ranks: merged symbols feed later merges
    assert encode_word("aaaa", [("a", "a"), ("aa", "aa")]) == ["aaaa"]
    # exhausted ranks never reapply (pair can't reappear)
    assert encode_word("abab", [("a", "b"), ("ab", "ab")]) == ["abab"]
    assert encode_word("x", MERGES) == ["x"]


def test_cte_oracle_matches_canonical_on_pins():
    merges = [("a", "a"), ("aa", "aa")]
    got = _duckdb_encode(["aaa", "aaaa", "aaaaa", "aab", "baaab"], merges)
    for w, enc in got.items():
        assert enc == encode_word(w, merges), w


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_cte_oracle_matches_canonical_fuzz(data):
    """For ANY trained merge table and ANY word over its alphabet, the
    DuckDB recursive-CTE replay equals canonical greedy BPE.  Training
    on random corpora produces realistic chained merges; encoding is
    then checked on DIFFERENT random words (including pathological
    single-symbol runs)."""
    alphabet = "ab" if data.draw(st.booleans()) else "abc"
    train_words = data.draw(
        st.lists(
            st.text(alphabet=alphabet, min_size=1, max_size=8),
            min_size=1,
            max_size=12,
        )
    )
    vocab = collections.Counter(train_words)
    merges = _reference_train(dict(vocab), n_merges=6, min_count=2)
    probe = data.draw(
        st.lists(
            st.text(alphabet=alphabet, min_size=1, max_size=10),
            min_size=1,
            max_size=8,
            unique=True,
        )
    )
    probe += ["a" * 7]  # worst case for replace-overlap bugs
    got = _duckdb_encode(sorted(set(probe)), merges)
    for w in sorted(set(probe)):
        assert got[w] == encode_word(w, merges), (w, merges)


# ------------------------------------------------------------------
# Distributed trainer
# ------------------------------------------------------------------


def _word_counts(spark, sf_dir):
    from cs425_distributed_systems_mp4_mapreduce_spark.sources.tables import table as T

    return (
        T(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@pytest.mark.parametrize(
    "trainer", [bpe_train, bpe_train_delta, bpe_train_permerge],
    ids=["dispatch_inmemory", "batched_delta", "naive_permerge"],
)
def test_checked_in_merges_are_trainer_output(spark, trainer):
    """Provenance pin: MERGES is exactly what EVERY trainer tier
    learns from the sf0.01 corpus — the in-memory production tier, the
    batched delta-maintained distributed tier, and the naive per-merge
    loop all emit the identical list, so the constant can never
    silently drift from any of them."""
    wc = _word_counts(spark, SF_T2)
    assert trainer(wc, n_merges=len(MERGES)) == MERGES


@pytest.mark.parametrize(
    "trainer", [bpe_train, bpe_train_delta, bpe_train_permerge],
    ids=["dispatch_inmemory", "batched_delta", "naive_permerge"],
)
def test_distributed_trainer_matches_reference(spark, trainer):
    """Every trainer tier equals the independent scan-based reference
    on a synthetic vocabulary engineered with ties and chainable
    merges (fold == scan, deterministic tie-break, exact batching)."""
    vocab = {
        "aaaa": 3,
        "aab": 2,
        "abab": 2,
        "banana": 4,
        "bandana": 1,
        "naan": 2,
    }
    rows = [(w, n) for w, n in sorted(vocab.items())]
    wc = spark.createDataFrame(rows, "word string, n long")
    got = trainer(wc, n_merges=8)
    want = _reference_train(vocab, n_merges=8)
    assert got == want


def _batched_train_python(vocab: dict[str, int], n_merges: int, min_count: int = 2):
    """Pure-Python mirror of bpe_train_delta's control flow (driver
    dict + _safe_batch + batch-apply + delta), with the Spark delta job
    replaced by a local fold — isolates the BATCHING GUARD for fuzzing:
    if _safe_batch ever admits a non-canonical batch, this diverges
    from the full-rescan reference."""
    from cs425_distributed_systems_mp4_mapreduce_spark.operators.bpe import (
        _safe_batch,
        encode_word_one,
    )

    words = {w: list(w) for w in vocab}
    counts: dict[tuple[str, str], int] = {}
    for w, syms in words.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + vocab[w]
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and counts:
        batch = _safe_batch(counts, n_merges - len(merges), min_count)
        if not batch:
            break
        merges.extend(batch)
        for w, syms in words.items():
            new = syms
            for left, right in batch:
                folded = encode_word_one(new, left, right)
                if folded is not None:
                    new = folded
            if new is not syms:
                n = vocab[w]
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) - n
                for a, b in zip(new, new[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + n
                words[w] = new
        counts = {p: c for p, c in counts.items() if c > 0}
    return merges


@settings(max_examples=150, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=12),
)
def test_batching_guard_fuzz_vs_reference(vocab, n_merges):
    """_safe_batch's provably-canonical prefix rule survives random
    small-alphabet vocabularies (heavy ties, shared symbols, merged
    strings colliding with later pairs) — the batched control flow
    emits exactly the canonical merge sequence."""
    got = _batched_train_python(dict(vocab), n_merges=n_merges)
    want = _reference_train(dict(vocab), n_merges=n_merges)
    assert got == want


@settings(max_examples=150, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=12),
)
def test_inmemory_trainer_fuzz_vs_reference(vocab, n_merges):
    """The incremental in-memory trainer (pair index + lazy heap +
    delta counts, incl. pair-revival handling) equals the full-rescan
    reference on random small-alphabet vocabularies — the regime where
    merged symbols collide, pairs revive, and ties are everywhere."""
    got = _bpe_train_inmemory(sorted(vocab.items()), n_merges=n_merges)
    want = _reference_train(dict(vocab), n_merges=n_merges)
    assert got == want


# ------------------------------------------------------------------
# Pre-tokenizer losslessness
# ------------------------------------------------------------------


def test_pretokenize_is_lossless(spark):
    """The token classes partition the input exactly: per source, the
    class census' total characters equal the input's total characters
    (no token dropped, none double-counted)."""
    from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

    census = all_queries()["q_text_pretokenize"].fn(spark, SF_T2).toPandas()
    got = census.groupby("src")["n_chars"].sum().to_dict()

    from cs425_distributed_systems_mp4_mapreduce_spark.sources.tables import table as T

    want_text = (
        T(spark, SF_T2, "documents").agg(F.sum(F.length("text"))).collect()[0][0]
    )
    want_props = (
        T(spark, SF_T2, "events")
        .agg(F.sum(F.length(F.concat(F.lit("it's "), F.col("props")))))
        .collect()[0][0]
    )
    assert got == {"text": want_text, "props": want_props}


# ------------------------------------------------------------------
# WordPiece greedy longest-match
# ------------------------------------------------------------------

from cs425_distributed_systems_mp4_mapreduce_spark.operators.bpe import (  # noqa: E402
    PIECES,
    pieces_values_sql,
    wordpiece_segment,
)


def test_pieces_derived_from_merges():
    assert PIECES == sorted(
        {l + r for l, r in MERGES} | set("abcdefghijklmnopqrstuvwxyz")
    )


def _reference_wordpiece(word: str, pieces: set[str]) -> list[str]:
    """Independent maximal-munch: try every prefix, longest first,
    via plain slicing (no maxlen shortcut)."""
    out, i = [], 0
    while i < len(word):
        for j in range(len(word), i, -1):
            if word[i:j] in pieces:
                out.append(word[i:j])
                i = j
                break
        else:
            raise AssertionError("alphabet fallback missing")
    return out


def _duckdb_wordpiece(words: list[str], pieces: list[str]) -> dict[str, list[str]]:
    """Replay the q_text_wordpiece oracle's precompute+walk CTE."""
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    q = f"""
    WITH RECURSIVE
    pieces(piece, plen) AS (VALUES {pieces_values_sql(pieces)}),
    w0(word) AS (VALUES {vals}),
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
    walk(word, pos, seg) AS (
      SELECT word, 1, '' FROM w0
      UNION ALL
      SELECT w.word, w.pos + b.plen,
             CASE WHEN w.seg = '' THEN b.piece ELSE w.seg || ' ' || b.piece END
      FROM walk w JOIN best b ON b.word = w.word AND b.pos = w.pos)
    SELECT w0.word, walk.seg FROM walk JOIN w0 USING (word)
    WHERE walk.pos = length(w0.word) + 1
    """
    out = {w: s.split(" ") for w, s in con.sql(q).fetchall()}
    con.close()
    return out


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_wordpiece_cte_matches_greedy_fuzz(data):
    """For ANY piece vocabulary (alphabet + random multi-char pieces,
    including pieces that are prefixes of each other — the case where
    greedy vs non-greedy diverges) and ANY word, the DuckDB
    precompute+walk replay equals maximal munch."""
    alphabet = "abc"
    extra = data.draw(
        st.lists(
            st.text(alphabet=alphabet, min_size=2, max_size=5),
            min_size=0,
            max_size=8,
            unique=True,
        )
    )
    pieces = sorted(set(extra) | set(alphabet))
    probe = data.draw(
        st.lists(
            st.text(alphabet=alphabet, min_size=1, max_size=10),
            min_size=1,
            max_size=8,
            unique=True,
        )
    )
    got = _duckdb_wordpiece(sorted(set(probe)), pieces)
    pset = set(pieces)
    for w in sorted(set(probe)):
        want = _reference_wordpiece(w, pset)
        assert got[w] == want, (w, pieces)
        assert wordpiece_segment(w, pieces) == want, (w, pieces)


# ---------------------------------------------------------------------------
# Unigram-LM Viterbi (q_text_unigram)

from cs425_distributed_systems_mp4_mapreduce_spark.operators.bpe import (  # noqa: E402
    unigram_costs,
    viterbi_segment,
)


def _enumerate_segmentations(word, costs):
    """Brute-force ALL segmentations (the oracle's semantics) and
    return the (cost, joined-string) lexicographic minimum."""
    outs = []

    def rec(i, acc, c):
        if i == len(word):
            outs.append((c, " ".join(acc)))
            return
        for ln in range(1, len(word) - i + 1):
            p = word[i : i + ln]
            if p in costs:
                rec(i + ln, acc + [p], c + costs[p])

    rec(0, [], 0)
    return min(outs) if outs else None


def _duckdb_unigram(words, costs):
    """Run the oracle-shaped DuckDB path-enumeration on an arbitrary
    cost table (bypassing the corpus-derived model) — pins the CTE
    itself, not just the one vocabulary the corpus happens to have."""
    con = duckdb.connect()
    cvals = ", ".join(f"('{p}', {len(p)}, {c})" for p, c in sorted(costs.items()))
    wvals = ", ".join(f"('{w}')" for w in words)
    q = f"""
    WITH RECURSIVE
    costs(piece, plen, cost) AS (VALUES {cvals}),
    w0(word) AS (VALUES {wvals}),
    walk(word, pos, cost, seg) AS (
      SELECT word, 1, 0::BIGINT, '' FROM w0
      UNION ALL
      SELECT w.word, w.pos + c.plen, w.cost + c.cost,
             CASE WHEN w.seg = '' THEN c.piece
                  ELSE w.seg || ' ' || c.piece END
      FROM walk w JOIN costs c ON substr(w.word, w.pos, c.plen) = c.piece),
    done AS (
      SELECT word, cost, seg,
             ROW_NUMBER() OVER (PARTITION BY word ORDER BY cost, seg) AS rn
      FROM walk WHERE pos = length(word) + 1)
    SELECT word, cost, seg FROM done WHERE rn = 1
    """
    out = {w: (c, s) for w, c, s in con.sql(q).fetchall()}
    con.close()
    return out


def test_unigram_costs_quantization():
    """cost = 2*(bitlen(max f) - bitlen(f)) + 1: monotone non-
    increasing in f, floor-log2 steps, +1 floor for the most frequent
    piece, f=0 pieces dropped."""
    c = unigram_costs({"a": 8, "b": 7, "c": 1, "z": 0})
    assert c == {"a": 1, "b": 3, "c": 7}


def test_viterbi_prefers_cheap_long_pieces():
    costs = {"ab": 1, "a": 3, "b": 3, "c": 7, "bc": 5}
    assert viterbi_segment("ab", costs) == (1, ["ab"])
    # tie at cost 8: 'a bc' vs 'ab c' -> lex-min wins
    assert viterbi_segment("abc", costs) == (8, ["a", "bc"])


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_viterbi_matches_bruteforce_and_cte_fuzz(data):
    """For ANY cost table (alphabet always segmentable + random
    multi-char pieces with random integer costs — including equal-cost
    ties, the case the lexicographic rule exists for) and ANY word:
    right-to-left DP == brute-force path minimum == DuckDB recursive
    enumeration."""
    alphabet = "abc"
    extra = data.draw(
        st.lists(
            st.text(alphabet=alphabet, min_size=2, max_size=4),
            min_size=0,
            max_size=6,
            unique=True,
        )
    )
    pieces = sorted(set(extra) | set(alphabet))
    costs = {
        p: data.draw(st.integers(min_value=1, max_value=9), label=f"cost[{p}]")
        for p in pieces
    }
    probe = data.draw(
        st.lists(
            st.text(alphabet=alphabet, min_size=1, max_size=9),
            min_size=1,
            max_size=6,
            unique=True,
        )
    )
    words = sorted(set(probe))
    got_db = _duckdb_unigram(words, costs)
    for w in words:
        want = _enumerate_segmentations(w, costs)
        c, ps = viterbi_segment(w, costs)
        assert (c, " ".join(ps)) == want, (w, costs)
        assert got_db[w] == want, (w, costs)
