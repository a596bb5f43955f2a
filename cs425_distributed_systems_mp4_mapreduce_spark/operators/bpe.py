"""Byte-pair-encoding tokenizer: distributed trainer + canonical encoder.

The north-star text stack ("token counting — whitespace + a BPE-ish
regex", BASELINE.json:6) gets its real tokenizer here: the canonical
greedy BPE of Sennrich et al. 2016 ("Neural Machine Translation of
Rare Words with Subword Units") as popularized by GPT-2's encoder —
apply merge rules in learned rank order; within one rule, merge
leftmost-first, non-overlapping, rescanning after the pair.

Design for 100 TB — the whole point of this module's shape:

* **Encoding is a per-WORD pure function**, so the engine encodes the
  DISTINCT-word table, never the token stream.  Vocabulary grows
  ~Heaps-law (∝ corpusᵝ, β≈0.5) while the corpus grows linearly, so
  the pandas-UDF stage runs on a vocabulary-sized input and the
  corpus-sized work stays a JVM split/explode/count.  On this corpus
  that is 31 rows of Python for 27 k tokens of stream; at 100 TB it is
  ~10⁷ rows of Python for ~10¹³ tokens — the only viable shape.
* **Training** needs one corpus-sized pass (word counts), after which
  every iteration runs on the weighted vocabulary table.  The
  per-iteration argmax is a 1-row collect (the same sanctioned bounded
  collect as the z-order min/max in queries/sinks.py); the merge is
  then applied vocabulary-side as a JVM ``aggregate`` fold — no
  Python in the loop body.
* **Cross-engine provability**: canonical BPE is deterministic, so the
  full encoding is value-hash-oracle-able.  DuckDB replays it with a
  recursive CTE (rank-stepping: apply the current rank's pair via
  first-occurrence ``regexp_replace`` until absent, then advance —
  see :func:`merges_values_sql`), which tests/test_tokenizer.py
  fuzzes against this encoder over random words and random merge
  tables.

Two structural facts make the cheap implementations exactly canonical
(both fuzz-pinned in tests/test_tokenizer.py):

1. *Rank-order single passes == min-rank-present loop*: merging only
   ever concatenates neighbors into new (longer) symbols, so a pair of
   symbols (x, y) can never REAPPEAR after its rank is exhausted —
   processing ranks strictly in order is equivalent to GPT-2's
   "repeatedly merge the lowest-rank pair present".
2. *Fold == scan*: the merged symbol ``l+r`` is strictly longer than
   ``l``, so a left fold that merges ``cur`` into ``acc`` whenever
   ``last(acc) == l and cur == r`` can never chain-merge through the
   freshly-merged symbol — it implements exactly the leftmost
   non-overlapping greedy scan.
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Merge table trained on the sf0.01 documents corpus (31-word
#: vocabulary) by :func:`bpe_train` with n_merges=24, min pair count 2.
#: Checked in as a constant so encoding is deterministic across scale
#: factors; tests/test_tokenizer.py::test_checked_in_merges_are_trainer_output
#: re-trains on sf0.01 every run and asserts THIS list falls out, so
#: the constant can never drift from the trainer.
MERGES: list[tuple[str, str]] = [
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
    ("at", "c"),
    ("atc", "h"),
    ("b", "atch"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("c", "u"),
]

_SYM_SAFE = re.compile(r"^[0-9A-Za-z_]+$")


def encode_word(word: str, merges: Sequence[tuple[str, str]]) -> list[str]:
    """Canonical greedy BPE encode of one word (rank-order passes,
    leftmost non-overlapping within a pass).  Pure Python reference —
    also the body of the pandas UDF, applied to DISTINCT words only."""
    syms = list(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        out, i = [], 0
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_udf(merges: Sequence[tuple[str, str]]):
    """Arrow-batched ``word -> array<string>`` encoder.  A sanctioned
    pandas-UDF case (data-dependent loop the JVM expression language
    cannot express) — but only ever applied to the distinct-word
    table, so the Python stage is vocabulary-sized at any corpus
    scale (module docstring, point 1)."""
    frozen = [tuple(m) for m in merges]

    @F.pandas_udf("array<string>")
    def _encode(words):
        return words.map(lambda w: None if w is None else encode_word(w, frozen))

    return _encode


def merges_values_sql(merges: Sequence[tuple[str, str]]) -> str:
    """Render the merge table as a SQL ``VALUES`` list of
    ``(rank, ' l r ', ' lr ')`` rows for the DuckDB recursive-CTE
    oracle.  Symbols are asserted shell-safe ([0-9A-Za-z_]) so the
    space-delimited pair string is literal-safe both as a SQL string
    and as an RE2 pattern (``regexp_replace`` first-occurrence
    semantics is what gives leftmost-rescan merging)."""
    rows = []
    for rank, (left, right) in enumerate(merges, start=1):
        if not (_SYM_SAFE.match(left) and _SYM_SAFE.match(right)):
            raise ValueError(f"merge symbols not literal-safe: {(left, right)!r}")
        rows.append(f"({rank}, ' {left} {right} ', ' {left}{right} ')")
    return ",\n  ".join(rows)


def _merge_fold_expr(left: str, right: str) -> str:
    """JVM ``aggregate`` fold applying one merge rule to a ``syms``
    array column — the trainer's loop body, Python-free (module
    docstring, point 2: fold == canonical scan)."""
    if not (_SYM_SAFE.match(left) and _SYM_SAFE.match(right)):
        raise ValueError(f"merge symbols not literal-safe: {(left, right)!r}")
    merged = left + right
    return f"""
    aggregate(
      syms,
      cast(array() as array<string>),
      (acc, x) -> CASE
        WHEN size(acc) > 0 AND element_at(acc, -1) = '{left}' AND x = '{right}'
          THEN concat(slice(acc, 1, size(acc) - 1), array('{merged}'))
        ELSE concat(acc, array(x))
      END)
    """


def bpe_train(word_counts: DataFrame, n_merges: int, min_count: int = 2) -> list[tuple[str, str]]:
    """Distributed BPE training over a ``(word, n)`` weighted
    vocabulary DataFrame.

    One corpus pass produces ``word_counts`` (the caller's
    split/explode/groupBy); everything here is vocabulary-sized.  Each
    iteration: adjacent-pair explode + weighted count (map-side combine
    collapses repeats), deterministic argmax (count DESC, then pair
    lexicographic — a 1-row bounded collect), then the merge applied
    as a JVM fold.  ``localCheckpoint`` truncates the growing lineage
    each round (same discipline as operators/graph.py's iterative CC).
    """
    df = word_counts.select(
        "word", F.col("n").cast("long").alias("n"), F.split("word", "").alias("syms")
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = df.select(
            "n",
            F.explode(
                F.expr(
                    "transform(slice(syms, 1, size(syms) - 1),"
                    " (x, i) -> struct(x AS l, element_at(syms, i + 2) AS r))"
                )
            ).alias("p"),
        ).select("n", "p.l", "p.r")
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((left, right))
        df = df.withColumn("syms", F.expr(_merge_fold_expr(left, right))).localCheckpoint()
    return merges


#: WordPiece-style piece vocabulary DERIVED from the BPE merge table:
#: every merged symbol plus all single letters (the fallback alphabet,
#: which guarantees greedy longest-match segmentation always
#: terminates).  Derived at import, so it can never drift from MERGES.
PIECES: list[str] = sorted(
    {left + right for left, right in MERGES} | set("abcdefghijklmnopqrstuvwxyz")
)


def wordpiece_segment(word: str, pieces: Iterable[str]) -> list[str]:
    """Greedy longest-match-first segmentation (BERT WordPiece
    maximal-munch, minus the '##' continuation marker): at each
    position take the LONGEST vocabulary piece that matches.  The
    single-char alphabet in PIECES makes it total; greediness makes it
    deterministic — which is what lets DuckDB replay it exactly
    (per-position longest-match precompute + recursive path-follow in
    queries/tokenizer.py)."""
    ps = set(pieces)
    maxlen = max((len(p) for p in ps), default=1)
    out, i, n = [], 0, len(word)
    while i < n:
        for ln in range(min(maxlen, n - i), 0, -1):
            if word[i : i + ln] in ps:
                out.append(word[i : i + ln])
                i += ln
                break
        else:
            raise ValueError(f"no piece matches {word!r} at {i}")
    return out


def wordpiece_segment_udf(pieces: Sequence[str]):
    """Arrow-batched ``word -> array<string>`` greedy segmenter;
    vocabulary-sized input only (same discipline as
    :func:`bpe_encode_udf`)."""
    frozen = list(pieces)

    @F.pandas_udf("array<string>")
    def _seg(words):
        return words.map(
            lambda w: None if w is None else wordpiece_segment(w, frozen)
        )

    return _seg


def pieces_values_sql(pieces: Sequence[str]) -> str:
    """Render the piece vocabulary as SQL VALUES ``(piece, plen)``."""
    rows = []
    for p in pieces:
        if not _SYM_SAFE.match(p):
            raise ValueError(f"piece not literal-safe: {p!r}")
        rows.append(f"('{p}', {len(p)})")
    return ", ".join(rows)


def ilog2(x: int) -> int:
    """Floor log2 as a pure-integer bit length minus one — the
    cross-engine substitute for log(): both engines compute it with an
    indicator sum over powers of two, so unigram costs stay integers
    and the Viterbi objective is hash-comparable (no libm rounding)."""
    if x < 1:
        raise ValueError("ilog2 needs x >= 1")
    return x.bit_length() - 1


def unigram_costs(piece_freqs: dict[str, int]) -> dict[str, int]:
    """Integer-quantized unigram costs from corpus piece frequencies:
    cost(p) = 2·(bitlen(max_f) − bitlen(f_p)) + 1.

    The 2·Δbitlen term is the floor-log2 quantization of −log2 p (up
    to the shared normalizer, which cancels in argmin); the +1 per
    emitted piece is the token-count penalty that makes the model
    prefer fewer, higher-frequency pieces — the same role as
    SentencePiece's per-token log-prior.  Integer costs are exactly
    what production tokenizers ship for platform independence; here
    they additionally make the DuckDB replay bit-exact."""
    if not piece_freqs:
        return {}
    max_bl = max(f.bit_length() for f in piece_freqs.values())
    return {
        p: 2 * (max_bl - f.bit_length()) + 1
        for p, f in piece_freqs.items()
        if f >= 1
    }


def viterbi_segment(
    word: str, costs: dict[str, int]
) -> tuple[int, list[str]]:
    """Min-cost segmentation of ``word`` over the cost table —
    SentencePiece-style unigram Viterbi, right-to-left DP.

    Tie-break: among min-cost segmentations, the one whose
    space-joined string is lexicographically smallest.  That order
    decomposes by prefix (for a fixed first piece, the best completion
    is the (cost, string)-lexicographic-min completion of the suffix),
    so the DP state is the PAIR (cost, string) per position and the
    result equals the global min over all complete paths — which is
    exactly what the DuckDB oracle computes by full path enumeration +
    ROW_NUMBER ORDER BY (cost, seg).  Fuzz-pinned equal to brute-force
    enumeration in tests/test_tokenizer.py."""
    n = len(word)
    maxlen = max((len(p) for p in costs), default=0)
    INF = (1 << 60, "")
    dp: list[tuple[int, str]] = [INF] * (n + 1)
    dp[n] = (0, "")
    for i in range(n - 1, -1, -1):
        best = INF
        for ln in range(1, min(maxlen, n - i) + 1):
            p = word[i : i + ln]
            c = costs.get(p)
            if c is None:
                continue
            tc, ts = dp[i + ln]
            if tc >= INF[0]:
                continue
            cand = (c + tc, p + " " + ts if ts else p)
            if cand < best:
                best = cand
        dp[i] = best
    if dp[0][0] >= INF[0]:
        raise ValueError(f"word {word!r} not segmentable over cost table")
    return dp[0][0], dp[0][1].split(" ")


def viterbi_segment_udf(costs: dict[str, int]):
    """Arrow-batched ``word -> struct<cost, pieces>`` Viterbi
    segmenter; vocabulary-sized input only (same discipline as
    :func:`bpe_encode_udf`)."""
    frozen = dict(costs)

    @F.pandas_udf("struct<cost: long, pieces: array<string>>")
    def _seg(words):
        import pandas as pd

        costs_out, pieces_out = [], []
        for w in words:
            if w is None:
                costs_out.append(None)
                pieces_out.append(None)
            else:
                c, ps = viterbi_segment(w, frozen)
                costs_out.append(c)
                pieces_out.append(ps)
        return pd.DataFrame({"cost": costs_out, "pieces": pieces_out})

    return _seg
