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


def _merge_fold_expr(left: str, right: str, inner: str = "syms") -> str:
    """JVM ``aggregate`` fold applying one merge rule to the symbol
    array produced by ``inner`` (a column name or a nested fold
    expression, which is how a batch of merges chains into ONE
    expression) — the trainer's loop body, Python-free (module
    docstring, point 2: fold == canonical scan)."""
    if not (_SYM_SAFE.match(left) and _SYM_SAFE.match(right)):
        raise ValueError(f"merge symbols not literal-safe: {(left, right)!r}")
    merged = left + right
    return f"""
    aggregate(
      {inner},
      cast(array() as array<string>),
      (acc, x) -> CASE
        WHEN size(acc) > 0 AND element_at(acc, -1) = '{left}' AND x = '{right}'
          THEN concat(slice(acc, 1, size(acc) - 1), array('{merged}'))
        ELSE concat(acc, array(x))
      END)
    """


def _has_pair_expr(left: str, right: str) -> str:
    """Boolean SQL expression: ``syms`` contains the (left, right)
    adjacency.  Word-length arrays only, so the interpreted HOF is in
    the sanctioned vocabulary-sized regime."""
    if not (_SYM_SAFE.match(left) and _SYM_SAFE.match(right)):
        raise ValueError(f"merge symbols not literal-safe: {(left, right)!r}")
    return (
        f"exists(zip_with(slice(syms, 1, size(syms) - 1),"
        f" slice(syms, 2, size(syms) - 1),"
        f" (a, b) -> a = '{left}' AND b = '{right}'), v -> v)"
    )


def _pair_rows(df: DataFrame, syms_col: str, sign: int):
    """(l, r, w) adjacent-pair rows of ``syms_col`` weighted ±n."""
    return df.select(
        (F.col("n") * sign).alias("w"),
        F.explode(
            F.expr(
                f"transform(slice({syms_col}, 1, size({syms_col}) - 1),"
                f" (x, i) -> struct(x AS l, element_at({syms_col}, i + 2) AS r))"
            )
        ).alias("p"),
    ).select("p.l", "p.r", "w")


def _safe_batch(
    counts: dict[tuple[str, str], int], limit: int, min_count: int
) -> list[tuple[str, str]]:
    """Longest prefix of the canonical merge order that is PROVABLY
    canonical from the current pair-count table alone — the batching
    rule that lets one Spark delta-job carry many merges.

    Canonical BPE re-ranks after every merge because applying (a, b)
    (i) changes the counts of pairs touching a or b and (ii) creates
    new pairs containing the merged symbol ab.  A candidate (l, r, c)
    taken from the PRE-batch table is still the true argmax at its
    step iff neither mechanism can interfere:

    * **Unchanged count**: l, r ∉ {a, b, ab} of every earlier batch
      member — applying those merges then cannot create or destroy an
      (l, r) adjacency, and ab is strictly longer than a so no new
      symbol collides with l or r either.
    * **No new pair can outrank it**: a new pair from applying (a, b)
      is (x, ab) — born from an original (x, a) adjacency — or
      (ab, y) — born from (b, y) — so its count is bounded by
      min(c_ab, max(maxL[a], maxR[b])) where maxL/maxR are the max
      pre-batch counts into/out of a symbol.  Chained new pairs
      (ab_j, ab_k) are born from original (b_j, a_k) adjacencies and
      are covered by the same bound.  We require the bound STRICTLY
      below c (a tie is conservatively treated as a conflict, because
      the new pair's lexicographic identity is unknown).

    Destroyed pairs only lose count, so they can never beat a
    candidate they didn't already beat.  The batch stops at the first
    candidate that fails a guard; the caller then applies the batch,
    measures the real deltas with one Spark job, and re-enters.  Batch
    size is corpus-dependent: ~1 under heavy symbol reuse, tens to
    hundreds on natural text where top pairs touch disjoint symbols.
    """
    order = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    batch: list[tuple[str, str]] = []
    touched: set[str] = set()
    bounds: list[int] = []
    max_l: dict[str, int] = {}
    max_r: dict[str, int] = {}
    for (l, r), c in counts.items():
        if c > max_l.get(r, 0):
            max_l[r] = c
        if c > max_r.get(l, 0):
            max_r[l] = c
    for (l, r), c in order:
        if c < min_count:
            break
        if batch:
            if l in touched or r in touched:
                break
            if any(b >= c for b in bounds):
                break
        batch.append((l, r))
        touched.update((l, r, l + r))
        bounds.append(min(c, max(max_l.get(l, 0), max_r.get(r, 0))))
        if len(batch) >= limit:
            break
    return batch


def bpe_train(
    word_counts: DataFrame,
    n_merges: int,
    min_count: int = 2,
    driver_vocab_limit: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Distributed BPE training over a ``(word, n)`` weighted
    vocabulary DataFrame — the round-8 two-tier trainer (bit-identical
    output to the naive per-merge loop, pinned by
    tests/test_tokenizer.py's provenance + fuzz tests).

    One corpus pass produces ``word_counts`` (the caller's
    split/explode/groupBy) — that is the only corpus-sized work, and
    the only part that NEEDS the cluster.  The training loop itself is
    vocabulary-sized (Heaps' law: vocab ∝ corpusᵝ, β≈0.5 — the same
    boundedness the encode path already leans on to run its pandas UDF
    over distinct words only), so:

    * **In-memory tier** (vocab ≤ ``driver_vocab_limit`` rows): collect
      the weighted vocabulary and run the exact incremental algorithm
      production trainers use (:func:`_bpe_train_inmemory`: pair→count
      + pair→word index, lazy heap, only affected words re-scanned per
      merge).  TOTAL Spark jobs: 1 — a real 50 k-merge train stops
      being 50 k sequential Spark jobs.  The probe of vocab size is
      ``limit(L+1).collect()``: if ≤ L rows come back that IS the whole
      vocabulary (no sampling bias possible).  A 100 TB corpus has a
      ~10⁷–10⁸-word vocabulary — gigabytes, a driver-sized object, which
      is exactly why this tier is the production path.
    * **Distributed tier** (vocab above the limit):
      :func:`bpe_train_delta` — delta-maintained pair counts on the
      driver with provably canonical merge BATCHING, ~2 jobs per batch
      instead of ~2 jobs per merge, and each delta job scans only the
      affected slice of the vocabulary instead of all of it.

    Measured on the 10× probe corpus in SCALE_PROBE.json
    (``bpe_trainer`` section): jobs-per-merge and wall for all three
    formulations (in-memory / batched-delta / naive per-merge).
    """
    head = word_counts.select("word", F.col("n").cast("long").alias("n")).limit(
        driver_vocab_limit + 1
    ).collect()
    if len(head) <= driver_vocab_limit:
        return _bpe_train_inmemory(
            [(r["word"], r["n"]) for r in head], n_merges, min_count
        )
    return bpe_train_delta(word_counts, n_merges, min_count)


def _bpe_train_inmemory(
    vocab: list[tuple[str, int]], n_merges: int, min_count: int = 2
) -> list[tuple[str, str]]:
    """Exact canonical BPE over an in-memory weighted vocabulary — the
    incremental algorithm (Sennrich et al. 2016 §3.2 as engineered in
    production tokenizer trainers): a pair→count table, a pair→word
    inverted index so each merge re-scans ONLY the words containing
    it, and a lazily-invalidated heap for the (count DESC, pair lex)
    argmax.  Per merge the work is proportional to the affected words,
    not the vocabulary — the reason a 50 k-merge train is seconds, not
    50 k full passes.

    Stale-entry handling is what keeps it exact: a word index entry
    survives after the word stops containing the pair (we never purge
    on unrelated merges), so the apply step recomputes each affected
    word's CURRENT pairs and no-ops when the pair is gone; heap
    entries are re-validated against the live count before use.  Pair
    counts can revive (new adjacencies form around freshly merged
    symbols), which the lazy heap push-on-change also covers."""
    import heapq
    from collections import Counter, defaultdict

    words = [list(w) for w, _ in vocab]
    weights = [n for _, n in vocab]
    pc: Counter = Counter()
    occ: defaultdict = defaultdict(set)
    for i, syms in enumerate(words):
        n = weights[i]
        for a, b in zip(syms, syms[1:]):
            pc[(a, b)] += n
            occ[(a, b)].add(i)
    heap = [(-c, p) for p, c in pc.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, pair = heap[0]
        live = pc.get(pair, 0)
        if live != -negc:
            heapq.heappop(heap)
            if live > 0:
                heapq.heappush(heap, (-live, pair))
            continue
        if live < min_count:
            break
        heapq.heappop(heap)
        merges.append(pair)
        left, right = pair
        changed: set = set()
        for i in occ.pop(pair, ()):
            syms = words[i]
            new = encode_word_one(syms, left, right)
            if new is None:  # stale index entry: pair no longer present
                continue
            n = weights[i]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] -= n
                changed.add((a, b))
            for a, b in zip(new, new[1:]):
                pc[(a, b)] += n
                occ[(a, b)].add(i)
                changed.add((a, b))
            words[i] = new
        for p in changed:
            c = pc.get(p, 0)
            if c <= 0:
                pc.pop(p, None)
            elif p != pair:
                heapq.heappush(heap, (-c, p))
        pc.pop(pair, None)
    return merges


def encode_word_one(
    syms: list[str], left: str, right: str
) -> list[str] | None:
    """One leftmost non-overlapping merge pass over a symbol list;
    returns None when the pair does not occur (the in-memory trainer's
    stale-index fast path)."""
    out, i, n, hit = [], 0, len(syms), False
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
            hit = True
        else:
            out.append(syms[i])
            i += 1
    return out if hit else None


def bpe_train_delta(
    word_counts: DataFrame, n_merges: int, min_count: int = 2
) -> list[tuple[str, str]]:
    """Distributed delta-maintained trainer — the exceed-driver tier.

    The pair-count table lives on the driver (distinct adjacent symbol
    pairs grow ∝ vocabulary, not corpus), so the per-merge argmax is a
    dict lookup, not a Spark job.  Per BATCH of merges (see
    :func:`_safe_batch` for the exactness proof) the cluster runs ONE
    delta job — filter to words containing a batch pair, apply the
    whole batch as one chained JVM fold, emit ±n weighted pair rows,
    aggregate — and one ``localCheckpoint`` to truncate lineage: ~2
    jobs per batch versus ~2 jobs per MERGE in the naive loop
    (:func:`bpe_train_permerge`), with each delta job scanning only
    the affected slice of the vocabulary instead of all of it."""
    df = word_counts.select(
        "word", F.col("n").cast("long").alias("n"), F.split("word", "").alias("syms")
    ).localCheckpoint()
    counts: dict[tuple[str, str], int] = {
        (row["l"], row["r"]): row["w"]
        for row in _pair_rows(df, "syms", 1).groupBy("l", "r").agg(
            F.sum("w").alias("w")
        ).collect()
    }
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and counts:
        batch = _safe_batch(counts, n_merges - len(merges), min_count)
        if not batch:
            break
        merges.extend(batch)
        affected = " OR ".join(_has_pair_expr(l, r) for l, r in batch)
        fold = "syms"
        for l, r in batch:
            fold = _merge_fold_expr(l, r, fold)
        folded = df.where(F.expr(affected)).withColumn(
            "new_syms", F.expr(fold)
        )
        delta = (
            _pair_rows(folded, "syms", -1)
            .unionByName(_pair_rows(folded, "new_syms", 1))
            .groupBy("l", "r")
            .agg(F.sum("w").alias("d"))
            .where("d <> 0")
            .collect()
        )
        for row in delta:
            key = (row["l"], row["r"])
            c = counts.get(key, 0) + row["d"]
            if c > 0:
                counts[key] = c
            else:
                counts.pop(key, None)
        df = df.withColumn(
            "syms",
            F.when(F.expr(affected), F.expr(fold)).otherwise(F.col("syms")),
        ).localCheckpoint()
    return merges


def bpe_train_permerge(
    word_counts: DataFrame, n_merges: int, min_count: int = 2
) -> list[tuple[str, str]]:
    """The naive one-argmax-job-per-merge trainer (the pre-round-8
    formulation), kept as the A/B reference for the batched trainer:
    equality is fuzz-pinned in tests/test_tokenizer.py and the
    jobs/wall gap is measured in SCALE_PROBE.json (bpe_trainer
    section).  Each iteration: adjacent-pair explode + weighted count,
    deterministic argmax (count DESC, then pair lexicographic — a
    1-row bounded collect), then the merge applied as a JVM fold over
    the WHOLE vocabulary."""
    df = word_counts.select(
        "word", F.col("n").cast("long").alias("n"), F.split("word", "").alias("syms")
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            _pair_rows(df, "syms", 1)
            .groupBy("l", "r")
            .agg(F.sum("w").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((left, right))
        df = df.withColumn(
            "syms", F.expr(_merge_fold_expr(left, right))
        ).localCheckpoint()
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
