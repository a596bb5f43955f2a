"""Adversarial correctness properties for the round-4b operators.

The oracle parity row checks ONE corpus; these tests check the
theorems on randomized corpora engineered to stress the edge cases:
- prefix filtering: completeness (no false negatives) must hold for
  ANY corpus and ANY threshold, including sets near the prefix-length
  rounding boundaries — this is the claim q_dedup_allpairs' docstring
  makes "by theorem", so test the theorem, not the one corpus.
- CDC upsert: the merge must be a fold of an associative operation —
  any chunking of the same events yields the same state.
"""

from __future__ import annotations

import itertools
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _brute_pairs(docs: list[tuple[int, list[str]]], t: float):
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(docs, 2):
        a, b = set(sa), set(sb)
        j = len(a & b) / len(a | b)
        if j >= t:
            out.add((min(ia, ib), max(ia, ib)))
    return out


@pytest.mark.parametrize("length_buckets", [False, True])
def test_prefix_filter_complete_on_random_corpora(spark, length_buckets):
    """Seeded random corpora with a SMALL vocabulary (maximum token
    collision pressure — the regime where pruning is hardest and a
    broken filter would show as missing pairs) at three thresholds
    spanning the prefix-length rounding behavior.  Parametrized over
    both join-key variants (single-token and (token, length-bucket)
    composite) — the bucketed path must be exactly as complete."""
    from cs425_distributed_systems_mp4_mapreduce_spark.operators.dedup import (
        jaccard,
        prefix_filter_candidate_pairs,
    )

    rng = random.Random(42)
    vocab = [f"tok{i}" for i in range(40)]
    docs = []
    for i in range(60):
        n = rng.randint(1, 12)
        docs.append((i, sorted(rng.sample(vocab, n))))
    # plant exact duplicates and near-duplicates (jaccard 1.0 and high)
    docs.append((100, docs[0][1]))
    docs.append((101, docs[1][1] + ["tok39"]))

    sets = spark.createDataFrame(
        [(i, s) for i, s in docs], "doc_id long, s array<string>"
    )
    for t in (0.5, 0.8, 0.95):
        cand = prefix_filter_candidate_pairs(sets, t, length_buckets=length_buckets)
        got = (
            cand.join(
                sets.select(F.col("doc_id").alias("id_a"), F.col("s").alias("_sa")),
                "id_a",
            )
            .join(
                sets.select(F.col("doc_id").alias("id_b"), F.col("s").alias("_sb")),
                "id_b",
            )
            .withColumn("j", jaccard(F.col("_sa"), F.col("_sb")))
            .filter(F.col("j") >= t)
        )
        got_pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
        want = _brute_pairs(docs, t)
        assert got_pairs == want, (
            f"t={t}: missing={want - got_pairs} extra={got_pairs - want}"
        )


@pytest.mark.parametrize("length_buckets", [False, True])
def test_prefix_filter_float_boundary_pairs(spark, length_buckets):
    """Pin the IEEE-rounding bug class: t/(1+t) for t=0.8 rounds UP in
    double (0.8/1.8 → …449), so a raw ceil over-tightens the PPJoin
    positional bound α at exact-boundary pairs.  Plant subset pairs at
    EXACTLY J=t with |a|+|b| in the affected sums (28⊂35 → 63, and
    scaled multiples) among random filler docs; a raw-ceil α prunes
    them (measured pre-fix), the epsilon-guarded bound must not."""
    from cs425_distributed_systems_mp4_mapreduce_spark.operators.dedup import (
        jaccard,
        prefix_filter_candidate_pairs,
    )

    t = 0.8
    rng = random.Random(7)
    docs = []
    planted = []
    # (na, nb) with na = 0.8·nb exactly and J = na/nb = 0.8: subset
    # pairs.  63 = 28+35 is the smallest sum where ceil(0.8/1.8·s)
    # errs; include multiples to cover more affected sums.
    for i, nb in enumerate((35, 70, 105, 140)):
        na = (4 * nb) // 5
        big = [f"p{i}_t{j}" for j in range(nb)]
        docs.append((1000 + 2 * i, big[:na]))
        docs.append((1001 + 2 * i, big))
        planted.append((1000 + 2 * i, 1001 + 2 * i))
    vocab = [f"f{i}" for i in range(300)]
    for i in range(40):
        docs.append((i, sorted(rng.sample(vocab, rng.randint(5, 60)))))

    sets = spark.createDataFrame(
        [(i, s) for i, s in docs], "doc_id long, s array<string>"
    )
    cand = prefix_filter_candidate_pairs(sets, t, length_buckets=length_buckets)
    got = (
        cand.join(
            sets.select(F.col("doc_id").alias("id_a"), F.col("s").alias("_sa")),
            "id_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("id_b"), F.col("s").alias("_sb")),
            "id_b",
        )
        .withColumn("j", jaccard(F.col("_sa"), F.col("_sb")))
        .filter(F.col("j") >= t)
    )
    got_pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    want = _brute_pairs(docs, t)
    assert set(planted) <= want  # sanity: the plant really is J >= t
    assert got_pairs == want, (
        f"missing={want - got_pairs} extra={got_pairs - want}"
    )


@pytest.mark.parametrize("length_buckets", [False, True])
def test_prefix_filter_complete_for_arbitrary_thresholds(spark, length_buckets):
    """The length/prefix bounds take ARBITRARY t; completeness must
    hold for unlucky thresholds whose t·n / n/t land on near-integer
    floats, not just the shipped 0.5/0.8.  Seeded corpus, awkward
    irrational-ish thresholds."""
    from cs425_distributed_systems_mp4_mapreduce_spark.operators.dedup import (
        jaccard,
        prefix_filter_candidate_pairs,
    )

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(80)]
    docs = [
        (i, sorted(rng.sample(vocab, rng.randint(2, 40)))) for i in range(50)
    ]
    docs.append((200, docs[0][1]))
    docs.append((201, docs[2][1][:-1] if len(docs[2][1]) > 1 else docs[2][1]))
    sets = spark.createDataFrame(
        [(i, s) for i, s in docs], "doc_id long, s array<string>"
    )
    for t in (0.3, 1 / 3, 0.6, 0.7, 2 / 3, 0.9):
        cand = prefix_filter_candidate_pairs(sets, t, length_buckets=length_buckets)
        got = (
            cand.join(
                sets.select(F.col("doc_id").alias("id_a"), F.col("s").alias("_sa")),
                "id_a",
            )
            .join(
                sets.select(F.col("doc_id").alias("id_b"), F.col("s").alias("_sb")),
                "id_b",
            )
            .withColumn("j", jaccard(F.col("_sa"), F.col("_sb")))
            .filter(F.col("j") >= t)
        )
        got_pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
        want = _brute_pairs(docs, t)
        assert got_pairs == want, (
            f"t={t}: missing={want - got_pairs} extra={got_pairs - want}"
        )


def test_cdc_merge_is_chunking_invariant(spark):
    """Fold associativity: merging per-chunk summaries must equal the
    single-pass summary for EVERY chunking — including chunk splits
    that separate a key's earlier and later events (the case where a
    broken last-write-wins would pick the wrong side)."""
    from cs425_distributed_systems_mp4_mapreduce_spark.streaming.cdc import (
        _merge,
        _summarize,
    )
    from cs425_distributed_systems_mp4_mapreduce_spark.sources.tables import table
    from conftest import SF_SMOKE

    e = table(spark, SF_SMOKE, "events")
    want = (
        _summarize(e)
        .orderBy("user_id", "event_type")
        .toPandas()
        .reset_index(drop=True)
    )
    for n_chunks, key in ((3, "event_id"), (4, "ts")):
        state = None
        for i in range(n_chunks):
            chunk = e.filter(F.col(key) % n_chunks == i)
            state = _merge(state, _summarize(chunk))
        got = (
            state.orderBy("user_id", "event_type")
            .toPandas()
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


@pytest.mark.parametrize("vocab_size", [60, 130], ids=["bitmask_V<=64", "prefix_V>64"])
def test_containment_prefix_rewrite_matches_brute_force(spark, tmp_path, vocab_size):
    """r13: q_dedup_containment's prefix-filtered + hashed-verify
    rewrite must equal the brute-force containment predicate on a
    corpus engineered around the integer-threshold boundaries:
    |A| = 25 exactly (the size floor), |A∩B| = ceil(0.9|A|) exactly
    (pairs that pass by ONE token), one token below (must be absent),
    and a doc under the size floor with full containment (absent).

    r14: parametrized over BOTH adaptive regimes — vocab 60 drives the
    V≤64 single-word bitmask fast path, vocab 130 (with a full-vocab
    cover doc pinning V>64) drives the r13 prefix-filter path; the
    planted boundary pairs use the shared low slice of the vocabulary
    so the same four assertions exercise each branch."""
    import duckdb

    from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(vocab_size)]
    docs = []
    # A0: 30 tokens; B0 contains ceil(0.9*30)=27 of them -> pass by 1
    a0 = vocab[:30]
    b0 = a0[:27] + vocab[40:50]
    # A1: 30 tokens; B1 contains 26 -> below threshold, must NOT appear
    a1 = vocab[10:40]
    b1 = a1[:26] + vocab[50:60]
    # A2: 25 tokens (size floor) fully inside B2
    a2 = vocab[20:45]
    b2 = a2 + vocab[:10]
    # A3: 24 tokens (below floor) fully inside B3 -> must NOT appear
    a3 = vocab[5:29]
    b3 = a3 + vocab[40:55]
    fixed = [a0, b0, a1, b1, a2, b2, a3, b3]
    docs = [(i, s) for i, s in enumerate(fixed)]
    for i in range(8, 40):
        docs.append((i, sorted(rng.sample(vocab, rng.randint(6, 35)))))
    if vocab_size > 64:
        docs.append((40, vocab))  # cover doc: pins the appearing V > 64

    pdf = pd.DataFrame(
        {
            "doc_id": [i for i, _ in docs],
            "text": [" ".join(s) for _, s in docs],
            "lang": "en",
            "n_chars": [len(" ".join(s)) for _, s in docs],
            "source": "fixture",
        }
    )
    sf_dir = str(tmp_path)
    pdf.to_parquet(f"{sf_dir}/documents.parquet", index=False)

    got = (
        all_queries()["q_dedup_containment"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["contained_id", "container_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet')"
    )
    want = (
        con.execute(all_queries()["q_dedup_containment"].oracle)
        .df()
        .sort_values(["contained_id", "container_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )
    pairs = set(zip(got.contained_id, got.container_id))
    assert (0, 1) in pairs  # pass-by-one boundary
    assert (2, 3) not in pairs  # one token short
    assert (4, 5) in pairs  # size floor, full containment
    assert (6, 7) not in pairs  # below the size floor
