"""Planted-fixture tests for the probabilistic LLM-data operators
(SURVEY.md §5.2): LSH recall on known near-dups, simhash sensitivity,
embedding near-dup detection, language ID on real sentences, multimodal
featurize determinism, dedup idempotence."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cs425_distributed_systems_mp4_mapreduce_spark.operators.dedup import (
    embedding_near_pairs,
    exact_dedup,
    minhash_near_pairs,
    simhash64,
    simhash_near_pairs,
)
from cs425_distributed_systems_mp4_mapreduce_spark.operators.multimodal import (
    attach_blob,
    featurize_blobs,
)
from cs425_distributed_systems_mp4_mapreduce_spark.operators.similarity import (
    topk_cosine,
    topk_cosine_lsh,
)
from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def planted_docs(spark):
    """documents ∪ near-duplicates of the first 10 docs (one token
    changed) ∪ one exact duplicate."""
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    base = d.limit(10).collect()
    rows = [(r.doc_id, r.text) for r in d.collect()]
    planted = []
    for r in base:
        toks = r.text.split(" ")
        toks[len(toks) // 2] = "PLANTEDTOKEN"
        planted.append((10_000 + r.doc_id, " ".join(toks)))
    exact_copy = [(20_000, rows[0][1])]
    return spark.createDataFrame(rows + planted + exact_copy, "doc_id long, text string")


def test_minhash_recall_on_planted(spark, planted_docs):
    pairs = minhash_near_pairs(
        planted_docs, jaccard_threshold=0.5, num_tables=16
    ).collect()
    found = {(p.id_a, p.id_b) for p in pairs}
    expected = {(i, 10_000 + i) for i in range(10)}
    recall = len(found & expected) / len(expected)
    assert recall >= 0.9, f"minhash recall {recall}: found {sorted(found)[:20]}"
    assert (0, 20_000) in found, "exact duplicate must be found"


def test_simhash_identical_and_near(spark, planted_docs):
    sh = planted_docs.select(
        "doc_id", simhash64("text").alias("sh")
    ).collect()
    by_id = {r.doc_id: r.sh for r in sh}
    assert by_id[0] == by_id[20_000], "identical text -> identical simhash"
    # one-token edit flips few bits
    ham = bin((by_id[0] ^ by_id[10_000]) & (2**64 - 1)).count("1")
    assert ham <= 16, f"near-dup hamming too high: {ham}"


def test_simhash_near_pairs_finds_exact_dup(spark, planted_docs):
    pairs = simhash_near_pairs(planted_docs, max_hamming=3).collect()
    found = {(p.id_a, p.id_b) for p in pairs}
    assert (0, 20_000) in found


def test_simhash_max_hamming_zero(spark, planted_docs):
    # single 64-bit band: the unmasked-final-band form must not emit a
    # (1<<64)-1 literal (Spark long parser overflow)
    pairs = simhash_near_pairs(planted_docs, max_hamming=0).collect()
    found = {(p.id_a, p.id_b): p.hamming for p in pairs}
    assert found.get((0, 20_000)) == 0
    assert all(h == 0 for h in found.values())


def test_embedding_near_pairs_finds_planted(spark):
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    copy = e.filter(F.col("vec_id") == 1).select(
        (F.col("vec_id") + 50_000).alias("vec_id"), "embedding", "label"
    )
    planted = e.unionByName(copy)
    pairs = embedding_near_pairs(planted, cosine_threshold=0.99).collect()
    assert any(p.id_a == 1 and p.id_b == 50_001 for p in pairs), pairs


def test_exact_dedup_idempotent_and_correct(spark, planted_docs):
    once = exact_dedup(planted_docs, key_cols=("text",), id_col="doc_id")
    twice = exact_dedup(once, key_cols=("text",), id_col="doc_id")
    assert once.count() == twice.count() == planted_docs.count() - 1
    # winner is the LOWEST id
    kept = {r.doc_id for r in once.collect()}
    assert 0 in kept and 20_000 not in kept


def test_lsh_topk_recall_vs_bruteforce(spark):
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = e.filter(F.col("vec_id") == 0).first()["embedding"]
    exact = {r.vec_id for r in topk_cosine(e, q, k=10).collect()}
    ann = {r.vec_id for r in topk_cosine_lsh(e, q, k=10, num_tables=4).collect()}
    recall = len(exact & ann) / 10
    assert recall >= 0.5, f"ANN recall vs brute force too low: {recall}"


def test_langid_real_sentences(spark):
    rows = [
        ("the cat is on the mat and it is happy", "en"),
        ("le chat est sur la table et il est content pour la vie", "fr"),
        ("el gato es de la casa y es feliz en el sol", "es"),
        ("der Hund ist mit der Katze und das ist gut für die Welt", "de"),
        ("这是一个中文句子 关于分布式系统", "zh"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    from cs425_distributed_systems_mp4_mapreduce_spark.functions.text import langid_udf

    preds = [r[0] for r in df.select(langid_udf("text")).collect()]
    assert preds == [want for _, want in rows], preds


def test_featurize_blobs_deterministic(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    f1 = featurize_blobs(attach_blob(d)).orderBy("doc_id").collect()
    f2 = featurize_blobs(attach_blob(d.repartition(7))).orderBy("doc_id").collect()
    assert f1 == f2, "features must not depend on partitioning"
    r = f1[0]
    assert r.n_bytes > 0 and len(r.sha1_8) == 8
    assert 16 <= r.fake_width < 1040 and 16 <= r.fake_height < 1040


def test_connected_components_planted(spark):
    from cs425_distributed_systems_mp4_mapreduce_spark.operators.graph import (
        connected_components,
    )

    # chain 1-2-3 (diameter 2), pair 10-11, singletons 20 and 21
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 20, 21]], "id long")
    got = {
        r.id: r.component
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 21}


def test_connected_components_long_chain_converges(spark):
    from cs425_distributed_systems_mp4_mapreduce_spark.operators.graph import (
        connected_components,
    )

    # 0-1-2-...-19: worst-case diameter for the iteration bound
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], "id_a long, id_b long"
    )
    got = connected_components(edges).groupBy("component").count().collect()
    assert len(got) == 1 and got[0].component == 0 and got[0]["count"] == 20

    # strict non-convergence surfaces as the intended RuntimeError for
    # ANY max_iter — including <= 0, where the raise's message formerly
    # referenced an unbound loop variable and died as NameError
    # (ADVICE r13)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=0)
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


def test_hash_split_stable_under_repartition(spark):
    from cs425_distributed_systems_mp4_mapreduce_spark.operators.sampling import (
        hash_bucket,
        knuth_bucket,
        split_assign,
    )

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    fr = {"train": 0.8, "valid": 0.1, "test": 0.1}
    for bucket, buckets in [
        (knuth_bucket(F.col("doc_id")), 100),
        (hash_bucket([F.col("text")], 10_000), 10_000),
    ]:
        a = split_assign(d, bucket, fr, buckets).select("doc_id", "split")
        b = split_assign(d.repartition(13), bucket, fr, buckets).select("doc_id", "split")
        assert a.orderBy("doc_id").collect() == b.orderBy("doc_id").collect()
        # every row assigned, fractions roughly honored
        counts = {r.split: r["count"] for r in a.groupBy("split").count().collect()}
        n = sum(counts.values())
        assert n == d.count() and None not in counts
        assert 0.7 < counts["train"] / n < 0.9


def test_stratified_sample_rates(spark):
    from cs425_distributed_systems_mp4_mapreduce_spark.operators.sampling import (
        stratified_sample,
    )

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    langs = [r.lang for r in d.select("lang").distinct().collect()]
    s = stratified_sample(d, "lang", {lg: 0.5 for lg in langs})
    tot = {r.lang: r["count"] for r in d.groupBy("lang").count().collect()}
    got = {r.lang: r["count"] for r in s.groupBy("lang").count().collect()}
    for lg, n in tot.items():
        rate = got.get(lg, 0) / n
        assert 0.2 < rate < 0.8, f"{lg}: rate {rate} far from 0.5 (n={n})"


def test_split_assign_properties(spark):
    """Property check over assorted fraction maps: every row labeled,
    labels limited to the declared splits, empirical fractions within
    tolerance of the spec."""
    from cs425_distributed_systems_mp4_mapreduce_spark.operators.sampling import (
        knuth_bucket,
        split_assign,
    )

    d = spark.range(0, 2000).withColumnRenamed("id", "k")
    for fractions in [
        {"a": 0.5, "b": 0.5},
        {"train": 0.8, "valid": 0.1, "test": 0.1},
        {"x": 0.98, "y": 0.02},
        {"p": 0.25, "q": 0.25, "r": 0.25, "s": 0.25},
    ]:
        out = split_assign(d, knuth_bucket(F.col("k")), fractions)
        counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
        assert set(counts) <= set(fractions), counts
        n = sum(counts.values())
        assert n == 2000
        for name, frac in fractions.items():
            got = counts.get(name, 0) / n
            assert abs(got - frac) < 0.08, (fractions, name, got)


def test_connected_components_star_matches_propagation(spark):
    from cs425_distributed_systems_mp4_mapreduce_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (11, 12), (12, 13)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 15)], "id long")
    a = {r.id: r.component for r in connected_components(edges, nodes=nodes).collect()}
    b = {r.id: r.component for r in connected_components_star(edges, nodes=nodes).collect()}
    assert a == b, (a, b)


def test_connected_components_star_log_rounds_on_chain(spark):
    # worst case for label propagation: a 20-node chain needs 19
    # propagation rounds; large-star/small-star squares reach per round
    # and must finish within 6 — run with max_iter=6 and demand the
    # exact answer
    from cs425_distributed_systems_mp4_mapreduce_spark.operators.graph import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], "id_a long, id_b long"
    )
    got = connected_components_star(edges, max_iter=6)
    comps = {r.id: r.component for r in got.collect()}
    assert comps == {i: 0 for i in range(20)}, comps


def test_chunking_covers_every_token(spark):
    """q_text_chunk's window/stride arithmetic must leave no token
    uncovered and no empty chunks: with window=32, stride=24, chunk i
    covers token positions [24i, 24i+32); the union over i must cover
    [0, n_tokens) for every document."""
    import pyspark.sql.functions as F

    from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries
    from conftest import SF_SMOKE

    chunks = all_queries()["q_text_chunk"].fn(spark, SF_SMOKE).collect()
    ntok = {
        r["doc_id"]: r["n"]
        for r in (
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id", F.size(F.split("text", " ")).alias("n"))
            .collect()
        )
    }
    per_doc = {}
    for r in chunks:
        assert r["n_chunk_tokens"] >= 1, r  # no empty chunks
        assert len(r["chunk_text"].split(" ")) == r["n_chunk_tokens"], r
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert set(per_doc) == set(ntok)
    for doc_id, rows in per_doc.items():
        covered = set()
        for r in rows:
            start = r["chunk_idx"] * 24
            covered.update(range(start, start + r["n_chunk_tokens"]))
        assert covered == set(range(ntok[doc_id])), doc_id


def test_hll_sketch_merge_lossless_and_accurate(spark):
    """q_sketch_hll_merge is rows-only (implementation-defined
    estimates) — so pin the properties that matter instead:
    (1) MERGE LOSSLESSNESS: union(per-day sketches) estimates exactly
        what one sketch over the whole stream estimates (HLL merge at
        equal lgK is exact, not approximate) — the re-aggregation
        contract that makes sketches the 100 TB rollup primitive;
    (2) accuracy: the merged estimate is within the published HLL
        error (lgK=12 -> ~1.6% rse; allow 5%) of the exact count."""
    import pyspark.sql.functions as F

    from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries
    from cs425_distributed_systems_mp4_mapreduce_spark.sources.tables import table as T
    from conftest import SF_T2

    out = {r["day"]: r["n_users_est"]
           for r in all_queries()["q_sketch_hll_merge"].fn(spark, SF_T2).collect()}
    merged = out.pop(-1)

    e = T(spark, SF_T2, "events")
    global_est = e.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))")
    ).collect()[0][0]
    assert merged == global_est, (merged, global_est)

    exact = e.select("user_id").distinct().count()
    assert abs(merged - exact) / exact < 0.05, (merged, exact)
    # per-day estimates exist for every active day
    n_days = e.select(F.expr("(ts DIV 1000) DIV 86400000000").alias("d")).distinct().count()
    assert len(out) == n_days


def test_funnel_matches_independent_pandas_mirror(spark):
    """q_events_funnel's ordered-stage logic is the same CTE shape on
    both engines, so parity can't catch a shared misconception (e.g.
    counting clicks that precede the first view).  Recompute the
    funnel with an independent pandas implementation and require exact
    equality — including at least one user whose click-before-view
    ordering would change the naive 3-independent-filters answer."""
    import pandas as pd

    from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries
    from conftest import SF_T2

    ev = pd.read_parquet(f"{SF_T2}/events.parquet")[
        ["user_id", "ts", "event_type"]
    ]
    ev["ts_us"] = ev["ts"].astype("int64")  # µs epoch

    t_v = (
        ev[ev.event_type == "view"].groupby("user_id")["ts_us"].min().rename("t_v")
    )
    c = ev[ev.event_type == "click"].merge(t_v, on="user_id")
    t_c = c[c.ts_us >= c.t_v].groupby("user_id")["ts_us"].min().rename("t_c")
    p = ev[ev.event_type == "purchase"].merge(t_c, on="user_id")
    t_p = p[p.ts_us >= p.t_c].groupby("user_id")["ts_us"].min()

    row = all_queries()["q_events_funnel"].fn(spark, SF_T2).collect()[0]
    assert (row["n_viewed"], row["n_clicked"], row["n_purchased"]) == (
        len(t_v),
        len(t_c),
        len(t_p),
    )

    # the ordering constraint must be non-vacuous on this corpus: some
    # user has a click strictly before their first view (else the test
    # couldn't distinguish the funnel from independent filters)
    all_clicks = ev[ev.event_type == "click"].merge(t_v, on="user_id")
    assert (all_clicks.ts_us < all_clicks.t_v).any()


def test_ppm_decoder_parses_any_valid_p6():
    """decode_ppm is a REAL parser, not an inverse of our encoder: it
    must accept arbitrary header whitespace and reject malformed
    payloads."""
    import numpy as np
    import pytest as _pytest

    from cs425_distributed_systems_mp4_mapreduce_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm_solid_gradient,
    )

    # roundtrip of our own encoder
    img = decode_ppm(encode_ppm_solid_gradient(42))
    assert img.shape == (3 + 42 % 7, 4 + 42 % 13, 3)

    # foreign header style: multi-space / newline mix
    raw = np.arange(2 * 3 * 3, dtype=np.uint8)
    blob = b"P6  3\n 2\t255\n" + raw.tobytes()
    img2 = decode_ppm(blob)
    assert img2.shape == (2, 3, 3)
    assert (img2.reshape(-1) == raw).all()

    with _pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with _pytest.raises(ValueError, match="payload"):
        decode_ppm(b"P6\n2 2\n255\n\x00\x00\x00")
    with _pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 3)


def test_wav_decoder_walks_foreign_chunk_layouts():
    """decode_wav is a real RIFF parser: unknown chunks are skipped
    word-aligned, chunk order is arbitrary, malformed files reject."""
    import struct

    import numpy as np
    import pytest as _pytest

    from cs425_distributed_systems_mp4_mapreduce_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm16,
    )

    rate, s = decode_wav(encode_wav_pcm16(7))
    assert rate == 8000 and len(s) == 507

    # foreign layout: LIST chunk (odd size -> pad byte) BEFORE fmt,
    # data chunk last
    samples = np.array([-3, 0, 12345], dtype="<i2")
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
    chunks = b"".join([
        b"LIST", struct.pack("<I", 5), b"INFOx", b"\x00",   # odd size + pad
        b"fmt ", struct.pack("<I", 16), fmt,
        b"data", struct.pack("<I", 6), samples.tobytes(),
    ])
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    rate2, s2 = decode_wav(blob)
    assert rate2 == 44100 and (s2 == samples).all()

    with _pytest.raises(ValueError, match="not RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    stereo = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    bad = b"".join([b"fmt ", struct.pack("<I", 16), stereo,
                    b"data", struct.pack("<I", 0)])
    with _pytest.raises(ValueError, match="mono PCM16"):
        decode_wav(b"RIFF" + struct.pack("<I", 4 + len(bad)) + b"WAVE" + bad)


def test_rendezvous_resize_moves_one_over_n(spark):
    """The contract that justifies rendezvous over mod-N sharding:
    growing 8 → 9 shards relocates ~1/9 of documents (only those whose
    new shard's score beats all old ones), while mod-N would relocate
    ~8/9.  Exact binomial tolerance around the 1/9 expectation."""
    from pyspark.sql import functions as F

    from cs425_distributed_systems_mp4_mapreduce_spark.sources.tables import table
    from conftest import SF_T2

    d = table(spark, SF_T2, "documents").select("doc_id")

    def assign(n):
        shards = spark.range(n).select(F.col("id").alias("shard"))
        return (
            d.crossJoin(shards)
            .withColumn(
                "score", F.md5(F.concat_ws(":", F.col("doc_id"), F.col("shard")))
            )
            .groupBy("doc_id")
            .agg(F.expr("max_by(shard, score)").alias("shard"))
        )

    a8 = assign(8).withColumnRenamed("shard", "s8")
    a9 = assign(9).withColumnRenamed("shard", "s9")
    j = a8.join(a9, "doc_id")
    n = j.count()
    moved = j.filter(F.col("s8") != F.col("s9")).count()
    frac = moved / n
    assert 0.05 < frac < 0.18, f"moved {frac:.3f}, expected ~1/9"
    # every move must be INTO the new shard 8 — anything else breaks
    # the rendezvous invariant (old scores are unchanged by resize)
    bad = j.filter((F.col("s8") != F.col("s9")) & (F.col("s9") != 8)).count()
    assert bad == 0, f"{bad} docs moved between OLD shards on resize"


def test_embed_quantize_reconstruction_error_bound(spark):
    """int8 quantization quality: reconstructing x̂ = code·scale/127
    must land within scale/254 (= half a quantization step) of x per
    dimension — the standard symmetric-quantization bound."""
    import numpy as np
    from pyspark.sql import functions as F

    from cs425_distributed_systems_mp4_mapreduce_spark.sources.tables import table
    from conftest import SF_T2

    e = table(spark, SF_T2, "embeddings").limit(200).toPandas()
    for _, row in e.iterrows():
        x = np.asarray(row["embedding"], dtype=np.float64)
        s = max(np.abs(x).max(), 1e-30)
        codes = np.floor(x * 127.0 / s + 0.5)
        assert np.abs(codes).max() <= 127
        err = np.abs(codes * s / 127.0 - x).max()
        assert err <= s / 254.0 + 1e-12, (err, s)


def test_embed_quantize_edge_vectors(spark):
    """Quantizer edge cases the corpus can't produce: all-zero vectors
    (scale guard), all-negative, single-spike, and ±denormal noise —
    codes must stay in [-127, 127] and Spark must agree with the
    reference numpy computation bit-for-bit."""
    import numpy as np
    from pyspark.sql import functions as F

    vecs = [
        (1, [0.0] * 8),
        (2, [-1.0] * 8),
        (3, [0.0, 0.0, 5.5, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (4, [1e-30, -1e-30, 1e-38, -1e-38, 0.5, -0.5, 0.25, -0.25]),
        (5, [3.14159, -2.71828, 1.41421, -1.73205, 0.0, 127.0, -127.0, 64.0]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )
    got = (
        df.select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 /"
                " GREATEST(CAST(array_max(transform(embedding, y -> abs(CAST(y AS DOUBLE)))) AS DOUBLE), 1e-30d)"
                " + 0.5d) AS BIGINT))"
            ).alias("codes"),
        )
        .orderBy("vec_id")
        .collect()
    )
    for row, (_, v) in zip(got, vecs):
        x = np.asarray(v, dtype=np.float32).astype(np.float64)
        s = max(np.abs(x).max(), 1e-30)
        want = np.floor(x * 127.0 / s + 0.5).astype(np.int64)
        assert list(row["codes"]) == want.tolist(), (row["vec_id"], row["codes"], want)
        assert max(abs(c) for c in row["codes"]) <= 127


def test_rendezvous_uniformity(spark):
    """md5 scores are uniform, so shard sizes should be balanced:
    no shard off by more than ~5 sigma from n/8 on the sf0.1 corpus."""
    from pyspark.sql import functions as F

    from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

    rows = all_queries()["q_shard_rendezvous"].fn(
        spark, "/root/testdata/sf0.1"
    ).collect()
    counts = [r["n_docs"] for r in rows]
    n = sum(counts)
    exp = n / 8
    sigma = (n * (1 / 8) * (7 / 8)) ** 0.5
    assert len(counts) == 8
    for c in counts:
        assert abs(c - exp) < 5 * sigma, (counts, exp, sigma)


def test_embed_quantize_matches_numpy_and_duckdb_on_random_vectors(spark):
    """Triple-implementation fuzz for the int8 quantizer: seeded random
    float32 vectors through (a) the Spark higher-order-function codes,
    (b) DuckDB's list_transform twin, and (c) a numpy float64 model of
    floor(x*127/s + 0.5) — all three must emit identical integer codes
    (the double-cast discipline q_embed_quantize's docstring pins)."""
    import duckdb
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(427)
    vecs = [rng.normal(0, 0.1, size=16).astype("float32") for _ in range(40)]
    vecs += [np.array([0.5, -0.5, 0.25] * 4 + [1.0] * 4, dtype="float32"),
             np.full(16, 1e-20, dtype="float32")]

    def model(v):
        x = v.astype("float64")
        s = max(float(np.max(np.abs(x))), 1e-30)
        return [int(np.floor(xi * 127.0 / s + 0.5)) for xi in x]

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<float>",
    )
    codes_expr = (
        "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 /"
        " GREATEST(CAST(array_max(transform(embedding,"
        " y -> abs(CAST(y AS DOUBLE)))) AS DOUBLE), 1e-30d)"
        " + 0.5d) AS BIGINT))"
    )
    got = {r.vec_id: list(r.codes)
           for r in df.select("vec_id", F.expr(codes_expr).alias("codes")).collect()}
    con = duckdb.connect()
    duck_sql = """
    SELECT list_transform(?::FLOAT[],
        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 /
             GREATEST(CAST(list_max(list_transform(?::FLOAT[],
                 y -> ABS(CAST(y AS DOUBLE)))) AS DOUBLE), 1e-30)
             + 0.5) AS BIGINT))
    """
    for i, v in enumerate(vecs):
        want = model(v)
        assert got[i] == want, f"spark != numpy model on vec {i}"
        lst = [float(x) for x in v]
        duck = con.execute(duck_sql, [lst, lst]).fetchone()[0]
        assert list(duck) == want, f"duckdb != numpy model on vec {i}"


def test_ann_xengine_discovery_is_band_complete(spark):
    """q_sim_ann_xengine's candidate set must be EXACTLY the pairs
    sharing >= 1 packed band value (the property the DuckDB oracle
    brute-forces): recompute signatures via the query's own plan,
    brute-force the pair set in pandas, and compare.  Also pins the
    geometry's selectivity — candidates stay ~1% of all-pairs at
    sf0.01, the number the docstring claims."""
    from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries
    from conftest import SF_T2

    got = all_queries()["q_sim_ann_xengine"].fn(spark, SF_T2).toPandas()
    n = got[["id_a", "id_b"]].drop_duplicates().shape[0]
    assert n == len(got), "duplicate candidate pairs"
    assert 0 < n < 0.05 * (500 * 499 // 2), f"selectivity broke: {n}"
    # every reported pair shares at least one band, none shares zero
    assert (got["n_shared_bands"] >= 1).all()
    assert (got["n_shared_bands"] <= 2).all()
    # verification dots are symmetric-integer: spot-check one pair
    # against a numpy recompute of the quantized codes
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{SF_T2}/embeddings.parquet").to_pandas()
    emb = emb.set_index("vec_id")["embedding"]
    row = got.iloc[0]

    def codes(v):
        v = np.asarray(v, dtype=np.float64)
        s = max(np.abs(v).max(), 1e-30)
        return np.floor(v * 127.0 / s + 0.5).astype(np.int64)

    want = int(codes(emb[row["id_a"]]) @ codes(emb[row["id_b"]]))
    assert int(row["dot_q"]) == want


def test_resize_nn_matches_naive_loop():
    """Floor-mapping NN resize == the per-pixel naive definition, for
    downsample, upsample, and identity shapes."""
    import numpy as np

    from cs425_distributed_systems_mp4_mapreduce_spark.operators.multimodal import resize_nn

    rng = np.random.default_rng(7)
    for (h, w), (oh, ow) in [((5, 9), (4, 4)), ((3, 4), (6, 8)), ((4, 4), (4, 4))]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        got = resize_nn(img, oh, ow)
        for y in range(oh):
            for x in range(ow):
                assert (got[y, x] == img[(y * h) // oh, (x * w) // ow]).all()


def test_bfs_hops_on_synthetic_graph(spark):
    """bfs_hops on a graph the corpus doesn't have: a chain past the
    hop bound (e is 4 hops -> excluded), a shortcut creating a
    tie-by-two-paths (d at hops 3 via both c and the direct b-d edge
    -> 2), a multi-source minimum (both s1 and s2 seeds, node m
    reachable from s2 in 1), and an unreachable island."""
    from cs425_distributed_systems_mp4_mapreduce_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [("s1", "b"), ("b", "c"), ("c", "d"), ("b", "d"), ("d", "e"),
         ("s2", "m"), ("x", "y")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("s1",), ("s2",)], "id string")
    got = {
        r["id"]: r["hops"]
        for r in bfs_hops(edges, seeds, max_hops=3).collect()
    }
    assert got == {"s1": 0, "s2": 0, "b": 1, "m": 1, "c": 2, "d": 2, "e": 3}

def test_cosine_zero_vector_is_null_not_crash(spark):
    """Review r12: the unguarded norm-product division aborts the
    whole job with DIVIDE_BY_ZERO under Spark 4 ANSI mode the moment
    one all-zero embedding appears.  cos(0-vector, q) is NULL (ranks
    last in a DESC top-k), never an exception."""
    from cs425_distributed_systems_mp4_mapreduce_spark.functions.vectors import (
        cosine,
        cosine_to_lit,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0], [1.0, 0.0]), (2, [3.0, 4.0], [1.0, 0.0])],
        "id int, a array<double>, b array<double>",
    )
    rows = {
        r["id"]: (r["c"], r["cl"])
        for r in df.select(
            "id",
            cosine("a", "b").alias("c"),
            cosine_to_lit("a", [1.0, 0.0]).alias("cl"),
        ).collect()
    }
    assert rows[1] == (None, None)
    assert rows[2][0] == 0.6 and rows[2][1] == 0.6


def test_query_vector_returns_defensive_copy(spark):
    """Review r12: the memoized vector was returned by reference — a
    caller normalizing in place corrupted every later call's value."""
    from cs425_distributed_systems_mp4_mapreduce_spark.sources.tables import (
        query_vector,
    )

    v1 = query_vector(spark, "/root/testdata/sf0.01", 0)
    original = list(v1)
    v1[0] = 12345.0
    assert query_vector(spark, "/root/testdata/sf0.01", 0) == original
