#!/usr/bin/env python
"""10x scale probe (VERDICT r4 task 2): turn the 100-TB posture from
"argued from plans" into "measured on a 10x corpus".

Generates a one-off ~10x corpus under /tmp/sf1 by replicate+perturb of
the sf0.1 driver testdata, then measures:

  (a) candidate-volume curves for every sub-quadratic discovery family
      (banded MinHash, SimHash, hyperplane LSH, AllPairs/PPJoin) at
      n=5k -> 50k documents / 2k -> 20k embeddings;
  (b) wall-time scaling of shuffle-heavy headline queries at
      sf0.1 -> sf1 (10x rows): a scalable plan should grow ~linearly
      (ratio ~10 on a fixed 32-core box means perfect CPU-bound
      linearity; well under counts as sublinear);
  (c) the AllPairs vocabulary-saturation curve: candidates at
      n = 5k/10k/20k/50k on the SAME saturating vocabulary, giving the
      docstring's "degrades as token frequencies grow" caveat a
      measured saturation point.

Perturbation discipline (what makes the 10x corpus honest):
  documents  : each replica doc mixes one THIRD of the words of three
               consecutive source docs (i-1, i, i+1), then permutes —
               global word frequencies are exactly preserved (every
               source word placed exactly once per replica, so
               vocabulary saturation is real: 10x occurrences of the
               same tokens) while BOTH the 3-gram shingle sets and the
               unigram frequency profiles decorrelate from any single
               source doc.  A plain per-doc permutation is NOT enough:
               it preserves the unigram multiset, and SimHash (whose
               features are order-insensitive) then sees every replica
               as a true near-dup of its source — the first probe run
               measured exactly that (133x candidate "growth" that was
               planted true positives, not bucketing failure).  Docs
               with < 6 words get a replica tag token so they cannot
               become exact duplicates 10x over.
  events     : new user-id / event-id ranges per replica, timestamps
               kept — per-user event density (the interval-join and
               window cost driver) is constant as N grows.
  lineitem / orders : new orderkey ranges, dims (part/supplier/
               customer) FIXED — the realistic shape: facts grow,
               dimensions don't, per-dim-key skew grows 10x.
  embeddings : replica-seeded dimension permutation — norms and the
               intra-replica cosine distribution are exactly
               preserved; cross-replica cosines decorrelate.

Results land in SCALE_PROBE.json (repo root) and are summarized in
SURVEY.md §6 / PLANS.md.  Run on an idle box: ~10-15 min.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
REPLICAS = 10
OFF = 10_000_000  # id offset per replica — far above any source id

WALL_QUERIES = [
    "q_tpch_q9",
    "q_join_threeway",
    "q_topk_revenue",
    "q_tpch_q18",
    "q_agg_pricing",
    "q_window_rank",
    "q_dedup_exact",
    "q_text_tokens",
    "q_filter_regex",
    "q_dedup_near",
    "q_events_funnel",
    "q_window_locf",
    "q_outliers_mad",
    "q_mix_sources",
]
N_RUNS = 3


# --------------------------------------------------------------- generation


def _perturb_documents(tbl: pa.Table) -> pa.Table:
    doc_id = tbl.column("doc_id").to_numpy()
    text = tbl.column("text").to_pylist()
    lang = tbl.column("lang")
    source = tbl.column("source")
    outs = [tbl]
    split_words = [t.split() for t in text]
    n_docs = len(split_words)
    for r in range(1, REPLICAS):
        rng = np.random.default_rng(1000 + r)
        new_text = []
        for i in range(n_docs):
            # thirds of docs i-r, i, i+r (stride r so different
            # replicas of the same doc mix DIFFERENT sources — a fixed
            # stride would make replicas unigram-identical to each
            # other, replanting the near-dup artifact).  Each source
            # doc contributes each of its thirds exactly once per
            # replica, so global word frequencies are preserved
            # exactly.
            words = []
            for off, third in ((-r, 0), (0, 1), (r, 2)):
                w = split_words[(i + off) % n_docs]
                k3 = len(w) // 3
                lo, hi = third * k3, (third + 1) * k3 if third < 2 else len(w)
                words.extend(w[lo:hi])
            if len(words) < 6:
                words = words + [f"rep{r}tag{i % 7}"]
            order = rng.permutation(len(words))
            new_text.append(" ".join(words[j] for j in order))
        outs.append(
            pa.table(
                {
                    "doc_id": pa.array(doc_id + r * OFF, pa.int64()),
                    "text": pa.array(new_text, pa.string()),
                    "lang": lang,
                    "source": source,
                    "n_chars": pa.array(
                        [len(s) for s in new_text], pa.int64()
                    ),
                },
                schema=tbl.schema,
            )
        )
    return pa.concat_tables(outs)


def _offset_cols(tbl: pa.Table, cols: list[str]) -> pa.Table:
    outs = [tbl]
    for r in range(1, REPLICAS):
        t = tbl
        for c in cols:
            idx = t.schema.get_field_index(c)
            t = t.set_column(
                idx,
                t.schema.field(idx),
                pa.array(t.column(c).to_numpy() + r * OFF, t.schema.field(idx).type),
            )
        outs.append(t)
    return pa.concat_tables(outs)


def _perturb_embeddings(tbl: pa.Table) -> pa.Table:
    vec_id = tbl.column("vec_id").to_numpy()
    mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    label = tbl.column("label")
    outs = [tbl]
    for r in range(1, REPLICAS):
        rng = np.random.default_rng(2000 + r)
        perm = rng.permutation(mat.shape[1])
        outs.append(
            pa.table(
                {
                    "vec_id": pa.array(vec_id + r * OFF, pa.int64()),
                    "embedding": pa.array(
                        mat[:, perm].tolist(), pa.list_(pa.float32())
                    ),
                    "label": label,
                },
                schema=tbl.schema,
            )
        )
    return pa.concat_tables(outs)


def generate(force: bool = False) -> None:
    marker = os.path.join(DST, "_GENERATED")
    if os.path.exists(marker) and not force:
        print(f"# {DST} already generated, skipping", file=sys.stderr)
        return
    os.makedirs(DST, exist_ok=True)
    for name in ["region", "nation", "customer", "supplier", "part"]:
        pq.write_table(
            pq.read_table(f"{SRC}/{name}.parquet"), f"{DST}/{name}.parquet"
        )
    pq.write_table(
        _perturb_documents(pq.read_table(f"{SRC}/documents.parquet")),
        f"{DST}/documents.parquet",
    )
    pq.write_table(
        _offset_cols(
            pq.read_table(f"{SRC}/events.parquet"), ["event_id", "user_id"]
        ),
        f"{DST}/events.parquet",
    )
    pq.write_table(
        _offset_cols(pq.read_table(f"{SRC}/orders.parquet"), ["o_orderkey"]),
        f"{DST}/orders.parquet",
    )
    pq.write_table(
        _offset_cols(
            pq.read_table(f"{SRC}/lineitem.parquet"), ["l_orderkey"]
        ),
        f"{DST}/lineitem.parquet",
    )
    pq.write_table(
        _perturb_embeddings(pq.read_table(f"{SRC}/embeddings.parquet")),
        f"{DST}/embeddings.parquet",
    )
    with open(marker, "w") as f:
        f.write(f"replicas={REPLICAS} src={SRC}\n")
    print(f"# generated {DST}", file=sys.stderr)


# --------------------------------------------------------------- measurement


def _candidate_curves(spark) -> dict:
    import math

    from cs425_distributed_systems_mp4_mapreduce_spark.operators.dedup import (
        _shingle_sets,
        embedding_candidate_pairs,
        minhash_banded_candidate_pairs,
        prefix_filter_candidate_pairs,
        simhash_candidate_pairs,
    )
    from cs425_distributed_systems_mp4_mapreduce_spark.sources.tables import table

    out: dict[str, dict] = {}

    def record(family, scale, n, cands, secs):
        out.setdefault(family, {})[scale] = {
            "n": n,
            "candidates": cands,
            "sec": round(secs, 2),
            "frac_all_pairs": round(cands / (n * (n - 1) / 2), 7),
        }

    for sf_dir, scale in ((SRC, "sf0.1"), (DST, "sf1")):
        docs = table(spark, sf_dir, "documents")
        n = docs.count()
        # key-width discipline: grow key bits with log2(N)
        blocks = 8 if n <= 10_000 else 10
        planes = math.ceil(math.log2(n)) + 2

        for family, fn in (
            (
                "minhash_banded_r3",
                lambda d: minhash_banded_candidate_pairs(
                    d, num_bands=8, band_width=3
                ),
            ),
            (
                f"simhash",
                lambda d: simhash_candidate_pairs(d, num_blocks=blocks),
            ),
            (
                # Distinct configurations, verified: bucketed composite
                # (token, length-bucket) keys vs plain single-token
                # keys (an earlier probe ran the default config twice
                # under both labels; the "difference" was JIT noise).
                "prefix_filter_t0.8_bucketed",
                lambda d: prefix_filter_candidate_pairs(
                    _shingle_sets(d, "doc_id", "text", 3),
                    0.8,
                    length_buckets=True,
                ),
            ),
            (
                "prefix_filter_t0.8_single_token_key",
                lambda d: prefix_filter_candidate_pairs(
                    _shingle_sets(d, "doc_id", "text", 3),
                    0.8,
                    length_buckets=False,
                ),
            ),
        ):
            # median-of-3 for the wall column: single runs at this SF
            # mix in JIT/warm-up noise larger than real variant deltas.
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                c = fn(docs).count()
                times.append(time.perf_counter() - t0)
            record(family, scale, n, c, statistics.median(times))

        emb = table(spark, sf_dir, "embeddings")
        ne = emb.count()
        t0 = time.perf_counter()
        c = embedding_candidate_pairs(
            emb, num_planes=math.ceil(math.log2(ne)) + 2
        ).count()
        record("embedding_lsh", scale, ne, c, time.perf_counter() - t0)

    # (c) AllPairs saturation curve on the sf1 saturating vocabulary
    from pyspark.sql import functions as F

    docs1 = table(spark, DST, "documents")
    sat = []
    for k_reps in (1, 2, 4, 10):
        sub = docs1.filter(F.col("doc_id") < k_reps * OFF)
        n = sub.count()
        row = {"n": n}
        for label, lb in (("bucketed", True), ("single_token", False)):
            t0 = time.perf_counter()
            c = prefix_filter_candidate_pairs(
                _shingle_sets(sub, "doc_id", "text", 3),
                0.8,
                length_buckets=lb,
            ).count()
            row[label] = {
                "candidates": c,
                "sec": round(time.perf_counter() - t0, 2),
                "frac_all_pairs": round(c / (n * (n - 1) / 2), 7),
            }
        sat.append(row)
    out["allpairs_saturation_curve"] = sat
    return out


def _wall_scaling(spark) -> dict:
    from cs425_distributed_systems_mp4_mapreduce_spark.queries.fast_variants import (
        FAST_VARIANTS,
    )
    from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

    qs = all_queries()
    out = {}
    for name in WALL_QUERIES:
        fn = FAST_VARIANTS.get(name, qs[name].fn)
        row = {}
        for sf_dir, scale in ((SRC, "sf0.1"), (DST, "sf1")):
            fn(spark, sf_dir).count()  # warm-up
            times = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                times.append(time.perf_counter() - t0)
            row[scale] = round(statistics.median(times), 3)
        row["ratio_at_10x_rows"] = round(row["sf1"] / row["sf0.1"], 2)
        out[name] = row
    return out


def main() -> None:
    generate(force="--force" in sys.argv)

    from cs425_distributed_systems_mp4_mapreduce_spark.session import get_spark

    spark = get_spark("scale_probe", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    result = {
        "src": SRC,
        "dst": DST,
        "replicas": REPLICAS,
        "loadavg_before": [round(x, 2) for x in os.getloadavg()],
        "candidate_curves": _candidate_curves(spark),
        "wall_scaling": _wall_scaling(spark),
    }
    result["loadavg_after"] = [round(x, 2) for x in os.getloadavg()]
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_PROBE.json",
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
