"""Mini-t2 on DEGENERATE inputs for the round-9 O–W packs: empty
contrasts (no R/A rows), constant series (zero variance), one-day
calendars (n ≤ lag), single-source corpora (no vocabulary pairs), an
all-zero query vector (empty MMR pool), token-less documents, and
single-type event streams — both engines must agree on every shape
the generated corpus never produces (the q_stats_kruskal n³ overflow
and the KMV under-k case both lived exactly here).
"""

from __future__ import annotations

import datetime as dt
import hashlib

import duckdb
import pandas as pd
import pytest

from cs425_distributed_systems_mp4_mapreduce_spark.registry import all_queries

#: (query, tables needed) — all run against the degenerate corpus
CASES = [
    # pack O
    ("q_stats_welch_t", ("lineitem",)),        # no R/A rows at all
    ("q_stats_jarque_bera", ("lineitem",)),    # constant quantity
    ("q_stats_wilcoxon_signed", ("events",)),  # every d = 0
    ("q_stats_mood_median", ("orders",)),      # single group
    ("q_stats_cochran_q", ("events",)),        # single treatment
    ("q_stats_ljung_box", ("events",)),        # n = 1 < every lag
    # pack P
    ("q_window_stochastic", ("orders",)),      # 1 bar < window
    ("q_window_aroon", ("orders",)),           # 1 bar < window
    ("q_window_obv", ("orders",)),             # first-bar sign 0
    ("q_timeseries_fold_periodicity", ("events",)),  # n < every period
    ("q_timeseries_mase", ("events",)),        # n <= seasonal lag
    # pack Q
    ("q_text_readability", ("documents",)),    # empty text
    ("q_text_sentence_stats", ("documents",)),
    ("q_text_vocab_overlap", ("documents",)),  # single source: no pairs
    ("q_dedup_minhash_error", ("documents",)),  # no adjacent tokened pair
    # pack R
    ("q_graph_clustering_coeff", ("lineitem",)),  # no edges
    ("q_graph_assortativity", ("lineitem",)),     # no edges
    ("q_graph_reciprocity", ("lineitem",)),       # single-line orders
    ("q_sketch_ams_f2", ("documents",)),
    # pack S/N
    ("q_sim_mmr", ("embeddings",)),            # zero query vector
    ("q_sim_recall_quantized", ("embeddings",)),  # corpus empty past qids
    ("q_stats_page_hinkley", ("events",)),     # single-day series
    # pack T/U/V/W
    ("q_stats_cvm", ("lineitem",)),            # both sides empty
    ("q_stats_grubbs", ("orders",)),
    ("q_stats_friedman", ("events",)),         # single block
    ("q_events_markov_power", ("events",)),    # self-loop chain
    ("q_stats_binom_ci", ("events",)),         # x = 0 edge of Wilson
    ("q_embed_dim_outliers", ("embeddings",)),
    ("q_stats_sign_test", ("events",)),        # zero nonzero diffs
    ("q_stats_fmax", ("orders",)),             # one live group: Fmax = 1
    ("q_scalar_url", ("documents",)),
    ("q_events_type_affinity", ("events",)),   # single type: no pairs
    ("q_stats_poisson_dispersion", ("events",)),  # n = 1
    ("q_window_ulcer_index", ("orders",)),     # never below peak
    # pack X
    ("q_join_asof_nearest", ("events",)),      # no views at all
    ("q_stats_runs_updown", ("orders",)),      # single day: no diffs
    ("q_agg_bowley_skew", ("orders",)),        # two values: Q1 = Q3?
    # pack Y
    ("q_stats_mcnemar", ("events",)),          # zero discordant pairs
    ("q_text_heaps_curve", ("documents",)),    # one token-less doc
    ("q_stats_kappa", ("documents",)),         # pe = 1 -> NULL kappa
]


@pytest.fixture(scope="module")
def degenerate_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_r9ow")
    day = dt.datetime(2024, 1, 1)
    # ONE calendar day, ONE priority -> single bars, single groups
    pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_custkey": [7, 7],
            "o_orderdate": pd.Series([day, day], dtype="datetime64[us]"),
            "o_totalprice": [10.0, 20.0],
            "o_orderpriority": ["3-MEDIUM", "3-MEDIUM"],
        }
    ).to_parquet(d / "orders.parquet")
    # constant quantity, no R/A return flags, single-line orders
    pd.DataFrame(
        {
            "l_orderkey": [1, 2, 3],
            "l_partkey": [11, 22, 33],
            "l_linenumber": [1, 1, 1],
            "l_returnflag": ["N", "N", "N"],
            "l_quantity": [7.0, 7.0, 7.0],
            "l_extendedprice": [1.0, 2.0, 3.0],
        }
    ).to_parquet(d / "lineitem.parquet")
    # one user, one day, one type, zero values
    pd.DataFrame(
        {
            "event_id": [0, 1],
            "ts": pd.Series(
                [day + dt.timedelta(hours=1), day + dt.timedelta(hours=2)],
                dtype="datetime64[us]",
            ),
            "user_id": [1, 1],
            "event_type": ["click", "click"],
            "value": [0.0, 0.0],
        }
    ).to_parquet(d / "events.parquet")
    # one empty doc + one tiny doc, single source
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["", "hello world hello"],
            "lang": ["en", "en"],
            "source": ["srcA", "srcA"],
            "n_chars": [0, 17],
        }
    ).to_parquet(d / "documents.parquet")
    # vec 0 (the MMR query) is ALL-ZERO; vec 1 is e1; no vec_id >= 8
    emb0 = [0.0] * 64
    emb1 = [0.0] * 64
    emb1[0] = 1.0
    pd.DataFrame(
        {"vec_id": [0, 1], "embedding": [emb0, emb1], "label": [0, 0]}
    ).to_parquet(d / "embeddings.parquet")
    return str(d)


def _vhash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1).round(9)
    rows = sorted(df.astype(str).apply("|".join, axis=1))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name,tables", CASES, ids=[c[0] for c in CASES])
def test_r9ow_query_parity_on_degenerate_corpus(
    spark, degenerate_dir, name, tables
):
    spec = all_queries()[name]
    got = spec.fn(spark, degenerate_dir).toPandas()
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{degenerate_dir}/{t}.parquet')"
        )
    want = con.execute(spec.oracle).df()
    assert len(got) == len(want), (name, len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns), name
    assert _vhash(got) == _vhash(want), (
        f"{name}: engines diverge on the degenerate corpus\n"
        f"spark:\n{got.head(25).to_string()}\nduck:\n{want.head(25).to_string()}"
    )
