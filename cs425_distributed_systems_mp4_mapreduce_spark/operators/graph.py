"""Distributed connected components — the clustering step that turns
near-dup PAIRS into dedup DECISIONS (keep one representative per
component), which is how MinHash/SimHash output is actually consumed
by a training-data pipeline.

Algorithm: iterative min-label propagation.  Each round every node
adopts the smallest component id among itself and its neighbors; the
loop stops when no label changes.  Rounds needed = graph diameter,
and near-dup graphs are unions of small dense clusters (diameter ≤ 2-3
in practice), so the loop converges in a handful of rounds even at
100 TB.  For adversarial long-chain graphs the round count grows with
the chain length — the web-scale fix is the large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14), which squares the propagation distance per round;
the propagation core below is the building block either way.

Spark-specific discipline for driver-side iteration:
- each round's labels are ``localCheckpoint``-ed: without lineage
  truncation the plan doubles per round and Catalyst analysis time
  explodes after ~10 rounds (the classic iterative-algorithm trap);
- the symmetrized edge list is checkpointed ONCE up front so the
  (possibly expensive) edge-producing pipeline — e.g. banded MinHash —
  runs exactly once, not once per round;
- convergence is detected from the per-round change count, a single
  tiny action on the already-materialized label frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    max_iter: int = 50,
    strict: bool = True,
) -> DataFrame:
    """Component id (= min node id in the component) for every node.

    ``edges`` is undirected (each pair listed once in either order).
    ``nodes`` optionally supplies the full vertex set (single-column
    DataFrame) so isolated vertices appear as their own singleton
    components — pass the corpus ids for dedup clustering, where most
    documents have no near-dup edge at all.

    Returns (id, component) with component = min reachable node id.
    Deterministic for a given edge set, hence oracle-checkable against
    a recursive-CTE transitive closure.

    Min-label propagation converges in graph-DIAMETER rounds, so a
    chain longer than ``max_iter`` exhausts the loop with non-minimal
    labels still in flight — one true component reported as several, a
    silently wrong dedup decision (review r12).  ``strict=True``
    (default) raises RuntimeError on exhaustion instead; pass
    ``strict=False`` only when truncated labels are deliberate (plan
    tests) — or use :func:`connected_components_star`, whose two-phase
    contraction converges in O(log N) rounds on long chains.
    """
    sym = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = sym.union(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # materialize once: every round re-reads the edge list, and the
    # upstream pipeline (LSH candidate generation + verification) must
    # not re-execute per round
    sym = sym.localCheckpoint()

    labels = sym.select(F.col("src").alias("id"))
    if nodes is not None:
        labels = labels.union(nodes.toDF("id"))
    labels = labels.distinct().select("id", F.col("id").alias("component"))
    labels = labels.localCheckpoint()

    # -1 sentinel so the for-else strict raise below never references
    # an unbound name when max_iter <= 0 (ADVICE r13)
    changed = -1
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("_nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("_nbr_min"), F.col("component"))
                ).alias("component"),
                (F.col("_nbr_min") < F.col("component")).alias("_changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    else:
        if strict:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter}"
                f" rounds ({changed if changed >= 0 else 'unknown'}"
                " labels still changing) — the graph"
                " diameter exceeds max_iter; raise max_iter, or use"
                " connected_components_star (O(log N) rounds), or pass"
                " strict=False to accept truncated labels"
            )
    return labels


def _edge_fingerprint(edges: DataFrame) -> tuple:
    """(count, hash-sum) of an edge multiset — an O(1)-size convergence
    check (equal fingerprints ⇒ equal edge sets w.h.p.)."""
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        # decimal sum: an int64 hash-sum overflows under ANSI mode
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    max_iter: int = 50,
    strict: bool = True,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., SoCC'14) — the web-scale algorithm: each round
    SQUARES the distance information travels, so convergence is
    O(log² n) rounds on ANY graph, where plain min-label propagation
    (:func:`connected_components`) needs diameter rounds (a 20-node
    chain: ~5 rounds vs 19 — asserted in tests).  Same output contract:
    (id, component) with component = min node id.

    One round, expressed relationally (no RDDs):
      large-star: per node u, m = min(N(u) ∪ {u}); rewire each strictly
                  LARGER neighbor v > u to (v, m).
      small-star: orient each edge toward its larger endpoint, then per
                  node u rewire every smaller-or-equal neighbor to m.
    Both are one groupBy + one join per phase; every intermediate is
    ``localCheckpoint``-ed to keep the plan flat across rounds."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    e = e.localCheckpoint()

    def _min_nbr(sym: DataFrame) -> DataFrame:
        # m(u) = min(N(u) ∪ {u})
        return sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )

    fp = None
    for _ in range(max_iter):
        # ---- large-star on the symmetrized edge set
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = _min_nbr(sym)
        e = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # ---- small-star on edges oriented toward the larger endpoint
        oriented = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = _min_nbr(oriented)
        # (the second union branch previously re-derived least(u, v)
        # as a new v and immediately discarded it — v IS the lesser
        # endpoint in `oriented` by construction; review r12)
        joined = oriented.join(mins, "u")
        e = (
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(joined.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        new_fp = _edge_fingerprint(e)
        if new_fp == fp:
            break
        fp = new_fp
    else:
        if strict:
            raise RuntimeError(
                f"connected_components_star did not converge in"
                f" {max_iter} rounds (edge fingerprint still moving) —"
                " the remaining edge set is not yet a star, so the"
                " leaf->center label extraction below would be wrong;"
                " raise max_iter or pass strict=False"
            )

    # stars: every remaining edge points leaf → center (min id)
    labels = e.select(
        F.greatest("u", "v").alias("id"), F.least("u", "v").alias("component")
    ).distinct()
    members = labels.select("id").union(labels.select(F.col("component").alias("id")))
    all_nodes = edges.select(F.col(src).alias("id")).union(
        edges.select(F.col(dst).alias("id"))
    )
    if nodes is not None:
        all_nodes = all_nodes.union(nodes.toDF("id"))
    singletons = all_nodes.distinct().join(members.distinct(), "id", "anti")
    return labels.union(
        singletons.select("id", F.col("id").alias("component"))
    ).union(
        # star centers label themselves
        labels.select(F.col("component").alias("id"), "component").distinct()
    ).distinct()


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a symmetrized edge list by power iteration — the
    canonical ITERATIVE MapReduce application (each round = join ranks
    to edges on src, scatter rank/outdeg to dst, re-aggregate), here as
    a driver-side DataFrame loop.

    Scale discipline (same as connected_components):
    - edges + out-degrees are localCheckpoint-ed ONCE so the upstream
      edge pipeline runs once, not once per round;
    - each round's rank frame is localCheckpoint-ed to truncate
      lineage — an unbounded power-iteration chain is the classic
      Catalyst analysis-time explosion;
    - every round is ONE shuffle (join on src + groupBy dst); the node
      count N is a scalar aggregate computed once.

    Assumes no dangling nodes (symmetrized edges guarantee outdeg ≥ 1
    for every node that appears at all), so no dangling-mass
    redistribution term is needed and a fixed-iteration SQL oracle can
    reproduce the arithmetic exactly.

    Returns (id, rank) for every node in the edge list.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).localCheckpoint(eager=True)
    nodes = e.select(F.col("src").alias("id")).distinct().localCheckpoint(eager=True)
    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e.src == ranks.id)
            .join(deg, "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("outdeg")).alias("c"))
        )
        ranks = (
            nodes.join(contribs.groupBy("id").agg(F.sum("c").alias("cs")), "id", "left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("cs"), F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def bfs_hops(
    edges: DataFrame, sources: DataFrame, max_hops: int
) -> DataFrame:
    """Multi-source BFS to ``max_hops``: returns (id, hops) with the
    MINIMUM hop count from any source, for every node within reach.

    Frontier-expansion loop — the textbook distributed BFS: each round
    joins the frontier to the (symmetrized) edge list, anti-joins the
    visited set, tags the new nodes with the round number.  A node is
    tagged the FIRST round it appears, which IS its BFS distance, so
    no min-aggregation is ever needed engine-side; the recursive-CTE
    oracle states the same result as MIN(d) over all ≤max_hops walks.

    Scale: each round is one equi-join shuffle keyed on node id (the
    same key every round — co-partitioning is reusable), the visited
    anti-join keeps the frontier monotone shrinking toward the
    periphery, and ``localCheckpoint`` truncates the growing lineage
    (same discipline as the CC/PageRank loops above).  Driver round
    count is bounded by max_hops, not data."""
    sym = (
        edges.select(F.col("src"), F.col("dst"))
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    visited = sources.select(
        F.col("id"), F.lit(0).cast("long").alias("hops")
    ).localCheckpoint()
    frontier = visited.select("id")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier["id"] == sym["src"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint()
        frontier = nxt.select("id")
    return visited
