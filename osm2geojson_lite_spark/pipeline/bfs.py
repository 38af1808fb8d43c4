"""Multi-source BFS hop distance (P-series): bounded-radius reachability
over a link graph — "every page within k clicks of the seed whitelist",
the crawl-frontier / link-locality companion to `pagerank` (quality
weight) and `cluster.connected_components` (dedup grouping).  Curated
seed lists (Wikipedia-linked domains, etc.) are a standard
training-corpus quality signal, and hop distance is the feature.

Reference scope note: tibetty/osm2geojson-lite has no graph surface;
this extends the engine for the 100 TB corpus-curation path.

Pregel-style frontier iteration, all exact integers:

- round i joins the CURRENT FRONTIER (only the nodes first reached at
  hop i-1, never the whole visited set) against the static edge list —
  the edge side is hash-partitioned on ``src`` once, persisted, and its
  cached partitioning is reused every round, so only the frontier moves
  per iteration (the `pagerank` join shape);
- ``distinct`` collapses the new frontier BEFORE the anti-join, so a
  hot hub expanding to millions of duplicate targets is bounded by the
  reachable node count, not the path count (path counts explode
  combinatorially; node counts cannot);
- the anti-join against the visited set marks first arrivals — hop
  minimality holds by induction, no min-aggregation needed;
- each round's visited table is ``localCheckpoint``ed to truncate
  lineage (the `cluster.py` convention) and the loop exits early on an
  empty frontier (one bounded count per round, never a row collect).

Output is deterministic at any parallelism: (node, hops) with hops the
exact minimum hop count — no floats anywhere — and replays in ANSI SQL
as a recursive CTE with a ``hops < k`` bound + min-aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..session import data_sized_shuffle


def bfs_hops(edges: DataFrame, seeds: DataFrame, *, src: str = "src",
             dst: str = "dst", seed_col: str = "node",
             max_hops: int = 6, directed: bool = True) -> DataFrame:
    """-> ``(node, hops)``: minimum hop count from ANY seed, for every
    node within ``max_hops`` hops (seeds themselves at 0).  Unreachable
    nodes are absent — join against the node frame for a dense feature.

    ``directed=False`` symmetrizes the edge list first (web links are
    directed; road/rail graphs are not).
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0: {max_hops}")
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .filter(F.col("src") != F.col("dst")))
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    e = e.distinct().repartition("src").persist()
    # materializes the edge cache (round 1 would anyway) and sizes the
    # round shuffles to the measured graph instead of the session's
    # corpus-sized partition count (the cluster.py CC convention)
    n_e = e.count()

    frontier = (seeds.select(F.col(seed_col).cast("long").alias("node"))
                .distinct()
                .withColumn("hops", F.lit(0).cast("int"))
                .localCheckpoint(eager=True))
    visited = frontier
    try:
        with data_sized_shuffle(e.sparkSession, n_e):
            for i in range(1, max_hops + 1):
                nxt = (
                    frontier.join(e, frontier["node"] == e["src"])
                    .select(F.col("dst").alias("node"))
                    .distinct()
                    .join(visited.select("node"), "node", "left_anti")
                    .withColumn("hops", F.lit(i).cast("int"))
                )
                frontier = nxt.localCheckpoint(eager=True)
                if frontier.isEmpty():
                    break
                visited = visited.union(frontier).localCheckpoint(eager=True)
    finally:
        e.unpersist()
    return visited


def cheapest_path(edges: DataFrame, seeds: DataFrame, *, src: str = "src",
                  dst: str = "dst", weight: str = "w", seed_col: str = "node",
                  max_hops: int = 6, directed: bool = True) -> DataFrame:
    """Weighted bounded-hop cheapest path — the cost-aware sibling of
    ``bfs_hops``: ``(node, cost, hops)`` with ``cost`` the exact minimum
    integer path cost from ANY seed over paths of at most ``max_hops``
    edges, and ``hops`` the fewest edges among those min-cost paths
    (lexicographic ``(cost, hops)`` optimum; seeds at ``(0, 0)``).
    Unreachable-within-bound nodes are absent.

    Distributed Bellman-Ford with an improved-only frontier (the SPFA
    refinement): round i relaxes ONLY nodes whose best label changed in
    round i-1 — after a few rounds the frontier collapses to the still-
    settling fringe, never the whole visited set.  The edge list is
    hash-partitioned on ``src`` once and persisted, so only the frontier
    shuffles per round; candidate labels collapse through a map-side-
    combinable ``min(struct(cost, hops))`` groupBy BEFORE touching the
    best-label table, so a hot hub's fan-in never funnels raw path count
    anywhere.  Each round's tables are ``localCheckpoint``ed to truncate
    lineage, and the loop exits early on an empty frontier.

    The hop bound makes the semantics total even with negative weights
    (no negative-cycle divergence — every label is a <= max_hops-edge
    path cost), exactly like the textbook bounded Bellman-Ford
    recurrence the DuckDB oracle unrolls.  All labels are exact integers:
    bit-identical at any parallelism.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0: {max_hops}")
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"),
                      F.col(weight).cast("long").alias("w"))
         .filter(F.col("src") != F.col("dst")))
    if not directed:
        e = e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst"), F.col("w")))
    # parallel edges: only the cheapest can ever win a relaxation
    e = (e.groupBy("src", "dst").agg(F.min("w").alias("w"))
         .repartition("src").persist())
    n_e = e.count()  # materialize the cache + size the round shuffles

    frontier = (seeds.select(F.col(seed_col).cast("long").alias("node"))
                .distinct()
                .select("node", F.lit(0).cast("long").alias("cost"),
                        F.lit(0).cast("int").alias("hops"))
                .localCheckpoint(eager=True))
    best = frontier
    try:
        with data_sized_shuffle(e.sparkSession, n_e):
            for _ in range(max_hops):
                cand = (
                    frontier.join(e, frontier["node"] == e["src"])
                    .select(F.col("dst").alias("node"),
                            (F.col("cost") + F.col("w")).alias("cost"),
                            (F.col("hops") + F.lit(1)).cast("int")
                            .alias("hops"))
                    .groupBy("node")
                    .agg(F.min(F.struct("cost", "hops")).alias("c"))
                    .select("node", F.col("c.cost").alias("cost"),
                            F.col("c.hops").alias("hops"))
                )
                old = best.select("node", F.col("cost").alias("old_cost"),
                                  F.col("hops").alias("old_hops"))
                improved = (
                    cand.join(old, "node", "left")
                    .filter(
                        F.col("old_cost").isNull()
                        | (F.struct(F.col("cost"), F.col("hops"))
                           < F.struct(F.col("old_cost"), F.col("old_hops")))
                    )
                    .select("node", "cost", "hops")
                )
                frontier = improved.localCheckpoint(eager=True)
                if frontier.isEmpty():
                    break
                best = (
                    best.join(frontier.select("node"), "node", "left_anti")
                    .union(frontier)
                    .localCheckpoint(eager=True)
                )
    finally:
        e.unpersist()
    return best
