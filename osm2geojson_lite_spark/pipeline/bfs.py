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

    frontier = (seeds.select(F.col(seed_col).cast("long").alias("node"))
                .distinct()
                .withColumn("hops", F.lit(0).cast("int"))
                .localCheckpoint(eager=True))
    visited = frontier
    try:
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
