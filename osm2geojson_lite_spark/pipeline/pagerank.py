"""Fixed-point PageRank (P-series): link-graph quality weighting — the
classic web-corpus signal a training-data pipeline uses to weight or
filter crawled documents (Page, Brin, Motwani, Winograd 1999; used for
corpus curation in e.g. Common Crawl derivatives).

Arithmetic is **integer fixed-point** end to end: ranks are bigints
scaled by ``scale`` (default 10^9), per-edge contributions use exact
integer division ``r div out_degree``, damping is an integer percentage,
and the teleport term is one integer constant.  Floating-point PageRank
sums contributions in shuffle order, so two runs of the same job can
differ in the last bits; the fixed-point form makes every partial
aggregation order-independent — byte-identical ranks at any
partitioning or parallelism (the engine-wide determinism contract,
same as `spatial/hotspot.py`), and replayable verbatim in ANSI SQL.
The cost is truncation: each division drops < 1 unit of 10^-9 rank
mass, bounded by (edges + nodes) * n_iters units overall.

Scale shape per iteration: ONE join of the static edge list against the
current rank table (both sides hash-partitioned on the same key — the
edge side is repartitioned once, persisted, and its cached partitioning
is reused every round, so only the small rank table moves per
iteration), one map-side-combinable groupBy-sum on dst, and one left
join back to the node frame.  The driver loop only counts iterations —
no data is collected.  Each round's result is ``localCheckpoint``ed to
truncate lineage (the `cluster.py` convention; pass real checkpoints on
a cluster for fault tolerance).

Dangling nodes (out-degree 0) absorb rank: their mass leaves the system
instead of being redistributed — the standard simplification; with the
uniform teleport floor every node keeps a nonzero rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..session import data_sized_shuffle


def pagerank(edges: DataFrame, *, src: str = "src", dst: str = "dst",
             n_iters: int = 5, damping_pct: int = 85,
             scale: int = 10 ** 9,
             nodes: DataFrame | None = None,
             node_col: str = "node") -> DataFrame:
    """Ranks after ``n_iters`` fixed-point power iterations.

    Returns ``(node, rank_fp, rank)``: ``rank_fp`` the exact scaled
    bigint, ``rank = rank_fp / scale`` one final IEEE divide per row.
    ``nodes`` (optional) adds isolated nodes beyond those seen in the
    edge list.  ``damping_pct`` is an integer percent (85 = the classic
    0.85) — keeping it rational keeps the whole recurrence integral:

        rank'(v) = ((100 - dp) * scale) div (100 * n)
                   + (dp * sum_{u -> v}(rank(u) div deg(u))) div 100
    """
    if not (0 < damping_pct < 100):
        raise ValueError("damping_pct must be in (1, 99)")
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .filter(F.col("src") != F.col("dst")).distinct())

    nd = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node")))
    if nodes is not None:
        nd = nd.union(nodes.select(F.col(node_col).cast("long").alias("node")))
    nd = nd.distinct().repartition("node").persist()

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # static per-round probe side: edge list + out-degree, partitioned on
    # src once; the cached partitioning is reused by every round's join
    ed = e.join(deg, "src").repartition("src").persist()

    n = nd.count()
    if n == 0:
        return nd.select("node", F.lit(0).cast("long").alias("rank_fp"),
                         F.lit(0.0).alias("rank"))
    teleport = ((100 - damping_pct) * scale) // (100 * n)

    # size the per-iteration shuffles to the measured graph (n nodes is
    # already counted; ed materializes here instead of inside round 1) —
    # the cluster.py/bfs.py convention
    n_e = ed.count()
    ranks = nd.select("node", F.lit(scale // n).cast("long").alias("r"))
    with data_sized_shuffle(nd.sparkSession, max(n, n_e)):
        for _ in range(n_iters):
            contribs = (
                ed.join(ranks, ed["src"] == ranks["node"])
                .select("dst", F.expr("r div d").alias("c"))
                .groupBy("dst").agg(F.sum("c").alias("s"))
            )
            ranks = (
                nd.join(contribs, nd["node"] == contribs["dst"], "left")
                .select(
                    "node",
                    (F.lit(teleport)
                     + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                     ).cast("long").alias("r"))
                .localCheckpoint(eager=True)
            )

    return ranks.select(
        F.col("node"), F.col("r").alias("rank_fp"),
        (F.col("r").cast("double") / F.lit(float(scale))).alias("rank"))
