"""Grid-bucketed DBSCAN — density clustering over the cell index (X1-X3).

DBSCAN (Ester, Kriegel, Sander, Xu, KDD 1996) on a point table, composed
entirely from operators this engine already proves at scale:

1. **eps-neighborhood pairs** = :func:`~.range_join.radius_join`'s exact
   cell-bucketed self-join (3x3-disk covering argument; one equi-join
   shuffle, never a cross join).
2. **Core points** = pairs grouped by left id with a map-side-combinable
   count: a point is core iff its eps-ball holds ``>= min_pts`` points
   (the point itself included, per the paper).
3. **Clusters** = connected components of the core-core sub-pair-graph
   via the alternating large-star / small-star rounds in
   :func:`~..pipeline.cluster.connected_components` (O(log n) rounds,
   skew-proof, no driver-side edges).  The cluster label is the minimum
   core id in the component — deterministic at any partitioning.
4. **Border points** = non-core points within eps of >=1 core point,
   labeled ``min(component)`` over their core neighbors.  Classic DBSCAN
   leaves border assignment scan-order-dependent; the min rule is the
   deterministic refinement, required for the north rule's byte-identity
   across cluster sizes (and it is ANSI-SQL-replayable).
5. Everything else is **noise** (``role='noise'``, null label).

100 TB shape: no step is quadratic in corpus size — the pair join's output
is ``n * (points per eps-ball)``, i.e. linear at bounded density (and
bounded density is DBSCAN's own operating regime: a dataset whose eps-balls
hold millions of points needs a smaller eps, not a bigger reducer).  The
degree count and the border min are partial aggregations; the CC rounds
shed hot stars in one round by design.  ``salt`` passes through to the
pair join for deterministic hot-cell scatter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..pipeline.cluster import connected_components
from .range_join import radius_join


def dbscan(points: DataFrame, eps: float, min_pts: int, *,
           id_col: str = "point_id", lon_col: str = "lon",
           lat_col: str = "lat", res: int | None = None,
           salt: int | None = None, max_rounds: int = 50) -> DataFrame:
    """-> ``(point_id, role, label)`` for every input point.

    ``role`` is ``core`` / ``border`` / ``noise``; ``label`` is the
    minimum core point id of the cluster (null for noise).  Distances are
    planar squared degrees, matching the kNN / radius-join metric.
    """
    pts = points.select(
        F.col(id_col).alias("point_id"),
        F.col(lon_col).cast("double").alias("lon"),
        F.col(lat_col).cast("double").alias("lat"),
    )
    # The eps-pair join feeds four consumers (degree count, core-core
    # edges, border labeling, noise anti-join); checkpoint it once so the
    # cell-bucketed self-join runs once, not once per consumer — the same
    # eager-materialization contract connected_components already applies
    # to its edge input (blocks are freed by the ContextCleaner when the
    # result DataFrame is released).
    pairs = radius_join(
        pts, pts, eps, left_id="point_id", right_id="point_id",
        res=res, include_self=True, salt=salt,
    ).select("left_id", "right_id").localCheckpoint(eager=True)

    deg = pairs.groupBy("left_id").agg(F.count(F.lit(1)).alias("_n"))
    core = (deg.filter(F.col("_n") >= F.lit(int(min_pts)))
            .select(F.col("left_id").alias("_core_id"))
            .localCheckpoint(eager=True))

    core_edges = (
        pairs
        .join(core.withColumnRenamed("_core_id", "left_id"), "left_id")
        .join(core.withColumnRenamed("_core_id", "right_id"), "right_id")
        .filter(F.col("left_id") != F.col("right_id"))
    )
    # pairs is a materialized checkpoint, so its count is a cheap scan and
    # bounds the core-edge count — lets CC size its input-dedup shuffle to
    # the data instead of the session's corpus-sized partition count.
    comp = connected_components(
        core_edges, id_a="left_id", id_b="right_id",
        nodes=core, node_col="_core_id", max_rounds=max_rounds,
        input_rows_hint=pairs.count(),
    )

    core_out = comp.select(
        F.col("node").alias("point_id"),
        F.lit("core").alias("role"),
        F.col("component").alias("label"),
    )

    # Border: not core, but within eps of a core point — take the minimum
    # component over core neighbors (partial-agg-combinable groupBy-min).
    border = (
        pairs
        .join(core.withColumnRenamed("_core_id", "right_id"), "right_id")
        .join(core.withColumnRenamed("_core_id", "left_id"), "left_id",
              "left_anti")
        .join(comp.withColumnRenamed("node", "right_id"), "right_id")
        .groupBy("left_id")
        .agg(F.min("component").alias("label"))
        .select(F.col("left_id").alias("point_id"),
                F.lit("border").alias("role"), "label")
    )

    noise = (
        pts.select("point_id")
        .join(core_out.select("point_id"), "point_id", "left_anti")
        .join(border.select("point_id"), "point_id", "left_anti")
        .select("point_id", F.lit("noise").alias("role"),
                F.lit(None).cast(dict(pts.dtypes)["point_id"]).alias("label"))
    )
    return core_out.unionByName(border).unionByName(noise)
