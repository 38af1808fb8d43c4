"""Radius (range) join via cell-bucketed prefilter — sibling of kNN (X3).

All pairs (left, right) with planar distance <= radius, computed as one
cell equi-join instead of a cross join:

1. Pick the finest resolution whose cell extents are both >= radius
   (lat height ``180/2^r``; lon width is 2x that), so the ring-1 3x3 disk
   around the left point's cell is guaranteed to contain every right point
   within ``radius`` — the same covering argument as kNN's exactness check
   (`knn.py`).
2. Explode each left point to its 3x3 disk, equi-join on the right table's
   cell column (the single shuffle; at 100 TB the right table is stored
   repartitioned/partitioned by this same cell key, making the join
   co-located), then refine with the exact distance predicate JVM-side.

No dedup pass is needed: the disk cells are distinct and a right point
belongs to exactly one cell, so each pair appears at most once.  Distances
are planar squared degrees with explicit products (deterministic IEEE
sequence, ANSI-SQL-reproducible), matching the kNN metric.  ``salt``
scatters the left side and replicates the (already exploded) disk cells —
the deterministic hot-cell pattern shared with `pip_join`.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .cells import cell_col, cell_size_deg, neighbor_cells_col


def radius_res(radius: float, *, res_max: int = 12) -> int:
    """Finest resolution with cell height (the smaller extent) >= radius."""
    if radius <= 0:
        return res_max
    r = int(math.floor(math.log2(180.0 / radius)))
    return max(0, min(res_max, r))


def radius_join(left: DataFrame, right: DataFrame, radius: float, *,
                left_id: str = "left_id", right_id: str = "right_id",
                l_lon: str = "lon", l_lat: str = "lat",
                r_lon: str = "lon", r_lat: str = "lat",
                res: int | None = None, include_self: bool = True,
                broadcast_left: bool = False, salt: int | None = None) -> DataFrame:
    """-> (left_id, right_id, dist2) for every pair within ``radius``.

    ``res`` overrides the auto-picked resolution (must satisfy
    ``cell_size_deg(res) >= radius`` for exactness — asserted).
    ``include_self=False`` drops pairs whose ids are equal (self-join use).
    """
    if res is None:
        res = radius_res(radius)
    if not cell_size_deg(res) >= radius:
        raise ValueError(
            f"res={res} cells ({cell_size_deg(res)} deg) are smaller than "
            f"radius={radius}; the 3x3 disk would miss pairs"
        )
    l = left.select(
        F.col(left_id).alias("left_id"),
        F.col(l_lon).cast("double").alias("llon"),
        F.col(l_lat).cast("double").alias("llat"),
    ).withColumn(
        "cell",
        F.explode(neighbor_cells_col(
            cell_col(F.col("llon"), F.col("llat"), res), res, ring=1)),
    )
    r = right.select(
        F.col(right_id).alias("right_id"),
        F.col(r_lon).cast("double").alias("rlon"),
        F.col(r_lat).cast("double").alias("rlat"),
    ).withColumn("cell", cell_col(F.col("rlon"), F.col("rlat"), res))

    # Salting de-skews the SHUFFLE join only; a broadcast join has no
    # shuffle to de-skew, and salt-folding the left side would just
    # multiply the broadcast payload salt-fold for no benefit (ADVICE r2) —
    # so salt is ignored when broadcast_left is set.
    if salt and salt > 1 and not broadcast_left:
        r = r.withColumn("_s", F.pmod(F.xxhash64("right_id"), F.lit(salt)))
        l = l.withColumn("_s", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
        keys = ["cell", "_s"]
    else:
        keys = ["cell"]

    lhs = F.broadcast(l) if broadcast_left else l
    dx = F.col("llon") - F.col("rlon")
    dy = F.col("llat") - F.col("rlat")
    dist2 = dx * dx + dy * dy
    out = (
        lhs.join(r, keys, "inner")
        .select("left_id", "right_id", dist2.alias("dist2"))
        .filter(F.col("dist2") <= F.lit(float(radius)) * F.lit(float(radius)))
    )
    if not include_self:
        out = out.filter(F.col("left_id") != F.col("right_id"))
    return out
