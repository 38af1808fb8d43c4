"""Snap-to-nearest-segment join (map matching, X16).

For each point, the nearest segment within ``radius`` plus the snapped
coordinate — the map-matching primitive (GPS ping → road edge) and the
vector flavor of ``raster_tile_assignment``.  Extends the reference's
point-vs-edge orientation family (``utils.ts:51-81``) with the classic
clamped-projection point-to-segment distance.

Scale shape, three choices that matter at 100 TB:

1. **Disk x cover candidate join**: segments explode to the grid cells
   of their bboxes (``intersect._cover``); each point probes its 3x3
   neighbor disk at a resolution whose cell extent is >= ``radius``
   (asserted) — any segment within ``radius`` of the point has a cover
   cell inside that disk, so the equi-join is an exact candidate
   superset (the `radius_join` covering argument applied to bboxes).
2. **No dedup, no window**: a (point, segment) pair reaching the join
   through several shared cells carries an IDENTICAL candidate struct,
   and the nearest segment is taken with ``min(struct(d2, seg_id, …))``
   — a partially-aggregable groupBy that combines map-side, so
   duplicates collapse for free and a hot point never funnels rows
   through a window task.
3. **Distance in codegen**: the clamped projection ``t = clamp(dot/len2,
   0, 1)``, snap point, and squared distance are plain column algebra —
   one IEEE division, deterministic cross-engine, rounded to 9 dp before
   the argmin with a segment-id tiebreak (the repo's rank contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cells import cell_col, cell_size_deg, neighbor_cells_col
from .intersect import _cover

__all__ = ["snap_join"]


def snap_join(points: DataFrame, segments: DataFrame, radius: float, *,
              point_id: str = "point_id", seg_id: str = "seg_id",
              p_lon: str = "lon", p_lat: str = "lat",
              s_x1: str = "x1", s_y1: str = "y1",
              s_x2: str = "x2", s_y2: str = "y2",
              res: int | None = None, broadcast_segments: bool = False,
              max_cover_cells: int | None = 256) -> DataFrame:
    """-> ``(point_id, seg_id, t, snap_x, snap_y, dist2)``: each point's
    nearest segment within ``radius`` (points with none are dropped).

    ``t`` is the clamped position along the segment (0 = first endpoint,
    1 = second), ``(snap_x, snap_y)`` the snapped coordinate, ``dist2``
    the squared planar distance — all rounded to 9 dp.  Nearest = lowest
    ``(dist2, seg_id)``, so ties are deterministic at any partitioning.
    """
    if res is None:
        import math
        res = max(0, min(12, int(math.floor(math.log2(180.0 / radius)))))
    if not cell_size_deg(res) >= radius:
        raise ValueError(
            f"res={res} cells ({cell_size_deg(res)} deg) are smaller than "
            f"radius={radius}; the 3x3 disk could miss segments")

    segs = _cover(
        segments.select(
            F.col(seg_id).alias("sid"),
            F.col(s_x1).cast("double").alias("sx1"),
            F.col(s_y1).cast("double").alias("sy1"),
            F.col(s_x2).cast("double").alias("sx2"),
            F.col(s_y2).cast("double").alias("sy2"),
        ), res, "s", max_cover_cells)
    pts = points.select(
        F.col(point_id).alias("point_id"),
        F.col(p_lon).cast("double").alias("px"),
        F.col(p_lat).cast("double").alias("py"),
    ).withColumn(
        "cell",
        F.explode(neighbor_cells_col(
            cell_col(F.col("px"), F.col("py"), res), res, ring=1)),
    )

    rhs = F.broadcast(segs) if broadcast_segments else segs
    cand = pts.join(rhs, "cell", "inner")

    dx = F.col("sx2") - F.col("sx1")
    dy = F.col("sy2") - F.col("sy1")
    len2 = dx * dx + dy * dy
    t_raw = ((F.col("px") - F.col("sx1")) * dx
             + (F.col("py") - F.col("sy1")) * dy) / len2
    t = F.when(len2 > 0,
               F.least(F.lit(1.0), F.greatest(F.lit(0.0), t_raw))
               ).otherwise(F.lit(0.0))

    # Raw-arithmetic prefilter — the ONLY predicate below the aggregation,
    # so the optimizer may inline it into the join condition freely: it is
    # plain flops.  The exact pipeline's round(, 9) calls (Spark's double
    # round allocates a BigDecimal per value; four rounds per candidate
    # row dominated this stage — measured ~6s over 3.6M candidates at
    # sf0.1, ~18% selective) live in a PROJECT above the join and are now
    # evaluated only for prefilter survivors.  The raw squared distance
    # differs from the exact rounded one only by the snap point's decimal-
    # rounding displacement (<= 0.5e-9 per axis, ABSOLUTE — round-to-9-
    # decimals error is magnitude-independent) plus the final d2 round and
    # FP noise, so `d2_raw <= r^2 + margin` is a provable SUPERSET of the
    # exact survivors.  The exact radius test moves AFTER the argmin: the
    # min-(d2, sid) winner over the superset is <= every exact survivor's
    # d2, hence is itself an exact survivor whenever one exists, and the
    # final one-row-per-point filter drops points whose winner exceeds the
    # radius — byte-identical results, rounds on ~1/5 of the rows, and no
    # round-bearing predicate for the optimizer to substitute into the
    # join condition (where the expanded expression defeats codegen).
    exr = F.col("px") - (F.col("sx1") + t * dx)
    eyr = F.col("py") - (F.col("sy1") + t * dy)
    r = float(radius)
    margin = 1e-8 + 3e-9 * r + 1e-15 * r * r
    pre = cand.filter(exr * exr + eyr * eyr <= F.lit(r * r + margin))

    snapped = pre.select(
        "point_id", "px", "py", F.col("sid"),
        F.round(t, 9).alias("_t"),
        F.round(F.col("sx1") + t * dx, 9).alias("_cx"),
        F.round(F.col("sy1") + t * dy, 9).alias("_cy"),
    )
    ex = F.col("px") - F.col("_cx")
    ey = F.col("py") - F.col("_cy")
    scored = snapped.select(
        "point_id", "sid", "_t", "_cx", "_cy",
        F.round(ex * ex + ey * ey, 9).alias("_d2"),
    )
    best = scored.groupBy("point_id").agg(
        F.min(F.struct("_d2", "sid", "_t", "_cx", "_cy")).alias("_b"))
    return best.filter(
        F.col("_b._d2") <= F.lit(float(radius)) * F.lit(float(radius))
    ).select(
        "point_id",
        F.col("_b.sid").alias("seg_id"),
        F.col("_b._t").alias("t"),
        F.col("_b._cx").alias("snap_x"),
        F.col("_b._cy").alias("snap_y"),
        F.col("_b._d2").alias("dist2"),
    )
