"""Segment-intersection join (line x line overlay, X12).

Pairs two segment sets wherever a left segment PROPERLY crosses a right
segment (interiors intersect at exactly one point), returning the pair
plus the crossing point.  This is the line-layer overlay primitive the
polygon layer (``overlap.py``) builds on — road x river crossings,
trajectory x boundary transitions — exposed as a standalone join.
Generalizes the reference's ray/edge orientation test family
(``utils.ts:51-81``) from point-vs-edge to edge-vs-edge.

Semantics: proper crossings only.  Touching contacts (shared endpoint,
endpoint-on-interior) and collinear overlaps have measure-zero crossing
sets and are NOT counted — same fixed-formula contract as
``polygon_overlap_join``: degenerate pairs classify deterministically,
just not topologically.

Scale shape — three properties make this the 100 TB plan:

1. **Cell-cover prefilter, pure column math**: each segment explodes to
   the grid cells of its bbox (two ``sequence`` explodes — no UDF).
   Crossing segments share the crossing point's cell, so the cell
   equi-join is a guaranteed candidate superset at any resolution.  The
   only shuffle is keyed by cell; at 100 TB the right side is stored
   partitioned by the same cell key (co-located join) or broadcast.
2. **Exact refine stays in whole-stage codegen**: the classic
   orientation sign test (Cormen et al. §33.1) — four cross products,
   strict-sign straddle both ways — is plain column algebra; no Python,
   no division, no sqrt.
3. **Reference-point dedup, not a distinct**: a pair sharing k cover
   cells would emit k duplicates; instead of a ``dropDuplicates``
   shuffle, each crossing is kept ONLY in the cell containing its
   intersection point (the standard reference-point trick from
   distributed spatial joins, e.g. SpatialHadoop/Sedona).  The crossing
   point lies on both segments, hence inside both bboxes, hence its
   cell is always among the joined cells — each pair survives exactly
   once, with zero extra shuffle.

Determinism: the crossing parameter ``t = d3 / (d3 - d1·sign…)`` is a
single IEEE division of two cross products; Spark and DuckDB evaluate
the identical expression tree, so the crossing point — and therefore
the dedup cell — is bit-identical cross-engine.  The gate oracle replays
a naive all-pairs cross join with the same formulas; equality IS the
proof that cover + reference-point dedup lose nothing and double-count
nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .cells import _RES_SHIFT, _X_SHIFT, _clamped_axis, cell_col

__all__ = ["segment_intersection_join"]


def _axis_range(v1: Column, v2: Column, lo: float, span: float,
                n: int) -> tuple[Column, Column]:
    return (_clamped_axis(F.least(v1, v2), lo, span, n),
            _clamped_axis(F.greatest(v1, v2), lo, span, n))


def _cover(df: DataFrame, res: int, prefix: str,
           max_cover_cells: int | None) -> DataFrame:
    """Explode segments to the grid cells of their bboxes at ``res``."""
    n = 1 << res
    x1, y1 = F.col(f"{prefix}x1"), F.col(f"{prefix}y1")
    x2, y2 = F.col(f"{prefix}x2"), F.col(f"{prefix}y2")
    cx0, cx1 = _axis_range(x1, x2, -180.0, 360.0, n)
    cy0, cy1 = _axis_range(y1, y2, -90.0, 180.0, n)
    covered = df.select(
        "*", cx0.alias("_cx0"), cx1.alias("_cx1"),
        cy0.alias("_cy0"), cy1.alias("_cy1"),
    )
    if max_cover_cells is not None:
        ncells = ((F.col("_cx1") - F.col("_cx0") + 1)
                  * (F.col("_cy1") - F.col("_cy0") + 1))
        bad = covered.filter(ncells > max_cover_cells).limit(1).collect()
        if bad:
            raise ValueError(
                f"segment cover exceeds max_cover_cells={max_cover_cells} "
                f"at res={res} (first offender id="
                f"{bad[0][f'{prefix}id']!r}); use a coarser res, split "
                "long segments, or raise/disable the guard"
            )
    return (
        covered
        .withColumn("_gx", F.explode(F.sequence(F.col("_cx0"), F.col("_cx1"))))
        .withColumn("_gy", F.explode(F.sequence(F.col("_cy0"), F.col("_cy1"))))
        .select(
            f"{prefix}id", f"{prefix}x1", f"{prefix}y1",
            f"{prefix}x2", f"{prefix}y2",
            (F.lit(res) * F.lit(_RES_SHIFT) + F.col("_gx") * F.lit(_X_SHIFT)
             + F.col("_gy")).alias("cell"),
        )
    )


def segment_intersection_join(
        left: DataFrame, right: DataFrame, *, res: int = 9,
        left_id: str = "left_id", right_id: str = "right_id",
        l_x1: str = "x1", l_y1: str = "y1", l_x2: str = "x2", l_y2: str = "y2",
        r_x1: str = "x1", r_y1: str = "y1", r_x2: str = "x2", r_y2: str = "y2",
        broadcast_right: bool = False,
        max_cover_cells: int | None = 256) -> DataFrame:
    """-> ``(left_id, right_id, px, py)`` for every proper crossing.

    Inputs are segment tables ``(id, x1, y1, x2, y2)`` in lon/lat (or any
    planar) coordinates.  ``px, py`` is the crossing point rounded to
    9 dp.  ``res`` trades prefilter cost (finer = bigger covers) against
    candidate count (finer = fewer false candidates); output is IDENTICAL
    at any resolution.  ``max_cover_cells`` refuses segments whose bbox
    cover explodes (continent-spanning lines at fine res) instead of
    silently materializing it; ``None`` disables the guard job.
    """
    l = _cover(
        left.select(
            F.col(left_id).alias("lid"),
            F.col(l_x1).cast("double").alias("lx1"),
            F.col(l_y1).cast("double").alias("ly1"),
            F.col(l_x2).cast("double").alias("lx2"),
            F.col(l_y2).cast("double").alias("ly2"),
        ), res, "l", max_cover_cells)
    r = _cover(
        right.select(
            F.col(right_id).alias("rid"),
            F.col(r_x1).cast("double").alias("rx1"),
            F.col(r_y1).cast("double").alias("ry1"),
            F.col(r_x2).cast("double").alias("rx2"),
            F.col(r_y2).cast("double").alias("ry2"),
        ), res, "r", max_cover_cells)

    rhs = F.broadcast(r) if broadcast_right else r
    cand = l.join(rhs, "cell", "inner")

    ax1, ay1 = F.col("lx1"), F.col("ly1")
    ax2, ay2 = F.col("lx2"), F.col("ly2")
    bx1, by1 = F.col("rx1"), F.col("ry1")
    bx2, by2 = F.col("rx2"), F.col("ry2")
    # orientation cross products (same operand order as overlap.py /
    # the oracle SQL — the IEEE sequence must match bit-for-bit)
    d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
    d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
    d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
    d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
    straddle = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & \
               (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))

    cand = cand.filter(straddle).select(
        "cell", "lx1", "ly1", "lx2", "ly2",
        F.col("lid").alias("left_id"), F.col("rid").alias("right_id"),
        # t along the LEFT segment: with r = a2-a1, s = b2-b1,
        # d3 = cross(b1-a1, s) and d2-d1 = cross(r, s)  =>  t = d3/(d2-d1);
        # strict straddle guarantees d1 != d2, so no divide-by-zero
        (d3 / (d2 - d1)).alias("_t"),
    )
    px = F.col("lx1") + F.col("_t") * (F.col("lx2") - F.col("lx1"))
    py = F.col("ly1") + F.col("_t") * (F.col("ly2") - F.col("ly1"))
    return (
        cand
        .withColumn("_px", px)
        .withColumn("_py", py)
        # reference-point dedup: keep the pair only in the crossing
        # point's own cell — exactly one survivor per crossing pair
        .filter(cell_col(F.col("_px"), F.col("_py"), res) == F.col("cell"))
        .select(
            "left_id", "right_id",
            F.round(F.col("_px"), 9).alias("px"),
            F.round(F.col("_py"), 9).alias("py"),
        )
    )
