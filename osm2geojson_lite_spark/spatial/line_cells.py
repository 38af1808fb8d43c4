"""Segment -> cell trace (X24): rasterize line geometry onto the
quadtree grid — the "line" member of the tiling family next to
``cell_col`` (points) and ``polygon_cover_cells`` (polygons).

Assigning road / route / boundary segments to tiles is the standard
prerequisite for tile-local joins (map matching, tile rendering, per-tile
length rollups).  The supercover — every cell whose half-open box
``[Lx, Lx+w) x [Ly, Ly+h)`` the segment passes through — is computed by
column-strip decomposition:

  1. explode the segment over the integer columns its x-extent crosses
     (one ``sequence``),
  2. per column, clip the segment to the strip and linearly interpolate
     its y-range at the clip bounds (pure column math),
  3. explode that y-range into rows (second ``sequence``).

Scale shape: two map-side explodes, no join, no window, no Python; work
is proportional to the number of (column, row) cells actually touched —
output-linear, the same bound H3's ``gridPathCells``/polyfill family
gives.  A segment spanning many cells at a fine resolution is therefore
an *input* problem, exactly like choosing ``radius_res``: pick ``res``
so the expected per-segment cell count stays O(10..100), or set
``max_cols`` to refuse degenerate continent-long rows loudly instead of
exploding them.

Determinism: every arithmetic step (quantize, clip, interpolate, floor)
is one fixed IEEE-double expression evaluated in the same order on every
engine — byte-identical at any partitioning and replayable verbatim in
ANSI SQL (the gate oracle chains the identical expressions through
DuckDB ``unnest(generate_series(..))``).

Tie rule: floor semantics throughout — a segment running exactly along
a cell border is charged to the upper/right cell, and the grid clamp
pins out-of-domain coordinates to the border cells (same contract as
``cell_col``, `cells.py`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .cells import CELL_RES_MAX, CELL_RES_MIN, _RES_SHIFT, _X_SHIFT


def _grid(v: Column, lo: float, extent: float, n: int) -> Column:
    """Quantize a coordinate to a clamped integer grid index —
    the same expression ``cell_col`` uses, kept textually identical in
    the SQL oracle."""
    raw = F.floor((v - F.lit(lo)) / F.lit(extent) * F.lit(n))
    return F.greatest(F.lit(0).cast("long"),
                      F.least(F.lit(n - 1).cast("long"), raw.cast("long")))


def line_cells(segments: DataFrame, res: int, *,
               id_col: str = "id",
               x1: str = "x1", y1: str = "y1",
               x2: str = "x2", y2: str = "y2",
               max_cols: int | None = None) -> DataFrame:
    """Supercover cells of each segment at resolution ``res``.

    Input: one row per segment with endpoint lon/lat columns.  Output:
    ``(id, cell)`` — one row per (segment, touched cell), distinct by
    construction (each (column, row) pair is produced exactly once).

    ``max_cols`` (optional): drop rows whose x-extent crosses at least
    this many grid columns, so one degenerate continent-long row cannot
    explode a task (callers wanting visibility can diff counts or wrap
    the input in ``observe``).  Pick ``res`` so ordinary segments stay
    well under the cap.
    """
    if not (CELL_RES_MIN <= res <= CELL_RES_MAX):
        raise ValueError(f"res must be in [{CELL_RES_MIN}, {CELL_RES_MAX}]")
    n = 1 << res

    ax_r, ay_r = F.col(x1).cast("double"), F.col(y1).cast("double")
    bx_r, by_r = F.col(x2).cast("double"), F.col(y2).cast("double")
    swap = bx_r < ax_r
    ax = F.when(swap, bx_r).otherwise(ax_r)
    ay = F.when(swap, by_r).otherwise(ay_r)
    bx = F.when(swap, ax_r).otherwise(bx_r)
    by = F.when(swap, ay_r).otherwise(by_r)

    pre = segments.select(
        F.col(id_col).alias("id"),
        ax.alias("ax"), ay.alias("ay"), bx.alias("bx"), by.alias("by"),
        _grid(ax, -180.0, 360.0, n).alias("ca"),
        _grid(bx, -180.0, 360.0, n).alias("cb"),
    )
    if max_cols is not None:
        pre = pre.filter(F.col("cb") - F.col("ca") < F.lit(int(max_cols)))

    cols = pre.select(
        "id", "ax", "ay", "bx", "by",
        F.explode(F.sequence(F.col("ca"), F.col("cb"))).alias("cx"),
    )

    # clip the segment to the strip [L(cx), L(cx+1)] and interpolate y
    lc = F.lit(-180.0) + F.col("cx").cast("double") * F.lit(360.0) / F.lit(n)
    lc1 = (F.lit(-180.0)
           + (F.col("cx").cast("double") + F.lit(1.0)) * F.lit(360.0) / F.lit(n))
    xs = F.greatest(F.col("ax"), lc)
    xe = F.least(F.col("bx"), lc1)
    vertical = F.col("bx") == F.col("ax")
    dy_dx = (F.col("by") - F.col("ay")) / (F.col("bx") - F.col("ax"))
    y_s = F.when(vertical, F.col("ay")).otherwise(
        F.col("ay") + (xs - F.col("ax")) * dy_dx)
    y_e = F.when(vertical, F.col("by")).otherwise(
        F.col("ay") + (xe - F.col("ax")) * dy_dx)

    rows = cols.select(
        "id", F.col("cx"),
        _grid(F.least(y_s, y_e), -90.0, 180.0, n).alias("ra"),
        _grid(F.greatest(y_s, y_e), -90.0, 180.0, n).alias("rb"),
    ).select(
        "id", "cx",
        F.explode(F.sequence(F.col("ra"), F.col("rb"))).alias("cy"),
    )

    cell = (F.lit(res).cast("long") * F.lit(_RES_SHIFT)
            + F.col("cx") * F.lit(_X_SHIFT) + F.col("cy"))
    return rows.select("id", cell.alias("cell"))
