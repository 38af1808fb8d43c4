"""K-ring density smoothing — the heatmap layer over the cell grid (X1).

``cell_density`` bins points into grid cells (one map-side-combined
groupBy); ``kring_smooth`` spreads each cell's count over its Chebyshev
``ring``-neighborhood with integer distance weights, the discrete kernel
smoothing step every tile heatmap / hotspot-detection pipeline runs after
binning (the H3 analog is ``grid_disk`` + weighted sum).

Scale shape: smoothing is scatter-not-gather — each *aggregated* cell row
explodes into its ``(2*ring+1)^2`` weighted contributions and one groupBy
re-sums them.  Work is proportional to (#distinct occupied cells) x
ring², never to raw point count, and both aggregations are map-side
combinable; there is no join and no window.  At 100 TB the density table
is already tiny relative to the corpus (bounded by the grid, 2^2r cells),
so the smooth is a rounding error next to the binning scan.

Determinism: weights are integers and counts are longs, so ``w_sum`` is
exact integer arithmetic — bit-identical at any partitioning, parallelism,
or engine (the north rule's byte-identity bar).  Neighbor semantics match
:func:`~.cells.neighbor_cells_col`: x wraps at the antimeridian, y clamps
at the poles (off-grid contributions are dropped, not reflected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cells import _RES_SHIFT, _X_SHIFT, cell_col, cell_xy


def cell_density(points: DataFrame, res: int, *,
                 lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Bin points into res-``res`` cells: ``(cell, n_points)``."""
    return (
        points.select(cell_col(F.col(lon_col), F.col(lat_col), res).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def kring_scatter_col(cell, res: int, ring: int = 1,
                      weights: list[int] | None = None):
    """Array of ``struct(cell, w)`` contributions a source cell sends to
    its Chebyshev ``ring``-neighborhood — the shared scatter expression
    behind :func:`kring_smooth` (batch) and the streaming heatmap
    (``streaming.tile_stats.stream_tile_heatmap``, which scatters per
    event BEFORE its single windowed aggregation: smoothing is linear, so
    scatter-then-count == count-then-smooth)."""
    if weights is None:
        weights = [1 << (ring - d) for d in range(ring + 1)]
    if len(weights) != ring + 1:
        raise ValueError(f"weights must have ring+1={ring + 1} entries")
    n = 1 << res
    x, y = cell_xy(cell)
    contribs = []
    for dx in range(-ring, ring + 1):
        for dy in range(-ring, ring + 1):
            w = int(weights[max(abs(dx), abs(dy))])
            nx = F.pmod(x + F.lit(dx), F.lit(n))
            ny = y + F.lit(dy)
            tgt = F.lit(res * _RES_SHIFT) + nx * F.lit(_X_SHIFT) + ny
            contribs.append(
                F.when(
                    (ny >= 0) & (ny < n),
                    F.struct(tgt.alias("cell"), F.lit(w).alias("w")),
                )
            )
    return F.filter(F.array(*contribs), lambda c: c.isNotNull())


def kring_smooth(density: DataFrame, res: int, *, ring: int = 1,
                 cell_col_name: str = "cell", value_col: str = "n_points",
                 weights: list[int] | None = None) -> DataFrame:
    """Weighted k-ring smooth of a per-cell value.

    Output ``(cell, w_sum, n_src)``: ``w_sum`` = sum over occupied cells
    within Chebyshev distance ``ring`` of ``value * weights[distance]``;
    ``n_src`` = how many occupied cells contributed.  Cells with no
    occupied neighbor don't appear; empty cells inside a hot halo DO —
    that's the heatmap contract.

    ``weights[d]`` must be an int per distance 0..ring (default
    ``2^(ring-d)``: ring 1 -> [2, 1]).
    """
    arr = kring_scatter_col(F.col(cell_col_name), res, ring, weights)
    scat = density.select(
        F.col(value_col).cast("long").alias("_v"), F.explode(arr).alias("t")
    )
    return (
        scat.groupBy(F.col("t.cell").alias("cell"))
        .agg(
            F.sum(F.col("_v") * F.col("t.w")).alias("w_sum"),
            F.count(F.lit(1)).alias("n_src"),
        )
    )
