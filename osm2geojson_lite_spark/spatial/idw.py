"""Inverse-distance-weighted (IDW) interpolation surface (X25) — the
classic Shepard-style gridding operator: estimate a continuous field at
every grid cell from scattered sample points (sensor readings, property
values, elevation spot heights).

Two-stage, both map-side combinable:

  1. bin sample points to cells — ``(cell, Σvalue, n)`` per occupied
     cell (one groupBy, integer aggregates);
  2. scatter each occupied cell's aggregate to its Chebyshev
     ``ring``-neighborhood with an **integer-quantized** inverse-
     distance-squared kernel ``w(dx, dy) = scale // (dx² + dy² + 1)``
     and re-aggregate per target cell.

The estimate at a target cell is ``num / den`` where
``num = Σ_src Σvalue·w`` and ``den = Σ_src n·w`` — both exact integers,
so every aggregation is bit-reproducible at any partitioning and the
single IEEE divide at the end is one fixed expression (the same
integers-until-the-last-divide contract as ``gi_hotspots`` /
``morans_i``, `hotspot.py`).  Quantizing the kernel to integers is what
buys that: classical ``1/d²`` float weights would make the partial sums
order-dependent.

Scale shape: work ∝ (#distinct occupied cells) × (2·ring+1)², never raw
point count — identical to ``kring_smooth``'s scatter-not-gather plan.
No join, no window, no Python.  Neighbor semantics match
``neighbor_cells_col``: x wraps at the antimeridian, y clamps at the
poles (off-grid contributions are dropped).

Within-cell positions are collapsed to the cell's aggregate before
scattering (the source location is the cell, not the raw point) — the
standard gridded-IDW approximation; choose ``res`` fine enough that a
cell is "one place" for the field being interpolated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cells import CELL_RES_MAX, CELL_RES_MIN, _RES_SHIFT, _X_SHIFT, \
    cell_col, cell_xy


def idw_kernel(ring: int, scale: int = 2520) -> dict[tuple[int, int], int]:
    """The integer weight table: ``(dx, dy) -> scale // (dx²+dy²+1)``.
    2520 = lcm(1..9) keeps small-d weights exact multiples; any positive
    scale works, larger = finer quantization."""
    return {(dx, dy): scale // (dx * dx + dy * dy + 1)
            for dx in range(-ring, ring + 1)
            for dy in range(-ring, ring + 1)}


def idw_surface(points: DataFrame, res: int, *, ring: int = 2,
                scale: int = 2520,
                lon_col: str = "lon", lat_col: str = "lat",
                value_col: str = "value") -> DataFrame:
    """IDW field estimate per grid cell.

    ``value_col`` must be integral (cast to long) — the exactness
    contract above depends on it; pre-quantize float fields upstream.
    Output ``(cell, num, den, n_src, idw_value)``; ``num``/``den`` are
    the exact integer sums, ``idw_value = num / den`` the one-divide
    estimate.  Cells with no occupied cell within ``ring`` don't appear.
    """
    if not (CELL_RES_MIN <= res <= CELL_RES_MAX):
        raise ValueError(f"res must be in [{CELL_RES_MIN}, {CELL_RES_MAX}]")
    if ring < 1:
        raise ValueError("ring must be >= 1")
    n = 1 << res

    binned = (
        points.select(
            cell_col(F.col(lon_col), F.col(lat_col), res).alias("cell"),
            F.col(value_col).cast("long").alias("v"))
        .groupBy("cell")
        .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("np"))
    )

    kern = idw_kernel(ring, scale)
    x, y = cell_xy(F.col("cell"))
    contribs = []
    for (dx, dy), w in sorted(kern.items()):
        if w <= 0:
            continue
        nx = F.pmod(x + F.lit(dx), F.lit(n))
        ny = y + F.lit(dy)
        tgt = F.lit(res * _RES_SHIFT) + nx * F.lit(_X_SHIFT) + ny
        contribs.append(F.when(
            (ny >= 0) & (ny < n),
            F.struct(tgt.alias("cell"), F.lit(w).alias("w"))))
    arr = F.filter(F.array(*contribs), lambda c: c.isNotNull())

    scat = binned.select("sv", "np", F.explode(arr).alias("t"))
    return (
        scat.groupBy(F.col("t.cell").alias("cell"))
        .agg(F.sum(F.col("sv") * F.col("t.w")).alias("num"),
             F.sum(F.col("np") * F.col("t.w")).alias("den"),
             F.count(F.lit(1)).alias("n_src"))
        .select("cell", "num", "den", "n_src",
                (F.col("num").cast("double")
                 / F.col("den").cast("double")).alias("idw_value"))
    )
