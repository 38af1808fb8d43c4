"""Getis-Ord Gi* and global Moran's I over the cell grid (X1 heatmap layer).

Getis-Ord Gi* is the standard local spatial statistic behind "find the
statistically hot tiles" (Getis & Ord 1992; Ord & Getis 1995): for each
occupied cell i,
the z-score of its binary-weighted ring-neighborhood sum against the
global mean/variance of the per-cell value,

    Gi* = (S_i - xbar * W_i) / (s * sqrt((n*W_i - W_i^2) / (n - 1)))

with S_i = sum of x over occupied cells within Chebyshev ``ring`` of i
(self included), W_i = how many occupied cells contributed, and n / xbar
/ s the count / mean / stddev over ALL occupied cells.  The study frame
is the occupied-cell set (the universal choice for point-derived
densities, where the empty grid is unbounded ocean).

Scale shape: the neighborhood sums reuse :func:`~.density.kring_smooth`'s
scatter-not-gather plan (work ∝ occupied cells x ring², map-side
combinable, no join on raw points); the global moments are ONE tiny
partial-agg row crossJoin-broadcast back.  Everything downstream of the
binning scan is proportional to the number of occupied cells (bounded by
the grid, 2^2r), never to corpus size.

Determinism: S_i, W_i, n and the sum / sum-of-squares are exact integers
(long counts), and the z-score is computed from them in ONE fixed IEEE
expression — ``(n*S_i - sx*W_i) / sqrt(dfloat(n*sumsq - sx^2) *
dfloat(n*W_i - W_i^2) / (n-1))`` — the integer-scaled form of the formula
above (multiply numerator and denominator by n), so the only
floating-point steps are one multiply, one divide, one sqrt, one divide:
bit-reproducible at any partitioning and replayable in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .density import kring_smooth


def getis_ord_gi(density: DataFrame, res: int, *, ring: int = 1,
                 cell_col_name: str = "cell",
                 value_col: str = "n_points") -> DataFrame:
    """-> ``(cell, x, s_i, w_i, gi)`` for every occupied cell.

    ``density`` is a per-cell value table (e.g. from
    :func:`~.density.cell_density`) with integer values.  ``x`` is the
    cell's own value, ``s_i``/``w_i`` the neighborhood sum / contributor
    count (binary weights, self included), ``gi`` the Gi* z-score (null
    when the variance is zero or n < 2).
    """
    dens = density.select(
        F.col(cell_col_name).alias("cell"),
        F.col(value_col).cast("long").alias("x"),
    )
    nbr = kring_smooth(
        dens, res, ring=ring, cell_col_name="cell", value_col="x",
        weights=[1] * (ring + 1),
    ).select("cell", F.col("w_sum").alias("s_i"),
             F.col("n_src").alias("w_i"))

    stats = dens.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )

    # Occupied centers only (kring_smooth also emits the empty halo).
    joined = dens.join(nbr, "cell").crossJoin(F.broadcast(stats))
    num = (F.col("n") * F.col("s_i") - F.col("sx") * F.col("w_i")).cast("double")
    var_term = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    w_term = (F.col("n") * F.col("w_i") - F.col("w_i") * F.col("w_i")).cast("double")
    den = F.sqrt(var_term * w_term / (F.col("n") - F.lit(1)).cast("double"))
    gi = F.when((F.col("n") > 1) & (den > 0), num / den)
    return joined.select("cell", "x", "s_i", "w_i", gi.alias("gi"))


def morans_i(density: DataFrame, res: int, *, ring: int = 1,
             cell_col_name: str = "cell",
             value_col: str = "n_points") -> DataFrame:
    """Global Moran's I spatial autocorrelation (Moran 1950; Cliff & Ord
    1981) over the occupied-cell frame with binary Chebyshev-``ring``
    weights (w_ij = 1 when j ≠ i is an occupied cell within ``ring`` of i).

    One row out: ``(n, w, a, t, d, sx, sxx, s1, s2, moran_i, e_i, z)``
    where ``n``/``sx``/``sxx`` are the frame count / Σx / Σx², ``w`` the
    total weight Σ_ij w_ij, ``a`` = Σ_ij w_ij·x_i·x_j, ``t``/``d`` the row
    / column weighted sums Σ_i x_i·(row/col degree-weighted neighbor
    terms), and ``s1``/``s2`` the Cliff-Ord variance building blocks
    (S1 = 2W and S2 = Σ(2·deg_i)² for a symmetric binary matrix).  ``e_i``
    = -1/(n-1); ``z`` is the normality-assumption z-score
    (I - E[I]) / sqrt(Var_N(I)) with

        Var_N(I) = (n²·S1 - n·S2 + 3W²) / (W²·(n²-1)) - E[I]².

    Scale shape: identical to :func:`getis_ord_gi` — the pair sums ride
    :func:`~.density.kring_smooth`'s scatter plan (no join on raw points,
    work ∝ occupied cells × ring²), then ONE global partial aggregation
    collapses everything to a single row.  No window, no driver collect.

    Determinism: the Chebyshev neighborhood (x wraps, y clamps) is
    symmetric, so with t_i = S_i - x_i (neighbor sum excl. self) and
    d_i = W_i - 1 (degree), every aggregate (A = Σx_i·t_i, D = Σx_i·d_i,
    T = Σt_i = D, W = Σd_i, S2 = 4·Σd_i²) is exact integer arithmetic.
    Multiplying numerator and denominator of I by n² gives

        I = (n²·A - n·sx·(D + T) + sx²·W) / (W·(n·sxx - sx²))

    — ONE IEEE divide of two exact integers; E[I] and z add a fixed short
    sequence of divides and one sqrt.  Bit-reproducible at any
    partitioning and replayable verbatim in ANSI SQL.

    Nulls: ``moran_i`` is null when W = 0 (no neighboring occupied pair)
    or the variance term n·sxx - sx² is 0 (constant field); ``z``
    additionally requires n > 2 and Var_N(I) > 0.
    """
    dens = density.select(
        F.col(cell_col_name).alias("cell"),
        F.col(value_col).cast("long").alias("x"),
    )
    nbr = kring_smooth(
        dens, res, ring=ring, cell_col_name="cell", value_col="x",
        weights=[1] * (ring + 1),
    ).select("cell", F.col("w_sum").alias("s_incl"),
             F.col("n_src").alias("w_incl"))

    per_cell = dens.join(nbr, "cell").select(
        "x",
        (F.col("s_incl") - F.col("x")).alias("t_i"),   # Σ_j≠i w_ij x_j
        (F.col("w_incl") - F.lit(1)).alias("d_i"),     # row degree
    )
    g = per_cell.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("t_i")).alias("a"),   # Σ w_ij x_i x_j
        F.sum(F.col("x") * F.col("d_i")).alias("d"),   # Σ x_i · deg_i
        F.sum("t_i").alias("t"),                       # = d by symmetry
        F.sum("d_i").alias("w"),                       # total weight W
        F.sum(F.col("d_i") * F.col("d_i")).alias("sd2"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    a, d, t, w, sd2 = (F.col("a"), F.col("d"), F.col("t"), F.col("w"),
                       F.col("sd2"))
    num = (n * n * a - n * sx * (d + t) + sx * sx * w).cast("double")
    den = (w * (n * sxx - sx * sx)).cast("double")
    i_val = F.when((w > 0) & (n * sxx - sx * sx > 0), num / den)
    e_i = F.when(n > 1, F.lit(-1.0) / (n - F.lit(1)).cast("double"))
    s1 = F.lit(2) * w
    s2 = F.lit(4) * sd2
    var_n = F.when(
        (w > 0) & (n > 2),
        (n * n * s1 - n * s2 + F.lit(3) * w * w).cast("double")
        / (w * w * (n * n - F.lit(1))).cast("double")
        - e_i * e_i,
    )
    z = F.when(var_n > 0, (i_val - e_i) / F.sqrt(var_n))
    return g.select(
        "n", "w", "a", "t", "d", "sx", "sxx",
        s1.alias("s1"), s2.alias("s2"),
        i_val.alias("moran_i"), e_i.alias("e_i"), z.alias("z"),
    )
