"""Cell-set compaction / uncompaction — the H3 ``compactCells`` /
``uncompactCells`` analog over the quadtree grid (X23).

A region cover at a fine resolution (the output of PIP rasterization,
``zonal_stats`` input prep, or a tile-pyramid layer) is hugely redundant
wherever the region is solid: every fully-covered parent carries all four
of its children.  ``compact_cells`` iteratively replaces each complete
4-sibling group with its parent, producing the minimal mixed-resolution
set covering exactly the same area — at 100 TB this is the difference
between shipping a continent cover as ~10^9 res-12 cells or ~10^6 mixed
cells (H3's own motivation for the operation).

Scale shape: one groupBy-on-parent per level, ``res_from - res_to``
levels total (<= 5 across the supported 7..12 range).  The per-parent
aggregate is ``count + collect_list`` with at most 4 children per group,
so it is map-side combinable and the shuffle carries at most one row per
*parent* cell; work shrinks geometrically level over level (complete
groups collapse 4 -> 1, incomplete ones leave the loop).  No joins, no
windows, no Python.

Determinism: pure integer bit algebra on the cell id (parent = shift x/y
down) — byte-identical at any partitioning or parallelism, and replayable
verbatim in ANSI SQL (the gate oracle chains one
``QUALIFY count(*) OVER (PARTITION BY parent)`` per level).

Contract: the input is a SET of DISTINCT cells all at ``res_from`` (a
single-resolution cover, which is what every producer in this repo
emits).  Mixed-resolution input would need sibling checks across levels
the iterative scheme doesn't perform; enforce upstream with
``.distinct()`` if provenance is unknown.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from .cells import _RES_SHIFT, _X_SHIFT, cell_xy


def compact_cells(cells: DataFrame, res_from: int, res_to: int, *,
                  cell_col_name: str = "cell") -> DataFrame:
    """Minimal mixed-resolution cover of a res-``res_from`` cell set.

    Returns ``(cell, res)`` — ``res`` in ``[res_to, res_from]``.  A cell
    appears at resolution ``r < res_from`` iff every res-``res_from``
    descendant of it was present in the input; no coarser merge than
    ``res_to`` is attempted (the floor mirrors H3's lowest-res argument
    and keeps the level count bounded for the plan).
    """
    if res_to > res_from:
        raise ValueError("res_to must be <= res_from")
    cur = cells.select(F.col(cell_col_name).cast("long").alias("cell"))
    finals: list[DataFrame] = []
    for r in range(res_from, res_to, -1):
        x, y = cell_xy(F.col("cell"))
        parent = (
            F.lit(r - 1) * F.lit(_RES_SHIFT)
            + (x / F.lit(2)).cast("long") * F.lit(_X_SHIFT)
            + (y / F.lit(2)).cast("long")
        )
        g = (
            cur.groupBy(parent.alias("parent"))
            .agg(F.count(F.lit(1)).alias("c"),
                 F.collect_list("cell").alias("kids"))
        )
        finals.append(
            g.filter(F.col("c") < 4)
            .select(F.explode("kids").alias("cell"), F.lit(r).alias("res"))
        )
        cur = g.filter(F.col("c") == 4).select(F.col("parent").alias("cell"))
    finals.append(cur.select("cell", F.lit(res_to).alias("res")))
    return reduce(DataFrame.unionByName, finals)


def uncompact_cells(compacted: DataFrame, res_to: int, *,
                    cell_col_name: str = "cell") -> DataFrame:
    """Expand a mixed-resolution set back to its res-``res_to`` cover.

    Exact inverse of :func:`compact_cells` on its own output (pinned by
    the round-trip property test).  Map-side only: each cell explodes
    into its ``4^(res_to - res)`` descendants via one ``sequence`` —
    no shuffle, no Python.
    """
    cell = F.col(cell_col_name).cast("long")
    # pyspark's shiftleft() only takes a literal bit count, so the
    # per-row side length goes through a SQL expr on a named column
    pre = compacted.select(
        cell.alias("_c"),
        F.expr(f"cast(shiftleft(1, {int(res_to)} - cast(_c div "
               f"{_RES_SHIFT} as int)) as bigint)").alias("_s"))
    i = F.explode(F.sequence(F.lit(0).cast("long"),
                             F.col("_s") * F.col("_s") - 1))
    out = pre.select("_c", "_s", i.alias("_i"))
    cx = F.col("_c") % F.lit(_RES_SHIFT)
    px, py = (cx / F.lit(_X_SHIFT)).cast("long"), cx % F.lit(_X_SHIFT)
    child = (
        F.lit(res_to) * F.lit(_RES_SHIFT)
        + (px * F.col("_s") + (F.col("_i") / F.col("_s")).cast("long")) * F.lit(_X_SHIFT)
        + (py * F.col("_s") + F.col("_i") % F.col("_s"))
    )
    return out.select(child.alias("cell"))
