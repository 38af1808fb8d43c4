"""Per-group convex hull (X29): the footprint / coverage-outline
operator — "one polygon summarizing each fleet / source / cluster's
spatial extent", the classic GIS ``ST_ConvexHull(ST_Collect(...))``
aggregate (PostGIS, Sedona) the tiling stack feeds.

Reference scope note: tibetty/osm2geojson-lite builds geometries from
explicit member lists only; the hull is a derived aggregate this engine
adds for the 100 TB summarization path.

Algorithm: Andrew's monotone chain (Andrew 1979, IPL 9(5)) on
INTEGER-quantized coordinates, so every orientation test is an exact
int64 cross product — no epsilon, byte-identical at any parallelism,
and replayable in ANSI SQL (the oracle gift-wraps the same integer
points with a recursive CTE; both produce the identical strict hull).
Collinear boundary points are dropped (strict hull), output is CCW
starting at the lexicographically smallest ``(x, y)`` vertex.

Scale shape — two-stage local-prune + final, never a per-group sort of
all points on one task:

1. ``mapInPandas`` partition-local strict hull per group: NO shuffle;
   each partition reduces a group's points to its local hull (O(k) for
   k survivors).  Correct because a strict-hull vertex of the full set
   is a strict-hull vertex of EVERY subset containing it, and a point
   dropped locally lies in the convex closure of the kept local points
   — so the union of local hulls preserves the global hull exactly.
2. One ``applyInPandas`` per group over the pruned candidates (a few
   dozen rows per partition x group, not the raw billions).

A 10¹⁰-point group thus ships only ~(partitions x local-hull-size) rows
through the single shuffle.  ``max_candidate_rows`` refuses a
pathological final group (e.g. billions of distinct points ON a circle
— every one a true hull vertex) instead of OOMing a reducer.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

HULL_SCHEMA = "g bigint, seq int, x bigint, y bigint"


def _monotone_chain(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Indices of the strict convex hull, CCW from the lexicomin vertex.

    Inputs are int64; all arithmetic stays integral.  Degenerate cases:
    1 point -> itself; all-collinear -> the two extreme endpoints.
    """
    pts = np.unique(np.stack([x, y], axis=1), axis=0)  # sorted (x, y)
    n = pts.shape[0]
    if n == 1:
        sel = pts
    else:
        def half(order):
            h: list[int] = []
            for i in order:
                while len(h) >= 2:
                    ox, oy = pts[h[-2]]
                    ax, ay = pts[h[-1]]
                    bx, by = pts[i]
                    # strict left turn keeps; collinear (== 0) drops
                    if (int(ax - ox) * int(by - oy)
                            - int(ay - oy) * int(bx - ox)) > 0:
                        break
                    h.pop()
                h.append(i)
            return h

        lower = half(range(n))
        upper = half(range(n - 1, -1, -1))
        sel = pts[lower[:-1] + upper[:-1]]
        if sel.shape[0] == 0:  # n == 2 edge: both halves collapse
            sel = pts[[0, n - 1]]
    return sel  # CCW, starts at lexicomin because lower hull starts there


def _local_prune(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        outs = []
        for g, grp in pdf.groupby("g", sort=False):
            sel = _monotone_chain(
                grp["x"].to_numpy(np.int64), grp["y"].to_numpy(np.int64))
            outs.append(pd.DataFrame({
                "g": np.full(sel.shape[0], g, dtype=np.int64),
                "seq": np.arange(sel.shape[0], dtype=np.int32),
                "x": sel[:, 0], "y": sel[:, 1],
            }))
        yield (pd.concat(outs) if outs
               else pd.DataFrame({"g": pd.Series([], dtype=np.int64),
                                  "seq": pd.Series([], dtype=np.int32),
                                  "x": pd.Series([], dtype=np.int64),
                                  "y": pd.Series([], dtype=np.int64)}))


def _final_hull(pdf: pd.DataFrame) -> pd.DataFrame:
    sel = _monotone_chain(
        pdf["x"].to_numpy(np.int64), pdf["y"].to_numpy(np.int64))
    return pd.DataFrame({
        "g": np.full(sel.shape[0], pdf["g"].iloc[0], dtype=np.int64),
        "seq": np.arange(sel.shape[0], dtype=np.int32),
        "x": sel[:, 0], "y": sel[:, 1],
    })


def convex_hull(points: DataFrame, *, group_col: str = "g",
                x_col: str = "x", y_col: str = "y",
                quantize: float | None = None,
                max_candidate_rows: int = 2_000_000) -> DataFrame:
    """-> ``(g, seq, x, y)``: strict hull vertices per group, CCW from
    the lexicomin vertex, on the integer grid.

    ``x_col``/``y_col`` must be integral (cast to bigint) unless
    ``quantize`` is given, in which case they are doubles snapped to
    ``round(v * quantize)`` — e.g. ``quantize=1e6`` keeps ~0.1 m of
    lon/lat precision while every downstream comparison stays exact.
    ``max_candidate_rows`` bounds the post-prune candidate table (a
    group needing more true hull vertices than this should be hulled at
    coarser quantization, not through one reducer).
    """
    if quantize is not None:
        xe = F.round(F.col(x_col) * F.lit(float(quantize))).cast("long")
        ye = F.round(F.col(y_col) * F.lit(float(quantize))).cast("long")
    else:
        xe, ye = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    pts = points.select(F.col(group_col).cast("long").alias("g"),
                        xe.alias("x"), ye.alias("y"))

    cand = pts.mapInPandas(_local_prune, HULL_SCHEMA).drop("seq")
    n_cand = cand.limit(max_candidate_rows + 1).count()
    if n_cand > max_candidate_rows:
        raise ValueError(
            f"convex_hull: > {max_candidate_rows} pruned candidates; "
            "re-run at coarser quantization or raise max_candidate_rows")
    return cand.groupBy("g").applyInPandas(_final_hull, HULL_SCHEMA)
