"""Douglas-Peucker polyline simplification (the vector-tile LOD step).

Every tiled-GeoJSON pipeline simplifies way geometries before emitting
low-zoom tiles; this is the standard Douglas-Peucker split-at-max-
deviation recursion (Douglas & Peucker 1973, Cartographica 10(2) — the
algorithm behind Shapely/PostGIS ``simplify``), run as an Arrow-batched kernel (numpy per geometry,
never per-point Python) — exactly the per-row-geometry pattern the north
rule prescribes (pandas/Arrow UDFs for per-row work; the reference's
fixture geometries stay untouched because simplification is opt-in,
downstream of assembly).

Scale shape: one ``mapInPandas`` projection — no shuffle, no join; work
is linear in total points (each point is examined once per split level,
O(n log n) expected).  Geometries are independent rows, so partitioning
is whatever the upstream table had; a mega-way is bounded by the same
mega-document guards the parse layer enforces.

Determinism (what makes the DuckDB oracle hash-green): all comparisons
are multiplicative — a point survives iff
``cross(p1-p0, pj-p0)^2 > eps^2 * |p1-p0|^2`` — so there is no sqrt and
no division anywhere, only IEEE-exact +,-,*.  The split point is the
FIRST index attaining the max deviation (numpy ``argmax`` == SQL
``list_position(cs, list_max(cs))``), endpoints always survive, and a
zero-length chord degenerates to radial distance from the start point.
Output is the sorted array of kept 0-based indices — integers, no float
leaves the operator.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame

SIMPLIFY_SCHEMA = "way_id bigint, n_in int, kept array<int>"


def dp_keep_indices(xs: np.ndarray, ys: np.ndarray, eps: float) -> np.ndarray:
    """0-based indices kept by Douglas-Peucker at tolerance ``eps``.

    Iterative stack form of the recursion; each (i0, i1) chord drops its
    interior iff every interior point is within ``eps`` of the chord.
    """
    n = xs.shape[0]
    if n <= 2:
        return np.arange(n)
    eps2 = eps * eps
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        x0, y0 = xs[i0], ys[i0]
        dx, dy = xs[i1] - x0, ys[i1] - y0
        len2 = dx * dx + dy * dy
        jx = xs[i0 + 1:i1]
        jy = ys[i0 + 1:i1]
        if len2 == 0.0:
            c = (jx - x0) * (jx - x0) + (jy - y0) * (jy - y0)
            thresh = eps2
        else:
            cr = dx * (jy - y0) - dy * (jx - x0)
            c = cr * cr
            thresh = eps2 * len2
        m = c.max()
        if m > thresh:
            k = i0 + 1 + int(np.argmax(c))  # first max -> lowest index
            keep[k] = True
            stack.append((k, i1))
            stack.append((i0, k))
    return np.flatnonzero(keep)


def simplify_lines(lines: DataFrame, epsilon: float, *,
                   id_col: str = "way_id",
                   coords_col: str = "coords") -> DataFrame:
    """Simplify ``(id, coords array<array<double>>)`` polylines.

    Output ``(way_id, n_in, kept array<int>)`` — the kept 0-based vertex
    positions (always includes both endpoints; a 0/1/2-point line passes
    through unchanged).  Join ``kept`` back to the coordinates (or slice
    with ``F.transform``) to materialize the simplified geometry; keeping
    indices rather than floats keeps the operator's output exact.
    """
    eps = float(epsilon)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, nins, kepts = [], [], []
            for wid, coords in zip(pdf[id_col], pdf[coords_col]):
                pts = np.asarray([(c[0], c[1]) for c in coords], dtype=np.float64) \
                    if len(coords) else np.empty((0, 2))
                idx = dp_keep_indices(pts[:, 0], pts[:, 1], eps) \
                    if pts.shape[0] else np.arange(0)
                ids.append(wid)
                nins.append(pts.shape[0])
                kepts.append([int(i) for i in idx])
            yield pd.DataFrame(
                {"way_id": ids, "n_in": nins, "kept": kepts})

    return (
        lines.select(id_col, coords_col)
        .mapInPandas(kernel, schema=SIMPLIFY_SCHEMA)
    )
