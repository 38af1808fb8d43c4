"""Planar geometry kernels with reference-exact semantics.

Clean-room reimplementations of the geometry predicates in the reference's
``src/utils.ts`` — the convex-vertex ring-direction test (``utils.ts:51-68``)
and the even-odd half-open ray cast (``utils.ts:70-81``). Both are ported by
*algorithm*, not by code, because common alternatives (signed area, Shapely
``contains``) disagree with the reference on ties and boundary points and
would break golden-fixture parity.
"""

from __future__ import annotations

import math

import numpy as np


def is_ring(coords: list) -> bool:
    """>3 points and first == last (compared via stringified key like the
    reference's ``coordsToKey`` — NaN==NaN under string keys)."""
    if len(coords) <= 3:
        return False
    a, b = coords[0], coords[-1]
    return _key_eq(a[0], b[0]) and _key_eq(a[1], b[1])


def _key_eq(x, y) -> bool:
    if isinstance(x, float) and isinstance(y, float):
        if math.isnan(x) and math.isnan(y):
            return True
        return x == y
    return x == y


def ring_direction(coords: list) -> str:
    """'clockwise' | 'counterclockwise' via the reference's convex-vertex
    determinant at the max-x point (last max wins on ties, reference
    ``utils.ts:54`` reduce semantics)."""
    n = len(coords)
    m = 0
    for idx in range(n):
        # reduce: keep m only when strictly greater, else take idx
        if not (coords[m][0] > coords[idx][0]):
            m = idx
    left = n - 2 if m <= 0 else m - 1
    right = 1 if m >= n - 1 else m + 1
    xa, ya = coords[left][0], coords[left][1]
    xb, yb = coords[m][0], coords[m][1]
    xc, yc = coords[right][0], coords[right][1]
    det = (xb - xa) * (yc - ya) - (xc - xa) * (yb - ya)
    return "clockwise" if det < 0 else "counterclockwise"


def point_inside_polygon(pt, polygon) -> bool:
    """Even-odd ray cast with the reference's exact half-open edge rule
    (``<=`` at the low end, ``<`` at the high end)."""
    x, y = pt[0], pt[1]
    result = False
    j = len(polygon) - 1
    for i in range(len(polygon)):
        xi, yi = polygon[i][0], polygon[i][1]
        xj, yj = polygon[j][0], polygon[j][1]
        if ((xi <= x < xj) or (xj <= x < xi)) and y < (yj - yi) * (x - xi) / (xj - xi) + yi:
            result = not result
        j = i
    return result


def points_inside_polygon(points: np.ndarray, polygon: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast: N query points against one polygon ring.

    Same half-open rule as :func:`point_inside_polygon`; used by the
    point-in-polygon spatial join (SURVEY.md §2.8 X2) where thousands of
    candidate points hit one polygon after the cell prefilter.
    """
    x = points[:, 0][:, None]  # (N,1)
    y = points[:, 1][:, None]
    xi = polygon[:, 0][None, :]  # (1,M)
    yi = polygon[:, 1][None, :]
    xj = np.roll(polygon[:, 0], 1)[None, :]
    yj = np.roll(polygon[:, 1], 1)[None, :]
    straddle = ((xi <= x) & (x < xj)) | ((xj <= x) & (x < xi))
    # vertical edges (xj == xi) and near-denormal dx divide to inf/NaN and
    # can overflow in the multiply; every such lane has straddle == False
    # (the half-open interval is empty), so the garbage lanes are masked —
    # silence ALL fp signals rather than warn on values we discard
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        ycross = (yj - yi) * (x - xi) / (xj - xi) + yi
        hits = straddle & (y < ycross)
    return (hits.sum(axis=1) % 2).astype(bool)
