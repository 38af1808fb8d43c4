"""Exact per-ring geometry statistics — pure column HOFs, zero shuffle.

The measurement layer every feature table needs after assembly: signed
shoelace area, perimeter, polygon centroid, and bbox of a closed
GeoJSON-style exterior ring (``array<array<double>>``, first point ==
last point).  Generalizes the reference's ring predicates
(``utils.ts:51-81`` computes orientation from the same cross products)
from booleans to measures.

Scale shape: every statistic is a single ``aggregate``/``transform``
higher-order function over the ring array — map-side, whole-stage
codegen, no UDF, no shuffle; a 10^12-feature table computes these at
scan speed with partitioning untouched.

Determinism: folds run left-to-right in vertex-index order (the array IS
the order — no ``collect_list`` nondeterminism), so the IEEE add sequence
is fixed and DuckDB's ``list_reduce`` over ``generate_series`` replays it
bit-for-bit.  ``sqrt`` is correctly-rounded per IEEE-754, so perimeter is
deterministic too.  Centroid divides by signed area — callers round
before hashing (the gate rounds to 9 dp).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _xs(ring: Column) -> Column:
    return F.transform(ring, lambda c: c[0])


def _ys(ring: Column) -> Column:
    return F.transform(ring, lambda c: c[1])


def _cross_terms(ring: Column) -> Column:
    """cross_i = x_{i-1}·y_i − x_i·y_{i-1} for i = 2..n (1-based)."""
    return F.transform(
        F.sequence(F.lit(2), F.size(ring)),
        lambda i: F.element_at(ring, i - 1)[0] * F.element_at(ring, i)[1]
        - F.element_at(ring, i)[0] * F.element_at(ring, i - 1)[1],
    )


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def ring_signed_area_col(ring: Column) -> Column:
    """Shoelace signed area (positive = counter-clockwise)."""
    return _fold_sum(_cross_terms(ring)) / F.lit(2.0)


def ring_area_col(ring: Column) -> Column:
    return F.abs(ring_signed_area_col(ring))


def ring_perimeter_col(ring: Column) -> Column:
    seg = F.transform(
        F.sequence(F.lit(2), F.size(ring)),
        lambda i: F.sqrt(
            (F.element_at(ring, i)[0] - F.element_at(ring, i - 1)[0])
            * (F.element_at(ring, i)[0] - F.element_at(ring, i - 1)[0])
            + (F.element_at(ring, i)[1] - F.element_at(ring, i - 1)[1])
            * (F.element_at(ring, i)[1] - F.element_at(ring, i - 1)[1])
        ),
    )
    return _fold_sum(seg)


def ring_centroid_cols(ring: Column) -> tuple[Column, Column]:
    """Polygon centroid (Cx, Cy) = Σ(p_{i-1}+p_i)·cross_i / (6·signed_area).

    NULL for degenerate (zero-signed-area) rings — the centroid is
    undefined there and ANSI mode would otherwise raise DIVIDE_BY_ZERO.
    """
    a6_raw = _fold_sum(_cross_terms(ring)) * F.lit(3.0)  # 6 * signed_area / 2
    a6 = F.when(a6_raw != F.lit(0.0), a6_raw)
    cx_terms = F.transform(
        F.sequence(F.lit(2), F.size(ring)),
        lambda i: (F.element_at(ring, i - 1)[0] + F.element_at(ring, i)[0])
        * (
            F.element_at(ring, i - 1)[0] * F.element_at(ring, i)[1]
            - F.element_at(ring, i)[0] * F.element_at(ring, i - 1)[1]
        ),
    )
    cy_terms = F.transform(
        F.sequence(F.lit(2), F.size(ring)),
        lambda i: (F.element_at(ring, i - 1)[1] + F.element_at(ring, i)[1])
        * (
            F.element_at(ring, i - 1)[0] * F.element_at(ring, i)[1]
            - F.element_at(ring, i)[0] * F.element_at(ring, i - 1)[1]
        ),
    )
    return _fold_sum(cx_terms) / a6, _fold_sum(cy_terms) / a6


def ring_bbox_cols(ring: Column) -> tuple[Column, Column, Column, Column]:
    xs, ys = _xs(ring), _ys(ring)
    return (F.array_min(xs), F.array_min(ys),
            F.array_max(xs), F.array_max(ys))
