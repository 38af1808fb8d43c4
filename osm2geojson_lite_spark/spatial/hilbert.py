"""Hilbert-curve spatial layout keys — the locality-optimal twin of
``zorder_key`` (X28).

Reference scope note: tibetty/osm2geojson-lite has no storage-layout
concept (`src/index.ts` emits GeoJSON only); this extends the engine for
the 100 TB write path.  Z-order is the cheap default, but the Hilbert
curve never takes the long diagonal jumps Morton order does, so files
clustered by Hilbert key have strictly tighter bounding boxes: for the
same file count, a bbox query overlaps fewer files (this is why Iceberg
and Databricks liquid clustering both offer Hilbert alongside Z-order).

The classic iterative algorithm mutates (x, y) with rotations and
reflections as it walks bit levels — imperative state that looks
un-columnar.  It is not: the suffix transform only ever takes FOUR
reachable values (identity, swap, swap+complement, complement), so the
walk is a 4-state quadrant automaton.  ``_DIGIT_LUT``/``_NEXT_LUT`` are
derived at import time from the textbook recurrence (see
``_derive_luts``; parity with the reference ``xy2d`` is pinned in
tests), and the key is a chain of ``element_at`` lookups on literal
arrays.  The carried ``state`` column is referenced exactly once per
level, so the Catalyst expression stays O(bits²) nodes — no
common-subexpression blowup (the lesson `pipeline/pq.py` documents) —
and every op is integer algebra: bit-identical at any parallelism and
replayable in ANSI SQL as a recursive CTE over bit positions.

100 TB shape: map-side only — zero exchange, zero Python, whole-stage
codegen end to end; ``hilbert_layout`` adds the same
``repartitionByRange`` + ``sortWithinPartitions`` writer recipe as
``zorder_layout`` (range boundaries from Spark's distributed sample,
never a driver collect).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .cells import _clamped_axis


def _derive_luts() -> tuple[list[list[int]], list[list[int]]]:
    """Derive the 4-state quadrant automaton from the textbook xy->d
    recurrence (rotate/reflect the remaining suffix; e.g. the iterative
    form on the Hilbert-curve Wikipedia page).  A suffix transform is
    ``(perm, cx, cy)``: read the (x, y) bits swapped if ``perm``, then
    XOR the complements.  Only four transforms are reachable from the
    identity — the automaton states."""

    def step(t: tuple[int, int, int], ox: int, oy: int):
        perm, cx, cy = t
        tx, ty = ((oy, ox) if perm else (ox, oy))
        rx, ry = tx ^ cx, ty ^ cy
        digit = (3 * rx) ^ ry
        if ry == 0:
            if rx == 1:  # reflect both axes of the suffix ...
                perm, cx, cy = perm, cx ^ 1, cy ^ 1
            perm, cx, cy = 1 - perm, cy, cx  # ... then swap them
        return digit, (perm, cx, cy)

    states: list[tuple[int, int, int]] = [(0, 0, 0)]
    idx = {states[0]: 0}
    digit_lut: list[list[int]] = []
    next_lut: list[list[int]] = []
    i = 0
    while i < len(states):
        drow, nrow = [], []
        for q in range(4):  # q = (x_bit << 1) | y_bit
            d, nxt = step(states[i], (q >> 1) & 1, q & 1)
            if nxt not in idx:
                idx[nxt] = len(states)
                states.append(nxt)
            drow.append(d)
            nrow.append(idx[nxt])
        digit_lut.append(drow)
        next_lut.append(nrow)
        i += 1
    assert len(states) == 4
    return digit_lut, next_lut


_DIGIT_LUT, _NEXT_LUT = _derive_luts()
# Flattened row-major for element_at(lit_array, state*4 + q + 1).
_DIGIT_FLAT = [d for row in _DIGIT_LUT for d in row]
_NEXT_FLAT = [n for row in _NEXT_LUT for n in row]


def hilbert_xy2d(bits: int, x: int, y: int) -> int:
    """Driver-side scalar twin (range planning, tests) — same automaton."""
    st, key = 0, 0
    for i in range(bits - 1, -1, -1):
        q = (((x >> i) & 1) << 1) | ((y >> i) & 1)
        key = (key << 2) | _DIGIT_LUT[st][q]
        st = _NEXT_LUT[st][q]
    return key


def hilbert_key_col(lon: Column, lat: Column, *, bits: int = 16) -> Column:
    """Hilbert key: 2*bits-bit curve position of the quantized axes.

    Quantization matches the cell index's clamped equirectangular grid
    (`cells._clamped_axis`) and ``zorder_key_col``, so the three layout
    keys (Morton / Hilbert / geohash) index the same grid squares.
    ``bits`` <= 31 so the key fits a bigint.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31]: {bits}")
    n = 1 << bits
    x = _clamped_axis(lon, -180.0, 360.0, n)
    y = _clamped_axis(lat, -90.0, 180.0, n)
    digit_arr = F.array(*[F.lit(v) for v in _DIGIT_FLAT])
    next_arr = F.array(*[F.lit(v) for v in _NEXT_FLAT])
    state = F.lit(0).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits - 1, -1, -1):
        q = (
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 1)
            .bitwiseOR(F.shiftright(y, i).bitwiseAND(F.lit(1)))
        )
        idx = (state * F.lit(4) + q + F.lit(1)).cast("int")
        key = F.shiftleft(key, 2).bitwiseOR(
            F.element_at(digit_arr, idx).cast("long"))
        state = F.element_at(next_arr, idx).cast("long")
    return key


def hilbert_layout(df: DataFrame, *, lon: str = "lon", lat: str = "lat",
                   bits: int = 16, num_files: int = 32,
                   key_col: str = "hkey") -> DataFrame:
    """Cluster ``df`` for writing by Hilbert key — same writer recipe as
    ``zorder_layout`` (range-partition + in-partition sort -> each output
    file covers one tight, disjoint key range -> parquet min/max file
    skipping on bbox predicates), with the tighter Hilbert locality."""
    keyed = df.withColumn(key_col, hilbert_key_col(F.col(lon), F.col(lat),
                                                   bits=bits))
    return (
        keyed.repartitionByRange(num_files, F.col(key_col))
        .sortWithinPartitions(key_col)
    )
