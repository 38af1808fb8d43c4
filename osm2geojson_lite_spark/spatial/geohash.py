"""Geohash encoding — the interchange twin of the Z-order key.

``zorder.py`` is the engine's INTERNAL layout key (bigint, fastest to
compare/range-scan); geohash is the same interleaved-bit idea in its
industry interchange form: a base-32 string whose prefixes nest (every
point in a cell shares the cell's hash as a prefix), understood by
Elasticsearch, Redis, BigQuery, Uber H3 tooling, and most geo APIs.
Emitting it from the engine lets 100 TB outputs join/bucket directly
against external systems without a re-encode pass.

Standard algorithm (Niemeyer 2008): alternate halving of the lon then
lat interval, MSB-first, 5 bits per character over the base-32 alphabet
``0123456789bcdefghjkmnpqrstuvwxyz``.  Equivalently — and the form used
here so everything stays whole-stage-codegen column math — quantize lon
to ``ceil(5p/2)`` bits and lat to ``floor(5p/2)`` bits, interleave
MSB-first starting with lon, then slice the bit string into ``p``
five-bit alphabet indexes.  Pure integer arithmetic + one literal
alphabet: bit-identical in any engine, so the DuckDB oracle replays the
strings byte-for-byte.

Quantization note: geohash truncates toward the interval floor (it IS a
prefix code), which matches ``floor((v - lo) / span * 2^bits)`` exactly;
inputs are clamped to the valid domain like every grid in
``spatial/cells.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .cells import _clamped_axis

__all__ = ["GEOHASH_ALPHABET", "geohash_col", "py_geohash"]

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_col(lon: Column, lat: Column, *, precision: int = 8) -> Column:
    """Base-32 geohash string of ``precision`` characters (1..12).

    12 characters = 60 interleaved bits — the practical maximum and
    exactly the repo's 60-bit integer budget.
    """
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12]: {precision}")
    total = 5 * precision
    xbits = (total + 1) // 2          # lon leads the interleave
    ybits = total // 2
    x = _clamped_axis(lon, -180.0, 360.0, 1 << xbits)
    y = _clamped_axis(lat, -90.0, 180.0, 1 << ybits)
    # MSB-first interleave: bit position (total-1) is lon's MSB
    g = F.lit(0).cast("long")
    for i in range(xbits):
        g = g.bitwiseOR(F.shiftleft(
            F.shiftright(x, xbits - 1 - i).bitwiseAND(F.lit(1)),
            total - 1 - 2 * i))
    for i in range(ybits):
        g = g.bitwiseOR(F.shiftleft(
            F.shiftright(y, ybits - 1 - i).bitwiseAND(F.lit(1)),
            total - 2 - 2 * i))
    parts = []
    for c in range(precision):
        idx = F.shiftright(g, total - 5 * (c + 1)).bitwiseAND(F.lit(31))
        parts.append(F.substr(F.lit(GEOHASH_ALPHABET),
                              (idx + 1).cast("int"), F.lit(1)))
    return F.concat(*parts)


def py_geohash(lon: float, lat: float, precision: int = 8) -> str:
    """Reference implementation (interval-halving form) for tests."""
    lo_x, hi_x, lo_y, hi_y = -180.0, 180.0, -90.0, 90.0
    bits, out, ch, even = 0, [], 0, True
    while len(out) < precision:
        if even:
            mid = (lo_x + hi_x) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lo_x = mid
            else:
                ch <<= 1
                hi_x = mid
        else:
            mid = (lo_y + hi_y) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lo_y = mid
            else:
                ch <<= 1
                hi_y = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(GEOHASH_ALPHABET[ch])
            bits, ch = 0, 0
    return "".join(out)
