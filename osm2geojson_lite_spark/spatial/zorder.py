"""Z-order (Morton) spatial layout keys — the data-layout leg of the
spatial stack.

Reference scope note: tibetty/osm2geojson-lite has no storage layout
concept; this extends the engine for the 100 TB write path.  A spatial
table laid out in row-group/file order by a space-filling curve gives
every downstream scan free pruning: parquet min/max stats (and Iceberg
manifest ranges) on the Morton key become 2-D bounding-box filters, so a
PIP/kNN/radius query over one city reads a handful of files instead of
the table.  Z-order is the standard choice (Delta/Iceberg `OPTIMIZE
ZORDER BY`) because bit interleaving is pure integer column arithmetic —
bit-identical across engines and cluster sizes, unlike Hilbert's
state-machine rotation.

Everything here is whole-stage-codegen column math: quantize each axis to
``bits`` levels, interleave the bits (x even positions, y odd) into one
bigint.  ``zorder_layout`` applies the standard writer recipe:
``repartitionByRange`` on the key (range boundaries from a distributed
sample — no driver collect) + ``sortWithinPartitions`` so each output
file covers one tight, non-overlapping key range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .cells import _clamped_axis


def zorder_key_col(lon: Column, lat: Column, *, bits: int = 16) -> Column:
    """Morton key: the 2*bits-bit interleave of the quantized axes.

    ``bits`` <= 31 per axis (key fits a bigint at <= 31).  Quantization
    matches the cell index's clamped equirectangular grid
    (`cells._clamped_axis`), so a z-range maps 1:1 onto cell rectangles.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31]: {bits}")
    n = 1 << bits
    x = _clamped_axis(lon, -180.0, 360.0, n)
    y = _clamped_axis(lat, -90.0, 180.0, n)
    key = F.lit(0).cast("long")
    for b in range(bits):
        key = (
            key
            .bitwiseOR(F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)),
                                   2 * b))
            .bitwiseOR(F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)),
                                   2 * b + 1))
        )
    return key


def zorder_decode_col(key: Column, *, bits: int = 16) -> Column:
    """Inverse interleave: struct(x, y) of quantized axis indices —
    the round-trip twin used by tests and range planning."""
    x = F.lit(0).cast("long")
    y = F.lit(0).cast("long")
    for b in range(bits):
        x = x.bitwiseOR(
            F.shiftleft(F.shiftright(key, 2 * b).bitwiseAND(F.lit(1)), b))
        y = y.bitwiseOR(
            F.shiftleft(F.shiftright(key, 2 * b + 1).bitwiseAND(F.lit(1)), b))
    return F.struct(x.alias("x"), y.alias("y"))


def zorder_layout(df: DataFrame, *, lon: str = "lon", lat: str = "lat",
                  bits: int = 16, num_files: int = 32,
                  key_col: str = "zkey") -> DataFrame:
    """Cluster ``df`` for writing: range-partition + sort by the Morton
    key so each of the ``num_files`` output files covers one tight key
    range (-> tight parquet min/max stats -> file skipping on any
    bbox-shaped predicate).  Returns the keyed, clustered DataFrame; call
    ``.write`` on it.  The range boundaries come from Spark's distributed
    range-partitioning sample, never a driver collect."""
    keyed = df.withColumn(key_col, zorder_key_col(F.col(lon), F.col(lat),
                                                  bits=bits))
    return (
        keyed.repartitionByRange(num_files, F.col(key_col))
        .sortWithinPartitions(key_col)
    )
