"""Point-in-polygon spatial join (X2).

Two-phase plan, generalizing the reference's inner-ring containment test
(``relation.ts:132-142`` + even-odd ray cast ``utils.ts:70-81``) to a
distributed join:

1. **Cell prefilter** (JVM-side, no UDF): polygons are covered by the grid
   cells of their bbox (``sequence`` x ``sequence`` -> ``explode``); points
   are encoded to their cell.  An equi-join on ``cell`` yields candidate
   pairs — the only shuffle, keyed uniformly by cell.  Hot cells can be
   salted via ``salt``.
2. **Exact refinement** (Arrow kernel): candidates grouped per polygon and
   tested with the vectorized even-odd ray cast (numpy, batch per polygon),
   honoring the reference's exact half-open edge rule.

The polygon side is broadcast when small (dimension-table pattern); pass
``broadcast_polygons=False`` to force a shuffle join for huge polygon sets.
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..functions.geometry import points_inside_polygon
from .cells import cell_col


def polygon_cover_cells(polygons: DataFrame, res: int, *,
                        ring_col: str = "ring_json") -> DataFrame:
    """(poly_id, ring_json) -> (poly_id, cell) bbox-cover cells at ``res``.

    ``ring_json`` is a JSON ``[[lon,lat], ...]`` exterior ring.  The cover is
    computed entirely with higher-order column functions: parse -> bbox
    aggregate -> integer cell ranges -> cartesian ``sequence`` explode.
    """
    n = 1 << res
    ring = F.from_json(F.col(ring_col), "array<array<double>>")
    lons = F.transform(ring, lambda c: c[0])
    lats = F.transform(ring, lambda c: c[1])

    def axis_idx(v, lo, span):
        i = F.floor((v - F.lit(lo)) / F.lit(span) * F.lit(n)).cast("long")
        return F.greatest(F.lit(0), F.least(F.lit(n - 1), i))

    x0 = axis_idx(F.array_min(lons), -180.0, 360.0)
    x1 = axis_idx(F.array_max(lons), -180.0, 360.0)
    y0 = axis_idx(F.array_min(lats), -90.0, 180.0)
    y1 = axis_idx(F.array_max(lats), -90.0, 180.0)

    covered = polygons.withColumn("_xs", F.sequence(x0, x1)).withColumn(
        "_ys", F.sequence(y0, y1)
    )
    cells = F.flatten(
        F.transform(
            F.col("_xs"),
            lambda x: F.transform(
                F.col("_ys"),
                lambda y: F.lit(res) * F.lit(1 << 56) + x * F.lit(1 << 28) + y,
            ),
        )
    )
    return covered.withColumn("cell", F.explode(cells)).drop("_xs", "_ys")


def pip_join(points: DataFrame, polygons: DataFrame, *, res: int = 9,
             point_id: str = "point_id", poly_id: str = "poly_id",
             lon: str = "lon", lat: str = "lat", ring_col: str = "ring_json",
             broadcast_polygons: bool = True, salt: int | None = None) -> DataFrame:
    """points x polygons -> (point_id, poly_id) containment pairs."""
    pts = points.select(
        F.col(point_id).alias("point_id"),
        F.col(lon).cast("double").alias("_lon"),
        F.col(lat).cast("double").alias("_lat"),
        cell_col(F.col(lon).cast("double"), F.col(lat).cast("double"), res).alias("cell"),
    )
    cover = polygon_cover_cells(
        polygons.select(F.col(poly_id).alias("poly_id"), F.col(ring_col).alias("ring_json")),
        res, ring_col="ring_json",
    )

    if salt and salt > 1:
        # Explicit hot-cell handling: scatter point side by a deterministic
        # salt, replicate the (small) polygon-cover side `salt` ways.
        pts = pts.withColumn("_s", F.pmod(F.xxhash64("point_id"), F.lit(salt)))
        cover = cover.withColumn("_s", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
        join_keys = ["cell", "_s"]
    else:
        join_keys = ["cell"]

    right = F.broadcast(cover) if broadcast_polygons else cover
    candidates = pts.join(right, join_keys, "inner").select(
        "point_id", "_lon", "_lat", "poly_id", "ring_json"
    ).dropDuplicates(["point_id", "poly_id"])

    schema = "point_id string, poly_id string"

    def refine(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame({"point_id": [], "poly_id": []})
                continue
            out_pid, out_poly = [], []
            for ring_json, grp in pdf.groupby("ring_json", sort=False):
                ring = np.asarray(json.loads(ring_json), dtype=np.float64)
                qpts = np.column_stack([grp["_lon"].to_numpy(), grp["_lat"].to_numpy()])
                inside = points_inside_polygon(qpts, ring)
                if inside.any():
                    out_pid.extend(grp["point_id"].to_numpy()[inside])
                    out_poly.extend(grp["poly_id"].to_numpy()[inside])
            yield pd.DataFrame({"point_id": out_pid, "poly_id": out_poly}).astype(str)

    return (
        candidates
        .withColumn("point_id", F.col("point_id").cast("string"))
        .withColumn("poly_id", F.col("poly_id").cast("string"))
        .mapInPandas(refine, schema=schema)
    )
