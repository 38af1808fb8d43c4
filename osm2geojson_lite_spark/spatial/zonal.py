"""Zonal statistics — per-polygon aggregates of a point-value field.

The GIS ``zonal stats`` operator (rasterio/QGIS name) over vector zones:
assign points to polygons with the existing cell-prefiltered PIP join
(X2), then one map-side-combinable groupBy per zone: count, sum, min,
max, mean.  Points outside every zone drop out (inner join); zones with
no points are absent (left-join the zone table back if a dense frame is
needed).

Scale shape: inherits the PIP join's plan — the polygon cover is the
broadcast dimension side, the only corpus shuffle is keyed by cell, and
the final per-zone aggregation is partial+final (hot zones shrink
map-side).  No new shuffle beyond the PIP join's own.

Determinism: count/min/max are order-free; sum is exact when the value
column is integral (cast it yourself for money-style fixed point); mean
is ``round(sum/count, 9)`` — one division on exact operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .pip import pip_join


def zonal_stats(points: DataFrame, polygons: DataFrame, *, res: int = 9,
                point_id: str = "point_id", poly_id: str = "poly_id",
                lon: str = "lon", lat: str = "lat",
                value: str = "value",
                ring_col: str = "ring_json") -> DataFrame:
    """(poly_id, n_points, sum_value, min_value, max_value, mean_value)."""
    hits = pip_join(points, polygons, res=res, point_id=point_id,
                    poly_id=poly_id, lon=lon, lat=lat, ring_col=ring_col)
    vals = points.select(
        F.col(point_id).cast("string").alias("point_id"),
        F.col(value).alias("_v"),
    )
    return (
        hits.join(vals, "point_id")
        .groupBy("poly_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("_v").alias("sum_value"),
            F.min("_v").alias("min_value"),
            F.max("_v").alias("max_value"),
        )
        .withColumn(
            "mean_value",
            F.round(F.col("sum_value") / F.col("n_points"), 9),
        )
    )
