"""Raster-tile <-> vector assignment (X4).

Maps vector features (points / cell-indexed geometries) onto web-mercator
XYZ raster tiles — pure column arithmetic (``mercator_tile_cols``), one
``groupBy(tile)`` manifest aggregation.  The inverse direction (tile ->
covered grid cells) is the same arithmetic inverted on tile corners.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cells import mercator_tile_cols


def raster_tile_assignment(features: DataFrame, z: int, *,
                           feature_id: str = "feature_id",
                           lon: str = "lon", lat: str = "lat") -> DataFrame:
    """(feature_id, lon, lat) -> (z, tile_x, tile_y, feature_id) plus a
    per-tile manifest; deterministic tile keys make the shuffle uniform and
    the output byte-identical across cluster sizes."""
    xt, yt = mercator_tile_cols(F.col(lon).cast("double"), F.col(lat).cast("double"), z)
    return features.select(
        F.col(feature_id).alias("feature_id"),
        F.lit(z).alias("z"),
        xt.alias("tile_x"),
        yt.alias("tile_y"),
    )


def tile_manifest(assignment: DataFrame) -> DataFrame:
    """Per-tile feature manifest (sorted ids -> deterministic output)."""
    return assignment.groupBy("z", "tile_x", "tile_y").agg(
        F.count(F.lit(1)).alias("n_features"),
        F.array_sort(F.collect_list("feature_id")).alias("feature_ids"),
    )
