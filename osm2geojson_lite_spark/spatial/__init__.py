"""Spatial extensions (SURVEY.md §2.8 X1-X4): hierarchical cell tiling,
point-in-polygon joins, exact kNN via cell-neighbor expansion, and
raster-tile <-> vector assignment.

No native geo library ships in this environment (h3/shapely absent), so the
cell index is a self-contained hierarchical quadtree grid (equirectangular,
resolutions 7-12 like H3's mid range) plus web-mercator XYZ raster tiles —
both pure column arithmetic (JVM-side, whole-stage codegen) with numpy
twins for the Arrow-UDF kernels. The grid math is deliberately rational
(no transcendentals) so results are bit-reproducible across engines and
cluster sizes.
"""

from .cells import (
    CELL_RES_MAX,
    CELL_RES_MIN,
    cell_col,
    cell_parent_col,
    cell_res,
    cell_size_deg,
    cell_xy,
    mercator_tile_cols,
    neighbor_cells_col,
    np_cell,
)
from .dbscan import dbscan
from .density import cell_density, kring_scatter_col, kring_smooth
from .emerging import mann_kendall_trend
from .geohash import GEOHASH_ALPHABET, geohash_col, py_geohash
from .hotspot import getis_ord_gi, morans_i
from .geomstats import (
    ring_area_col,
    ring_bbox_cols,
    ring_centroid_cols,
    ring_perimeter_col,
    ring_signed_area_col,
)
from .intersect import segment_intersection_join
from .colocate import colocation_join
from .compact import compact_cells, uncompact_cells
from .geodesic import geo_radius_join, geo_radius_res, haversine_km
from .idw import idw_kernel, idw_surface
from .knn import knn_join
from .knox import knox_statistic
from .line_cells import line_cells
from .overlap import polygon_overlap_join, rings_overlap
from .pip import pip_join, polygon_cover_cells
from .range_join import radius_join, radius_res
from .snap import snap_join
from .simplify import dp_keep_indices, simplify_lines
from .zonal import zonal_stats
from .raster import raster_tile_assignment, tile_manifest

__all__ = [
    "CELL_RES_MAX",
    "CELL_RES_MIN",
    "cell_col",
    "cell_parent_col",
    "cell_res",
    "cell_size_deg",
    "cell_xy",
    "mercator_tile_cols",
    "neighbor_cells_col",
    "np_cell",
    "cell_density",
    "dbscan",
    "getis_ord_gi",
    "mann_kendall_trend",
    "morans_i",
    "kring_scatter_col",
    "kring_smooth",
    "ring_area_col",
    "ring_bbox_cols",
    "ring_centroid_cols",
    "ring_perimeter_col",
    "ring_signed_area_col",
    "knn_join",
    "knox_statistic",
    "colocation_join",
    "pip_join",
    "polygon_overlap_join",
    "segment_intersection_join",
    "snap_join",
    "geohash_col",
    "py_geohash",
    "rings_overlap",
    "polygon_cover_cells",
    "radius_join",
    "radius_res",
    "dp_keep_indices",
    "simplify_lines",
    "zonal_stats",
    "compact_cells",
    "uncompact_cells",
    "line_cells",
    "idw_kernel",
    "idw_surface",
    "geo_radius_join",
    "geo_radius_res",
    "haversine_km",
    "raster_tile_assignment",
    "tile_manifest",
]
