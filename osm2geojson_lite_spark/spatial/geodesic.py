"""Geodesic (great-circle) radius join (X27) — the spherical-metric leg
of the range-join family.  The planar `range_join.py` is exact in DEGREE
space (the reference's own coordinate algebra); real-world "all sensors
within 250 km" queries need kilometres on the sphere, where one degree
of longitude shrinks with latitude.

Exactness argument (the cell prefilter is a strict superset):

* every point within great-circle angular radius ``a`` of a center at
  latitude ``phi`` satisfies ``|dlat| <= a``;
* the maximum longitude deviation over the whole spherical cap is
  ``dlon_max = asin(sin a / cos phi)`` (standard cap bounding box;
  if ``|phi| + a`` reaches the pole the cap wraps every longitude and
  the prefilter degrades to the full ring of columns for that row —
  bounded by ``2^res`` and only near the poles);
* the cells intersecting ``[phi - a, phi + a] x [lam - dlon_max,
  lam + dlon_max]`` therefore contain every candidate, and the exact
  haversine refine keeps only true pairs.

Scale shape: identical to the planar join — explode the left side over
its candidate cells (two ``sequence`` explodes, x wrapped with ``pmod``),
ONE cell equi-join against the right table (co-located when the right
table is stored partitioned by the same cell key), refine JVM-side.
Each right point lives in exactly one cell and the exploded cells are
distinct, so pairs appear at most once — no dedup pass.

Determinism note: the refine uses ``sin``/``cos``/``asin``, which are
NOT correctly-rounded IEEE ops — two engines can differ in the last
ulp.  Membership is therefore only engine-portable away from the
boundary (a pair at exactly ``radius_km`` may flip); the gate panel
keeps a fat margin, and distances are for callers, not for byte-exact
cross-engine hashing (the repo's exact-integer contract applies to the
operators that promise it, this one promises a superset prefilter +
standard haversine).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from .cells import CELL_RES_MAX, _RES_SHIFT, _X_SHIFT, cell_col

EARTH_RADIUS_KM = 6371.0088
KM_PER_DEG = EARTH_RADIUS_KM * math.pi / 180.0  # 111.19492664455873


def geo_radius_res(radius_km: float, *, res_max: int = CELL_RES_MAX) -> int:
    """Coarsest-useful resolution: finest grid whose cell height (in
    km along a meridian) still covers the radius, so the latitude band
    spans <= 3 rows — the planar `radius_res` heuristic in km."""
    if radius_km <= 0:
        return res_max
    alpha_deg = radius_km / KM_PER_DEG
    r = int(math.floor(math.log2(180.0 / alpha_deg)))
    return max(0, min(res_max, r))


def haversine_km(lon1: Column, lat1: Column, lon2: Column,
                 lat2: Column) -> Column:
    """Great-circle distance in km — one fixed expression tree."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / F.lit(2.0)
    dlam = F.radians(lon2 - lon1) / F.lit(2.0)
    a = (F.sin(dphi) * F.sin(dphi)
         + F.cos(p1) * F.cos(p2) * F.sin(dlam) * F.sin(dlam))
    return (F.lit(2.0 * EARTH_RADIUS_KM)
            * F.asin(F.least(F.lit(1.0), F.sqrt(a))))


def geo_radius_join(left: DataFrame, right: DataFrame, radius_km: float, *,
                    left_id: str = "left_id", right_id: str = "right_id",
                    l_lon: str = "lon", l_lat: str = "lat",
                    r_lon: str = "lon", r_lat: str = "lat",
                    res: int | None = None,
                    include_self: bool = True) -> DataFrame:
    """-> (left_id, right_id, dist_km) for every pair within
    ``radius_km`` great-circle distance."""
    if radius_km <= 0:
        raise ValueError("radius_km must be positive")
    if res is None:
        res = geo_radius_res(radius_km)
    n = 1 << res
    alpha_deg = radius_km / KM_PER_DEG

    lam, phi = F.col("llon"), F.col("llat")
    # latitude rows: clamped grid span of [phi - a, phi + a]
    def _gy(v: Column) -> Column:
        raw = F.floor((v + F.lit(90.0)) / F.lit(180.0) * F.lit(n))
        return F.greatest(F.lit(0).cast("long"),
                          F.least(F.lit(n - 1).cast("long"),
                                  raw.cast("long")))

    # longitude half-width of the cap's bounding box, in degrees;
    # a cap touching a pole (or u >= 1 numerically) wraps all longitudes
    u = (F.sin(F.radians(F.lit(alpha_deg)))
         / F.cos(F.radians(F.least(F.lit(89.999999), F.abs(phi)))))
    polar = (F.abs(phi) + F.lit(alpha_deg) >= F.lit(90.0)) | (u >= F.lit(1.0))
    dlon_deg = F.when(polar, F.lit(180.0)).otherwise(F.degrees(F.asin(u)))

    # unclamped column span, wrapped with pmod; width capped at the ring
    xa_raw = F.floor((lam - dlon_deg + F.lit(180.0)) / F.lit(360.0) * F.lit(n)) \
        .cast("long")
    xb_raw = F.floor((lam + dlon_deg + F.lit(180.0)) / F.lit(360.0) * F.lit(n)) \
        .cast("long")
    width = F.least(F.lit(n).cast("long"), xb_raw - xa_raw + F.lit(1))

    l = (left.select(F.col(left_id).alias("left_id"),
                     F.col(l_lon).cast("double").alias("llon"),
                     F.col(l_lat).cast("double").alias("llat"))
         .withColumn("_ya", _gy(phi - F.lit(alpha_deg)))
         .withColumn("_yb", _gy(phi + F.lit(alpha_deg)))
         .withColumn("_xa", xa_raw)
         .withColumn("_w", width)
         .withColumn("cy", F.explode(F.sequence(F.col("_ya"), F.col("_yb"))))
         .withColumn("_i", F.explode(F.sequence(
             F.lit(0).cast("long"), F.col("_w") - F.lit(1))))
         .withColumn("cell",
                     F.lit(res * _RES_SHIFT)
                     + F.pmod(F.col("_xa") + F.col("_i"), F.lit(n))
                     * F.lit(_X_SHIFT)
                     + F.col("cy"))
         .select("left_id", "llon", "llat", "cell"))

    r = right.select(
        F.col(right_id).alias("right_id"),
        F.col(r_lon).cast("double").alias("rlon"),
        F.col(r_lat).cast("double").alias("rlat"),
    ).withColumn("cell", cell_col(F.col("rlon"), F.col("rlat"), res))

    d = haversine_km(F.col("llon"), F.col("llat"),
                     F.col("rlon"), F.col("rlat"))
    out = (l.join(r, "cell", "inner")
           .select("left_id", "right_id", d.alias("dist_km"))
           .filter(F.col("dist_km") <= F.lit(float(radius_km))))
    if not include_self:
        out = out.filter(F.col("left_id") != F.col("right_id"))
    return out
