"""geo_radius_join vs brute-force python haversine (X27)."""

from __future__ import annotations

import math
import random

from osm2geojson_lite_spark.spatial.geodesic import (
    EARTH_RADIUS_KM, geo_radius_join, geo_radius_res)


def _hav(lon1, lat1, lon2, lat2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dphi = math.radians(lat2 - lat1) / 2.0
    dlam = math.radians(lon2 - lon1) / 2.0
    a = (math.sin(dphi) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dlam) ** 2)
    return 2.0 * EARTH_RADIUS_KM * math.asin(min(1.0, math.sqrt(a)))


def _brute(pl, pr, radius):
    return sorted((i, j) for i, x, y in pl for j, u, v in pr
                  if _hav(x, y, u, v) <= radius)


def _run(spark, pl, pr, radius, **kw):
    l = spark.createDataFrame(pl, "left_id bigint, lon double, lat double")
    r = spark.createDataFrame(pr, "right_id bigint, lon double, lat double")
    rows = geo_radius_join(l, r, radius, **kw).collect()
    return sorted((x["left_id"], x["right_id"]) for x in rows), rows


def test_matches_brute_force(spark):
    rng = random.Random(27)
    pl = [(i, rng.uniform(-179, 179), rng.uniform(-80, 80)) for i in range(120)]
    pr = [(j, rng.uniform(-179, 179), rng.uniform(-80, 80)) for j in range(150)]
    got, rows = _run(spark, pl, pr, 800.0)
    assert got == _brute(pl, pr, 800.0)
    # distances agree with python to float tolerance
    dl = {(x["left_id"], x["right_id"]): x["dist_km"] for x in rows}
    lpos = {i: (x, y) for i, x, y in pl}
    rpos = {j: (u, v) for j, u, v in pr}
    for (i, j), dkm in dl.items():
        ref = _hav(*lpos[i], *rpos[j])
        assert abs(dkm - ref) <= 1e-9 * max(1.0, ref)


def test_high_latitude_lon_shrink(spark):
    # at lat 75, 3 deg of lon is only ~87 km: planar-degrees would miss
    # that these are close; geodesic must pair them
    pl = [(0, 10.0, 75.0)]
    pr = [(0, 13.0, 75.0), (1, 10.0, 74.0), (2, 60.0, 75.0)]
    got, _ = _run(spark, pl, pr, 150.0)
    assert got == _brute(pl, pr, 150.0) == [(0, 0), (0, 1)]


def test_antimeridian_pairs(spark):
    pl = [(0, 179.5, 10.0)]
    pr = [(0, -179.5, 10.0), (1, 170.0, 10.0)]
    got, _ = _run(spark, pl, pr, 150.0)
    assert got == _brute(pl, pr, 150.0) == [(0, 0)]


def test_polar_cap_full_ring(spark):
    # center 1 deg from the pole with a radius that wraps all longitudes
    pl = [(0, 0.0, 89.0)]
    pr = [(j, lon, 89.0) for j, lon in enumerate((-170.0, -90.0, 45.0, 179.0))]
    got, _ = _run(spark, pl, pr, 300.0)
    assert got == _brute(pl, pr, 300.0)
    assert len(got) == 4   # all longitudes at that latitude are within 300km


def test_res_pick_and_invariance(spark):
    assert geo_radius_res(250.0) <= 6
    rng = random.Random(5)
    pl = [(i, rng.uniform(-179, 179), rng.uniform(-80, 80)) for i in range(80)]
    pr = [(j, rng.uniform(-179, 179), rng.uniform(-80, 80)) for j in range(80)]
    l = spark.createDataFrame(pl, "left_id bigint, lon double, lat double")
    r = spark.createDataFrame(pr, "right_id bigint, lon double, lat double")
    a = sorted((x["left_id"], x["right_id"])
               for x in geo_radius_join(l, r, 500.0).collect())
    b = sorted((x["left_id"], x["right_id"])
               for x in geo_radius_join(
                   l.repartition(11), r.repartition(5), 500.0,
                   res=geo_radius_res(500.0) + 1).collect())
    assert a == b == _brute(pl, pr, 500.0)
