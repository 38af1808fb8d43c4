"""clean_track — python-oracle parity at several bucket widths,
handcrafted teleport semantics, partitioning invariance, validation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osm2geojson_lite_spark.temporal import clean_track


def _py_clean(points, max_speed):
    """Naive oracle: sort per entity on (t, lon, lat), lag, flag."""
    out = {}
    by_e = {}
    for e, t, lon, lat in points:
        by_e.setdefault(e, []).append((t, lon, lat))
    for e, pts in by_e.items():
        pts.sort()
        prev = None
        for t, lon, lat in pts:
            if prev is None:
                out[(e, t, lon, lat)] = (None, None, None, False)
            else:
                dt = t - prev[0]
                leg = round(math.sqrt((lon - prev[1]) ** 2
                                      + (lat - prev[2]) ** 2), 9)
                speed = round(leg / dt, 9) if dt > 0 else None
                tel = (dt == 0 and leg > 0) or \
                      (speed is not None and speed > max_speed)
                out[(e, t, lon, lat)] = (dt, leg, speed, tel)
            prev = (t, lon, lat)
    return out


def _points(n=400, entities=3, seed=11):
    import random
    rng = random.Random(seed)
    pts = []
    for i in range(n):
        e = i % entities
        t = rng.randrange(0, 500_000)
        pts.append((e, t, round(rng.uniform(-10, 10), 4),
                    round(rng.uniform(-5, 5), 4)))
    return sorted(set(pts))


@pytest.mark.parametrize("bucket_s", [1000, 40_000, 10_000_000])
def test_matches_python_oracle_at_any_bucket_width(spark, bucket_s):
    pts = _points()
    df = spark.createDataFrame(
        pts, "entity bigint, t bigint, lon double, lat double")
    got = {(r.entity, r.t, r.lon, r.lat):
           (r.dt_s, r.leg, r.speed, r.is_teleport)
           for r in clean_track(df, max_speed=0.001,
                                bucket_s=bucket_s).collect()}
    want = _py_clean(pts, 0.001)
    assert got == want
    assert any(v[3] for v in want.values())      # panel has teleports
    assert not all(v[3] for v in want.values())  # and keeps normal legs


def test_handcrafted_teleport_semantics(spark):
    rows = [
        (1, 100, 0.0, 0.0),   # first point: all NULL, not a teleport
        (1, 200, 0.001, 0.0),  # 0.001 deg in 100 s -> 1e-05, fine
        (1, 300, 5.0, 0.0),    # ~5 deg in 100 s -> teleport
        (1, 300, 5.0, 1.0),    # same t, different place -> teleport
        (1, 400, 5.0, 1.0),    # same place 100 s later -> speed 0, fine
        (2, 50, 9.0, 9.0),     # other entity: fresh lag state
    ]
    df = spark.createDataFrame(
        rows, "entity bigint, t bigint, lon double, lat double")
    got = {(r.entity, r.t, r.lon, r.lat): r for r in
           clean_track(df, max_speed=0.01).collect()}
    assert got[(1, 100, 0.0, 0.0)].dt_s is None
    assert not got[(1, 100, 0.0, 0.0)].is_teleport
    assert got[(1, 200, 0.001, 0.0)].speed == pytest.approx(1e-05)
    assert not got[(1, 200, 0.001, 0.0)].is_teleport
    assert got[(1, 300, 5.0, 0.0)].is_teleport
    r_dup = got[(1, 300, 5.0, 1.0)]
    assert r_dup.dt_s == 0 and r_dup.speed is None and r_dup.is_teleport
    r_still = got[(1, 400, 5.0, 1.0)]
    assert r_still.speed == 0.0 and not r_still.is_teleport
    assert got[(2, 50, 9.0, 9.0)].dt_s is None


def test_partitioning_invariance(spark):
    pts = _points(n=600, entities=2)
    df = spark.createDataFrame(
        pts, "entity bigint, t bigint, lon double, lat double")
    one = clean_track(df.coalesce(1), max_speed=0.001, bucket_s=7_000)
    many = clean_track(df.repartition(41), max_speed=0.001, bucket_s=7_000)
    assert sorted(map(tuple, one.collect())) == \
        sorted(map(tuple, many.collect()))


def test_validation(spark):
    df = spark.createDataFrame(
        [(1, 1, 0.0, 0.0)], "entity bigint, t bigint, lon double, lat double")
    with pytest.raises(ValueError, match="positive"):
        clean_track(df, max_speed=0.0)
    with pytest.raises(ValueError, match="positive"):
        clean_track(df, max_speed=1.0, bucket_s=0)
