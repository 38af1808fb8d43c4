"""Co-location join: brute-force parity, inclusive boundaries,
bucket-edge pairs, exactly-once, hot keys, partitioning invariance."""

from __future__ import annotations

import random

from osm2geojson_lite_spark.spatial.colocate import colocation_join


def _brute(lrows, rrows, radius, tau, include_self=True):
    out = {}
    for lid, llon, llat, lts in lrows:
        for rid, rlon, rlat, rts in rrows:
            dx, dy = llon - rlon, llat - rlat
            d2 = dx * dx + dy * dy
            dt = lts - rts
            if d2 <= radius * radius and abs(dt) <= tau:
                if include_self or lid != rid:
                    out[(lid, rid)] = (d2, dt)
    return out


def _dfs(spark, lrows, rrows, parts=None):
    l = spark.createDataFrame(
        lrows, "left_id bigint, lon double, lat double, ts bigint")
    r = spark.createDataFrame(
        rrows, "right_id bigint, lon double, lat double, ts bigint")
    if parts:
        l, r = l.repartition(parts), r.repartition(parts + 3)
    return l, r


def _got(df):
    return {(r["left_id"], r["right_id"]): (r["dist2"], r["dt_s"])
            for r in df.collect()}


def _rand_rows(n, seed, id0=0):
    rng = random.Random(seed)
    return [(id0 + i, rng.uniform(-20, 20), rng.uniform(-20, 20),
             rng.randrange(0, 5000)) for i in range(n)]


def test_matches_brute_force(spark):
    lrows, rrows = _rand_rows(150, 1), _rand_rows(120, 2, id0=1000)
    radius, tau = 3.0, 600
    l, r = _dfs(spark, lrows, rrows)
    got = _got(colocation_join(l, r, radius, tau))
    assert got == _brute(lrows, rrows, radius, tau)
    assert got  # non-trivial


def test_exactly_once_no_dedup_needed(spark):
    lrows, rrows = _rand_rows(100, 3), _rand_rows(100, 4, id0=500)
    l, r = _dfs(spark, lrows, rrows)
    rows = colocation_join(l, r, 5.0, 1200).collect()
    keys = [(r["left_id"], r["right_id"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_inclusive_boundaries_and_bucket_edge(spark):
    # dt == tau exactly, and a pair straddling a bucket boundary
    lrows = [(1, 0.0, 0.0, 600), (2, 10.0, 10.0, 1199)]
    rrows = [(11, 3.0, 4.0, 0),      # dist 5.0 == radius, dt 600 == tau
             (12, 10.0, 10.0, 1200)]  # adjacent bucket, dt -1
    l, r = _dfs(spark, lrows, rrows)
    got = _got(colocation_join(l, r, 5.0, 600))
    assert got == {(1, 11): (25.0, 600), (2, 12): (0.0, -1)}


def test_include_self_flag(spark):
    rows = [(1, 0.0, 0.0, 0), (2, 0.1, 0.0, 10)]
    l, r = _dfs(spark, rows, rows)
    both = _got(colocation_join(l, r, 1.0, 100))
    assert set(both) == {(1, 1), (1, 2), (2, 1), (2, 2)}
    no_self = _got(colocation_join(l, r, 1.0, 100, include_self=False))
    assert set(no_self) == {(1, 2), (2, 1)}


def test_hot_key_with_salt_and_partitioning_invariance(spark):
    # everyone at the stadium at kickoff: one (cell, bucket) key
    lrows = [(i, 1.0 + (i % 7) * 1e-4, 2.0, 1000 + i % 30)
             for i in range(300)]
    rrows = [(1000 + i, 1.0, 2.0 + (i % 5) * 1e-4, 1000 + i % 40)
             for i in range(200)]
    expect = _brute(lrows, rrows, 0.5, 120)
    l, r = _dfs(spark, lrows, rrows)
    assert _got(colocation_join(l, r, 0.5, 120, salt=8)) == expect
    l2, r2 = _dfs(spark, lrows, rrows, parts=23)
    assert _got(colocation_join(l2, r2, 0.5, 120)) == expect
