"""Polygon overlap join — kernel truth table + operator vs brute force."""

from __future__ import annotations

import json

import numpy as np
from hypothesis import given, settings, strategies as st

from osm2geojson_lite_spark.spatial import polygon_overlap_join, rings_overlap


def _sq(x0, y0, x1, y1):
    return np.asarray(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float)


def test_kernel_truth_table():
    a = _sq(0, 0, 4, 4)
    assert rings_overlap(a, _sq(2, 2, 6, 6))          # partial overlap
    assert rings_overlap(a, _sq(1, 1, 2, 2))          # b inside a
    assert rings_overlap(_sq(1, 1, 2, 2), a)          # a inside b
    assert not rings_overlap(a, _sq(5, 5, 7, 7))      # disjoint
    assert not rings_overlap(a, _sq(10, 0, 14, 4))    # disjoint, same y-band
    # cross shape: edges cross but neither contains the other's vertex set
    tall = _sq(1, -10, 2, 10)
    wide = _sq(-10, 1, 10, 2)
    assert rings_overlap(tall, wide)


@settings(max_examples=120, deadline=None)
@given(st.tuples(*(st.floats(-20, 20, allow_nan=False) for _ in range(4))),
       st.tuples(*(st.floats(-20, 20, allow_nan=False) for _ in range(4))))
def test_kernel_matches_interval_math_on_rects(ra, rb):
    ax0, ay0 = min(ra[0], ra[2]), min(ra[1], ra[3])
    ax1, ay1 = max(ra[0], ra[2]), max(ra[1], ra[3])
    bx0, by0 = min(rb[0], rb[2]), min(rb[1], rb[3])
    bx1, by1 = max(rb[0], rb[2]), max(rb[1], rb[3])
    # skip degenerate rectangles and boundary-touch (measure-zero) cases
    if min(ax1 - ax0, ay1 - ay0, bx1 - bx0, by1 - by0) < 1e-6:
        return
    if (abs(ax0 - bx1) < 1e-9 or abs(ax1 - bx0) < 1e-9
            or abs(ay0 - by1) < 1e-9 or abs(ay1 - by0) < 1e-9):
        return
    want = (ax0 < bx1 and bx0 < ax1 and ay0 < by1 and by0 < ay1)
    got = rings_overlap(_sq(ax0, ay0, ax1, ay1), _sq(bx0, by0, bx1, by1))
    assert got == want


def test_operator_matches_brute_force(spark):
    rng = np.random.RandomState(7)
    lrows, rrows = [], []
    for i in range(30):
        x, y = rng.uniform(-50, 50, 2)
        w, h = rng.uniform(2, 12, 2)
        lrows.append((str(i), json.dumps(_sq(x, y, x + w, y + h).tolist())))
    for j in range(25):
        x, y = rng.uniform(-50, 50, 2)
        w, h = rng.uniform(2, 12, 2)
        rrows.append((str(j), json.dumps(_sq(x, y, x + w, y + h).tolist())))
    left = spark.createDataFrame(lrows, "left_id string, ring_json string")
    right = spark.createDataFrame(rrows, "right_id string, ring_json string")

    got = {(r["left_id"], r["right_id"])
           for r in polygon_overlap_join(left, right, res=7).collect()}
    want = set()
    for lid, ls in lrows:
        for rid, rs in rrows:
            if rings_overlap(np.asarray(json.loads(ls)),
                             np.asarray(json.loads(rs))):
                want.add((lid, rid))
    assert got == want and len(want) > 3
    # finer prefilter grid must not change the result
    got9 = {(r["left_id"], r["right_id"])
            for r in polygon_overlap_join(left, right, res=9).collect()}
    assert got9 == got
