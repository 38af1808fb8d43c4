"""Snap-to-nearest-segment join — handcrafted clamp/tie semantics,
brute-force parity, partitioning/broadcast invariance, radius guard."""

from __future__ import annotations

import numpy as np
import pytest

from osm2geojson_lite_spark.spatial import snap_join


def _pts(spark, rows):
    return spark.createDataFrame(
        [(str(i), float(x), float(y)) for i, (x, y) in enumerate(rows)],
        "id string, lon double, lat double")


def _segs(spark, rows):
    return spark.createDataFrame(
        [(str(i), float(a), float(b), float(c), float(d))
         for i, (a, b, c, d) in enumerate(rows)],
        "id string, x1 double, y1 double, x2 double, y2 double")


def _run(spark, pts, segs, radius, **kw):
    out = snap_join(_pts(spark, pts), _segs(spark, segs), radius,
                    point_id="id", seg_id="id", **kw).collect()
    return {r.point_id: (r.seg_id, r.t, r.snap_x, r.snap_y, r.dist2)
            for r in out}


def _py_snap(pts, segs, radius):
    want = {}
    for i, (px, py) in enumerate(pts):
        best = None
        for j, (ax, ay, bx, by) in enumerate(segs):
            dx, dy = bx - ax, by - ay
            len2 = dx * dx + dy * dy
            t = min(1.0, max(0.0, ((px - ax) * dx + (py - ay) * dy) / len2)) \
                if len2 > 0 else 0.0
            cx, cy = round(ax + t * dx, 9), round(ay + t * dy, 9)
            d2 = round((px - cx) ** 2 + (py - cy) ** 2, 9)
            if d2 <= radius * radius:
                key = (d2, str(j), round(t, 9), cx, cy)
                if best is None or key < best:
                    best = key
        if best is not None:
            want[str(i)] = (best[1], best[2], best[3], best[4], best[0])
    return want


def test_handcrafted_semantics(spark):
    segs = [(0, 0, 10, 0),        # seg 0: the x-axis
            (0, 5, 10, 5)]        # seg 1: parallel, higher
    pts = [(3, 1),                # interior projection -> seg 0, t=0.3
           (12, 1),               # beyond endpoint -> clamps to (10, 0)
           (3, 3.0),              # equidistant corridor? no: 3 vs 2 -> seg 1
           (3, 2.5),              # exact tie -> lowest seg_id wins
           (50, 50)]              # out of radius -> dropped
    got = _run(spark, pts, segs, radius=4.0, res=5)
    assert got["0"] == ("0", 0.3, 3.0, 0.0, 1.0)
    assert got["1"] == ("0", 1.0, 10.0, 0.0, 5.0)
    assert got["2"] == ("1", 0.3, 3.0, 5.0, 4.0)
    assert got["3"][0] == "0" and got["3"][4] == 6.25
    assert "4" not in got


def _panel(n, salt, span=20.0):
    rng = np.random.RandomState(salt)
    return rng.uniform(0, span, (n, 2)), None


def test_matches_brute_force(spark):
    rng = np.random.RandomState(11)
    pts = [tuple(p) for p in rng.uniform(0, 20, (300, 2)).round(4)]
    xy = rng.uniform(0, 20, (40, 2)).round(4)
    d = rng.uniform(-2, 2, (40, 2)).round(4)
    segs = [tuple(np.concatenate([a, a + b])) for a, b in zip(xy, d)]
    want = _py_snap(pts, segs, 1.5)
    got = _run(spark, pts, segs, 1.5, res=6)
    assert len(want) > 100          # panel actually snaps a good fraction
    assert got == want


def test_partitioning_and_broadcast_invariance(spark):
    rng = np.random.RandomState(12)
    pts = [tuple(p) for p in rng.uniform(0, 20, (200, 2)).round(4)]
    xy = rng.uniform(0, 20, (30, 2)).round(4)
    d = rng.uniform(-2, 2, (30, 2)).round(4)
    segs = [tuple(np.concatenate([a, a + b])) for a, b in zip(xy, d)]
    want = _py_snap(pts, segs, 2.0)
    pdf, sdf = _pts(spark, pts).repartition(13), _segs(spark, segs).repartition(5)
    for bc in (False, True):
        out = snap_join(pdf, sdf, 2.0, point_id="id", seg_id="id", res=6,
                        broadcast_segments=bc).collect()
        got = {r.point_id: (r.seg_id, r.t, r.snap_x, r.snap_y, r.dist2)
               for r in out}
        assert got == want


def test_radius_guard(spark):
    pts, segs = [(0, 0)], [(0, 1, 1, 1)]
    with pytest.raises(ValueError, match="3x3 disk"):
        _run(spark, pts, segs, radius=10.0, res=9)
    # degenerate zero-length segment snaps like a point
    got = _run(spark, [(1, 1)], [(0, 0, 0, 0)], radius=2.0, res=6)
    assert got["0"] == ("0", 0.0, 0.0, 0.0, 2.0)
