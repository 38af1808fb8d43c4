"""Segment-intersection join — handcrafted truth table, brute-force
equality (the reference-point-dedup exactness proof), resolution /
partitioning invariance, broadcast-path equality, cover guard."""

from __future__ import annotations

import numpy as np
import pytest

from osm2geojson_lite_spark.spatial import segment_intersection_join


def _df(spark, rows):
    return spark.createDataFrame(
        [(str(i), float(x1), float(y1), float(x2), float(y2))
         for i, (x1, y1, x2, y2) in enumerate(rows)],
        "id string, x1 double, y1 double, x2 double, y2 double")


def _run(spark, left, right, **kw):
    out = segment_intersection_join(
        _df(spark, left), _df(spark, right),
        left_id="id", right_id="id", **kw).collect()
    return sorted((r.left_id, r.right_id, r.px, r.py) for r in out)


def test_truth_table(spark):
    left = [(0, 0, 4, 0)]          # horizontal
    right = [
        (2, -1, 2, 1),             # proper crossing at (2, 0)
        (0, 0, 0, 5),              # shared endpoint -> excluded
        (3, 0, 3, 5),              # endpoint on interior (T-touch) -> excluded
        (1, 0, 2.5, 0),            # collinear overlap -> excluded
        (2, 1, 2, 5),              # disjoint, same x
        (10, -1, 10, 1),           # disjoint bbox
    ]
    got = _run(spark, left, right)
    assert got == [("0", "0", 2.0, 0.0)]


def test_crossing_point_345(spark):
    # (0,0)->(4,4) and (0,4)->(4,0) cross at (2,2)
    got = _run(spark, [(0, 0, 4, 4)], [(0, 4, 4, 0)])
    assert got == [("0", "0", 2.0, 2.0)]


def _brute(left, right):
    out = []
    for i, (ax1, ay1, ax2, ay2) in enumerate(left):
        for j, (bx1, by1, bx2, by2) in enumerate(right):
            d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
            d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
            d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
            d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
            if (((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0))
                    and ((d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0))):
                t = d3 / (d2 - d1)
                out.append((str(i), str(j),
                            round(ax1 + t * (ax2 - ax1), 9),
                            round(ay1 + t * (ay2 - ay1), 9)))
    return sorted(out)


def _synth_segments(n, salt, span=3.0, seg=0.8):
    """Deterministic pseudo-random segments inside a span x span box."""
    rng = np.random.RandomState(salt)
    x = rng.uniform(0, span, n)
    y = rng.uniform(0, span, n)
    dx = rng.uniform(-seg, seg, n)
    dy = rng.uniform(-seg, seg, n)
    return list(zip(x, y, x + dx, y + dy))


def test_matches_brute_force_each_pair_once(spark):
    left = _synth_segments(220, salt=1)
    right = _synth_segments(220, salt=2)
    want = _brute(left, right)
    got = _run(spark, left, right, res=9)
    assert len(want) > 150          # the panel actually exercises crossings
    assert got == want              # once per pair: dedup exact, no loss


def test_resolution_invariance(spark):
    left = _synth_segments(120, salt=3)
    right = _synth_segments(120, salt=4)
    base = _run(spark, left, right, res=7)
    for res in (8, 10):
        assert _run(spark, left, right, res=res) == base


def test_partitioning_and_broadcast_invariance(spark):
    left = _synth_segments(150, salt=5)
    right = _synth_segments(150, salt=6)
    want = _brute(left, right)
    ldf, rdf = _df(spark, left).repartition(13), _df(spark, right).repartition(7)
    for bc in (False, True):
        out = segment_intersection_join(
            ldf, rdf, left_id="id", right_id="id", res=9,
            broadcast_right=bc).collect()
        assert sorted((r.left_id, r.right_id, r.px, r.py) for r in out) == want


def test_cover_guard_refuses_long_segments(spark):
    long_seg = [(-170, -80, 170, 80)]
    with pytest.raises(ValueError, match="max_cover_cells"):
        _run(spark, long_seg, [(0, -1, 0, 1)], res=12)
    # disabling the guard still computes correctly
    got = _run(spark, [(-10, -10, 10, 10)], [(-10, 10, 10, -10)], res=7,
               max_cover_cells=None)
    assert got == [("0", "0", 0.0, 0.0)]
