"""line_cells supercover vs an identical-float python replay (X24)."""

from __future__ import annotations

import math
import random

from osm2geojson_lite_spark.spatial.cells import cell_id
from osm2geojson_lite_spark.spatial.line_cells import line_cells


def _grid(v: float, lo: float, extent: float, n: int) -> int:
    return max(0, min(n - 1, math.floor((v - lo) / extent * n)))


def _naive(seg, res: int):
    """Same strip decomposition, same float op order as the engine."""
    n = 1 << res
    sid, x1, y1, x2, y2 = seg
    if x2 < x1:
        ax, ay, bx, by = x2, y2, x1, y1
    else:
        ax, ay, bx, by = x1, y1, x2, y2
    out = set()
    for cx in range(_grid(ax, -180.0, 360.0, n), _grid(bx, -180.0, 360.0, n) + 1):
        lc = -180.0 + cx * 360.0 / n
        lc1 = -180.0 + (cx + 1.0) * 360.0 / n
        xs, xe = max(ax, lc), min(bx, lc1)
        if bx == ax:
            y_s, y_e = ay, by
        else:
            dydx = (by - ay) / (bx - ax)
            y_s = ay + (xs - ax) * dydx
            y_e = ay + (xe - ax) * dydx
        ra = _grid(min(y_s, y_e), -90.0, 180.0, n)
        rb = _grid(max(y_s, y_e), -90.0, 180.0, n)
        for cy in range(ra, rb + 1):
            out.add((sid, cell_id(cx, cy, res)))
    return sorted(out)


def _segs(rng, k):
    segs = []
    for i in range(k):
        x = rng.uniform(-170, 160)
        y = rng.uniform(-80, 70)
        segs.append((i, x, y, x + rng.uniform(-8, 8), y + rng.uniform(-8, 8)))
    return segs


def _run(spark, segs, res, **kw):
    df = spark.createDataFrame(
        segs, "id bigint, x1 double, y1 double, x2 double, y2 double")
    return sorted((r["id"], r["cell"])
                  for r in line_cells(df, res, **kw).collect())


def test_matches_python_replay(spark):
    segs = _segs(random.Random(24), 80)
    # + axis-aligned, degenerate-point, and border-grazing segments
    segs += [
        (100, 3.0, 5.0, 3.0, 25.0),          # vertical
        (101, -10.0, 4.0, 20.0, 4.0),        # horizontal
        (102, 7.25, 7.25, 7.25, 7.25),       # point
        (103, 0.0, 0.0, 45.0, 45.0),         # cell-corner diagonal
        (104, -190.0, -95.0, 190.0, 95.0),   # out-of-domain -> clamped
    ]
    got = _run(spark, segs, 7)
    want = sorted(set().union(*[_naive(s, 7) for s in segs]))
    assert got == want


def test_sampled_points_are_covered(spark):
    """Superset sanity independent of the replay: every densely sampled
    point of the segment lies in some output cell of that segment."""
    res, n = 8, 1 << 8
    segs = _segs(random.Random(7), 25)
    got = {}
    for sid, cell in _run(spark, segs, res):
        got.setdefault(sid, set()).add(cell)
    for sid, x1, y1, x2, y2 in segs:
        for t in [i / 400.0 for i in range(401)]:
            px, py = x1 + t * (x2 - x1), y1 + t * (y2 - y1)
            c = cell_id(_grid(px, -180.0, 360.0, n),
                        _grid(py, -90.0, 180.0, n), res)
            assert c in got[sid], (sid, px, py)


def test_max_cols_drops_long_rows(spark):
    segs = [(0, 0.0, 0.0, 1.0, 1.0), (1, -170.0, 0.0, 170.0, 0.0)]
    out = _run(spark, segs, 9, max_cols=50)
    assert {sid for sid, _ in out} == {0}


def test_partitioning_invariance(spark):
    segs = _segs(random.Random(3), 60)
    df = spark.createDataFrame(
        segs, "id bigint, x1 double, y1 double, x2 double, y2 double")
    a = sorted((r["id"], r["cell"]) for r in line_cells(df, 8).collect())
    b = sorted((r["id"], r["cell"])
               for r in line_cells(df.repartition(17), 8).collect())
    assert a == b
