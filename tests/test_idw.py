"""idw_surface vs a full-value python oracle (X25)."""

from __future__ import annotations

import math
import random

from osm2geojson_lite_spark.spatial.cells import cell_id
from osm2geojson_lite_spark.spatial.idw import idw_kernel, idw_surface


def _grid(v, lo, extent, n):
    return max(0, min(n - 1, math.floor((v - lo) / extent * n)))


def _naive(pts, res, ring, scale):
    n = 1 << res
    binned: dict[tuple[int, int], list[int]] = {}
    for lon, lat, v in pts:
        key = (_grid(lon, -180.0, 360.0, n), _grid(lat, -90.0, 180.0, n))
        agg = binned.setdefault(key, [0, 0])
        agg[0] += v
        agg[1] += 1
    kern = idw_kernel(ring, scale)
    out: dict[int, list[int]] = {}
    for (x, y), (sv, np_) in binned.items():
        for (dx, dy), w in kern.items():
            if w <= 0:
                continue
            ny = y + dy
            if not (0 <= ny < n):
                continue
            tgt = cell_id((x + dx) % n, ny, res)
            acc = out.setdefault(tgt, [0, 0, 0])
            acc[0] += sv * w
            acc[1] += np_ * w
            acc[2] += 1
    return sorted((c, a[0], a[1], a[2], a[0] / a[1]) for c, a in out.items())


def _pts(rng, k):
    return [(rng.uniform(-179, 179), rng.uniform(-85, 85), rng.randrange(0, 500))
            for _ in range(k)]


def _run(spark, pts, res, ring, scale=2520):
    df = spark.createDataFrame(pts, "lon double, lat double, value bigint")
    rows = idw_surface(df, res, ring=ring, scale=scale).collect()
    return sorted((r["cell"], r["num"], r["den"], r["n_src"], r["idw_value"])
                  for r in rows)


def test_matches_python_oracle(spark):
    rng = random.Random(25)
    pts = _pts(rng, 300)
    # clustered hot region so neighborhoods overlap
    pts += [(10.0 + rng.uniform(0, 2), 20.0 + rng.uniform(0, 2),
             rng.randrange(0, 50)) for _ in range(100)]
    assert _run(spark, pts, 7, 2) == _naive(pts, 7, 2, 2520)


def test_antimeridian_wrap_and_pole_clamp(spark):
    pts = [(-179.9, 0.0, 10), (179.9, 0.0, 30),   # neighbors across the seam
           (0.0, 89.9, 7), (0.0, -89.9, 7)]        # top/bottom rows
    got = _run(spark, pts, 7, 1)
    assert got == _naive(pts, 7, 1, 2520)
    # the two seam points actually smooth into each other at res 7
    n = 1 << 7
    x_w = _grid(-179.9, -180.0, 360.0, n)
    x_e = _grid(179.9, -180.0, 360.0, n)
    assert (x_w - x_e) % n in (1, n - 1)
    cells = {c for c, *_ in got}
    assert cell_id(x_w, _grid(0.0, -90.0, 180.0, n), 7) in cells


def test_exact_point_recovery(spark):
    # a single source cell: the estimate everywhere in its halo equals
    # the cell's own mean (weights cancel in num/den)
    pts = [(50.0, 50.0, 10), (50.0, 50.0, 20)]
    for _, num, den, n_src, val in _run(spark, pts, 7, 2):
        assert n_src == 1 and val == 15.0 and num == 15 * den


def test_partitioning_invariance(spark):
    pts = _pts(random.Random(9), 200)
    df = spark.createDataFrame(pts, "lon double, lat double, value bigint")
    a = sorted(map(tuple, idw_surface(df, 7, ring=2).collect()))
    b = sorted(map(tuple,
                   idw_surface(df.repartition(19), 7, ring=2).collect()))
    assert a == b
