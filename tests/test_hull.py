"""Convex hull: gift-wrap reference parity, degenerate inputs,
quantization, partitioning invariance, candidate guard."""

from __future__ import annotations

import random

import pytest

from osm2geojson_lite_spark.spatial.hull import convex_hull


def _ref_hull(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Strict hull, CCW from lexicomin, by gift wrapping — the
    independent reference (and the shape the DuckDB oracle replays)."""
    ps = sorted(set(pts))
    if len(ps) == 1:
        return ps

    def cross(p, q, r):
        return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])

    def beyond(p, q, r):  # r collinear with p->q and past q
        return ((r[0] - q[0]) * (q[0] - p[0])
                + (r[1] - q[1]) * (q[1] - p[1])) > 0

    start = ps[0]
    hull = [start]
    cur = start
    while True:
        nxt = None
        for q in ps:
            if q == cur:
                continue
            if all(c == cur or c == q
                   or cross(cur, q, c) > 0
                   or (cross(cur, q, c) == 0 and not beyond(cur, q, c))
                   for c in ps):
                nxt = q
                break
        assert nxt is not None
        if nxt == start:
            break
        hull.append(nxt)
        cur = nxt
    return hull


def _run(spark, rows, parts=None, **kw):
    df = spark.createDataFrame(rows, "g bigint, x bigint, y bigint")
    if parts:
        df = df.repartition(parts)
    out = convex_hull(df, **kw).collect()
    got: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["g"], r["seq"])):
        got.setdefault(r["g"], []).append((r["x"], r["y"]))
    return got


def test_matches_gift_wrap_reference(spark):
    rng = random.Random(9)
    rows = []
    expect = {}
    for g in range(6):
        pts = [(rng.randrange(-50, 50), rng.randrange(-50, 50))
               for _ in range(120 + g * 40)]
        if g % 2:  # inject duplicates + collinear runs
            pts += pts[:10] + [(i, i) for i in range(-20, 20)]
        rows += [(g, x, y) for x, y in pts]
        expect[g] = _ref_hull(pts)
    assert _run(spark, rows) == expect


def test_degenerate_groups(spark):
    rows = (
        [(0, 5, 5)]                                    # single point
        + [(1, i, 2 * i) for i in range(10)]           # all collinear
        + [(2, 0, 0), (2, 4, 0), (2, 4, 4), (2, 0, 4)]  # square
        + [(2, 2, 2), (2, 2, 0), (2, 0, 2)]            # interior + on-edge
    )
    got = _run(spark, rows)
    assert got[0] == [(5, 5)]
    assert got[1] == [(0, 0), (9, 18)]
    assert got[2] == [(0, 0), (4, 0), (4, 4), (0, 4)]  # strict: edges drop


def test_grid_hull_is_four_corners(spark):
    rows = [(0, x, y) for x in range(12) for y in range(8)]
    got = _run(spark, rows)
    assert got[0] == [(0, 0), (11, 0), (11, 7), (0, 7)]


def test_partitioning_invariance(spark):
    rng = random.Random(21)
    rows = [(g, rng.randrange(-1000, 1000), rng.randrange(-1000, 1000))
            for g in range(3) for _ in range(500)]
    assert _run(spark, rows) == _run(spark, rows, parts=37)


def test_quantize_path(spark):
    df = spark.createDataFrame(
        [(0, 0.0000004, 0.0), (0, 1.25, 0.0), (0, 1.25, 2.5),
         (0, 0.0, 2.5), (0, 0.6, 1.1)],
        "g bigint, x double, y double",
    )
    out = convex_hull(df, quantize=1e6).collect()
    got = [(r["x"], r["y"]) for r in sorted(out, key=lambda r: r["seq"])]
    assert got == [(0, 0), (1250000, 0), (1250000, 2500000), (0, 2500000)]


def test_candidate_guard(spark):
    # 100 points on a circle: every one a true local-hull vertex
    import math
    rows = [(0, int(10 ** 6 * math.cos(i)), int(10 ** 6 * math.sin(i)))
            for i in range(100)]
    df = spark.createDataFrame(rows, "g bigint, x bigint, y bigint")
    with pytest.raises(ValueError, match="pruned candidates"):
        convex_hull(df, max_candidate_rows=10)
