"""compact_cells / uncompact_cells vs a naive python oracle (X23)."""

from __future__ import annotations

import random

from osm2geojson_lite_spark.spatial.cells import cell_id
from osm2geojson_lite_spark.spatial.compact import compact_cells, uncompact_cells


def _naive_compact(xy: set[tuple[int, int]], res_from: int, res_to: int):
    cur, out = set(xy), []
    for r in range(res_from, res_to, -1):
        groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
        for x, y in cur:
            groups.setdefault((x // 2, y // 2), []).append((x, y))
        cur = set()
        for p, kids in groups.items():
            if len(kids) == 4:
                cur.add(p)
            else:
                out += [(cell_id(x, y, r), r) for x, y in kids]
    out += [(cell_id(x, y, res_to), res_to) for x, y in cur]
    return sorted(out)


def _df(spark, xy, res):
    return spark.createDataFrame(
        [(cell_id(x, y, res),) for x, y in sorted(xy)], "cell bigint")


def test_compact_matches_naive(spark):
    rng = random.Random(23)
    # a solid 8x8 block (fully compactable), a ragged blob, and strays
    xy = {(x, y) for x in range(16, 24) for y in range(32, 40)}
    xy |= {(rng.randrange(60, 80), rng.randrange(60, 80)) for _ in range(120)}
    xy |= {(0, 0), (255, 255), (5, 200)}
    got = sorted((r["cell"], r["res"])
                 for r in compact_cells(_df(spark, xy, 8), 8, 5).collect())
    assert got == _naive_compact(xy, 8, 5)


def test_solid_square_collapses_to_one_parent(spark):
    xy = {(x, y) for x in range(40, 48) for y in range(16, 24)}  # 8x8 at res 8
    rows = compact_cells(_df(spark, xy, 8), 8, 5).collect()
    assert [(r["cell"], r["res"]) for r in rows] == [(cell_id(5, 2, 5), 5)]


def test_res_floor_respected(spark):
    # same solid square, but floor at res 7 stops one level early: the
    # 8x8 res-8 block becomes its 4x4 grid of res-7 parents, no coarser
    xy = {(x, y) for x in range(40, 48) for y in range(16, 24)}
    rows = compact_cells(_df(spark, xy, 8), 8, 7).collect()
    assert sorted((r["cell"], r["res"]) for r in rows) == sorted(
        (cell_id(20 + dx, 8 + dy, 7), 7) for dx in range(4) for dy in range(4))


def test_roundtrip_uncompact(spark):
    rng = random.Random(7)
    xy = {(rng.randrange(0, 100), rng.randrange(0, 100)) for _ in range(300)}
    xy |= {(x, y) for x in range(8, 16) for y in range(8, 16)}
    comp = compact_cells(_df(spark, xy, 8), 8, 5)
    back = sorted(r["cell"] for r in uncompact_cells(comp, 8).collect())
    assert back == sorted(cell_id(x, y, 8) for x, y in xy)


def test_partitioning_invariance(spark):
    rng = random.Random(99)
    xy = {(rng.randrange(0, 64), rng.randrange(0, 64)) for _ in range(400)}
    xy |= {(x, y) for x in range(0, 8) for y in range(0, 8)}
    base = _df(spark, xy, 8)
    a = sorted((r["cell"], r["res"])
               for r in compact_cells(base, 8, 5).collect())
    b = sorted((r["cell"], r["res"])
               for r in compact_cells(base.repartition(13), 8, 5).collect())
    assert a == b and a == _naive_compact(xy, 8, 5)
