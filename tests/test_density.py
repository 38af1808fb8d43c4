"""cell_density + kring_smooth vs a naive python oracle."""

from __future__ import annotations

import pytest

from osm2geojson_lite_spark.spatial import cell_density, kring_smooth
from osm2geojson_lite_spark.spatial.cells import cell_id


def _naive_smooth(counts: dict[tuple[int, int], int], res: int, ring: int,
                  weights: list[int]) -> dict[int, tuple[int, int]]:
    n = 1 << res
    out: dict[int, list[int]] = {}
    for (x, y), v in counts.items():
        for dx in range(-ring, ring + 1):
            for dy in range(-ring, ring + 1):
                ny = y + dy
                if not (0 <= ny < n):
                    continue
                nx = (x + dx) % n
                w = weights[max(abs(dx), abs(dy))]
                acc = out.setdefault(cell_id(nx, ny, res), [0, 0])
                acc[0] += v * w
                acc[1] += 1
    return {c: (a, s) for c, (a, s) in out.items()}


def _cells_df(spark, counts, res):
    rows = [(cell_id(x, y, res), v) for (x, y), v in counts.items()]
    return spark.createDataFrame(rows, "cell bigint, n_points bigint")


RES = 8
N = 1 << RES


def test_smooth_matches_naive(spark):
    counts = {(10, 10): 3, (11, 10): 5, (13, 13): 1, (100, 200): 7}
    got = {r["cell"]: (r["w_sum"], r["n_src"])
           for r in kring_smooth(_cells_df(spark, counts, RES), RES).collect()}
    assert got == _naive_smooth(counts, RES, 1, [2, 1])


def test_ring2_custom_weights(spark):
    counts = {(50, 50): 2, (52, 50): 4, (51, 51): 1}
    weights = [9, 3, 1]
    got = {r["cell"]: (r["w_sum"], r["n_src"])
           for r in kring_smooth(_cells_df(spark, counts, RES), RES,
                                 ring=2, weights=weights).collect()}
    assert got == _naive_smooth(counts, RES, 2, weights)


def test_antimeridian_wrap_and_pole_clamp(spark):
    counts = {(0, 0): 1, (N - 1, N - 1): 1}
    got = {r["cell"]: (r["w_sum"], r["n_src"])
           for r in kring_smooth(_cells_df(spark, counts, RES), RES).collect()}
    naive = _naive_smooth(counts, RES, 1, [2, 1])
    assert got == naive
    # x wraps: the cell across the antimeridian received a contribution
    assert cell_id(N - 1, 0, RES) in got and cell_id(1, 0, RES) in got
    # y clamps: nothing exists below row 0 / above row n-1
    assert all((c % (1 << 28)) < N for c in got)


def test_density_bins_points(spark):
    pts = spark.createDataFrame(
        [(0.0, 0.0), (0.1, 0.1), (-179.9, 0.0)], "lon double, lat double")
    got = {r["cell"]: r["n_points"] for r in cell_density(pts, RES).collect()}
    assert sum(got.values()) == 3 and len(got) == 2


def test_partitioning_invariance(spark):
    counts = {(i * 7 % N, i * 13 % N): i + 1 for i in range(60)}
    df = _cells_df(spark, counts, RES)
    a = sorted(map(tuple, kring_smooth(df.repartition(1), RES).collect()))
    b = sorted(map(tuple, kring_smooth(df.repartition(9), RES).collect()))
    assert a == b


def test_bad_weights_rejected(spark):
    df = _cells_df(spark, {(1, 1): 1}, RES)
    with pytest.raises(ValueError, match="ring\\+1"):
        kring_smooth(df, RES, ring=2, weights=[1, 2])
