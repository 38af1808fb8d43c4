"""knox_statistic (spatial.knox) vs a naive all-pairs python oracle."""

from __future__ import annotations

import random

import pytest

from osm2geojson_lite_spark.spatial import knox_statistic


def _naive(pts: list[tuple[int, float, float, int]], eps_s: float,
           eps_t: int) -> dict:
    n = len(pts)
    n_s = n_t = n_st = 0
    for i in range(n):
        for j in range(i + 1, n):
            _, x1, y1, t1 = pts[i]
            _, x2, y2, t2 = pts[j]
            close_s = (x1 - x2) ** 2 + (y1 - y2) ** 2 <= eps_s * eps_s
            close_t = abs(t1 - t2) <= eps_t
            n_s += close_s
            n_t += close_t
            n_st += close_s and close_t
    pairs = n * (n - 1) // 2
    expected = round(n_s * n_t / pairs, 9) if pairs else None
    ratio = (round(n_st / (n_s * n_t / pairs), 9)
             if n_s > 0 and n_t > 0 else None)
    return {"n": n, "pairs": pairs, "n_s": n_s, "n_t": n_t, "n_st": n_st,
            "expected": expected, "knox_ratio": ratio}


def _run(spark, pts, eps_s, eps_t, **kw):
    df = spark.createDataFrame(pts, "id long, lon double, lat double, t long")
    [row] = knox_statistic(df, eps_s, eps_t, **kw).collect()
    return row.asDict()


def _check(got: dict, exp: dict):
    for k, v in exp.items():
        if isinstance(v, float):
            assert got[k] == pytest.approx(v, abs=1e-9), k
        else:
            assert got[k] == v, k


def test_random_cloud_matches_naive_with_and_without_salt(spark):
    rng = random.Random(5)
    pts = [(i, rng.uniform(0, 2), rng.uniform(0, 1),
            rng.randrange(0, 50_000)) for i in range(120)]
    exp = _naive(pts, 0.3, 2000)
    _check(_run(spark, pts, 0.3, 2000), exp)
    _check(_run(spark, pts, 0.3, 2000, salt=4), exp)


def test_planted_spacetime_clusters_push_ratio_up(spark):
    rng = random.Random(6)
    pts = []
    i = 0
    for c in range(8):  # 8 tight space-time bursts + uniform noise
        cx, cy, ct = rng.uniform(0, 5), rng.uniform(0, 5), c * 500_000
        for _ in range(10):
            pts.append((i, cx + rng.uniform(-0.05, 0.05),
                        cy + rng.uniform(-0.05, 0.05),
                        ct + rng.randrange(0, 600)))
            i += 1
    for _ in range(80):
        pts.append((i, rng.uniform(0, 5), rng.uniform(0, 5),
                    rng.randrange(0, 4_000_000)))
        i += 1
    got = _run(spark, pts, 0.2, 1800)
    _check(got, _naive(pts, 0.2, 1800))
    assert got["knox_ratio"] > 2.0  # bursts are real space-time interaction


def test_hot_window_duplicate_timestamps_and_locations(spark):
    """The r6 count-table legs: thousands of events share ONE tau-window
    and a handful of exact coordinates, so the pair joins see |distinct t|
    / |distinct location| rows, not n — and the counts still match the
    naive all-pairs oracle exactly (the product/choose-sum identity)."""
    rng = random.Random(7)
    # 400 events, only 12 distinct timestamps inside one tau=3600 window,
    # only 6 distinct snapped coordinates: heavy duplication on both keys.
    times = [rng.randrange(0, 3000) for _ in range(12)]
    locs = [(round(rng.uniform(0, 1), 2), round(rng.uniform(0, 1), 2))
            for _ in range(6)]
    pts = []
    for i in range(400):
        x, y = locs[i % 6]
        pts.append((i, x, y, times[i % 12]))
    exp = _naive(pts, 0.25, 3600)
    _check(_run(spark, pts, 0.25, 3600), exp)
    # all-in-one-bucket worst case: identical timestamps everywhere
    pts_same_t = [(i, x, y, 777) for i, x, y, _ in pts]
    _check(_run(spark, pts_same_t, 0.25, 3600), _naive(pts_same_t, 0.25, 3600))


def test_nan_coordinates_never_pair_in_space(spark):
    """NaN coords must stay excluded from n_s (dist2 NaN -> filter false),
    including the same-location C(c,2) leg of the count-table form."""
    nan = float("nan")
    pts = [(1, 0.0, 0.0, 0), (2, 0.0, 0.0, 10),
           (3, nan, nan, 20), (4, nan, nan, 30)]
    got = _run(spark, pts, 0.5, 100)
    # only the (1,2) pair is spatially close; NaN pairs contribute nothing
    assert got["n_s"] == 1
    assert got["n_t"] == 6  # all 4 events within 100s of each other
    assert got["n_st"] == 1


def test_degenerate_inputs(spark):
    # n = 1: no pairs, NULL expectation and ratio
    got = _run(spark, [(1, 0.0, 0.0, 0)], 0.5, 60)
    assert (got["n"], got["pairs"], got["n_s"], got["n_t"], got["n_st"]) \
        == (1, 0, 0, 0, 0)
    assert got["expected"] is None and got["knox_ratio"] is None
    # two coincident points: every count is 1, ratio exactly 1
    got = _run(spark, [(1, 0.0, 0.0, 0), (2, 0.0, 0.0, 10)], 0.5, 60)
    assert (got["n_s"], got["n_t"], got["n_st"]) == (1, 1, 1)
    assert got["expected"] == 1.0 and got["knox_ratio"] == 1.0
    with pytest.raises(ValueError):
        knox_statistic(
            spark.createDataFrame([], "id long, lon double, lat double, t long"),
            0.5, 0)
