"""Grid DBSCAN + Getis-Ord Gi* vs naive in-test python oracles."""

from __future__ import annotations

import math
import random

import pytest

from osm2geojson_lite_spark.spatial import cell_density, dbscan, getis_ord_gi
from osm2geojson_lite_spark.spatial.cells import cell_id


# ---------------------------------------------------------------------------
# Naive DBSCAN oracle (brute force, deterministic min-label border rule)
# ---------------------------------------------------------------------------


def _naive_dbscan(pts: dict[int, tuple[float, float]], eps: float,
                  min_pts: int) -> dict[int, tuple[str, int | None]]:
    ids = sorted(pts)
    eps2 = eps * eps

    def nbrs(i):
        xi, yi = pts[i]
        out = []
        for j in ids:
            dx, dy = pts[j][0] - xi, pts[j][1] - yi
            if dx * dx + dy * dy <= eps2:
                out.append(j)
        return out

    neigh = {i: nbrs(i) for i in ids}
    core = {i for i in ids if len(neigh[i]) >= min_pts}

    # Components of the core-core graph; label = min core id (union-find).
    parent = {i: i for i in core}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in core:
        for j in neigh[i]:
            if j in core:
                ri, rj = find(i), find(j)
                if ri != rj:
                    lo, hi = min(ri, rj), max(ri, rj)
                    parent[hi] = lo
    label = {i: find(i) for i in core}

    out: dict[int, tuple[str, int | None]] = {}
    for i in ids:
        if i in core:
            out[i] = ("core", label[i])
        else:
            core_nb = [label[j] for j in neigh[i] if j in core]
            if core_nb:
                out[i] = ("border", min(core_nb))
            else:
                out[i] = ("noise", None)
    return out


def _pts_df(spark, pts):
    rows = [(i, float(x), float(y)) for i, (x, y) in pts.items()]
    return spark.createDataFrame(rows, "point_id bigint, lon double, lat double")


def _run(spark, pts, eps, min_pts, **kw):
    df = dbscan(_pts_df(spark, pts), eps, min_pts, **kw)
    return {r["point_id"]: (r["role"], r["label"]) for r in df.collect()}


def test_dbscan_two_chains_and_noise(spark):
    # Two chains (spacing < eps), a lone pair (too small), isolated noise.
    pts = {}
    for k in range(6):
        pts[k] = (k * 0.005, 0.0)            # chain A: ids 0..5
    for k in range(5):
        pts[10 + k] = (1.0 + k * 0.005, 2.0)  # chain B: ids 10..14
    pts[20], pts[21] = (5.0, 5.0), (5.005, 5.0)   # pair: 2 < min_pts
    pts[30] = (-8.0, -8.0)                    # isolated
    got = _run(spark, pts, 0.008, 3)
    assert got == _naive_dbscan(pts, 0.008, 3)
    # Sanity on the structure itself, not just oracle agreement: chain
    # endpoints see only 2 points (self + 1) so they are border, and the
    # cluster label is the minimum CORE id (1 for chain A, 11 for chain B).
    assert got[2] == ("core", 1)
    assert got[0] == ("border", 1)
    assert got[12] == ("core", 11)
    assert got[20] == ("noise", None) and got[30] == ("noise", None)


def test_dbscan_random_matches_naive(spark):
    rng = random.Random(42)
    pts = {i: (rng.uniform(-1, 1), rng.uniform(-1, 1)) for i in range(150)}
    eps, min_pts = 0.18, 4
    assert _run(spark, pts, eps, min_pts) == _naive_dbscan(pts, eps, min_pts)


def test_dbscan_partitioning_invariant(spark):
    rng = random.Random(7)
    pts = {i: (rng.uniform(0, 2), rng.uniform(0, 2)) for i in range(120)}
    df = _pts_df(spark, pts)
    a = dbscan(df.repartition(1), 0.2, 3).collect()
    b = dbscan(df.repartition(37), 0.2, 3, salt=4).collect()
    key = lambda rows: sorted((r["point_id"], r["role"], r["label"]) for r in rows)
    assert key(a) == key(b)


def test_dbscan_hot_stack_single_cluster(spark):
    # 200 coincident points (the hot-cell worst case) + one far straggler:
    # all coincident points are core, one cluster labeled by the min id.
    pts = {i: (3.0, 3.0) for i in range(200)}
    pts[999] = (50.0, 50.0)
    got = _run(spark, pts, 0.01, 5, salt=8)
    assert got[999] == ("noise", None)
    for i in range(200):
        assert got[i] == ("core", 0)


# ---------------------------------------------------------------------------
# Gi* oracle
# ---------------------------------------------------------------------------


def _naive_gi(counts: dict[tuple[int, int], int], res: int, ring: int):
    n_cells = 1 << res
    vals = list(counts.values())
    n = len(vals)
    sx = sum(vals)
    sxx = sum(v * v for v in vals)
    out = {}
    for (x, y), v in counts.items():
        s_i = w_i = 0
        for (x2, y2), v2 in counts.items():
            dx = min((x2 - x) % n_cells, (x - x2) % n_cells)
            if dx <= ring and abs(y2 - y) <= ring:
                s_i += v2
                w_i += 1
        num = float(n * s_i - sx * w_i)
        var_term = float(n * sxx - sx * sx)
        w_term = float(n * w_i - w_i * w_i)
        den = math.sqrt(var_term * w_term / float(n - 1)) if n > 1 else 0.0
        gi = num / den if den > 0 else None
        out[cell_id(x, y, res)] = (v, s_i, w_i, gi)
    return out


RES = 8


def _dens_df(spark, counts):
    rows = [(cell_id(x, y, RES), v) for (x, y), v in counts.items()]
    return spark.createDataFrame(rows, "cell bigint, n_points bigint")


def test_gi_matches_naive(spark):
    counts = {(10, 10): 30, (11, 10): 25, (11, 11): 28, (12, 10): 4,
              (40, 40): 1, (41, 40): 2, (80, 9): 3, (0, 0): 5, (255, 0): 7}
    got = {r["cell"]: (r["x"], r["s_i"], r["w_i"], r["gi"])
           for r in getis_ord_gi(_dens_df(spark, counts), RES).collect()}
    want = _naive_gi(counts, RES, 1)
    assert set(got) == set(want)
    for c in want:
        assert got[c][:3] == want[c][:3]
        if want[c][3] is None:
            assert got[c][3] is None
        else:
            assert got[c][3] == pytest.approx(want[c][3], rel=1e-12)


def test_gi_hotspot_ranks_highest(spark):
    # A dense 3x3 blob against sparse background: the blob center has the
    # top Gi* score.
    counts = {(x, y): 50 for x in (20, 21, 22) for y in (20, 21, 22)}
    for i in range(30):
        counts[(60 + 3 * i, 100)] = 1
    rows = getis_ord_gi(_dens_df(spark, counts), RES).collect()
    top = max(rows, key=lambda r: r["gi"])
    assert top["cell"] == cell_id(21, 21, RES)
    assert top["gi"] > 2.0


def test_gi_zero_variance_null(spark):
    counts = {(5, 5): 4, (9, 9): 4, (100, 100): 4}
    rows = getis_ord_gi(_dens_df(spark, counts), RES).collect()
    assert all(r["gi"] is None for r in rows)


def test_gi_from_cell_density(spark):
    # End-to-end from raw points: bin then score; integer pieces exact.
    rng = random.Random(3)
    pts = [(rng.uniform(-10, 10), rng.uniform(-10, 10)) for _ in range(400)]
    pts += [(0.01 * rng.random(), 0.01 * rng.random()) for _ in range(200)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    dens = cell_density(df, RES)
    rows = getis_ord_gi(dens, RES).collect()
    binned = {}
    for lon, lat in pts:
        n = 1 << RES
        x = min(n - 1, max(0, int((lon + 180.0) / 360.0 * n)))
        y = min(n - 1, max(0, int((lat + 90.0) / 180.0 * n)))
        binned[(x, y)] = binned.get((x, y), 0) + 1
    want = _naive_gi(binned, RES, 1)
    got = {r["cell"]: (r["x"], r["s_i"], r["w_i"]) for r in rows}
    assert got == {c: v[:3] for c, v in want.items()}


# ---------------------------------------------------------------------------
# Moran's I oracle (classic textbook formula, independent of the engine's
# integer-scaled rearrangement)
# ---------------------------------------------------------------------------


def _naive_moran(counts: dict[tuple[int, int], int], res: int, ring: int):
    n_cells = 1 << res
    cells = sorted(counts)
    n = len(cells)
    vals = [counts[c] for c in cells]
    xbar = sum(vals) / n

    def w(a, b):
        if a == b:
            return 0
        dx = min((b[0] - a[0]) % n_cells, (a[0] - b[0]) % n_cells)
        return 1 if dx <= ring and abs(b[1] - a[1]) <= ring else 0

    W = sum(w(a, b) for a in cells for b in cells)
    num = sum(
        w(a, b) * (counts[a] - xbar) * (counts[b] - xbar)
        for a in cells for b in cells
    )
    den = sum((v - xbar) ** 2 for v in vals)
    i_val = (n / W) * num / den if W > 0 and den > 0 else None
    e_i = -1.0 / (n - 1) if n > 1 else None
    degs = [sum(w(a, b) for b in cells) for a in cells]
    s1 = 2 * W
    s2 = sum((2 * d) ** 2 for d in degs)
    var_n = None
    if W > 0 and n > 2:
        var_n = (n * n * s1 - n * s2 + 3 * W * W) / (W * W * (n * n - 1)) \
            - e_i * e_i
    z = (i_val - e_i) / math.sqrt(var_n) \
        if var_n is not None and var_n > 0 and i_val is not None else None
    return {"n": n, "w": W, "s1": s1, "s2": s2,
            "moran_i": i_val, "e_i": e_i, "z": z}


def _run_moran(spark, counts, ring=1):
    from osm2geojson_lite_spark.spatial import morans_i
    [row] = morans_i(_dens_df(spark, counts), RES, ring=ring).collect()
    return row


def test_moran_clustered_field(spark):
    # A hot blob next to cold sparse cells: strong positive autocorrelation.
    counts = {(x, y): 40 + x + y for x in (30, 31, 32) for y in (30, 31, 32)}
    for i in range(12):
        counts[(90 + 2 * i, 200)] = 1 + (i % 3)
    row = _run_moran(spark, counts)
    want = _naive_moran(counts, RES, 1)
    assert (row["n"], row["w"], row["s1"], row["s2"]) == \
        (want["n"], want["w"], want["s1"], want["s2"])
    assert row["t"] == row["d"]  # weight-matrix symmetry holds on the grid
    assert row["moran_i"] == pytest.approx(want["moran_i"], rel=1e-12)
    assert row["e_i"] == pytest.approx(want["e_i"], rel=1e-12)
    assert row["z"] == pytest.approx(want["z"], rel=1e-12)
    assert row["moran_i"] > row["e_i"] and row["z"] > 2.0


def test_moran_dispersed_checkerboard(spark):
    # Alternating high/low on a connected block: negative autocorrelation.
    counts = {(x, y): (10 if (x + y) % 2 == 0 else 1)
              for x in range(50, 56) for y in range(50, 56)}
    row = _run_moran(spark, counts)
    want = _naive_moran(counts, RES, 1)
    assert row["moran_i"] == pytest.approx(want["moran_i"], rel=1e-12)
    assert row["z"] == pytest.approx(want["z"], rel=1e-12)
    assert row["moran_i"] < want["e_i"]  # more dispersed than random


def test_moran_random_field_matches_naive(spark):
    rng = random.Random(11)
    counts = {}
    while len(counts) < 60:
        counts[(rng.randrange(0, 100), rng.randrange(0, 100))] = \
            rng.randrange(1, 50)
    for ring in (1, 2):
        row = _run_moran(spark, counts, ring=ring)
        want = _naive_moran(counts, RES, ring)
        assert (row["n"], row["w"], row["s1"], row["s2"]) == \
            (want["n"], want["w"], want["s1"], want["s2"])
        for k in ("moran_i", "e_i", "z"):
            if want[k] is None:
                assert row[k] is None
            else:
                assert row[k] == pytest.approx(want[k], rel=1e-12)


def test_moran_degenerate_cases(spark):
    # No neighboring pair: W = 0 -> I and z null.
    row = _run_moran(spark, {(0, 0): 5, (50, 50): 9, (100, 100): 2})
    assert row["w"] == 0 and row["moran_i"] is None and row["z"] is None
    # Constant field: variance 0 -> I null (W > 0 though).
    row = _run_moran(spark, {(10, 10): 4, (10, 11): 4, (11, 10): 4})
    assert row["w"] > 0 and row["moran_i"] is None


def test_moran_partitioning_invariant(spark):
    counts = {(x, y): 1 + ((x * 7 + y) % 9)
              for x in range(20, 28) for y in range(40, 46)}
    df = _dens_df(spark, counts)
    from osm2geojson_lite_spark.spatial import morans_i
    [a] = morans_i(df.repartition(1), RES).collect()
    [b] = morans_i(df.repartition(29), RES).collect()
    assert a == b  # bit-identical, not approx: exact-integer inputs
