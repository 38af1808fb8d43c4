"""ks_drift vs an exact python oracle over hist_sketch registers."""

from __future__ import annotations

import math
import random

from osm2geojson_lite_spark.pipeline.sketch import hist_sketch, ks_drift

LO, HI, BINS = 0.0, 100.0, 32


def _bin(v):
    return max(0, min(BINS - 1, math.floor((v - LO) / (HI - LO) * BINS)))


def _naive_ks(xs, ys):
    if not xs or not ys:
        return 1.0
    ca = [0] * BINS
    cb = [0] * BINS
    for v in xs:
        ca[_bin(v)] += 1
    for v in ys:
        cb[_bin(v)] += 1
    na, nb, cum_a, cum_b, best = len(xs), len(ys), 0, 0, 0.0
    for i in range(BINS):
        cum_a += ca[i]
        cum_b += cb[i]
        if ca[i] or cb[i]:
            best = max(best, abs(cum_a / na - cum_b / nb))
    return best


def _regs(spark, rows):
    df = spark.createDataFrame(rows, "g string, v double")
    return hist_sketch(df, ["g"], "v", lo=LO, hi=HI, bins=BINS)


def test_matches_python_oracle(spark):
    rng = random.Random(11)
    a = [("x", rng.uniform(0, 100)) for _ in range(400)] + \
        [("y", rng.gauss(30, 5)) for _ in range(300)]
    b = [("x", rng.uniform(0, 100)) for _ in range(350)] + \
        [("y", rng.gauss(60, 5)) for _ in range(250)]
    got = {r["g"]: (r["n_a"], r["n_b"], r["ks"])
           for r in ks_drift(_regs(spark, a), _regs(spark, b), ["g"]).collect()}
    for g in ("x", "y"):
        xs = [v for k, v in a if k == g]
        ys = [v for k, v in b if k == g]
        assert got[g] == (len(xs), len(ys), _naive_ks(xs, ys))
    assert got["y"][2] > 0.9 > got["x"][2]   # planted shift vs same dist


def test_identical_distributions_ks_zero(spark):
    rows = [("g", float(i % 50)) for i in range(500)]
    out = ks_drift(_regs(spark, rows), _regs(spark, rows), ["g"]).collect()
    assert [(r["n_a"], r["n_b"], r["ks"]) for r in out] == [(500, 500, 0.0)]


def test_missing_side_is_total_drift(spark):
    a = [("only_a", 5.0), ("both", 5.0)]
    b = [("both", 5.0)]
    got = {r["g"]: r["ks"]
           for r in ks_drift(_regs(spark, a), _regs(spark, b), ["g"]).collect()}
    assert got["only_a"] == 1.0 and got["both"] == 0.0


def test_partitioning_invariance(spark):
    rng = random.Random(3)
    a = [("g", rng.uniform(0, 100)) for _ in range(300)]
    b = [("g", rng.gauss(50, 20)) for _ in range(300)]
    ra, rb = _regs(spark, a), _regs(spark, b)
    x = sorted(map(tuple, ks_drift(ra, rb, ["g"]).collect()))
    y = sorted(map(tuple,
                   ks_drift(ra.repartition(13), rb.repartition(7),
                            ["g"]).collect()))
    assert x == y
