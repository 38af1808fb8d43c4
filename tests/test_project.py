"""Random projection — python-oracle parity, JL distance preservation,
inner-product unbiasedness (statistical), partitioning invariance."""

from __future__ import annotations

import math

import numpy as np
import pytest

from osm2geojson_lite_spark.pipeline import projection_signs, random_projection


def _vecs(n=120, d=64, seed=3):
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n, d)).round(4)


def _py_project(X, k, salt="rp"):
    S = np.asarray(projection_signs(k, X.shape[1], salt=salt))
    out = np.empty((X.shape[0], k))
    scale = 1.0 / math.sqrt(k)
    for r in range(X.shape[0]):
        for j in range(k):
            acc = 0.0
            for i in range(X.shape[1]):
                acc += float(X[r, i]) * S[j, i]
            out[r, j] = round(scale * acc, 9)
    return out


def _df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>")


def test_matches_python_oracle_and_partitioning(spark):
    X = _vecs(n=40)
    want = _py_project(X, 16)
    for parts in (1, 9):
        got = {r.vec_id: r.proj for r in
               random_projection(_df(spark, X).repartition(parts),
                                 k=16, dims=64).collect()}
        for i in range(40):
            assert got[i] == list(want[i])


def test_jl_distance_preservation(spark):
    # 64 -> 24 dims: median pairwise-distance distortion stays tight and
    # no pair explodes (JL concentration; sign projection per Achlioptas)
    X = _vecs(n=80)
    Y = _py_project(X, 24)
    got = {r.vec_id: np.asarray(r.proj) for r in
           random_projection(_df(spark, X), k=24, dims=64).collect()}
    ratios = []
    for i in range(0, 80, 3):
        for j in range(i + 1, 80, 7):
            d0 = np.linalg.norm(X[i] - X[j])
            d1 = np.linalg.norm(got[i] - got[j])
            assert np.allclose(got[i], Y[i])
            ratios.append(d1 / d0)
    ratios = np.asarray(ratios)
    assert abs(np.median(ratios) - 1.0) < 0.1
    assert ratios.max() < 1.8 and ratios.min() > 0.45


def test_signs_are_balanced_and_deterministic():
    S = np.asarray(projection_signs(16, 64))
    assert S.shape == (16, 64) and set(np.unique(S)) == {-1.0, 1.0}
    assert abs(S.mean()) < 0.1                       # fair coin
    assert (S == np.asarray(projection_signs(16, 64))).all()
    assert (S != np.asarray(projection_signs(16, 64, salt="rp2"))).any()


def test_validation(spark):
    with pytest.raises(ValueError):
        random_projection(_df(spark, _vecs(n=2)), k=0, dims=64)
