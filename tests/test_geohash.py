"""Geohash — classic vectors, reference-implementation parity, prefix
nesting, clamping, validation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2geojson_lite_spark.spatial import geohash_col, py_geohash


def _encode(spark, pts, precision):
    df = spark.createDataFrame(
        [(i, float(lon), float(lat)) for i, (lon, lat) in enumerate(pts)],
        "id long, lon double, lat double")
    out = df.select("id", geohash_col(F.col("lon"), F.col("lat"),
                                      precision=precision).alias("gh"))
    return {r.id: r.gh for r in out.collect()}


def test_classic_vectors(spark):
    pts = [(-5.6, 42.6), (-0.1257, 51.5074), (139.6917, 35.6895)]
    got = _encode(spark, pts, 5)
    assert got[0] == "ezs42"                        # Niemeyer's example
    assert got[1] == py_geohash(-0.1257, 51.5074, 5) == "gcpvj"
    assert got[2] == py_geohash(139.6917, 35.6895, 5)


@pytest.mark.parametrize("precision", [1, 6, 8, 11, 12])
def test_matches_reference_implementation(spark, precision):
    rng = np.random.RandomState(31)
    pts = [(round(float(x), 4), round(float(y), 4))
           for x, y in zip(rng.uniform(-179.9, 179.9, 150),
                           rng.uniform(-89.9, 89.9, 150))]
    got = _encode(spark, pts, precision)
    for i, (lon, lat) in enumerate(pts):
        assert got[i] == py_geohash(lon, lat, precision), (lon, lat)


def test_prefix_nesting_and_clamp(spark):
    # nearby points share prefixes; a coarser hash IS the prefix
    pts = [(11.8801, 48.1201), (11.8802, 48.1202)]
    g8 = _encode(spark, pts, 8)
    g4 = _encode(spark, pts, 4)
    assert g8[0][:4] == g8[1][:4]
    assert g8[0].startswith(g4[0])
    # out-of-domain inputs clamp deterministically (match the clamped ref)
    got = _encode(spark, [(200.0, 95.0)], 6)
    assert got[0] == py_geohash(180.0, 90.0, 6)
    with pytest.raises(ValueError):
        geohash_col(F.lit(0.0), F.lit(0.0), precision=13)
