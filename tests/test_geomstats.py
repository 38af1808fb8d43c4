"""Ring statistics vs known shapes and a pure-python shoelace oracle."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from osm2geojson_lite_spark.spatial import (
    ring_area_col,
    ring_bbox_cols,
    ring_centroid_cols,
    ring_perimeter_col,
    ring_signed_area_col,
)


def _stats(spark, ring):
    df = spark.createDataFrame([(ring,)], "ring array<array<double>>")
    r = F.col("ring")
    cx, cy = ring_centroid_cols(r)
    x0, y0, x1, y1 = ring_bbox_cols(r)
    return df.select(
        ring_signed_area_col(r).alias("signed"),
        ring_area_col(r).alias("area"),
        ring_perimeter_col(r).alias("perim"),
        cx.alias("cx"), cy.alias("cy"),
        x0.alias("x0"), y0.alias("y0"), x1.alias("x1"), y1.alias("y1"),
    ).collect()[0]


def test_unit_square_ccw(spark):
    s = _stats(spark, [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]])
    assert s["signed"] == 1.0 and s["area"] == 1.0 and s["perim"] == 4.0
    assert (s["cx"], s["cy"]) == (0.5, 0.5)
    assert (s["x0"], s["y0"], s["x1"], s["y1"]) == (0.0, 0.0, 1.0, 1.0)


def test_clockwise_is_negative(spark):
    s = _stats(spark, [[0.0, 0.0], [0.0, 2.0], [2.0, 2.0], [2.0, 0.0], [0.0, 0.0]])
    assert s["signed"] == -4.0 and s["area"] == 4.0


def test_translated_l_shape_centroid(spark):
    # L-shape: area 3, centroid known analytically
    ring = [[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2], [0, 0]]
    ring = [[float(x) + 10.0, float(y) - 5.0] for x, y in ring]
    s = _stats(spark, ring)
    assert abs(s["area"] - 3.0) < 1e-12
    assert abs(s["cx"] - (10.0 + 5.0 / 6.0)) < 1e-12
    assert abs(s["cy"] - (-5.0 + 5.0 / 6.0)) < 1e-12


def _py_shoelace(ring):
    sgn = sum(ring[i - 1][0] * ring[i][1] - ring[i][0] * ring[i - 1][1]
              for i in range(1, len(ring))) / 2.0
    per = sum(math.hypot(ring[i][0] - ring[i - 1][0], ring[i][1] - ring[i - 1][1])
              for i in range(1, len(ring)))
    return sgn, per


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.tuples(st.floats(-1000, 1000, allow_nan=False),
              st.floats(-1000, 1000, allow_nan=False)),
    min_size=3, max_size=12,
))
def test_matches_python_shoelace(spark, pts):
    ring = [[float(x), float(y)] for x, y in pts] + [[float(pts[0][0]), float(pts[0][1])]]
    s = _stats(spark, ring)
    sgn, per = _py_shoelace(ring)
    assert abs(s["signed"] - sgn) < 1e-6 * max(1.0, abs(sgn))
    assert abs(s["perim"] - per) < 1e-6 * max(1.0, per)
