"""Zonal statistics: known zones + values, naive-python parity."""

from __future__ import annotations

import json

from osm2geojson_lite_spark.spatial import zonal_stats


def _sq_json(x0, y0, x1, y1):
    return json.dumps([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])


def test_zonal_counts_sums_means(spark):
    pts = [(str(i), float(i % 10), float(i % 7), i) for i in range(50)]
    points = spark.createDataFrame(
        pts, "point_id string, lon double, lat double, value long")
    polys = spark.createDataFrame(
        [("west", _sq_json(-0.5, -0.5, 4.5, 8.5)),
         ("east", _sq_json(4.5, -0.5, 10.5, 8.5)),
         ("empty", _sq_json(50.0, 50.0, 60.0, 60.0))],
        "poly_id string, ring_json string")
    out = {r["poly_id"]: r for r in zonal_stats(points, polys, res=7).collect()}

    def agg(pred):
        vs = [v for _, x, y, v in pts if pred(x, y)]
        return (len(vs), sum(vs), min(vs), max(vs), round(sum(vs) / len(vs), 9))

    # the half-open ray cast counts [x0, x1) x [y0, y1)-ish; use strict
    # interior points only (all test points are >= 0.5 from every edge)
    w = agg(lambda x, y: x < 4.5 and y < 8.5)
    e = agg(lambda x, y: x > 4.5)
    assert (out["west"]["n_points"], out["west"]["sum_value"],
            out["west"]["min_value"], out["west"]["max_value"],
            out["west"]["mean_value"]) == w
    assert (out["east"]["n_points"], out["east"]["sum_value"],
            out["east"]["min_value"], out["east"]["max_value"],
            out["east"]["mean_value"]) == e
    assert "empty" not in out  # zones with no points are absent
    assert out["west"]["n_points"] + out["east"]["n_points"] == 50
