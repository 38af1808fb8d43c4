"""Hilbert layout keys: reference parity, curve continuity, clamps,
locality vs Z-order, layout file ranges."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from osm2geojson_lite_spark.spatial.hilbert import (
    hilbert_key_col, hilbert_layout, hilbert_xy2d,
)
from osm2geojson_lite_spark.spatial.zorder import zorder_key_col

BITS = 16


def _ref_xy2d(bits: int, x: int, y: int) -> int:
    """Textbook iterative xy->d (rotate/reflect the suffix) — the
    independent reference the automaton must reproduce."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_automaton_matches_reference_scalar():
    rng = random.Random(3)
    for bits in (1, 2, 4, 8, 16):
        n = 1 << bits
        for _ in range(300):
            x, y = rng.randrange(n), rng.randrange(n)
            assert hilbert_xy2d(bits, x, y) == _ref_xy2d(bits, x, y)


def test_curve_is_continuous():
    """Defining Hilbert property (and what Z-order lacks): consecutive
    keys are always grid 4-neighbors — manhattan step exactly 1."""
    bits = 4
    n = 1 << bits
    by_key = {hilbert_xy2d(bits, x, y): (x, y)
              for x in range(n) for y in range(n)}
    assert len(by_key) == n * n  # bijective
    for k in range(n * n - 1):
        (x0, y0), (x1, y1) = by_key[k], by_key[k + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def _pts(spark, n=400, seed=11):
    rng = random.Random(seed)
    rows = [(i, rng.uniform(-180, 180), rng.uniform(-90, 90))
            for i in range(n)]
    return spark.createDataFrame(rows, "pid bigint, lon double, lat double")


def test_spark_column_matches_scalar(spark):
    df = _pts(spark).select(
        "lon", "lat",
        hilbert_key_col(F.col("lon"), F.col("lat"), bits=BITS).alias("hkey"),
    )
    n = 1 << BITS
    for r in df.collect():
        x = min(n - 1, max(0, int((r["lon"] + 180.0) / 360.0 * n)))
        y = min(n - 1, max(0, int((r["lat"] + 90.0) / 180.0 * n)))
        assert r["hkey"] == hilbert_xy2d(BITS, x, y)


def test_edges_clamp(spark):
    df = spark.createDataFrame(
        [(180.0, 90.0), (-180.0, -90.0), (200.0, 95.0), (-200.0, -95.0)],
        "lon double, lat double",
    ).select(hilbert_key_col(F.col("lon"), F.col("lat"), bits=BITS)
             .alias("hkey"))
    ks = [r["hkey"] for r in df.collect()]
    n = 1 << BITS
    assert all(0 <= k < n * n for k in ks)
    assert ks[0] == hilbert_xy2d(BITS, n - 1, n - 1)
    assert ks[1] == hilbert_xy2d(BITS, 0, 0)
    assert ks[2] == ks[0] and ks[3] == ks[1]


def test_locality_beats_id_order_and_zorder(spark):
    """Sort locality: mean grid distance between consecutive hilbert-
    sorted rows beats id order by a wide margin and is <= the z-order
    sort of the same points (Hilbert never takes Morton's diagonal
    jumps)."""
    df = _pts(spark, n=600).select(
        "pid", "lon", "lat",
        hilbert_key_col(F.col("lon"), F.col("lat"), bits=BITS).alias("hkey"),
        zorder_key_col(F.col("lon"), F.col("lat"), bits=BITS).alias("zkey"),
    )
    n = 1 << BITS
    rows = []
    for r in df.collect():
        x = min(n - 1, max(0, int((r["lon"] + 180.0) / 360.0 * n)))
        y = min(n - 1, max(0, int((r["lat"] + 90.0) / 180.0 * n)))
        rows.append((r["pid"], r["hkey"], r["zkey"], x, y))

    def mean_step(seq):
        return sum(abs(a[3] - b[3]) + abs(a[4] - b[4])
                   for a, b in zip(seq, seq[1:])) / (len(seq) - 1)

    h_sorted = sorted(rows, key=lambda r: r[1])
    z_sorted = sorted(rows, key=lambda r: r[2])
    id_sorted = sorted(rows, key=lambda r: r[0])
    assert mean_step(h_sorted) * 5 < mean_step(id_sorted)
    assert mean_step(h_sorted) <= mean_step(z_sorted)


def test_layout_files_cover_disjoint_ranges(spark, tmp_path):
    out = str(tmp_path / "hlayout")
    hilbert_layout(_pts(spark, n=1000), bits=BITS, num_files=4) \
        .write.parquet(out)
    got = (
        spark.read.parquet(out)
        .withColumn("f", F.input_file_name())
        .groupBy("f").agg(F.min("hkey").alias("lo"), F.max("hkey").alias("hi"),
                          F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(got) >= 3
    spans = sorted((r["lo"], r["hi"]) for r in got)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next
    assert sum(r["n"] for r in got) == 1000
