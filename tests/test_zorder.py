"""Z-order layout keys: round-trip, bounds, locality, file-range layout."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from osm2geojson_lite_spark.spatial.zorder import (
    zorder_decode_col, zorder_key_col, zorder_layout,
)

BITS = 16


def _pts(spark, n=400, seed=11):
    rng = random.Random(seed)
    rows = [(i, rng.uniform(-180, 180), rng.uniform(-90, 90))
            for i in range(n)]
    return spark.createDataFrame(rows, "pid bigint, lon double, lat double")


def test_zorder_roundtrip_and_bounds(spark):
    df = _pts(spark).select(
        "lon", "lat",
        zorder_key_col(F.col("lon"), F.col("lat"), bits=BITS).alias("zkey"),
    ).withColumn("xy", zorder_decode_col(F.col("zkey"), bits=BITS))
    n = 1 << BITS
    for r in df.collect():
        assert 0 <= r["zkey"] < 1 << (2 * BITS)
        x = min(n - 1, max(0, int((r["lon"] + 180.0) / 360.0 * n)))
        y = min(n - 1, max(0, int((r["lat"] + 90.0) / 180.0 * n)))
        assert (r["xy"]["x"], r["xy"]["y"]) == (x, y)


def test_zorder_edges_clamp(spark):
    df = spark.createDataFrame(
        [(180.0, 90.0), (-180.0, -90.0), (200.0, 95.0), (-200.0, -95.0)],
        "lon double, lat double",
    ).select(zorder_key_col(F.col("lon"), F.col("lat"), bits=BITS)
             .alias("zkey"))
    ks = [r["zkey"] for r in df.collect()]
    assert all(0 <= k < 1 << (2 * BITS) for k in ks)
    assert ks[0] == (1 << (2 * BITS)) - 1   # top-right corner, clamped
    assert ks[1] == 0                        # bottom-left corner
    assert ks[2] == ks[0] and ks[3] == ks[1]  # out-of-range clamps


def test_zorder_sort_is_local(spark):
    """The point of the curve: z-sorted neighbors are spatially near.
    Mean grid distance between consecutive z-sorted rows must beat the
    id-ordered (random) baseline by a wide margin."""
    df = _pts(spark, n=600).select(
        "pid",
        zorder_key_col(F.col("lon"), F.col("lat"), bits=BITS).alias("zkey"),
    ).withColumn("xy", zorder_decode_col(F.col("zkey"), bits=BITS))
    rows = [(r["pid"], r["zkey"], r["xy"]["x"], r["xy"]["y"])
            for r in df.collect()]

    def mean_step(seq):
        return sum(abs(a[2] - b[2]) + abs(a[3] - b[3])
                   for a, b in zip(seq, seq[1:])) / (len(seq) - 1)

    z_sorted = sorted(rows, key=lambda r: r[1])
    id_sorted = sorted(rows, key=lambda r: r[0])
    assert mean_step(z_sorted) * 5 < mean_step(id_sorted)


def test_zorder_layout_files_cover_disjoint_ranges(spark, tmp_path):
    """repartitionByRange + sortWithinPartitions = every output file owns
    one tight key range — the property parquet min/max skipping needs."""
    out = str(tmp_path / "zlayout")
    zorder_layout(_pts(spark, n=2000), bits=BITS, num_files=8) \
        .write.parquet(out)
    got = (
        spark.read.parquet(out)
        .withColumn("f", F.input_file_name())
        .groupBy("f").agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"),
                          F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(got) >= 4                      # actually split across files
    spans = sorted((r["lo"], r["hi"]) for r in got)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next             # non-overlapping ranges
    # and the data survived intact
    assert sum(r["n"] for r in got) == 2000
