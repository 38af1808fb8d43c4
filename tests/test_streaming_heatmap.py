"""Streaming k-ring heatmap: windowed scatter-sum == batch smooth."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from osm2geojson_lite_spark.spatial import cell_col, cell_density, kring_smooth
from osm2geojson_lite_spark.streaming.tile_stats import (
    EVENT_SCHEMA,
    stream_tile_heatmap,
)


def test_streaming_heatmap_matches_batch_smooth(spark, tmp_path):
    """Per finalized window, the streaming scatter-then-sum surface equals
    kring_smooth(cell_density(...)) of that window's events on w_sum (the
    linearity argument in the docstring), and late rows are dropped."""
    inp = str(tmp_path / "hm_in")
    outp = str(tmp_path / "hm_out")
    ckpt = str(tmp_path / "hm_ckpt")
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + datetime.timedelta(minutes=i % 40),
         -10.0 + (i % 9) * 0.5, 40.0 + (i % 7) * 0.25)
        for i in range(120)
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.parquet(inp)

    q = stream_tile_heatmap(spark, inp, outp, ckpt, res=7, ring=1,
                            window="10 minutes")
    q.awaitTermination(120)
    # advance the watermark so earlier windows finalize and emit
    late = [(999, base + datetime.timedelta(hours=2), 0.0, 0.0)]
    spark.createDataFrame(late, EVENT_SCHEMA).write.mode("append").parquet(inp)
    q2 = stream_tile_heatmap(spark, inp, outp, ckpt, res=7, ring=1,
                             window="10 minutes")
    q2.awaitTermination(120)
    got = spark.read.parquet(outp)
    got_windows = {r["window_start"] for r in got.select("window_start").distinct().collect()}
    assert got_windows  # at least one window finalized

    batch = spark.createDataFrame(rows, EVENT_SCHEMA).withColumn(
        "w", F.window("ts", "10 minutes")["start"])
    for w0 in got_windows:
        ev = batch.filter(F.col("w") == F.lit(w0)).select("lon", "lat")
        want = {r["cell"]: r["w_sum"]
                for r in kring_smooth(cell_density(ev, 7), 7, ring=1).collect()}
        have = {r["cell"]: r["w_sum"]
                for r in got.filter(F.col("window_start") == F.lit(w0)).collect()}
        assert have == want, w0
