"""Streaming k-mins tile sketch: windowed register min == batch sketch,
and streamed minima feed kmv_merge / kmv_set_ops exactly like batch ones."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from osm2geojson_lite_spark.pipeline.sketch import (
    kmv_merge, kmv_set_ops, kmv_sketch,
)
from osm2geojson_lite_spark.spatial import cell_col
from osm2geojson_lite_spark.streaming.tile_stats import (
    EVENT_SCHEMA,
    stream_tile_minima,
)

K = 8


def test_streaming_minima_match_batch_sketch(spark, tmp_path):
    inp = str(tmp_path / "kmv_in")
    outp = str(tmp_path / "kmv_out")
    ckpt = str(tmp_path / "kmv_ckpt")
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i % 70, base + datetime.timedelta(minutes=i % 40),  # repeat ids
         -10.0 + (i % 5) * 0.5, 40.0 + (i % 3) * 0.25)
        for i in range(400)
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.parquet(inp)

    q = stream_tile_minima(spark, inp, outp, ckpt, res=7, k=K,
                           window="10 minutes")
    q.awaitTermination(120)
    # advance the watermark so earlier windows finalize and emit
    late = [(999, base + datetime.timedelta(hours=2), 0.0, 0.0)]
    spark.createDataFrame(late, EVENT_SCHEMA).write.mode("append").parquet(inp)
    q2 = stream_tile_minima(spark, inp, outp, ckpt, res=7, k=K,
                            window="10 minutes")
    q2.awaitTermination(120)

    got = spark.read.parquet(outp)
    got_windows = {r["window_start"]
                   for r in got.select("window_start").distinct().collect()}
    assert got_windows

    batch = (
        spark.createDataFrame(rows, EVENT_SCHEMA)
        .withColumn("w", F.window("ts", "10 minutes")["start"])
        .withColumn("cell", cell_col(F.col("lon"), F.col("lat"), 7))
    )
    for w0 in got_windows:
        ev = batch.filter(F.col("w") == F.lit(w0))
        want = {(r["cell"], r["i"]): r["mn"]
                for r in kmv_sketch(ev, ["cell"], "event_id", k=K).collect()}
        have = {(r["cell"], r["i"]): r["mn"]
                for r in got.filter(F.col("window_start") == F.lit(w0))
                .collect()}
        assert have == want, w0  # byte-identical registers

    # streamed minima are first-class sketches: (a) rolling all finalized
    # windows up to the cell level matches the batch sketch over exactly
    # those windows' events; (b) set-ops between two finalized windows run
    # directly on the streamed tables and match batch-built sketches
    merged = {(r["cell"], r["i"]): r["mn"] for r in kmv_merge(
        got.select("cell", "i", "mn"), ["cell"]).collect()}
    ev_fin = batch.filter(F.col("w").isin([F.lit(w) for w in got_windows]))
    direct = {(r["cell"], r["i"]): r["mn"] for r in kmv_sketch(
        ev_fin, ["cell"], "event_id", k=K).collect()}
    assert merged == direct

    ws = sorted(got_windows)[:2]
    if len(ws) == 2:
        a = got.filter(F.col("window_start") == F.lit(ws[0])) \
            .select("cell", "i", "mn")
        b = got.filter(F.col("window_start") == F.lit(ws[1])) \
            .select("cell", "i", "mn")
        got_ops = sorted(map(tuple, kmv_set_ops(a, b, ["cell"],
                                                k=K).collect()))
        ba = kmv_sketch(batch.filter(F.col("w") == F.lit(ws[0])),
                        ["cell"], "event_id", k=K)
        bb = kmv_sketch(batch.filter(F.col("w") == F.lit(ws[1])),
                        ["cell"], "event_id", k=K)
        want_ops = sorted(map(tuple, kmv_set_ops(ba, bb, ["cell"],
                                                 k=K).collect()))
        assert got_ops == want_ops
