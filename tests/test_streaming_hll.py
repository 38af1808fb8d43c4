"""Streaming HLL tile-distinct: windowed register max == batch sketch,
and streamed registers merge/estimate exactly like batch ones."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from osm2geojson_lite_spark.pipeline.sketch import (
    hll_estimate, hll_merge, hll_sketch,
)
from osm2geojson_lite_spark.spatial import cell_col
from osm2geojson_lite_spark.streaming.tile_stats import (
    EVENT_SCHEMA,
    stream_tile_distinct,
)

P = 6


def test_streaming_registers_match_batch_sketch(spark, tmp_path):
    inp = str(tmp_path / "hll_in")
    outp = str(tmp_path / "hll_out")
    ckpt = str(tmp_path / "hll_ckpt")
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i % 70, base + datetime.timedelta(minutes=i % 40),  # repeat ids
         -10.0 + (i % 5) * 0.5, 40.0 + (i % 3) * 0.25)
        for i in range(400)
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.parquet(inp)

    q = stream_tile_distinct(spark, inp, outp, ckpt, res=7, p=P,
                             window="10 minutes")
    q.awaitTermination(120)
    # advance the watermark so earlier windows finalize and emit
    late = [(999, base + datetime.timedelta(hours=2), 0.0, 0.0)]
    spark.createDataFrame(late, EVENT_SCHEMA).write.mode("append").parquet(inp)
    q2 = stream_tile_distinct(spark, inp, outp, ckpt, res=7, p=P,
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
        want = {(r["cell"], r["j"]): r["rho"]
                for r in hll_sketch(ev, ["cell"], "event_id", p=P).collect()}
        have = {(r["cell"], r["j"]): r["rho"]
                for r in got.filter(F.col("window_start") == F.lit(w0))
                .collect()}
        assert have == want, w0  # byte-identical registers

    # streamed registers are first-class mergeable sketches: rolling all
    # finalized windows up to the cell level estimates the same as a
    # batch sketch over exactly those windows' events
    fin = got.withColumnRenamed("window_start", "ws")
    merged = hll_merge(fin.select("cell", "j", "rho"), ["cell"])
    est_stream = {r["cell"]: r["distinct_est"]
                  for r in hll_estimate(merged, ["cell"], p=P).collect()}
    ev_fin = batch.filter(
        F.col("w").isin([F.lit(w) for w in got_windows]))
    est_batch = {r["cell"]: r["distinct_est"]
                 for r in hll_estimate(
                     hll_sketch(ev_fin, ["cell"], "event_id", p=P),
                     ["cell"], p=P).collect()}
    assert est_stream == est_batch
