"""Streaming co-location join vs its batch twin (spatial.colocation_join)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from osm2geojson_lite_spark.spatial import colocation_join
from osm2geojson_lite_spark.streaming.colocate import stream_colocation_pairs

BASE = dt.datetime(2024, 1, 1)
SCHEMA = "pid bigint, lon double, lat double, ts timestamp"


def _rows(seed, n, id0):
    # dense 2x1-degree patch, 2h span, fractional-second timestamps so the
    # truncated-epoch dt_s differs from the raw timestamp delta (exercises
    # the tau+1 band widening)
    rng = random.Random(seed)
    return [(id0 + i, rng.uniform(0.0, 2.0), rng.uniform(0.0, 1.0),
             BASE + dt.timedelta(seconds=rng.uniform(0, 7200)))
            for i in range(n)]


def _batch_pairs(spark, lrows, rrows, radius, tau):
    ldf = spark.createDataFrame(lrows, SCHEMA).select(
        F.col("pid").alias("lid"), "lon", "lat",
        F.col("ts").cast("long").alias("t"))
    rdf = spark.createDataFrame(rrows, SCHEMA).select(
        F.col("pid").alias("rid"), "lon", "lat",
        F.col("ts").cast("long").alias("t"))
    out = colocation_join(ldf, rdf, radius, tau, left_id="lid",
                          right_id="rid", l_ts="t", r_ts="t")
    return {(r["left_id"], r["right_id"], round(r["dist2"], 12), r["dt_s"])
            for r in out.collect()}


def _run_stream(spark, lin, rin, outp, ckpt, radius, tau):
    q = (stream_colocation_pairs(
            spark.readStream.schema(SCHEMA).parquet(lin),
            spark.readStream.schema(SCHEMA).parquet(rin),
            radius, tau, left_id="pid", right_id="pid",
            watermark="4 hours")
         .writeStream.format("parquet")
         .option("path", outp).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(240)
    return {(r["left_id"], r["right_id"], round(r["dist2"], 12), r["dt_s"])
            for r in spark.read.parquet(outp).collect()}


def test_stream_colocate_matches_batch(spark, tmp_path):
    lrows, rrows = _rows(1, 150, 0), _rows(2, 150, 10_000)
    want = _batch_pairs(spark, lrows, rrows, 0.4, 600)
    assert len(want) > 20  # non-degenerate panel

    lin, rin = str(tmp_path / "l"), str(tmp_path / "r")
    outp, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    spark.createDataFrame(lrows, SCHEMA).write.parquet(lin)
    spark.createDataFrame(rrows, SCHEMA).write.parquet(rin)
    got = _run_stream(spark, lin, rin, outp, ckpt, 0.4, 600)
    assert got == want

    # incremental micro-batch: appended left pings join the existing right
    # state through the checkpoint; union equals the batch join on the
    # grown input
    l2 = _rows(3, 40, 5_000)
    spark.createDataFrame(l2, SCHEMA).write.mode("append").parquet(lin)
    got2 = _run_stream(spark, lin, rin, outp, ckpt, 0.4, 600)
    want2 = _batch_pairs(spark, lrows + l2, rrows, 0.4, 600)
    assert got2 == want2
    assert len(want2) > len(want)


def test_truncation_band_edge(spark, tmp_path):
    # raw timestamp delta 600.5 s > tau=600 but truncated dt_s = 600 <= tau:
    # the pair MUST be emitted (the tau+1 band keeps it joinable), exactly
    # as the batch operator keeps it
    lrows = [(1, 0.5, 0.5,
              BASE + dt.timedelta(seconds=600, milliseconds=400)),
             (3, 0.6, 0.5,
              BASE + dt.timedelta(seconds=601, milliseconds=400))]
    rrows = [(2, 0.5, 0.5, BASE + dt.timedelta(milliseconds=900)),
             (4, 0.6, 0.5, BASE + dt.timedelta(milliseconds=100))]
    # pid 1 vs pid 2: raw delta 599.5 s, truncated 600 - 0 = 600 <= 600: IN
    # pid 1 vs pid 4: raw delta 600.3 s, truncated 600 - 0 = 600 <= 600: IN
    #   (raw > tau — only the tau+1 band keeps it joinable)
    # pid 3 vs pid 2: raw delta 600.5 s, truncated 601 - 0 = 601 > 600: OUT
    # pid 3 vs pid 4: raw delta 601.3 s, truncated 601 - 0 = 601 > 600: OUT

    want = _batch_pairs(spark, lrows, rrows, 0.4, 600)
    lin, rin = str(tmp_path / "l"), str(tmp_path / "r")
    outp, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    spark.createDataFrame(lrows, SCHEMA).write.parquet(lin)
    spark.createDataFrame(rrows, SCHEMA).write.parquet(rin)
    got = _run_stream(spark, lin, rin, outp, ckpt, 0.4, 600)
    assert got == want
    pairs = {(a, b) for a, b, _, _ in got}
    assert (1, 4) in pairs and (3, 2) not in pairs and (3, 4) not in pairs


def test_validation(spark, tmp_path):
    p = str(tmp_path / "empty")
    spark.createDataFrame([], SCHEMA).write.parquet(p)
    s = spark.readStream.schema(SCHEMA).parquet(p)
    with pytest.raises(ValueError, match="tau_s"):
        stream_colocation_pairs(s, s, 0.4, 0, left_id="pid", right_id="pid")
    with pytest.raises(ValueError, match="disk would miss"):
        stream_colocation_pairs(s, s, 5.0, 60, left_id="pid",
                                right_id="pid", res=12)
