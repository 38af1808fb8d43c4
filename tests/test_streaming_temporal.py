"""Stream-stream interval join vs its batch twin (temporal.interval_join)."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from osm2geojson_lite_spark.streaming.temporal import stream_interval_join
from osm2geojson_lite_spark.temporal import interval_join

BASE = dt.datetime(2024, 1, 1)


def _rows(seed, n, id0):
    rng = random.Random(seed)
    return [(id0 + i, rng.randrange(5),
             BASE + dt.timedelta(seconds=rng.randrange(3600)))
            for i in range(n)]


def test_stream_interval_join_matches_batch(spark, tmp_path):
    lrows = _rows(1, 120, 0)
    rrows = _rows(2, 120, 1000)
    ldf = spark.createDataFrame(lrows, "lid bigint, k bigint, ts timestamp")
    rdf = spark.createDataFrame(rrows, "rid bigint, k bigint, ts timestamp")

    # batch twin on unix_micros (inclusive band [-300s, 0])
    lb = ldf.select("lid", "k", F.unix_micros("ts").alias("t"))
    rb = rdf.select("rid", "k", F.unix_micros("ts").alias("t"))
    want = {(r["lid"], r["rid_r"]) for r in interval_join(
        lb, rb, on="k", left_time="t", right_time="t",
        lower=-300_000_000, upper=0, right_values=["rid"]).collect()}
    assert want  # the seeds produce matches

    lin, rin = str(tmp_path / "l"), str(tmp_path / "r")
    outp, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    ldf.write.parquet(lin)
    rdf.write.parquet(rin)
    ls = spark.readStream.schema(ldf.schema).parquet(lin)
    rs = spark.readStream.schema(rdf.schema).parquet(rin)
    joined = stream_interval_join(
        ls, rs, on="k", left_ts="ts", right_ts="ts",
        lower_seconds=-300, upper_seconds=0, right_values=["rid"],
        watermark="2 hours")
    q = (joined.writeStream.format("parquet")
         .option("path", outp).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r["lid"], r["rid_r"])
           for r in spark.read.parquet(outp).collect()}
    assert got == want

    # incremental micro-batch: new left rows join against the existing
    # right state through the checkpoint
    l2 = _rows(3, 30, 500)
    spark.createDataFrame(l2, "lid bigint, k bigint, ts timestamp") \
        .write.mode("append").parquet(lin)
    q2 = (stream_interval_join(
            spark.readStream.schema(ldf.schema).parquet(lin),
            spark.readStream.schema(rdf.schema).parquet(rin),
            on="k", left_ts="ts", right_ts="ts",
            lower_seconds=-300, upper_seconds=0, right_values=["rid"],
            watermark="2 hours")
          .writeStream.format("parquet")
          .option("path", outp).option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination(180)

    lb2 = spark.createDataFrame(lrows + l2,
                                "lid bigint, k bigint, ts timestamp") \
        .select("lid", "k", F.unix_micros("ts").alias("t"))
    want2 = {(r["lid"], r["rid_r"]) for r in interval_join(
        lb2, rb, on="k", left_time="t", right_time="t",
        lower=-300_000_000, upper=0, right_values=["rid"]).collect()}
    got2 = {(r["lid"], r["rid_r"])
            for r in spark.read.parquet(outp).collect()}
    assert got2 == want2
    assert len(want2) > len(want)
