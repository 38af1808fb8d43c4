"""Streaming tile statistics: event-time windowed cell aggregation.

The engine extension for continuously-arriving geo events (feature updates,
GPS pings): ``readStream`` -> cell encode (X1 column arithmetic) -> event-time
tumbling window with a watermark for late data -> per-(window, cell) counts,
appended to a parquet sink.  This is the Structured Streaming face of the
batch tile rollup (`spatial.raster.tile_manifest`): same cell math, same
deterministic keys, late rows older than the watermark dropped by Spark's
state store.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from ..spatial.cells import cell_col

EVENT_SCHEMA = "event_id long, ts timestamp, lon double, lat double"


def stream_tile_stats(spark: SparkSession, input_path: str, output_path: str,
                      checkpoint_path: str, *, res: int = 8,
                      window: str = "10 minutes", watermark: str = "30 minutes",
                      trigger_once: bool = True):
    """Start (and return) the streaming query.

    Output rows: (window_start, window_end, cell, n_events) — append mode,
    so a window's row emits once its watermark passes (exactly-once with
    the checkpoint).
    """
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(input_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .withColumn("cell", cell_col(F.col("lon"), F.col("lat"), res))
        .groupBy(F.window("ts", window).alias("w"), F.col("cell"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cell", "n_events",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
