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


def stream_tile_heatmap(spark: SparkSession, input_path: str,
                        output_path: str, checkpoint_path: str, *,
                        res: int = 8, ring: int = 1,
                        weights: list[int] | None = None,
                        window: str = "10 minutes",
                        watermark: str = "30 minutes",
                        trigger_once: bool = True):
    """Streaming k-ring heatmap: the windowed face of
    ``spatial.density.kring_smooth``.

    Structured Streaming allows ONE aggregation per query, so the smooth
    cannot run after the windowed count.  But k-ring smoothing is linear:
    ``smooth(count(events)) == count_weighted(scatter(events))`` — so
    each event scatters map-side into its ``(2·ring+1)²`` weighted
    contributions (``kring_scatter_col``, the exact expression the batch
    operator uses) and ONE windowed sum produces the smoothed surface.
    State size is bounded by (windows in flight) × (occupied cells),
    late rows beyond the watermark are dropped by the state store, and
    the integer weights keep outputs byte-identical to the batch smooth
    of the same window's events.

    Output rows: (window_start, window_end, cell, w_sum, n_src) — n_src
    counts contributing *events* here (batch n_src counts cells; the
    per-cell density is not materialized in a single-agg stream).
    """
    from ..spatial.density import kring_scatter_col

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(input_path)
    scat = (
        stream.withWatermark("ts", watermark)
        .withColumn("cell0", cell_col(F.col("lon"), F.col("lat"), res))
        .select(
            "ts",
            F.explode(
                kring_scatter_col(F.col("cell0"), res, ring, weights)
            ).alias("t"),
        )
    )
    agg = (
        scat.groupBy(F.window("ts", window).alias("w"), F.col("t.cell").alias("cell"))
        .agg(F.sum("t.w").alias("w_sum"), F.count(F.lit(1)).alias("n_src"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cell", "w_sum", "n_src",
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


def stream_tile_distinct(spark: SparkSession, input_path: str,
                         output_path: str, checkpoint_path: str, *,
                         res: int = 8, p: int = 10, salt: str = "hll",
                         window: str = "10 minutes",
                         watermark: str = "30 minutes",
                         trigger_once: bool = True):
    """Streaming HLL distinct sketch per (window, cell) — the continuous
    face of ``pipeline.hll_sketch`` ("distinct visitors per tile per 10
    minutes" over an unbounded ping stream).

    The batch sketch is one map-side register expression + a ``max``
    aggregation, and ``max`` is exactly the shape Structured Streaming's
    windowed state store supports: each (window, cell, j) key holds ONE
    int register, updated monotonically.  State is bounded by (windows
    in flight) x (occupied cells) x (registers hit), late rows beyond
    the watermark are dropped by the state store, and a finalized
    window's register rows are byte-identical to ``hll_sketch`` of that
    window's events (pinned in tests) — so downstream ``hll_merge`` /
    ``hll_estimate`` roll the streamed sketches up exactly like batch
    ones (tile -> parent tile, 10-minute -> daily) without rescanning.

    Output rows: (window_start, window_end, cell, j, rho) — the
    mergeable register table, not a point estimate, because registers
    compose and estimates do not.
    """
    from ..pipeline.sketch import hll_register_rows

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(input_path)
    regs = hll_register_rows(
        stream.withWatermark("ts", watermark)
        .withColumn("cell", cell_col(F.col("lon"), F.col("lat"), res)),
        ["ts", "cell"], "event_id", p=p, salt=salt,
    )
    agg = (
        regs.groupBy(F.window("ts", window).alias("w"), "cell", "j")
        .agg(F.max("rho").alias("rho"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cell", "j", "rho",
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


def stream_tile_minima(spark: SparkSession, input_path: str,
                       output_path: str, checkpoint_path: str, *,
                       res: int = 8, k: int = 32, salt: str = "kmv",
                       window: str = "10 minutes",
                       watermark: str = "30 minutes",
                       trigger_once: bool = True):
    """Streaming k-mins sketch per (window, cell) — the continuous face
    of ``pipeline.kmv_sketch``, the set-algebra companion to
    ``stream_tile_distinct``: streamed minima tables support
    ``kmv_set_ops`` across windows/tiles ("how many of this window's
    visitors were also in the last one"), which HLL registers cannot.

    Same shape argument as the HLL face: the batch sketch is one
    map-side register expression + a ``min`` aggregation, and ``min`` is
    exactly what the windowed state store supports — each (window, cell,
    i) key holds ONE bigint, updated monotonically downward.  A
    finalized window's register rows are byte-identical to
    ``kmv_sketch`` of that window's events (pinned in tests), so
    ``kmv_merge`` / ``kmv_estimate`` / ``kmv_set_ops`` treat streamed
    and batch sketches interchangeably.

    Output rows: (window_start, window_end, cell, i, mn) — the mergeable
    register table, not a point estimate (registers compose, estimates
    do not).
    """
    from ..pipeline.sketch import kmv_register_rows

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(input_path)
    regs = kmv_register_rows(
        stream.withWatermark("ts", watermark)
        .withColumn("cell", cell_col(F.col("lon"), F.col("lat"), res)),
        ["ts", "cell"], "event_id", k=k, salt=salt,
    )
    agg = (
        regs.groupBy(F.window("ts", window).alias("w"), "cell", "i")
        .agg(F.min("mn").alias("mn"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cell", "i", "mn",
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
