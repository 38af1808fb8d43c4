"""Custom stateful streaming operator via ``applyInPandasWithState``:
incremental per-cell feature counters.

Maintains a running (count, bbox) state per grid cell across micro-batches —
the streaming analog of the batch tile manifest, but with state that
survives between triggers (GroupState, timeout-free).  Demonstrates the
engine's pattern for operators Structured Streaming lacks natively:
group by a deterministic key, hold a compact Arrow-friendly state row,
emit updated aggregates per batch.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..spatial.cells import cell_col

EVENT_SCHEMA = "event_id long, ts timestamp, lon double, lat double"

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("min_lon", DoubleType()),
    StructField("min_lat", DoubleType()),
    StructField("max_lon", DoubleType()),
    StructField("max_lat", DoubleType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("cell", LongType()),
    StructField("n_events", LongType()),
    StructField("min_lon", DoubleType()),
    StructField("min_lat", DoubleType()),
    StructField("max_lon", DoubleType()),
    StructField("max_lat", DoubleType()),
])


def _update_cell_state(key, pdfs, state: GroupState):
    import pandas as pd

    n = 0
    mn_lon = mn_lat = float("inf")
    mx_lon = mx_lat = float("-inf")
    if state.exists:
        n, mn_lon, mn_lat, mx_lon, mx_lat = state.get
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        mn_lon = min(mn_lon, float(pdf["lon"].min()))
        mn_lat = min(mn_lat, float(pdf["lat"].min()))
        mx_lon = max(mx_lon, float(pdf["lon"].max()))
        mx_lat = max(mx_lat, float(pdf["lat"].max()))
    state.update((n, mn_lon, mn_lat, mx_lon, mx_lat))
    yield pd.DataFrame({
        "cell": [key[0]], "n_events": [n],
        "min_lon": [mn_lon], "min_lat": [mn_lat],
        "max_lon": [mx_lon], "max_lat": [mx_lat],
    })


def stream_cell_counters(spark: SparkSession, input_path: str, output_path: str,
                         checkpoint_path: str, *, res: int = 8,
                         trigger_once: bool = True):
    """Start (and return) the stateful streaming query: running per-cell
    event counts + bounding boxes, updated each micro-batch."""
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(input_path)
    keyed = stream.withColumn(
        "cell", cell_col(F.col("lon"), F.col("lat"), res)
    ).groupBy("cell")
    updated = keyed.applyInPandasWithState(
        _update_cell_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        updated.writeStream.outputMode("update")
        .foreachBatch(lambda df, _id: df.write.mode("append").parquet(output_path))
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
