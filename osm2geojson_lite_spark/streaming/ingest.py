"""Structured Streaming document ingest (SURVEY.md §2.7 engine stance).

The reference has no streaming semantics (its "progressive" parse is an
in-memory event parser); this is the engine extension: ``readStream`` over
the interleaved-documents table, the identical batch conversion pipeline
applied per micro-batch via ``foreachBatch``, appended to a GeoJSON sink.
Exactly-once comes from the streaming checkpoint + idempotent per-batch
append; watermarking is unnecessary because documents are self-contained
(one doc = one OSM universe, no cross-doc windows)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.convert import Options, convert
from ..sources.synth import SPAN_SCHEMA


def stream_convert(spark: SparkSession, input_path: str, output_path: str,
                   checkpoint_path: str, *, opts: Options | None = None,
                   trigger_once: bool = True):
    """Start (and return) a streaming query: parquet doc drops -> GeoJSON."""
    opts = opts or Options(complete_feature=True)
    stream = (
        spark.readStream.schema(SPAN_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_path)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        convert(batch_df, opts).write.mode("append").parquet(output_path)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
