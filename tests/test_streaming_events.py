"""S3 event bus under Structured Streaming: the same ``xml_events`` +
``subscribe`` operators run unchanged on a streaming DataFrame (stateless
``mapInPandas`` + filter), so listeners work over a live document feed —
the streaming analog of the reference's progressive parse callbacks."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2geojson_lite_spark.operators.events import subscribe, xml_events
from osm2geojson_lite_spark.sources.synth import SPAN_SCHEMA


def _xml_doc(i: int) -> tuple:
    lat = 38 + (i % 5)
    xml = (f"<osm><node id='{i}' lat='{lat}' lon='{i}'/>"
           f"<way id='w{i}'><nd ref='{i}'/></way></osm>")
    return (f"d{i}", [{"kind": "text", "text": xml, "media_ref": None,
                       "offset": 0}])


def test_event_bus_over_stream(spark, tmp_path):
    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch1 = spark.createDataFrame([_xml_doc(i) for i in range(8)], SPAN_SCHEMA)
    batch1.write.parquet(inp)

    stream_docs = spark.readStream.schema(batch1.schema).parquet(inp)
    payloads = stream_docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.array_sort(F.filter("spans", lambda s: s["kind"] == F.lit("text"))),
                lambda s: s["text"],
            ),
            "",
        ).alias("payload"),
    )
    hot = subscribe(xml_events(payloads), "<osm.node[$lat>40]>")
    q = (hot.writeStream.format("parquet")
         .option("path", outp).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(outp)
    # lat = 38 + i%5 > 40 for i%5 in {3, 4} -> docs d3, d4 (of 0..7: 3,4 only... plus 8+ none)
    ids = sorted(r["attrs"]["id"] for r in got.collect())
    assert ids == ["3", "4"]

    # incremental batch: checkpoint processes only the new file
    spark.createDataFrame([_xml_doc(i) for i in range(8, 12)], SPAN_SCHEMA) \
        .write.mode("append").parquet(inp)
    q2 = (subscribe(xml_events(payloads), "<osm.node[$lat>40]>")
          .writeStream.format("parquet")
          .option("path", outp).option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    ids = sorted(r["attrs"]["id"] for r in spark.read.parquet(outp).collect())
    assert ids == ["3", "4", "8", "9"]  # 8%5=3, 9%5=4
