"""Profile one conversion with the Spark event log, then summarize where
core-time goes (per-stage occupancy via tools/analyze_eventlog.py).

Usage: python tools/profile_convert.py [n_docs] [cpus]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 32000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    log_dir = tempfile.mkdtemp(prefix="evlog-")
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

    from pyspark.sql import SparkSession

    from osm2geojson_lite_spark import Options, convert
    from osm2geojson_lite_spark.sources.synth import generate_documents

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-convert")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", log_dir)
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    # persist + materialize the input outside the timed region (same policy
    # as bench.py — generation is not part of the conversion under test)
    docs = generate_documents(spark, n_docs, partitions=cpus).persist()
    docs.count()
    # warm
    convert(docs, Options(complete_feature=True)).write.format("noop").mode(
        "overwrite").save()
    t0 = time.time()
    convert(docs, Options(complete_feature=True)).write.format("noop").mode(
        "overwrite").save()
    wall = time.time() - t0
    print(f"timed convert: {wall:.2f}s  ({n_docs / wall:.1f} docs/s)")
    spark.stop()
    time.sleep(1)
    subprocess.run([sys.executable, "/root/repo/tools/analyze_eventlog.py",
                    log_dir, str(cpus)])


if __name__ == "__main__":
    main()
