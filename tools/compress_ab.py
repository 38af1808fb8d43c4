"""A/B: shuffle + cache compression OFF (engine local default) vs ON, on
the bandwidth-sensitive local[8] conversion leg.

Round 5's host calibration showed the sandbox's 8-core legs can be DRAM-
bandwidth-bound (2->8-core scaling of a memory-bound kernel = 0.63 while a
frequency-bound kernel scales at 0.95).  The engine's local defaults skip
codec work (`session.py`: CPU was the contended resource when that was
measured); in a bandwidth-bound window that trade may invert — lz4 spends
ALU to cut the bytes moving through the memory subsystem, which is also
the cluster-correct setting (network >> CPU).  This tool measures both on
the same leg so the default is chosen from data, not vibes.

Usage: python tools/compress_ab.py [--docs 24000] [--cpus 8] [--execs 2]
Each arm runs in its own taskset-pinned subprocess (own JVM).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def _worker(compress: bool, n_docs: int, cpus: int, execs: int) -> None:
    from pyspark.sql import SparkSession

    from osm2geojson_lite_spark import Options, convert
    from osm2geojson_lite_spark.sources.synth import generate_documents

    c = "true" if compress else "false"
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"compress-{c}")
        .config("spark.sql.shuffle.partitions", str(max(8, n_docs // 3000)))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.inMemoryColumnarStorage.compressed", c)
        .config("spark.shuffle.compress", c)
        .config("spark.shuffle.spill.compress", c)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions",
                "-XX:+UseParallelGC -Djava.io.tmpdir=/tmp")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    convert(generate_documents(spark, 16, partitions=8),
            Options(complete_feature=True)).write.format("noop").mode(
        "overwrite").save()
    docs = generate_documents(
        spark, n_docs, partitions=max(16, n_docs // 1500)).persist()
    docs.count()
    walls = []
    for i in range(1 + execs):
        t0 = time.perf_counter()
        convert(docs, Options(complete_feature=True)).write.format(
            "noop").mode("overwrite").save()
        if i > 0:
            walls.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"compress": compress, "walls": walls,
                      "docs_per_sec": round(n_docs / min(walls), 2)}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2] == "on", int(sys.argv[3]), int(sys.argv[4]),
                int(sys.argv[5]))
        return
    n_docs, cpus, execs = 24000, 8, 2
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--docs":
            n_docs = int(args[i + 1])
        if a == "--cpus":
            cpus = int(args[i + 1])
        if a == "--execs":
            execs = int(args[i + 1])
    results = {}
    # interleave arms (off, on, off, on) so drift hits both about equally
    for arm in ("off", "on", "off", "on"):
        proc = subprocess.run(
            ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
             os.path.abspath(__file__), "--worker", arm, str(n_docs),
             str(cpus), str(execs)],
            capture_output=True, text=True, timeout=1800, cwd="/root/repo",
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        results.setdefault(arm, []).append(r)
        print(f"{arm}: {r['docs_per_sec']} docs/s (walls {r['walls']})",
              flush=True)
    best = {a: max(x["docs_per_sec"] for x in rs) for a, rs in results.items()}
    print(json.dumps({"n_docs": n_docs, "cpus": cpus, "best": best,
                      "on_vs_off": round(best["on"] / best["off"], 3),
                      "detail": results}))


if __name__ == "__main__":
    main()
