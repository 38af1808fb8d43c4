"""Two-scale benchmark: the same job at N and 4N parallelism (local[8] vs
local[32] — the sandbox proxy for N vs 4N executors per BASELINE.md).

Measures conversion throughput at both scales, asserts byte-identical
outputs (GeoJSON md5 per doc, tile assignments, kNN results), and reports
scaling efficiency = thr(4N) / (4 * thr(N)).  Writes BENCH.md.

Each scale runs in its own subprocess (one JVM per master config).

Usage: python tools/scaling_bench.py [--docs 8000] [--sf /root/testdata/sf0.01]
       python tools/scaling_bench.py --worker <cpus> <n_docs> <sf_dir>
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def worker(cpus: int, n_docs: int, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from osm2geojson_lite_spark import Options, convert
    from osm2geojson_lite_spark.session import get_spark
    from osm2geojson_lite_spark.sources.synth import generate_documents

    spark = get_spark(f"scale-{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 8),
                      adaptive=False)
    # warm up codegen + python workers outside the timed region (one-time
    # JVM cost identical at any scale, not part of throughput)
    convert(
        generate_documents(spark, 16, partitions=8), Options(complete_feature=True)
    ).write.format("noop").mode("overwrite").save()
    docs = generate_documents(spark, n_docs, partitions=cpus * 2).persist()
    docs.count()

    # two measured executions; report the second (steady state) — the first
    # full-size run pays one-time JIT compilation of the generated code,
    # which is a JVM warm-up artifact, not throughput
    wall = convert_md5 = None
    for _ in range(2):
        t0 = time.perf_counter()
        out = convert(docs, Options(complete_feature=True)).select(
            "doc_id", F.md5("geojson").alias("h")
        )
        rows = sorted((r["doc_id"], r["h"]) for r in out.collect())
        wall = time.perf_counter() - t0
        convert_md5 = hashlib.md5(json.dumps(rows).encode()).hexdigest()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    hashes = {}
    for name in ("raster_assign", "tile_cells", "knn_cells", "pip_diamonds"):
        df = qs[name](spark, sf_dir)
        cols = sorted(df.columns)
        data = sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())
        hashes[name] = hashlib.md5(json.dumps(data).encode()).hexdigest()

    print(json.dumps({
        "cpus": cpus,
        "n_docs": n_docs,
        "wall_s": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 2),
        "convert_md5": convert_md5,
        "hashes": hashes,
    }))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
        return

    n_docs = 64000
    sf_dir = "/root/testdata/sf0.01"
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--docs":
            n_docs = int(args[i + 1])
        if a == "--sf":
            sf_dir = args[i + 1]

    results = {}
    for cpus in (8, 32):
        # Pin the N-scale run to N physical cpus: without pinning, local[8]'s
        # python UDF workers / GC / shuffle threads spill onto all 32 cores
        # and the "8-core" run gets unfair hardware — the pin makes local[8]
        # vs local[32] an honest N-vs-4N proxy.
        pin = ["taskset", "-c", f"0-{cpus - 1}"]
        proc = subprocess.run(
            pin + [sys.executable, os.path.abspath(__file__), "--worker",
                   str(cpus), str(n_docs), sf_dir],
            capture_output=True, text=True, timeout=3000, cwd="/root/repo",
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(f"local[{cpus}]: {results[cpus]['docs_per_sec']} docs/sec")

    r8, r32 = results[8], results[32]
    eff = r32["docs_per_sec"] / (4 * r8["docs_per_sec"])
    identical = (r8["convert_md5"] == r32["convert_md5"]
                 and r8["hashes"] == r32["hashes"])
    print(f"scaling efficiency N->4N: {eff:.3f}; byte-identical: {identical}")

    lines = [
        "# BENCH — two-scale run (N vs 4N parallelism)",
        "",
        "Sandbox proxy for N vs 4N executors per BASELINE.md: the identical",
        f"job (full OSM conversion of {n_docs} synthetic interleaved docs +",
        f"tile/kNN/PIP queries at {sf_dir}) at local[8] and local[32], each",
        "run `taskset`-pinned to exactly its core budget (otherwise the",
        "N-scale run's Python workers/GC spill onto all 32 host cores and",
        "borrow unaccounted hardware).  AQE disabled in both (see",
        "session.py rationale); one JVM per scale, codegen warmed outside",
        "the timed region.",
        "",
        "| scale | docs/sec | wall s | convert output md5 |",
        "|---|---|---|---|",
        f"| local[8] (N) | {r8['docs_per_sec']} | {r8['wall_s']} | `{r8['convert_md5']}` |",
        f"| local[32] (4N) | {r32['docs_per_sec']} | {r32['wall_s']} | `{r32['convert_md5']}` |",
        "",
        f"- **Scaling efficiency (thr_4N / (4 x thr_N)): {eff:.3f}**"
        + (" — meets the >=0.8 north-rule target." if eff >= 0.8 else " — below target."),
        f"- **Outputs byte-identical across scales: {identical}** (GeoJSON md5 per doc"
        " + raster tile assignments + cell encodes + kNN results + PIP pairs).",
        "- Determinism sources: rational cell arithmetic, explicit `pos` ordering",
        "  columns through every shuffle, id tiebreaks on every top-k.",
        "",
        "Per-scale query hashes:",
        "```json",
        json.dumps({"local8": r8["hashes"], "local32": r32["hashes"]}, indent=2),
        "```",
    ]
    with open("/root/repo/BENCH.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote /root/repo/BENCH.md")


if __name__ == "__main__":
    main()
