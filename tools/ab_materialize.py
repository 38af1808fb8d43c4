"""A/B: convert throughput with materialize_intermediates on vs off.

Usage: python tools/ab_materialize.py            # both arms, fresh JVM each
       python tools/ab_materialize.py --worker {on|off} [n_docs]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def worker(arm: str, n_docs: int) -> None:
    from osm2geojson_lite_spark import Options, convert
    from osm2geojson_lite_spark.session import get_spark
    from osm2geojson_lite_spark.sources.synth import generate_documents

    mat = arm == "on"
    spark = get_spark(f"ab-{arm}", cpus=32, shuffle_partitions=32, adaptive=False)
    opts = Options(complete_feature=True, materialize_intermediates=mat)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(convert(generate_documents(spark, max(n_docs // 4, 16), partitions=32), opts))
    docs = generate_documents(spark, n_docs, partitions=64).persist()
    docs.count()
    for _ in range(2):
        t0 = time.perf_counter()
        force(convert(docs, opts))
        wall = time.perf_counter() - t0
    print(json.dumps({"arm": arm, "n_docs": n_docs, "wall_s": round(wall, 2),
                      "docs_per_sec": round(n_docs / wall, 1)}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 32000)
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 32000
    for arm in ("off", "on"):
        proc = subprocess.run(
            [sys.executable, __file__, "--worker", arm, str(n_docs)],
            capture_output=True, text=True, timeout=1200, cwd="/root/repo",
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        print(line[-1] if line else f"FAILED {arm}: {proc.stderr[-800:]}")


if __name__ == "__main__":
    main()
