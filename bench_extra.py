"""Extra benchmarks for the optimization rounds (guide §1.4 noop isolation).

NOT the driver's bench: `bench.py` is frozen for measurement.  This runner
times an arbitrary subset of `__spark_entry__.queries()` with the noop sink
(same policy as bench.py: best of N, local[$SPARK_GRAFT_CPUS], shuffle
partitions = cores, AQE off) and can dump `.explain("formatted")` plans.

Usage:
  python bench_extra.py [--reps N] [--explain DIR] [query ...]
With no query names, times every BENCH_QUERIES entry from bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    explain_dir = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--explain":
            explain_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    import __spark_entry__ as entrymod
    from osm2geojson_lite_spark.session import get_spark

    import bench as benchmod

    if not names:
        names = list(benchmod.BENCH_QUERIES)

    spark = get_spark("bench-extra", cpus=CPUS, shuffle_partitions=CPUS,
                      adaptive=False)
    qs = entrymod.queries()
    timings = {}
    for name in names:
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}s", flush=True)
    print(json.dumps({"queries": timings, "sf_dir": SF_DIR, "cpus": CPUS,
                      "load_avg": [round(x, 2) for x in os.getloadavg()]}))


if __name__ == "__main__":
    main()
