"""Focused per-query re-measurement (VERDICT r2 #7): best-of-N wall time for
named queries at a given sf dir, isolating host noise from code deltas.

Usage: python tools/remeasure_queries.py simhash pip_diamonds [--n 3]
       [--sf /root/testdata/sf0.1] [--cpus 32]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = sys.argv[1:]
    names, n, sf_dir, cpus = [], 3, "/root/testdata/sf0.1", 32
    i = 0
    while i < len(args):
        if args[i] == "--n":
            n = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--cpus":
            cpus = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

    import __spark_entry__ as entrymod
    from osm2geojson_lite_spark.session import get_spark

    spark = get_spark("remeasure", cpus=cpus, shuffle_partitions=cpus,
                      adaptive=False)
    qs = entrymod.queries()
    out = {}
    for name in names:
        walls = []
        for _ in range(n + 1):  # first run warms codegen/workers, dropped
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = {"warm": walls[0], "measured": walls[1:],
                     "best": min(walls[1:])}
        print(name, out[name], flush=True)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "results": out}))


if __name__ == "__main__":
    main()
