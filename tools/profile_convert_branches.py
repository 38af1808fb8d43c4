"""Time each convert() branch in isolation (noop sink) to locate the cost.

Usage: python tools/profile_convert_branches.py [n_docs] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    w = time.perf_counter() - t0
    print(f"{label:28s} {w:7.2f}s", flush=True)
    return w


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 32000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)

    from osm2geojson_lite_spark import Options, convert
    from osm2geojson_lite_spark.operators.convert import (
        CacheScope, assemble_payload, build_features)
    from osm2geojson_lite_spark.operators.parse import parse_documents
    from osm2geojson_lite_spark.session import get_spark
    from osm2geojson_lite_spark.sources.synth import generate_documents

    spark = get_spark("profile-branches", cpus=cpus, shuffle_partitions=cpus,
                      adaptive=False)
    docs = generate_documents(spark, n_docs, partitions=cpus).persist()
    docs.count()
    # warm
    convert(docs, Options(complete_feature=True)).write.format("noop").mode(
        "overwrite").save()

    # 1. parse alone (uncached, single pass)
    t("parse_documents (no cache)", parse_documents(assemble_payload(docs)))

    # 2. full build via scope, then each branch off warm caches
    scope = CacheScope()
    t0 = time.perf_counter()
    parts = build_features(docs, Options(complete_feature=True), scope=scope)
    print(f"{'build_features (caches)':28s} {time.perf_counter()-t0:7.2f}s",
          flush=True)
    t("node_features", parts["node_features"])
    t("way_features", parts["way_features"])
    t("relation_features", parts["relation_features"])
    from osm2geojson_lite_spark.operators.emit import emit_geojson
    t("emit (all branches + agg)", emit_geojson(
        docs, parts["node_features"], parts["way_features"],
        parts["relation_features"], complete_feature=True))
    scope.release()

    # 3. end-to-end (best of 2)
    for i in range(2):
        t(f"convert end-to-end #{i}", convert(docs, Options(complete_feature=True)))


if __name__ == "__main__":
    main()
