"""Measure ANN recall@k vs tuning knobs (VERDICT r2 #4): sign-LSH recall as
a function of code_bits, IVF recall as a function of n_probe (lowest-id and
k-means quantizers), against the exact brute-force top-k.  Results go into
BENCH.md's recall table.

Usage: python tools/ann_recall_table.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from osm2geojson_lite_spark.pipeline.similarity import (  # noqa: E402
    brute_force_topk,
    ivf_topk,
    kmeans_centroids,
    recall_at_k,
    sign_lsh_topk,
)
from osm2geojson_lite_spark.session import get_spark  # noqa: E402


def mean_recall(approx, exact) -> float:
    row = recall_at_k(approx, exact).agg(
        F.round(F.avg("recall_at_k"), 4).alias("r")
    ).collect()[0]
    return float(row["r"])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ann-recall", cpus=8, shuffle_partitions=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    k = 10
    exact = brute_force_topk(queries, emb, k=k).persist()
    exact.count()

    out = {"sf_dir": sf_dir, "k": k, "n_queries": 32,
           "lsh_by_code_bits": {}, "ivf_by_n_probe": {},
           "ivf_kmeans_by_n_probe": {}}
    for code_bits in (8, 12, 16):
        out["lsh_by_code_bits"][code_bits] = mean_recall(
            sign_lsh_topk(queries, emb, k=k, code_bits=code_bits), exact)
    cents = kmeans_centroids(emb, n_centroids=16, n_iters=5, sample_size=512,
                             seed=0)
    for n_probe in (1, 2, 4, 8):
        out["ivf_by_n_probe"][n_probe] = mean_recall(
            ivf_topk(queries, emb, k=k, n_centroids=16, n_probe=n_probe),
            exact)
        out["ivf_kmeans_by_n_probe"][n_probe] = mean_recall(
            ivf_topk(queries, emb, k=k, n_probe=n_probe, centroids=cents),
            exact)
    print(json.dumps(out, indent=2))
    with open("/root/repo/ann_recall_table.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote /root/repo/ann_recall_table.json")


if __name__ == "__main__":
    main()
