"""Connected-components / near-dup-clustering tests against a pure-Python
union-find oracle."""

from __future__ import annotations

import random

from osm2geojson_lite_spark.pipeline.cluster import (
    connected_components,
    near_dup_clusters,
)


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _oracle(pairs, nodes=()):
    uf = _UF()
    for a, b in pairs:
        uf.union(a, b)
    for n in nodes:
        uf.find(n)
    # component label = min member id
    comp = {}
    for n in list(uf.p):
        comp.setdefault(uf.find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _run(spark, pairs, nodes=None):
    pdf = spark.createDataFrame(pairs, ["id_a", "id_b"])
    ndf = (spark.createDataFrame([(n,) for n in nodes], ["doc_id"])
           if nodes is not None else None)
    return {r["node"]: r["component"]
            for r in connected_components(pdf, nodes=ndf).collect()}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    n = 120
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _run(spark, pairs) == _oracle(pairs)


def test_long_chain_converges(spark):
    # O(diameter) naive propagation would need 64 rounds; large/small-star
    # must finish well inside the 50-round cap (O(log n) per the paper).
    pairs = [(i, i + 1) for i in range(64)]
    got = _run(spark, pairs)
    assert got == {i: 0 for i in range(65)}


def test_isolated_nodes_are_singletons(spark):
    got = _run(spark, [(1, 2)], nodes=[1, 2, 7, 9])
    assert got == {1: 1, 2: 1, 7: 7, 9: 9}


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(40)]
    pairs = [(a, b) for a, b in pairs if a != b]
    pdf = spark.createDataFrame(pairs, ["id_a", "id_b"])
    one = {r["node"]: r["component"]
           for r in connected_components(pdf.coalesce(1)).collect()}
    many = {r["node"]: r["component"]
            for r in connected_components(pdf.repartition(13)).collect()}
    assert one == many == _oracle(pairs)


def test_near_dup_clusters_plants(spark):
    base = ("the quick brown fox jumps over the lazy dog and keeps on "
            "running through the quiet field past the old stone wall")
    rows = [
        (0, base),
        (1, base + " tonight"),                  # near-dup of 0
        (2, base + " again and again ok"),       # near-dup of 0
        (10, "completely different text about spark shuffle partitions "
             "and adaptive query execution plans at terabyte scale today"),
        (11, "completely different text about spark shuffle partitions "
             "and adaptive query execution plans at terabyte scale now"),
        (20, "a unique little document nothing else resembles in any way "
             "whatsoever with its own private vocabulary entirely"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           near_dup_clusters(docs, threshold=0.5).collect()}
    assert len(out) == len(rows)  # every doc appears exactly once
    assert out[0]["cluster_id"] == out[1]["cluster_id"] == out[2]["cluster_id"] == 0
    assert out[10]["cluster_id"] == out[11]["cluster_id"] == 10
    assert out[20]["cluster_id"] == 20 and out[20]["cluster_size"] == 1
    for did, r in out.items():
        assert r["is_canonical"] == (did == r["cluster_id"])
    assert out[0]["cluster_size"] == 3 and out[10]["cluster_size"] == 2
    kept = sorted(d for d, r in out.items() if r["is_canonical"])
    assert kept == [0, 10, 20]
