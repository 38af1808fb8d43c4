"""Fixed-point PageRank vs an exact integer python oracle."""

from __future__ import annotations

import random

from osm2geojson_lite_spark.pipeline.pagerank import pagerank


def _naive(edges, n_iters=5, dp=85, scale=10 ** 9, extra_nodes=()):
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in e} | {d for _, d in e} | set(extra_nodes))
    n = len(nodes)
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    teleport = ((100 - dp) * scale) // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(n_iters):
        s_in = {v: 0 for v in nodes}
        for s, d in e:
            s_in[d] += r[s] // deg[s]
        r = {v: teleport + (dp * s_in[v]) // 100 for v in nodes}
    return sorted((v, r[v], r[v] / float(scale)) for v in nodes)


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return sorted(map(tuple, pagerank(df, **kw).collect()))


def test_matches_integer_oracle(spark):
    rng = random.Random(42)
    edges = [(rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(300)]
    assert _run(spark, edges) == _naive(edges)


def test_hub_outranks_leaves(spark):
    # star: everyone links to node 0; 0 links to 1
    edges = [(i, 0) for i in range(1, 20)] + [(0, 1)]
    got = dict((v, fp) for v, fp, _ in _run(spark, edges))
    assert got[0] > got[2]          # hub beats a leaf
    assert got[1] > got[2]          # hub's sole target inherits rank
    assert got == {v: fp for v, fp, _ in _naive(edges)}


def test_dangling_and_isolated_nodes(spark):
    # 5 -> 6, 6 dangling; 99 isolated via the nodes frame
    edges = [(5, 6)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    nodes = spark.createDataFrame([(99,)], "node bigint")
    got = sorted(map(tuple, pagerank(df, nodes=nodes).collect()))
    assert [v for v, _, _ in got] == [5, 6, 99]
    assert got == _naive(edges, extra_nodes=[99])


def test_uniform_cycle_is_uniform(spark):
    edges = [(i, (i + 1) % 8) for i in range(8)]
    ranks = {fp for _, fp, _ in _run(spark, edges)}
    assert len(ranks) == 1


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(0, 40), rng.randrange(0, 40)) for _ in range(150)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = sorted(map(tuple, pagerank(df, n_iters=3).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(23), n_iters=3).collect()))
    assert a == b
