"""Multi-source BFS hop distance: python-oracle parity, hub graphs,
undirected mode, hop bound, early exit, partitioning invariance."""

from __future__ import annotations

import random
from collections import deque

from pyspark.sql import functions as F

from osm2geojson_lite_spark.pipeline.bfs import bfs_hops


def _py_bfs(edges, seeds, max_hops, directed=True):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    hops = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        u = dq.popleft()
        if hops[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in hops:
                hops[v] = hops[u] + 1
                dq.append(v)
    return hops


def _dfs(spark, edges, seeds):
    e = spark.createDataFrame(edges or [(0, 0)], "src bigint, dst bigint")
    if not edges:
        e = e.filter(F.lit(False))
    s = spark.createDataFrame([(x,) for x in seeds], "node bigint")
    return e, s


def _got(df):
    return {r["node"]: r["hops"] for r in df.collect()}


def test_matches_python_oracle_random_digraph(spark):
    rng = random.Random(5)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(180)]
    seeds = [0, 7, 13]
    for k in (0, 1, 3, 6):
        e, s = _dfs(spark, edges, seeds)
        assert _got(bfs_hops(e, s, max_hops=k)) == _py_bfs(edges, seeds, k)


def test_undirected_mode(spark):
    edges = [(1, 2), (3, 2), (4, 3), (10, 4)]  # chain pointing at 2
    e, s = _dfs(spark, edges, [2])
    assert _got(bfs_hops(e, s, max_hops=10)) == {2: 0}  # no out-edges
    e, s = _dfs(spark, edges, [2])
    assert _got(bfs_hops(e, s, max_hops=10, directed=False)) == \
        _py_bfs(edges, [2], 10, directed=False)


def test_hub_takes_one_round(spark):
    """A hot hub fanning out to 3000 targets is one distinct frontier,
    and every target lands at hop 2 exactly once."""
    edges = [(1, 50)] + [(50, 1000 + i) for i in range(3000)]
    e, s = _dfs(spark, edges, [1])
    got = _got(bfs_hops(e, s, max_hops=2))
    assert got[1] == 0 and got[50] == 1
    assert sum(1 for h in got.values() if h == 2) == 3000


def test_min_hop_wins_on_multiple_paths(spark):
    # 1 -> 2 -> 3 -> 4 and a shortcut 1 -> 4
    edges = [(1, 2), (2, 3), (3, 4), (1, 4)]
    e, s = _dfs(spark, edges, [1])
    assert _got(bfs_hops(e, s, max_hops=5)) == {1: 0, 2: 1, 4: 1, 3: 2}


def test_early_exit_and_isolated_seed(spark):
    e, s = _dfs(spark, [(7, 8)], [100])
    assert _got(bfs_hops(e, s, max_hops=50)) == {100: 0}


def test_partitioning_invariance(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(300)]
    seeds = [1, 2]
    e, s = _dfs(spark, edges, seeds)
    base = _got(bfs_hops(e, s, max_hops=4))
    e2 = spark.createDataFrame(edges, "src bigint, dst bigint") \
        .repartition(37, "dst")
    s2 = spark.createDataFrame([(x,) for x in seeds], "node bigint") \
        .repartition(5)
    assert _got(bfs_hops(e2, s2, max_hops=4)) == base
