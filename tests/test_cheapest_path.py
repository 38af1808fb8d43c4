"""cheapest_path (pipeline.bfs) vs a naive bounded Bellman-Ford oracle."""

from __future__ import annotations

import random

from osm2geojson_lite_spark.pipeline import cheapest_path


def _naive(edges, seeds, max_hops, directed=True):
    """Textbook DP: best[v] after i rounds = lexicomin (cost, hops) over
    paths of <= i edges.  Returns {node: (cost, hops)}."""
    e = {}
    for s, d, w in edges:
        if s == d:
            continue
        pairs = [(s, d)] if directed else [(s, d), (d, s)]
        for a, b in pairs:
            if (a, b) not in e or w < e[(a, b)]:
                e[(a, b)] = w
    best = {s: (0, 0) for s in set(seeds)}
    for _ in range(max_hops):
        nxt = dict(best)
        for (a, b), w in e.items():
            if a in best:
                cand = (best[a][0] + w, best[a][1] + 1)
                if b not in nxt or cand < nxt[b]:
                    nxt[b] = cand
        if nxt == best:
            break
        best = nxt
    return best


def _run(spark, edges, seeds, max_hops, directed=True, parts=4):
    e_df = spark.createDataFrame(edges, "src long, dst long, w long") \
        .repartition(parts)
    s_df = spark.createDataFrame([(s,) for s in seeds], "node long")
    out = cheapest_path(e_df, s_df, max_hops=max_hops, directed=directed)
    return {r["node"]: (r["cost"], r["hops"]) for r in out.collect()}


def test_line_graph_prefers_cheap_long_path(spark):
    # 1 -> 2 -> 3 -> 4 each weight 1, plus a direct 1 -> 4 of weight 10:
    # cheapest is the 3-hop path, but with max_hops=2 only the direct
    # edge (cost 10) is reachable.
    edges = [(1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 4, 10)]
    assert _run(spark, edges, [1], 6) == {
        1: (0, 0), 2: (1, 1), 3: (2, 2), 4: (3, 3)}
    assert _run(spark, edges, [1], 2)[4] == (10, 1)


def test_tie_breaks_on_fewest_hops_and_parallel_edges(spark):
    # two cost-4 routes to node 3: 1 hop (direct) vs 2 hops; also a
    # parallel direct edge of higher weight that must lose.
    edges = [(1, 3, 4), (1, 3, 9), (1, 2, 2), (2, 3, 2)]
    assert _run(spark, edges, [1], 6)[3] == (4, 1)


def test_negative_weights_stay_total_under_hop_bound(spark):
    # negative cycle 1 <-> 2 (sum -2): bounded semantics still total
    edges = [(1, 2, -3), (2, 1, 1), (2, 3, 5)]
    got = _run(spark, edges, [1], 4)
    assert got == _naive(edges, [1], 4)
    assert got[2] == (-3 + 1 - 3, 3)  # relaxed around the cycle once


def test_random_graphs_match_naive(spark):
    rng = random.Random(9)
    for directed in (True, False):
        nodes = list(range(1, 40))
        edges = [(rng.choice(nodes), rng.choice(nodes), rng.randrange(1, 20))
                 for _ in range(150)]
        seeds = [1, 7, 13]
        for max_hops in (0, 1, 3, 8):
            exp = _naive(edges, seeds, max_hops, directed)
            got = _run(spark, edges, seeds, max_hops, directed,
                       parts=rng.choice([1, 7]))
            assert got == exp, (directed, max_hops)
