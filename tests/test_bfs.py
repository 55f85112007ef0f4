"""operators/graph.bfs_hops — brute-force BFS parity, directed mode,
multi-source, radius cap, early exit."""

from __future__ import annotations

import random
from collections import deque

from dataslicer_spark.operators.graph import bfs_hops


def _py_bfs(edge_list, sources, max_hops, directed=False):
    adj: dict = {}
    for u, v in edge_list:
        if u is None or v is None:
            continue
        adj.setdefault(u, set()).add(v)
        if not directed:
            adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        n = q.popleft()
        if dist[n] >= max_hops:
            continue
        for m in adj.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    return dist


def _run(spark, edges, sources, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    return {
        r["node"]: r["dist"] for r in bfs_hops(e, s, **kw).collect()
    }


def test_random_graph_parity(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(70)]
    for hops in (1, 2, 4):
        assert _run(spark, edges, [0], max_hops=hops) == _py_bfs(
            edges, [0], hops
        )


def test_directed_vs_undirected(spark):
    edges = [(1, 2), (2, 3), (4, 3)]
    assert _run(spark, edges, [1], max_hops=3, directed=True) == {
        1: 0, 2: 1, 3: 2,
    }
    assert _run(spark, edges, [1], max_hops=3) == {1: 0, 2: 1, 3: 2, 4: 3}


def test_multi_source_takes_nearest(spark):
    edges = [(i, i + 1) for i in range(10)]
    got = _run(spark, edges, [0, 9], max_hops=10)
    assert got == _py_bfs(edges, [0, 9], 10)
    assert got[5] == 4  # nearer to 9 (dist 4) than to 0 (dist 5)


def test_early_exit_and_unreachable(spark):
    edges = [(1, 2), (5, 6)]
    got = _run(spark, edges, [1], max_hops=50)
    assert got == {1: 0, 2: 1}  # component exhausted well before 50 rounds
