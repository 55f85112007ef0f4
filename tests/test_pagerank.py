"""Integer PageRank (operators/graph.pagerank)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.graph import pagerank

SCALE = 10**12


def _py_pagerank(edges, n_iter, scale=SCALE, d=(85, 100)):
    """Independent replay of the documented integer algorithm."""
    es = sorted(set(edges))
    nodes = sorted({u for u, _ in es} | {v for _, v in es})
    deg = {}
    for u, _ in es:
        deg[u] = deg.get(u, 0) + 1
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    base = (scale * (d[1] - d[0]) // d[1]) // n
    for _ in range(n_iter):
        nxt = {v: base for v in nodes}
        for u, v in es:
            nxt[v] += (r[u] * d[0] // d[1]) // deg[u]
        r = nxt
    return r


@pytest.fixture()
def run(spark):
    def go(edges, n_iter=3):
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: r.rank for r in pagerank(df, n_iter=n_iter).collect()
        }
        return got
    return go


def test_matches_python_replay(run):
    edges = [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (4, 1)]
    for it in (1, 3):
        assert run(edges, it) == _py_pagerank(edges, it)


def test_hub_ranks_highest(run):
    # star: everyone points at 0 (and back, so nothing dangles)
    edges = [(i, 0) for i in range(1, 8)] + [(0, i) for i in range(1, 8)]
    got = run(edges)
    assert max(got, key=got.get) == 0


def test_multi_edges_collapse(run):
    ranks_a = run([(1, 2), (2, 1)])
    ranks_b = run([(1, 2), (1, 2), (1, 2), (2, 1)])
    assert ranks_a == ranks_b


def test_dangling_mass_evaporates_deterministically(run):
    # node 2 has no out-edges: its mass is dropped, not redistributed —
    # pinned against the python replay (which implements the same rule)
    edges = [(1, 2)]
    assert run(edges, 3) == _py_pagerank(edges, 3)


def test_partitioning_invariance(spark):
    edges = [(i % 13, (i * 7) % 13) for i in range(150) if i % 13 != (i * 7) % 13]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r.node: r.rank for r in pagerank(df, n_iter=2).collect()}
    b = {r.node: r.rank for r in pagerank(df.repartition(11), n_iter=2).collect()}
    assert a == b


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).count() == 0
