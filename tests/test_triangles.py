"""operators/graph.triangle_count — brute-force parity on random graphs,
canonicalization semantics, hub-orientation behavior."""

from __future__ import annotations

import itertools
import random

from dataslicer_spark.operators.graph import triangle_count


def _py_census(edge_list):
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    verts = {x for e in und for x in e}
    adj = {v: set() for v in verts}
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    tri = sum(
        1
        for a, b, c in itertools.combinations(sorted(verts), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    return len(verts), len(und), wedges, tri


def test_random_graph_parity(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(df).collect()[0]
    nv, ne, nw, nt = _py_census(edges)
    assert (
        row["n_vertices"],
        row["n_edges"],
        row["n_wedges"],
        row["n_triangles"],
    ) == (nv, ne, nw, nt)
    if nw:
        assert row["clustering_coeff"] == 3 * nt / nw


def test_duplicate_reverse_and_loop_edges_collapse(spark):
    # triangle given twice, reversed, plus loops and a dangling edge
    edges = [
        (1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 1), (4, 5), (2, 2),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == 1
    assert row["n_edges"] == 4  # {1-2, 2-3, 1-3, 4-5}
    assert row["n_vertices"] == 5


def test_hub_star_has_no_triangles(spark):
    # star around 0: wedges = C(20,2), triangles = 0, orientation keeps
    # the hub's out-degree at 0 (all edges point INTO the hub)
    edges = [(0, i) for i in range(1, 21)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 190
    assert row["clustering_coeff"] == 0.0


def test_complete_graph(spark):
    n = 8
    edges = list(itertools.combinations(range(n), 2))
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == n * (n - 1) * (n - 2) // 6
    assert row["clustering_coeff"] == 1.0
