"""connected_components / resolve_duplicate_groups vs a driver union-find."""

import numpy as np
import pytest

from dataslicer_spark.operators.dedup import resolve_duplicate_groups
from dataslicer_spark.operators.graph import connected_components


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    # path-compress to final min representative
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("mode", ["driver", "distributed", "auto"])
@pytest.mark.parametrize("seed,n_nodes,n_edges", [(0, 30, 20), (1, 200, 150), (2, 500, 700)])
def test_connected_components_matches_union_find(spark, seed, n_nodes, n_edges, mode):
    rng = np.random.default_rng(seed)
    edges = [
        (int(a), int(b))
        for a, b in zip(
            rng.integers(0, n_nodes, n_edges), rng.integers(0, n_nodes, n_edges)
        )
        if a != b
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.rep for r in connected_components(df, mode=mode).collect()
    }
    # reference: min-id representative per component via union-find, but a
    # union-find root is not necessarily the min id — remap by component
    ref_root = _uf_components(edges)
    comp_min = {}
    for n, r in ref_root.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    expect = {n: comp_min[r] for n, r in ref_root.items()}
    assert got == expect


def test_connected_components_long_chain_converges(spark):
    """A path graph is the worst case for label propagation; pointer
    jumping must converge in O(log n) rounds, well under max_iter."""
    n = 300
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    got = connected_components(df, max_iter=20, mode="distributed").collect()
    assert len(got) == n + 1
    assert {r.rep for r in got} == {0}


def test_auto_mode_cap_falls_back_to_distributed(spark):
    """With a tiny driver_max_edges cap, auto must take the distributed
    path and still produce identical labels."""
    pairs = [(i, i + 1) for i in range(50)] + [(100, 101), (101, 102)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    a = {r.node: r.rep for r in connected_components(df, mode="driver").collect()}
    b = {
        r.node: r.rep
        for r in connected_components(df, mode="auto", driver_max_edges=5).collect()
    }
    assert a == b


def test_resolve_duplicate_groups(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "id_a long, id_b long",
    )
    out = {r.doc_id: r for r in resolve_duplicate_groups(pairs).collect()}
    assert set(out) == {1, 2, 3, 10, 11, 20, 21, 22}
    assert all(out[d].keep_id == 1 and out[d].n_members == 3 for d in (1, 2, 3))
    assert all(out[d].keep_id == 10 and out[d].n_members == 2 for d in (10, 11))
    assert all(out[d].keep_id == 20 and out[d].n_members == 3 for d in (20, 21, 22))
    kept = {d for d, r in out.items() if r.is_kept}
    assert kept == {1, 10, 20}
