"""operators/graph.label_propagation — exact Python replay of the
synchronous, tie-broken trajectory; community recovery; invariance."""

from __future__ import annotations

import random
from collections import Counter

from dataslicer_spark.operators.graph import label_propagation


def _py_lpa(edge_list, n_iter):
    adj: dict = {}
    for u, v in edge_list:
        if u == v or u is None or v is None:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = {n: n for n in adj}
    for _ in range(n_iter):
        new = {}
        for n, nbrs in adj.items():
            c = Counter(labels[m] for m in nbrs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    return labels


def _run(spark, edges, n_iter):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["label"]
        for r in label_propagation(df, n_iter=n_iter).collect()
    }


def test_exact_python_replay_random(spark):
    rng = random.Random(13)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(60)]
    for it in (1, 2, 3):
        assert _run(spark, edges, it) == _py_lpa(edges, it)


def test_two_cliques_bridge_recovers_communities(spark):
    a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    b = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    edges = a + b + [(4, 10)]  # one bridge
    got = _run(spark, edges, 3)
    assert got == _py_lpa(edges, 3)
    # each clique converges to a single internal label
    assert len({got[i] for i in range(4)}) == 1
    assert len({got[i] for i in range(11, 15)}) == 1
    assert got[0] != got[14]


def test_partitioning_invariance(spark):
    rng = random.Random(17)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    df = spark.createDataFrame(edges, "src long, dst long")
    one = sorted(map(tuple, label_propagation(df.coalesce(1), n_iter=3).collect()))
    many = sorted(
        map(tuple, label_propagation(df.repartition(16), n_iter=3).collect())
    )
    assert one == many
