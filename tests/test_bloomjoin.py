"""Bloom-filter join pruning (operators/bloomjoin.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.bloomjoin import bloom_prune, bloom_prune_join


@pytest.fixture(scope="module")
def tabs(spark):
    fact = spark.createDataFrame(
        [(i, i % 100, float(i)) for i in range(5000)],
        "row_id long, k long, v double",
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 100, 10)], "k long, label string"
    )
    return fact, dim


def test_prune_is_superset_and_join_is_exact(tabs):
    fact, dim = tabs
    pruned = bloom_prune(fact, dim, "k")
    joining_keys = {r.k for r in dim.collect()}
    kept_keys = {r.k for r in pruned.select("k").distinct().collect()}
    # every joining key survives the bloom
    assert joining_keys <= kept_keys

    got = (
        bloom_prune_join(fact, dim, "k")
        .orderBy("row_id")
        .collect()
    )
    want = fact.join(dim, "k").orderBy("row_id").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_left_semi_and_rejected_hows(tabs):
    fact, dim = tabs
    semi = bloom_prune_join(fact, dim, "k", how="left_semi")
    want = fact.join(dim, "k", "left_semi")
    assert semi.count() == want.count() == 500
    for how in ("left", "full", "right"):
        with pytest.raises(ValueError, match="inner/left_semi"):
            bloom_prune_join(fact, dim, "k", how=how)


def test_null_keys_dropped(spark):
    fact = spark.createDataFrame(
        [(1, None), (2, 5)], "row_id long, k long"
    )
    dim = spark.createDataFrame([(5,), (None,)], "k long")
    out = bloom_prune_join(fact, dim, "k").collect()
    assert [(r.k, r.row_id) for r in out] == [(5, 2)]


def test_prune_plan_shape(tabs):
    # the pruning stage is the fact scan + a 1-row broadcast carrying the
    # bitmap — no shuffle of either side, no real join
    fact, dim = tabs
    plan = bloom_prune(fact, dim, "k")._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row bitmap relation
    for bad in ("SortMergeJoin", "CartesianProduct", "ShuffledHashJoin"):
        assert bad not in plan


def test_bloom_bitmap_bounded_and_validated(tabs):
    from dataslicer_spark.operators.bloomjoin import build_bloom

    _, dim = tabs
    words = build_bloom(dim, "k", m_bits=1 << 10)
    assert len(words) == (1 << 10) // 64
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple of 64"):
        build_bloom(dim, "k", m_bits=100)
    with _pytest.raises(ValueError, match="n_hashes"):
        build_bloom(dim, "k", n_hashes=9)


def test_string_keys_work(spark):
    fact = spark.createDataFrame(
        [(i, f"k{i % 7}") for i in range(100)], "row_id long, k string"
    )
    dim = spark.createDataFrame([("k1",), ("k3",)], "k string")
    got = bloom_prune_join(fact, dim, "k").count()
    assert got == fact.join(dim, "k").count()
