"""Market-basket association rules (operators/basket.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.basket import association_rules


@pytest.fixture(scope="module")
def baskets(spark):
    rows = [
        (1, "milk"), (1, "bread"), (1, "eggs"),
        (2, "milk"), (2, "bread"),
        (3, "milk"), (3, "eggs"),
        (4, "bread"),
        (5, "milk"), (5, "bread"),
        (5, "milk"),  # duplicate item in basket → counted once
    ]
    return spark.createDataFrame(rows, "basket long, item string")


def test_counts_and_metrics_manual(baskets):
    out = {
        (r.item_a, r.item_b): r
        for r in association_rules(
            baskets, "basket", "item", min_pair_count=1
        ).collect()
    }
    # (bread, milk): together in baskets 1,2,5 → 3; bread in 4, milk in 4
    r = out[("bread", "milk")]
    assert (r.pair_cnt, r.cnt_a, r.cnt_b) == (3, 4, 4)
    assert r.support == 3 / 5
    assert r.confidence == 3 / 4
    assert r.lift == (3 * 5) / (4 * 4)
    # (eggs, milk): baskets 1,3 → 2
    assert out[("eggs", "milk")].pair_cnt == 2
    assert ("bread", "eggs") in out  # basket 1 only → cnt 1
    assert out[("bread", "eggs")].pair_cnt == 1


def test_min_pair_count_prunes(baskets):
    out = association_rules(baskets, "basket", "item", min_pair_count=2)
    got = {(r.item_a, r.item_b) for r in out.collect()}
    assert got == {("bread", "milk"), ("eggs", "milk")}


def test_max_basket_size_guards_skew(spark):
    rows = [(1, f"i{j}") for j in range(50)] + [(2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = association_rules(
        df, "basket", "item", min_pair_count=1, max_basket_size=10
    )
    got = {(r.item_a, r.item_b) for r in out.collect()}
    assert got == {("a", "b")}  # the 50-item basket is dropped entirely


def test_empty_input(spark):
    df = spark.createDataFrame([], "basket long, item string")
    out = association_rules(df, "basket", "item")
    assert out.count() == 0
    assert out.columns == [
        "item_a", "item_b", "pair_cnt", "cnt_a", "cnt_b",
        "support", "confidence", "lift",
    ]
