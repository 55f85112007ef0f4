"""Sketch aggregates (functions/sketches.py): error bounds vs the exact
operators, loss-free sketch merging, heavy-hitter recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.functions.sketches import (
    approx_quantiles,
    frequent_items,
    hll_distinct,
    hll_merge,
    hll_partial_sketches,
)


def test_hll_distinct_error_bound(lineitem):
    est = hll_distinct(lineitem, ["l_orderkey", "l_partkey"]).collect()[0]
    exact = lineitem.agg(
        F.countDistinct("l_orderkey").alias("a"),
        F.countDistinct("l_partkey").alias("b"),
    ).collect()[0]
    # lg_config_k=12 → ~1.6% RSE; 5% is a >3-sigma bound
    assert abs(est.n_l_orderkey - exact.a) / exact.a < 0.05
    assert abs(est.n_l_partkey - exact.b) / exact.b < 0.05


def test_hll_partial_merge_equals_full(lineitem):
    # sketch per l_linestatus partition, merge → estimate ≈ one sketch over
    # everything (register-wise max union; the sparse→dense promotion path
    # can differ from the single-sketch build, so ≈ not ==)
    partials = hll_partial_sketches(lineitem, "l_orderkey", ["l_linestatus"])
    merged = hll_merge(partials, "hll_l_orderkey").collect()[0].distinct_estimate
    full = hll_distinct(lineitem, ["l_orderkey"]).collect()[0].n_l_orderkey
    assert abs(merged - full) / full < 0.03


def test_hll_grouped(lineitem):
    per_flag = {
        r.l_returnflag: r.n_l_orderkey
        for r in hll_distinct(
            lineitem, ["l_orderkey"], group_cols=["l_returnflag"]
        ).collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(per_flag) == set(exact)
    for k, v in exact.items():
        assert abs(per_flag[k] - v) / v < 0.05


def test_approx_quantiles_rank_bound(lineitem):
    got = approx_quantiles(lineitem, "l_extendedprice", [0.25, 0.5, 0.75]).collect()[
        0
    ][0]
    n = lineitem.count()
    vals = [r.l_extendedprice for r in lineitem.select("l_extendedprice").collect()]
    vals.sort()
    for p, q in zip([0.25, 0.5, 0.75], got):
        # rank error ≤ n/accuracy (= n/10000); allow 2× slack
        import bisect

        rank = bisect.bisect_left(vals, q)
        assert abs(rank - p * n) <= max(2 * n / 10_000, 2)


def test_frequent_items_finds_planted(spark):
    # 30% of rows share one value; support=0.2 must surface it
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 3, F.lit(42)).otherwise(F.col("id")).alias("v")
    )
    items = frequent_items(df, ["v"], support=0.2).collect()[0].v_freqItems
    assert 42 in items


def test_theta_set_counts_error_bounds(spark, sf_dir):
    """Theta set-operation estimates land within 5% of exact (lgK=12 →
    ~1.6% RSE; set ops compound it), including the intersection HLL
    cannot compute."""
    import os
    from pyspark.sql import functions as F
    from dataslicer_spark.functions.sketches import theta_set_counts

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    est = theta_set_counts(
        li, "l_orderkey", "l_returnflag", "A", "R"
    ).collect()[0]
    k, fl = F.col("l_orderkey"), F.col("l_returnflag")
    ex = li.agg(
        F.countDistinct(F.when(fl == "A", k)).alias("a"),
        F.countDistinct(F.when(fl == "R", k)).alias("b"),
        F.countDistinct(F.when(fl.isin("A", "R"), k)).alias("u"),
    ).collect()[0]
    inter = ex.a + ex.b - ex.u
    diff = ex.u - ex.b
    for got, exact in [
        (est.n_a, ex.a), (est.n_b, ex.b), (est.n_union, ex.u),
        (est.n_intersection, inter), (est.n_diff, diff),
    ]:
        assert exact > 0
        assert abs(got / exact - 1.0) <= 0.05, (got, exact)


def test_kll_partial_merge_rank_bounds(spark, sf_dir):
    """Sketch per l_returnflag partition, merge across all partitions →
    global quantile estimates land between the exact quantiles at
    p ∓ 2·rank_error (k=200 → ~1.65% rank error)."""
    import os
    from pyspark.sql import functions as F
    from dataslicer_spark.functions.sketches import (
        kll_merge_quantiles,
        kll_partial_sketches,
    )

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    parts = kll_partial_sketches(
        li, "l_extendedprice", ["l_returnflag"], k=200
    )
    assert parts.count() == 3  # one stored sketch per partition value
    probs = [0.25, 0.5, 0.75]
    merged = kll_merge_quantiles(
        parts, "kll_l_extendedprice", probs
    ).collect()[0]
    eps = 0.033  # 2 x 1.65% rank error
    lo_hi = li.agg(
        F.percentile(
            F.col("l_extendedprice"),
            F.array(*[F.lit(x) for p in probs for x in (p - eps, p + eps)]),
        ).alias("q")
    ).collect()[0].q
    for i, p in enumerate(probs):
        got = merged[f"q_{str(p).replace('.', '_')}"]
        assert lo_hi[2 * i] <= got <= lo_hi[2 * i + 1], (p, got)


def test_cms_frequency_bounds(spark, sf_dir):
    """CMS estimates: never below the true count, overshoot <= eps*N."""
    import os
    from pyspark.sql import functions as F
    from dataslicer_spark.functions.sketches import cms_frequency

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    truth = {
        r.l_suppkey: r.n
        for r in li.groupBy("l_suppkey").agg(F.count("*").alias("n")).collect()
    }
    probes = sorted(truth)[:5] + [999_999_999]  # incl. an absent value
    n_total = li.count()
    est = dict(cms_frequency(li, "l_suppkey", probes, eps=0.001))
    for v in probes:
        true = truth.get(v, 0)
        assert est[v] >= true
        assert est[v] - true <= 0.001 * n_total + 1
