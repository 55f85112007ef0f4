"""Pandas-reference tests for the relational operator core (SURVEY.md §2
P/J/A/W/O families) — each operator verified against an independent pandas
computation on the sf0.001 tables."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.aggregates import (
    cluster_centroid,
    cluster_centroid_weighted,
    distinct_values,
    group_stats,
)
from dataslicer_spark.operators.filters import (
    filter_with_complement,
    trim_edges,
)
from dataslicer_spark.operators.joins import (
    anti_join,
    merge_metadata_to_sources,
    select_clusters,
    union_reindex,
)
from dataslicer_spark.operators.windows import (
    closest_match,
    group_all_satisfy,
    group_mean_attached,
    largest_wins,
)


def test_filter_with_complement_partitions_rows(lineitem):
    kept, rejected = filter_with_complement(lineitem, "l_quantity > 25")
    n = lineitem.count()
    nk, nr = kept.count(), rejected.count()
    assert nk + nr == n
    assert kept.agg(F.min("l_quantity")).first()[0] > 25
    assert rejected.agg(F.max("l_quantity")).first()[0] <= 25


def test_filter_with_complement_null_goes_to_rejected(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 1.0)], "id int, v double"
    )
    kept, rejected = filter_with_complement(df, "v > 5")
    assert [r.id for r in kept.collect()] == [1]
    assert sorted(r.id for r in rejected.collect()) == [2, 3]


def test_trim_edges_matches_pandas(lineitem):
    kept, rejected = trim_edges(
        lineitem, dx=5, dy=1000, xname="l_quantity", yname="l_extendedprice",
        xsize=50, ysize=60000,
    )
    pdf = lineitem.select("l_quantity", "l_extendedprice").toPandas()
    mask = (
        (pdf.l_quantity > 5) & (pdf.l_quantity < 45)
        & (pdf.l_extendedprice > 1000) & (pdf.l_extendedprice < 59000)
    )
    assert kept.count() == int(mask.sum())
    assert rejected.count() == int((~mask).sum())


def test_merge_metadata_broadcast_plan(lineitem, orders):
    li = lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
    out = merge_metadata_to_sources(
        li, orders, metadata_cols=["o_custkey"], join_on="o_orderkey"
    )
    assert out.count() == lineitem.count()
    # the plan must use a broadcast join, not a shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_anti_join_matches_pandas(customer, orders):
    got = anti_join(
        customer,
        orders.filter(F.col("o_totalprice") > 200000).withColumnRenamed(
            "o_custkey", "c_custkey"
        ),
        on=["c_custkey"],
    )
    cust = customer.toPandas()
    big = orders.toPandas().query("o_totalprice > 200000")
    expect = set(cust.c_custkey) - set(big.o_custkey)
    assert set(r.c_custkey for r in got.select("c_custkey").collect()) == expect


def test_anti_join_all_columns_default(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k int, v string")
    b = spark.createDataFrame([(2, "y"), (3, "DIFFERENT")], "k int, v string")
    # value-based anti-join over all common columns (reference semantics)
    out = anti_join(a, b)
    assert sorted(r.k for r in out.collect()) == [1, 3]


def test_select_clusters_all_semantics(orders):
    kept, rejected = select_clusters(
        orders, "o_totalprice < 150000", group_col="o_custkey"
    )
    pdf = orders.toPandas()
    bad = set(pdf.loc[pdf.o_totalprice >= 150000, "o_custkey"])
    good = set(pdf.o_custkey) - bad
    assert set(r.o_custkey for r in kept.select("o_custkey").collect()) == good
    assert set(r.o_custkey for r in rejected.select("o_custkey").collect()) == bad
    assert kept.count() + rejected.count() == len(pdf)


def test_select_clusters_null_counts_as_violation(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (1, None), (2, 2.0)], "g int, v double"
    )
    kept, rejected = select_clusters(df, "v < 10", group_col="g")
    assert set(r.g for r in kept.collect()) == {2}
    assert set(r.g for r in rejected.collect()) == {1}


def test_union_reindex_unique_ids(lineitem):
    a = lineitem.limit(100).withColumn("sourceid", F.lit(1))
    b = lineitem.limit(50).withColumn("sourceid", F.lit(1))
    out = union_reindex(a, b, reindex=True)
    assert out.count() == 150
    assert out.select("sourceid").distinct().count() == 150


def test_union_allows_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([(2,)], "k int")
    out = union_reindex(a, b, reindex=False)
    rows = {r.k: r.v for r in out.collect()}
    assert rows == {1: "x", 2: None}


def test_closest_match_is_argmin(spark):
    rows = [(g, i, float(d)) for g, i, d in
            [(1, 10, 5.0), (1, 11, 2.0), (1, 12, 2.0), (2, 20, 9.0)]]
    df = spark.createDataFrame(rows, "g int, id int, dist double")
    out = closest_match(df, "g", F.col("dist"), tiebreak_cols=["id"])
    got = {r.g: r.id for r in out.collect()}
    assert got == {1: 11, 2: 20}  # tie broken deterministically by id


def test_largest_wins(spark):
    df = spark.createDataFrame(
        [(1, "small", 1.0), (1, "big", 9.0), (2, "only", 2.0)],
        "src int, grain string, r double",
    )
    out = largest_wins(df, "src", "r")
    got = {r.src: r.grain for r in out.collect()}
    assert got == {1: "big", 2: "only"}


def test_group_all_satisfy_flags(spark):
    df = spark.createDataFrame([(1, 5.0), (1, 50.0), (2, 3.0)], "g int, v double")
    out = group_all_satisfy(df, "g", F.col("v") < 10)
    flags = {(r.g, r.v): r.all_satisfy for r in out.collect()}
    assert flags[(1, 5.0)] is False and flags[(2, 3.0)] is True


def test_group_mean_attached_matches_pandas(lineitem):
    out = group_mean_attached(lineitem, "l_returnflag", "l_quantity")
    got = (
        out.select("l_returnflag", "mean_l_quantity").distinct().toPandas()
        .set_index("l_returnflag")["mean_l_quantity"]
    )
    pdf = lineitem.select("l_returnflag", "l_quantity").toPandas()
    expect = pdf.groupby("l_returnflag")["l_quantity"].mean()
    for flag, val in expect.items():
        assert got[flag] == pytest.approx(val, rel=1e-12)


def test_group_stats_matches_pandas(lineitem):
    out = group_stats(lineitem, "l_returnflag", "l_extendedprice").toPandas()
    pdf = lineitem.select("l_returnflag", "l_extendedprice").toPandas()
    expect = pdf.groupby("l_returnflag")["l_extendedprice"].agg(
        ["min", "max", "count", "mean", "std"]
    )
    out = out.set_index("l_returnflag").sort_index()
    for flag in expect.index:
        assert out.loc[flag, "min_l_extendedprice"] == expect.loc[flag, "min"]
        assert out.loc[flag, "max_l_extendedprice"] == expect.loc[flag, "max"]
        assert out.loc[flag, "count_l_extendedprice"] == expect.loc[flag, "count"]
        assert out.loc[flag, "mean_l_extendedprice"] == pytest.approx(
            expect.loc[flag, "mean"], rel=1e-12
        )
        assert out.loc[flag, "std_l_extendedprice"] == pytest.approx(
            expect.loc[flag, "std"], rel=1e-9
        )


def test_centroid_weighted_matches_numpy(lineitem):
    out = cluster_centroid_weighted(
        lineitem, err_col="l_quantity", group_col="l_returnflag",
        xname="l_extendedprice", yname="l_discount",
    ).toPandas().set_index("l_returnflag")
    pdf = lineitem.select(
        "l_returnflag", "l_extendedprice", "l_discount", "l_quantity"
    ).toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        w = 1.0 / (grp.l_quantity**2)
        assert out.loc[flag, "l_extendedprice_centroid"] == pytest.approx(
            float((grp.l_extendedprice * w).sum() / w.sum()), rel=1e-9
        )


def test_centroid_unweighted(lineitem):
    out = cluster_centroid(
        lineitem, group_col="l_returnflag", xname="l_quantity", yname="l_discount"
    ).toPandas()
    pdf = lineitem.toPandas()
    expect = pdf.groupby("l_returnflag")["l_quantity"].mean()
    got = out.set_index("l_returnflag")["l_quantity_centroid"]
    for flag, val in expect.items():
        assert got[flag] == pytest.approx(val, rel=1e-12)


def test_distinct_values(orders):
    got = sorted(distinct_values(orders, "o_orderstatus"))
    expect = sorted(orders.toPandas().o_orderstatus.unique())
    assert got == expect


# ---------------------------------------------------------------------------
# skew mitigation — algebraic-equality checks on a pathologically skewed key
# ---------------------------------------------------------------------------

def test_salted_group_agg_equals_plain(spark):
    from dataslicer_spark.operators.skew import salted_group_agg

    # one key owns 90% of rows
    skewed = spark.range(0, 50_000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 'hot' ELSE concat('k', id % 7) END AS k",
        "CAST(id % 101 AS DOUBLE) AS v",
    )
    got = salted_group_agg(
        skewed, ["k"],
        {"sum_v": ("sum", "v"), "n": ("count", "v"),
         "min_v": ("min", "v"), "max_v": ("max", "v")},
        n_salts=8,
    ).toPandas().set_index("k").sort_index()
    expect = (
        skewed.groupBy("k")
        .agg(F.sum("v").alias("sum_v"), F.count("v").alias("n"),
             F.min("v").alias("min_v"), F.max("v").alias("max_v"))
        .toPandas().set_index("k").sort_index()
    )
    assert (got.n == expect.n).all()
    assert (got.min_v == expect.min_v).all()
    assert (got.max_v == expect.max_v).all()
    # integral-valued doubles → exact sums regardless of order
    assert (got.sum_v == expect.sum_v).all()


def test_salted_join_equals_plain(spark):
    from dataslicer_spark.operators.skew import salted_join

    big = spark.range(0, 30_000).selectExpr(
        "CASE WHEN id % 5 < 4 THEN 0 ELSE id % 50 END AS k", "id AS payload"
    )
    small = spark.range(0, 50).selectExpr("id AS k", "id * 10 AS attr")
    got = salted_join(big, small, on=["k"], n_salts=8)
    expect = big.join(small, on=["k"])
    assert got.count() == expect.count()
    assert got.agg(F.sum("payload"), F.sum("attr")).collect() == \
        expect.agg(F.sum("payload"), F.sum("attr")).collect()


# ---- A5 iqr_by_bin: exact vs approx gate ---------------------------------


def test_iqr_by_bin_auto_gate_and_accuracy(spark):
    """auto must pick exact below the threshold (matching numpy linear
    interpolation) and approx above it (within the KLL rank-error bound)."""
    from dataslicer_spark.operators.aggregates import iqr_by_bin

    rng = np.random.default_rng(7)
    big = rng.uniform(0.0, 1.0, 50_000)  # one bin above threshold=10k
    small = rng.normal(5.0, 1.0, 500)  # one bin below
    pdf = pd.DataFrame(
        {
            "b": ["big"] * len(big) + ["small"] * len(small),
            "v": np.concatenate([big, small]),
        }
    )
    df = spark.createDataFrame(pdf)

    exact = (
        iqr_by_bin(df, "b", "v", method="exact")
        .toPandas().set_index("b").sort_index()
    )
    for name, arr in (("big", big), ("small", small)):
        q25, q50, q75 = np.percentile(arr, [25, 50, 75])
        assert exact.loc[name, "iqr_v"] == pytest.approx(q75 - q25, abs=1e-12)
        assert exact.loc[name, "median_v"] == pytest.approx(q50, abs=1e-12)

    # auto with a low threshold → approx path; rank error ≤ n/accuracy
    # (uniform data: value error ≈ rank fraction, generous 50x margin)
    approx = (
        iqr_by_bin(df, "b", "v", method="auto", approx_threshold=10_000,
                   accuracy=10_000)
        .toPandas().set_index("b").sort_index()
    )
    q25, q50, q75 = np.percentile(big, [25, 50, 75])
    assert approx.loc["big", "iqr_v"] == pytest.approx(q75 - q25, abs=0.05)
    assert approx.loc["big", "median_v"] == pytest.approx(q50, abs=0.05)
    # approx returns actual data values, not interpolations — never exact
    # equality asserted; exact path must be bit-stable for the oracle
    auto_small = iqr_by_bin(
        df.filter(F.col("b") == "small"), "b", "v", method="auto",
        approx_threshold=10_000,
    ).toPandas().set_index("b")
    assert auto_small.loc["small", "iqr_v"] == exact.loc["small", "iqr_v"]
    assert auto_small.loc["small", "median_v"] == exact.loc["small", "median_v"]


def test_iqr_by_bin_bad_method(spark):
    from dataslicer_spark.operators.aggregates import iqr_by_bin

    df = spark.createDataFrame([("a", 1.0)], "b string, v double")
    with pytest.raises(ValueError, match="method"):
        iqr_by_bin(df, "b", "v", method="banana")
