"""Bucketed tables (sources/bucketed.py): exchange-free joins, catalog
validation, and result parity with a plain shuffle join."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.sources.bucketed import (
    bucket_spec,
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    orders = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .withColumnRenamed("o_orderkey", "okey")
        .select("okey", "o_orderpriority")
    )
    li = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .withColumnRenamed("l_orderkey", "okey")
        .select("okey", "l_quantity")
    )
    write_bucketed(orders, "tb_orders", ["okey"], 8)
    write_bucketed(li, "tb_lineitem", ["okey"], 8)
    yield orders, li
    for t in ("tb_orders", "tb_lineitem", "tb_li4"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_join_has_zero_exchanges(spark, tables):
    j = bucketed_join(spark, "tb_orders", "tb_lineitem", ["okey"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # neither shuffle nor broadcast
    assert "SelectedBucketsCount: 8 out of 8" in plan


def test_result_parity_with_plain_join(spark, tables):
    orders, li = tables
    got = (
        bucketed_join(spark, "tb_orders", "tb_lineitem", ["okey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    want = (
        orders.join(li, "okey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }


def test_one_file_per_bucket(spark, tables):
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED tb_orders")
        .filter(F.col("col_name") == "Location")
        .collect()[0]
        .data_type
    )
    path = loc.removeprefix("file:")
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 8  # repartition(n, keys) → one file per bucket


def test_mismatched_bucketing_rejected(spark, tables, sf_dir):
    li4 = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .withColumnRenamed("l_orderkey", "okey")
        .select("okey", "l_quantity")
    )
    write_bucketed(li4, "tb_li4", ["okey"], 4)
    with pytest.raises(ValueError, match="bucket counts differ"):
        bucketed_join(spark, "tb_orders", "tb_li4", ["okey"])
    with pytest.raises(ValueError, match="bucketed on"):
        bucketed_join(spark, "tb_orders", "tb_lineitem", ["o_orderpriority"])


def test_unbucketed_table_rejected(spark, tables):
    spark.range(5).write.mode("overwrite").saveAsTable("tb_plain")
    try:
        with pytest.raises(ValueError, match="not bucketed"):
            bucketed_join(spark, "tb_plain", "tb_lineitem", ["id"])
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_plain")


def test_bucket_spec_roundtrip(spark, tables):
    assert bucket_spec(spark, "tb_orders") == (["okey"], 8)
