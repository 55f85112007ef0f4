"""Co-located joins via bucketed tables: writing both sides bucketed by the
join key lets Catalyst plan the join with NO shuffle exchange — the
pre-partitioning strategy SURVEY.md §2.3 calls for on big-big joins that
recur at 100 TB (one-time bucketed write amortizes every later join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, lineitem, orders):
    # tables land in the default spark-warehouse dir (gitignored);
    # warehouse.dir is a static conf and cannot be pointed at a tempdir
    if True:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
        (lineitem.withColumnRenamed("l_orderkey", "k")
         .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
         .saveAsTable("li_b"))
        (orders.withColumnRenamed("o_orderkey", "k")
         .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
         .saveAsTable("ord_b"))

        li = spark.table("li_b")
        od = spark.table("ord_b").select("k", "o_custkey")
        # disable auto-broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = li.join(od, "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            # the payoff: bucket layout satisfies the join's distribution —
            # no shuffle exchange on either side
            assert "Exchange hashpartitioning" not in plan
            assert joined.count() == lineitem.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
            spark.sql("DROP TABLE IF EXISTS li_b")
            spark.sql("DROP TABLE IF EXISTS ord_b")
