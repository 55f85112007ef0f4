"""Plan linter (plans/linter.py): each antipattern triggers on a plan
known to contain it, clean plans report nothing, and the assert gate
honors the allow-list."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dataslicer_spark.plans.linter import (
    assert_scale_clean,
    explain_scale_report,
)


@pytest.fixture(scope="module")
def small(spark):
    return spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    )


def _checks(df):
    return {f.check for f in explain_scale_report(df)}


def test_clean_plan(small):
    out = small.groupBy("k").agg(F.sum("v").alias("s"))
    assert _checks(out) == set()
    assert_scale_clean(out)


def test_cartesian_flagged(small):
    a, b = small.alias("a"), small.alias("b")
    out = a.crossJoin(b)
    # Spark plans a tiny cross join as BroadcastNestedLoop; force both
    got = _checks(out)
    assert got & {"cartesian-product", "nested-loop-join"}


def test_single_partition_flagged(small):
    w = Window.orderBy("v")
    out = small.withColumn("rk", F.row_number().over(w))
    assert "single-partition-exchange" in _checks(out)


def test_unbounded_following_flagged(small):
    w = (
        Window.partitionBy("k")
        .orderBy("v")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    out = small.withColumn("x", F.first("v", ignorenulls=True).over(w))
    assert "unbounded-following-frame" in _checks(out)


def test_python_udf_flagged(small):
    from pyspark.sql.functions import udf

    plus = udf(lambda x: x + 1.0, "double")
    out = small.withColumn("x", plus(F.col("v")))
    assert "row-wise-python-udf" in _checks(out)


def test_assert_gate_allowlist(small):
    out = small.crossJoin(small.alias("b"))
    with pytest.raises(AssertionError, match="antipattern"):
        assert_scale_clean(out)
    assert_scale_clean(
        out, allow=("cartesian-product", "nested-loop-join")
    )


def test_repo_operators_are_clean(spark, sf_dir):
    """The engine's own flagship relational queries pass their linter."""
    import os
    from dataslicer_spark.plans.star_queries import (
        a10_histogram,
        j1_broadcast_enrich,
        o9_topk_per_group,
    )

    for q in (j1_broadcast_enrich, o9_topk_per_group, a10_histogram):
        assert_scale_clean(q(spark, sf_dir))
