"""Data-quality operators (operators/quality.py): profiling counts vs
pandas, uniqueness and FK violations on planted defects, NULL-FK
semantics, and plan shape (single aggregate pass for profiling)."""

from __future__ import annotations

import pandas as pd
import pytest

from dataslicer_spark.operators.quality import (
    constraint_report,
    profile_table,
    referential_orphans,
    uniqueness_violations,
)


@pytest.fixture(scope="module")
def dirty(spark):
    child = pd.DataFrame(
        {
            "id": [1, 2, 2, 3, 4, 5],
            "fk": [10, 10, 20, 99, None, 30],
            "v": [1.5, None, 2.5, 2.5, 3.5, None],
        }
    )
    parent = pd.DataFrame({"pk": [10, 20, 30]})
    return (
        spark.createDataFrame(child),
        spark.createDataFrame(parent),
        child,
    )


def test_profile_counts(dirty):
    sdf, _, pdf = dirty
    out = (
        profile_table(sdf)
        .toPandas()
        .set_index("col_name")
        .sort_index()
    )
    assert (out.n_rows == len(pdf)).all()
    for c in ["id", "fk", "v"]:
        assert out.loc[c, "n_nulls"] == pdf[c].isna().sum()
        assert out.loc[c, "n_distinct"] == pdf[c].nunique()


def test_profile_single_aggregate_pass(dirty):
    sdf, _, _ = dirty
    plan = (
        profile_table(sdf)._jdf.queryExecution().executedPlan().toString()
    )
    # distinct expansion happens inside one aggregate chain — the input
    # scan appears exactly once regardless of column count
    n_scans = sum(
        plan.count(s)
        for s in ("LocalTableScan", "Scan ExistingRDD", "Scan parquet")
    )
    assert n_scans == 1, plan


def test_profile_weird_column_names(spark):
    """Hyphens, spaces, and quotes in column names must profile fine —
    internal aliases are positional, only the display literal is escaped."""
    pdf = pd.DataFrame({"a": [1, 2, None]})
    df = spark.createDataFrame(pdf).selectExpr(
        "a AS `a-b`", "a AS `a b`", "a AS `it's`"
    )
    out = profile_table(df).toPandas().set_index("col_name")
    assert set(out.index) == {"a-b", "a b", "it's"}
    assert (out.n_nulls == 1).all() and (out.n_distinct == 2).all()


def test_uniqueness(dirty):
    sdf, _, _ = dirty
    out = uniqueness_violations(sdf, ["id"]).collect()
    assert [(r.id, r.n_rows) for r in out] == [(2, 2)]


def test_referential_orphans_null_fk_not_orphan(dirty):
    child, parent, _ = dirty
    out = referential_orphans(child, parent, ["fk"], ["pk"]).collect()
    assert sorted(r.id for r in out) == [3]  # fk=99; NULL fk (id=4) is fine


def test_constraint_report(dirty):
    child, parent, _ = dirty
    rep = (
        constraint_report(
            [
                ("unique:id", uniqueness_violations(child, ["id"])),
                ("fk", referential_orphans(child, parent, ["fk"], ["pk"])),
            ]
        )
        .toPandas()
        .set_index("constraint")
        .n_violations
    )
    assert rep["unique:id"] == 1
    assert rep["fk"] == 1


def test_fk_length_mismatch(dirty):
    child, parent, _ = dirty
    with pytest.raises(ValueError, match="equal length"):
        referential_orphans(child, parent, ["fk", "id"], ["pk"])


def test_key_skew_report_shares_and_order(spark):
    from dataslicer_spark.operators.quality import key_skew_report

    rows = [(1, "a")] * 6 + [(2, "a")] * 3 + [(3, "b")] * 1
    df = spark.createDataFrame(rows, "k int, g string")
    out = key_skew_report(df, ["k", "g"], top=2).collect()
    assert [(r.rank, r.key, r.n) for r in out] == [
        (1, "1|a", 6), (2, "2|a", 3)
    ]
    assert out[0].share == 0.6
