"""operators/evaluation.binary_classification_report — parity against a
brute-force pairwise AUC and a hand-counted confusion matrix."""

from __future__ import annotations

import math

import pytest

from dataslicer_spark.operators.evaluation import binary_classification_report


def _brute_auc(rows):
    """Pairwise AUC: 1 per correctly ordered (pos, neg) pair, ½ per tie."""
    pos = [s for y, s in rows if y == 1]
    neg = [s for y, s in rows if y == -1]
    if not pos or not neg:
        return None
    total = 0.0
    for sp in pos:
        for sn in neg:
            total += 1.0 if sp > sn else (0.5 if sp == sn else 0.0)
    return total / (len(pos) * len(neg))


# (label, score) with deliberate score ties straddling both classes and
# a tie exactly at the 0 threshold
FIXTURE = [
    (1, 5), (1, 3), (1, 3), (1, 0), (1, -2),
    (-1, 4), (-1, 3), (-1, 0), (-1, 0), (-1, -1), (-1, -3),
]


def test_report_matches_brute_force(spark):
    df = spark.createDataFrame(FIXTURE, "y int, score long")
    row = binary_classification_report(df).collect()[0]

    p = sum(1 for y, _ in FIXTURE if y == 1)
    n = len(FIXTURE) - p
    tp = sum(1 for y, s in FIXTURE if y == 1 and s > 0)
    fp = sum(1 for y, s in FIXTURE if y == -1 and s > 0)
    assert (row["p"], row["n"], row["tp"], row["fp"]) == (p, n, tp, fp)
    assert row["tn"] == n - fp and row["fn"] == p - tp
    assert row["accuracy"] == pytest.approx((tp + n - fp) / (p + n), abs=0)
    assert row["precision"] == pytest.approx(tp / (tp + fp), abs=0)
    assert row["recall"] == pytest.approx(tp / p, abs=0)
    assert row["f1"] == pytest.approx(2 * tp / (2 * tp + fp + (p - tp)), abs=0)
    assert math.isclose(row["auc"], _brute_auc(FIXTURE), rel_tol=1e-15)


def test_null_rows_excluded_and_threshold(spark):
    data = FIXTURE + [(None, 7), (1, None)]
    df = spark.createDataFrame(data, "y int, score long")
    base = binary_classification_report(
        spark.createDataFrame(FIXTURE, "y int, score long")
    ).collect()[0]
    row = binary_classification_report(df).collect()[0]
    assert row == base  # NULL label / NULL score rows contribute nothing

    # higher threshold reclassifies the s=3 cluster
    row3 = binary_classification_report(df, threshold=3).collect()[0]
    assert row3["tp"] == sum(1 for y, s in FIXTURE if y == 1 and s > 3)
    assert row3["fp"] == sum(1 for y, s in FIXTURE if y == -1 and s > 3)
    # AUC is threshold-free
    assert row3["auc"] == row["auc"]


def test_degenerate_single_class_yields_nulls(spark):
    df = spark.createDataFrame([(1, 2), (1, -1)], "y int, score long")
    row = binary_classification_report(df).collect()[0]
    assert row["n"] == 0
    assert row["auc"] is None  # undefined without both classes
    assert row["precision"] == 1.0  # tp=1, fp=0
    assert row["accuracy"] == 0.5


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(FIXTURE * 37, "y int, score long")
    one = binary_classification_report(df.coalesce(1)).collect()[0]
    many = binary_classification_report(df.repartition(16)).collect()[0]
    assert one == many
