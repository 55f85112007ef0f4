"""SCD2 history builder (operators/scd.py): run collapsing, validity
chaining, NULL-safe attribute comparison, current snapshot."""

from __future__ import annotations

import pandas as pd

from dataslicer_spark.operators.scd import scd2_current, scd2_history


def _hist(spark, rows, attrs=("v",), tiebreak=None):
    pdf = pd.DataFrame(rows)
    out = scd2_history(
        spark.createDataFrame(pdf), ["k"], "ts", list(attrs), tiebreak_col=tiebreak
    )
    return sorted(
        (r.k, r.valid_from, r.valid_to, *[r[a] for a in attrs])
        for r in out.collect()
    )


def test_scd2_collapses_runs(spark):
    rows = [
        {"k": 1, "ts": 1, "v": "a"},
        {"k": 1, "ts": 2, "v": "a"},   # unchanged → collapsed
        {"k": 1, "ts": 3, "v": "b"},
        {"k": 1, "ts": 4, "v": "a"},   # back to a → NEW version
        {"k": 2, "ts": 1, "v": "x"},
    ]
    assert _hist(spark, rows) == [
        (1, 1, 3, "a"),
        (1, 3, 4, "b"),
        (1, 4, None, "a"),
        (2, 1, None, "x"),
    ]


def test_scd2_null_safe_attr_change(spark):
    rows = [
        {"k": 1, "ts": 1, "v": None},
        {"k": 1, "ts": 2, "v": None},  # NULL == NULL → no new version
        {"k": 1, "ts": 3, "v": "a"},
    ]
    assert _hist(spark, rows) == [(1, 1, 3, None), (1, 3, None, "a")]


def test_scd2_multi_attr_and_current(spark):
    rows = [
        {"k": 1, "ts": 1, "v": "a", "w": 1},
        {"k": 1, "ts": 2, "v": "a", "w": 2},  # second attr changed
        {"k": 1, "ts": 3, "v": "a", "w": 2},
    ]
    hist = _hist(spark, rows, attrs=("v", "w"))
    assert hist == [(1, 1, 2, "a", 1), (1, 2, None, "a", 2)]

    df = scd2_history(
        spark.createDataFrame(pd.DataFrame(rows)), ["k"], "ts", ["v", "w"]
    )
    cur = scd2_current(df).collect()
    assert len(cur) == 1 and cur[0].w == 2 and cur[0].valid_from == 2
