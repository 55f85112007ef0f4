"""As-of join (operators/asof.py): brute-force parity, direction,
tolerance, timestamp-tie determinism, and plan shape (single shuffle,
no pair fanout)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.asof import asof_join


def _brute_force(left, right, direction="backward", tolerance=None):
    """Per-row scan over the right side (ground truth)."""
    out = []
    for _, lrow in left.iterrows():
        cands = right[right.key == lrow.key]
        if direction == "backward":
            cands = cands[cands.ts <= lrow.ts]
            if tolerance is not None:
                cands = cands[lrow.ts - cands.ts <= tolerance]
            cands = cands.sort_values(["ts", "tb"])
        else:
            cands = cands[cands.ts >= lrow.ts]
            if tolerance is not None:
                cands = cands[cands.ts - lrow.ts <= tolerance]
            # earliest ts wins; at equal ts the largest tiebreak wins
            cands = cands.sort_values(["ts", "tb"], ascending=[True, False])
        if len(cands):
            m = cands.iloc[-1] if direction == "backward" else cands.iloc[0]
            out.append((lrow.lid, m.ts, m.rv))
        else:
            out.append((lrow.lid, None, None))
    return sorted(out)


@pytest.fixture()
def asof_data(spark):
    left = pd.DataFrame(
        {
            "lid": range(12),
            "key": [1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3],
            "ts": [5, 10, 15, 20, 3, 9, 9, 30, 1, 2, 100, 7],
        }
    )
    right = pd.DataFrame(
        {
            "key": [1, 1, 1, 2, 2, 2, 4, 4],
            "ts": [4, 10, 18, 9, 9, 25, 1, 2],
            "tb": [100, 101, 102, 200, 201, 202, 300, 301],
            "rv": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
        }
    )
    return (
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        left,
        right,
    )


def _run(sdf):
    rows = sdf.select("lid", "matched_ts", "rv").collect()
    return sorted((r.lid, r.matched_ts, r.rv) for r in rows)


def test_asof_backward_matches_brute_force(asof_data):
    sl, sr, left, right = asof_data
    out = asof_join(sl, sr, "ts", ["key"], ["rv"], tiebreak_col="tb")
    assert _run(out) == _brute_force(left, right, "backward")


def test_asof_forward_matches_brute_force(asof_data):
    sl, sr, left, right = asof_data
    out = asof_join(sl, sr, "ts", ["key"], ["rv"], direction="forward",
                    tiebreak_col="tb")
    assert _run(out) == _brute_force(left, right, "forward")


def test_asof_tolerance(asof_data):
    sl, sr, left, right = asof_data
    out = asof_join(sl, sr, "ts", ["key"], ["rv"], tolerance=F.lit(5),
                    tiebreak_col="tb")
    assert _run(out) == _brute_force(left, right, "backward", tolerance=5)


def test_asof_tolerance_forward(asof_data):
    sl, sr, left, right = asof_data
    out = asof_join(sl, sr, "ts", ["key"], ["rv"], direction="forward",
                    tolerance=F.lit(3), tiebreak_col="tb")
    assert _run(out) == _brute_force(left, right, "forward", tolerance=3)


def test_asof_null_ts_right_rows_never_match(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"lid": [0], "key": [1], "ts": [10.0]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {"key": [1, 1], "ts": [None, 20.0], "tb": [1, 2], "rv": [9.0, 8.0]}
        )
    )
    row = asof_join(left, right, "ts", ["key"], ["rv"], tiebreak_col="tb").collect()[0]
    # the NULL-ts right row must not be treated as an "earliest" match
    assert row.rv is None and row.matched_ts is None


def test_asof_output_collision_raises(spark):
    left = spark.createDataFrame(pd.DataFrame({"lid": [0], "key": [1], "ts": [1],
                                               "matched_ts": [0]}))
    right = spark.createDataFrame(pd.DataFrame({"key": [1], "ts": [1], "rv": [1.0]}))
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "ts", ["key"], ["rv"])


def test_asof_tie_determinism(spark):
    # two right rows at the same (key, ts): the larger tiebreak wins
    left = spark.createDataFrame(pd.DataFrame({"lid": [0], "key": [1], "ts": [10]}))
    right = spark.createDataFrame(
        pd.DataFrame(
            {"key": [1, 1], "ts": [10, 10], "tb": [7, 9], "rv": [1.0, 2.0]}
        )
    )
    out = asof_join(left, right, "ts", ["key"], ["rv"], tiebreak_col="tb")
    row = out.collect()[0]
    assert row.rv == 2.0 and row.matched_ts == 10


def test_asof_value_col_collision_raises(asof_data):
    sl, sr, *_ = asof_data
    with pytest.raises(ValueError, match="collide"):
        asof_join(sl, sr.withColumnRenamed("rv", "ts2"), "ts", ["key"], ["ts2"],
                  ) if "ts2" in sl.columns else asof_join(
            sl.withColumn("rv", F.lit(0.0)), sr, "ts", ["key"], ["rv"]
        )


def test_asof_property_random_tables(spark):
    """Randomized parity with the brute-force scan (a fixed-seed sweep —
    session-scoped Spark fixtures don't compose with @given)."""
    import numpy as np

    rng = np.random.default_rng(2024)
    for trial in range(5):
        nl, nr = rng.integers(1, 40, 2)
        left = pd.DataFrame(
            {
                "lid": range(nl),
                "key": rng.integers(0, 5, nl),
                "ts": rng.integers(0, 50, nl),
            }
        )
        right = pd.DataFrame(
            {
                "key": rng.integers(0, 5, nr),
                "ts": rng.integers(0, 50, nr),
                "tb": range(nr),
                "rv": rng.normal(size=nr).round(3),
            }
        )
        sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
        for direction in ("backward", "forward"):
            out = asof_join(
                sl, sr, "ts", ["key"], ["rv"], direction=direction,
                tiebreak_col="tb",
            )
            assert _run(out) == _brute_force(left, right, direction), (
                f"trial {trial} {direction}"
            )


def test_asof_single_shuffle_plan(asof_data):
    sl, sr, *_ = asof_data
    out = asof_join(sl, sr, "ts", ["key"], ["rv"], tiebreak_col="tb")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + one window — no join operator, no cartesian/fanout
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # union inputs coalesce into the window shuffle


# ---------------------------------------------------------------- CEP

def test_detect_event_pattern_strict_contiguity(spark):
    from dataslicer_spark.operators.timeseries import detect_event_pattern

    rows = [
        # user 1: A A B -> one match at ts 20 (strict contiguity)
        (1, 10, "A", 1), (1, 20, "A", 2), (1, 30, "B", 3),
        # user 2: A B A B -> two matches
        (2, 10, "A", 4), (2, 20, "B", 5), (2, 30, "A", 6), (2, 40, "B", 7),
        # user 3: A B but outside the window
        (3, 10, "A", 8), (3, 200, "B", 9),
    ]
    ev = spark.createDataFrame(
        rows, "u int, ts long, t string, eid int"
    )
    got = sorted(
        (r.u, r.match_ts, r.span)
        for r in detect_event_pattern(
            ev, "ts", ["u"], "t", ["A", "B"], within=50,
            tiebreak_col="eid",
        ).collect()
    )
    assert got == [(1, 20, 10), (2, 10, 10), (2, 30, 10)]


def test_detect_event_pattern_three_steps_and_validation(spark):
    import pytest as _pytest

    from dataslicer_spark.operators.timeseries import detect_event_pattern

    ev = spark.createDataFrame(
        [(1, 10, "A", 1), (1, 20, "A", 2), (1, 30, "B", 3),
         (1, 40, "A", 4)],
        "u int, ts long, t string, eid int",
    )
    got = [
        (r.u, r.match_ts)
        for r in detect_event_pattern(
            ev, "ts", ["u"], "t", ["A", "A", "B"], within=100,
            tiebreak_col="eid",
        ).collect()
    ]
    assert got == [(1, 10)]
    # single-step pattern degenerates to a type filter
    one = detect_event_pattern(
        ev, "ts", ["u"], "t", ["B"], within=10**9
    ).count()
    assert one == 1
    with _pytest.raises(ValueError):
        detect_event_pattern(ev, "ts", ["u"], "t", [], within=1)
