"""operators/stats.corr_matrix — numpy parity (at the quantized values),
partitioning invariance, degenerate columns, NULL-row policy."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from dataslicer_spark.operators.stats import corr_matrix


def _np_corr(xs, ys, scale):
    xq = np.floor(np.array(xs) * scale)
    yq = np.floor(np.array(ys) * scale)
    n = len(xq)
    num = n * (xq * yq).sum() - xq.sum() * yq.sum()
    va = n * (xq * xq).sum() - xq.sum() ** 2
    vb = n * (yq * yq).sum() - yq.sum() ** 2
    return num / (math.sqrt(va) * math.sqrt(vb))


def test_matches_numpy(spark):
    rng = random.Random(3)
    rows = [
        (rng.uniform(0, 50), rng.uniform(0, 1000), rng.uniform(-5, 5))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {
        (r["var_x"], r["var_y"]): r
        for r in corr_matrix(df, ["a", "b", "c"], scale=100.0).collect()
    }
    assert len(got) == 3
    cols = list(zip(*rows))
    names = ["a", "b", "c"]
    for i in range(3):
        for j in range(i + 1, 3):
            r = got[(names[i], names[j])]
            assert r["n"] == 400
            expect = _np_corr(cols[i], cols[j], 100.0)
            assert r["corr"] == pytest.approx(expect, rel=1e-12)


def test_perfect_and_anti_correlation(spark):
    rows = [(float(i), 2.0 * i + 3.0, -1.0 * i) for i in range(50)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {
        (r["var_x"], r["var_y"]): r["corr"]
        for r in corr_matrix(df, ["x", "y", "z"], scale=1000.0).collect()
    }
    assert got[("x", "y")] == pytest.approx(1.0, abs=1e-12)
    assert got[("x", "z")] == pytest.approx(-1.0, abs=1e-12)


def test_zero_variance_yields_null(spark):
    rows = [(float(i), 7.0) for i in range(10)]
    df = spark.createDataFrame(rows, "x double, k double")
    r = corr_matrix(df, ["x", "k"]).collect()[0]
    assert r["corr"] is None


def test_null_rows_dropped_listwise(spark):
    rows = [(1.0, 2.0), (2.0, 4.0), (None, 9.0), (3.0, None), (3.0, 6.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = corr_matrix(df, ["x", "y"]).collect()[0]
    assert r["n"] == 3
    assert r["corr"] == pytest.approx(1.0, abs=1e-12)


def test_partitioning_invariance_bitwise(spark):
    rng = random.Random(9)
    rows = [(rng.uniform(0, 9e5), rng.uniform(0, 50)) for _ in range(3000)]
    df = spark.createDataFrame(rows, "p double, q double")
    one = corr_matrix(df.coalesce(1), ["p", "q"]).collect()[0]["corr"]
    many = corr_matrix(df.repartition(32), ["p", "q"]).collect()[0]["corr"]
    assert one == many  # bit-identical, not approx


# ---- weighted_median ----

from dataslicer_spark.operators.aggregates import weighted_median


def _py_wmedian(pairs):
    """Lower weighted median of (value, int_weight) pairs."""
    agg = {}
    for v, w in pairs:
        if v is None or w is None or w <= 0:
            continue
        agg[v] = agg.get(v, 0) + w
    tot = sum(agg.values())
    cum = 0
    for v in sorted(agg):
        cum += agg[v]
        if 2 * cum >= tot:
            return v, tot
    return None, 0


def test_weighted_median_matches_python(spark):
    rng = random.Random(5)
    pairs = [
        (round(rng.uniform(0, 100), 2), rng.randrange(1, 9))
        for _ in range(500)
    ] + [(50.0, 3), (50.0, 4)]  # forced value ties
    df = spark.createDataFrame(
        [("g", v, float(w)) for v, w in pairs], "g string, v double, w double"
    )
    r = weighted_median(df, ["g"], "v", "w").collect()[0]
    ev, et = _py_wmedian(pairs)
    assert (r["weighted_median"], r["total_weight"]) == (ev, et)


def test_weighted_median_weight_dominance(spark):
    # one huge weight drags the median to its value regardless of count
    rows = [("g", float(i), 1.0) for i in range(100)] + [("g", 77.5, 1000.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    r = weighted_median(df, ["g"], "v", "w").collect()[0]
    assert r["weighted_median"] == 77.5


def test_weighted_median_drops_nonpositive_and_null(spark):
    rows = [
        ("g", 1.0, 5.0), ("g", 2.0, 0.0), ("g", 3.0, -2.0),
        ("g", None, 9.0), ("g", 9.0, None),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    r = weighted_median(df, ["g"], "v", "w").collect()[0]
    assert (r["weighted_median"], r["total_weight"]) == (1.0, 5)


def test_weighted_median_even_split_takes_lower(spark):
    rows = [("g", 10.0, 1.0), ("g", 20.0, 1.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    r = weighted_median(df, ["g"], "v", "w").collect()[0]
    assert r["weighted_median"] == 10.0  # 2*cum(10)=2 >= tot=2
