"""operators/drift.histogram_drift — parity against a Python-computed
total variation distance, NULL-bucket semantics, one-sided groups."""

from __future__ import annotations

import math
from collections import Counter

from dataslicer_spark.operators.drift import histogram_drift


def _py_tvd(a_vals, b_vals, width):
    bucket = lambda v: None if v is None else math.floor(v / width)
    ca, cb = Counter(map(bucket, a_vals)), Counter(map(bucket, b_vals))
    na, nb = sum(ca.values()), sum(cb.values())
    keys = set(ca) | set(cb)
    l1 = sum(abs(ca[k] * nb - cb[k] * na) for k in keys)
    return na, nb, l1, (l1 / (2 * na * nb) if na and nb else None)


def test_drift_matches_python(spark):
    a = [("x", v) for v in [1.0, 2.0, 7.0, 7.5, None, 12.0]] + [
        ("y", v) for v in [0.0, 4.9, 5.0]
    ]
    b = [("x", v) for v in [1.0, 11.0, 11.5, None, None]] + [
        ("y", v) for v in [5.1, 9.0, 20.0, 20.0]
    ]
    df_a = spark.createDataFrame(a, "g string, v double")
    df_b = spark.createDataFrame(b, "g string, v double")
    rows = {
        r["g"]: r
        for r in histogram_drift(df_a, df_b, ["g"], "v", 5.0).collect()
    }
    for g in ("x", "y"):
        na, nb, l1, tvd = _py_tvd(
            [v for k, v in a if k == g], [v for k, v in b if k == g], 5.0
        )
        r = rows[g]
        assert (r["n_a"], r["n_b"], r["l1_cross"]) == (na, nb, l1)
        assert math.isclose(r["tvd"], tvd, rel_tol=1e-15)


def test_identical_distributions_zero_tvd(spark):
    vals = [("g", float(i % 7)) for i in range(50)]
    df = spark.createDataFrame(vals, "g string, v double")
    r = histogram_drift(df, df, ["g"], "v", 2.0).collect()[0]
    assert r["l1_cross"] == 0 and r["tvd"] == 0.0


def test_one_sided_group_yields_null_tvd(spark):
    df_a = spark.createDataFrame([("only_a", 1.0)], "g string, v double")
    df_b = spark.createDataFrame([("only_b", 2.0)], "g string, v double")
    rows = {
        r["g"]: r
        for r in histogram_drift(df_a, df_b, ["g"], "v", 1.0).collect()
    }
    assert rows["only_a"]["n_b"] == 0 and rows["only_a"]["tvd"] is None
    assert rows["only_b"]["n_a"] == 0 and rows["only_b"]["tvd"] is None


def test_disjoint_supports_tvd_one(spark):
    df_a = spark.createDataFrame([("g", 1.0)] * 9, "g string, v double")
    df_b = spark.createDataFrame([("g", 100.0)] * 4, "g string, v double")
    r = histogram_drift(df_a, df_b, ["g"], "v", 5.0).collect()[0]
    assert r["tvd"] == 1.0
