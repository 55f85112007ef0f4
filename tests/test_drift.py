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


# ---------------------------------------------------------------------------
# ks_2sample — brute-force ECDF parity + validation
# ---------------------------------------------------------------------------


def test_ks_2sample_brute_force(spark):
    import numpy as np
    import pandas as pd

    from dataslicer_spark.operators.drift import ks_2sample

    rng = np.random.default_rng(5)
    n = 800
    pdf = pd.DataFrame(
        {
            "feat": rng.choice(["f1", "f2"], n),
            "lab": rng.choice(["a", "b", "c"], n),  # 'c' must be ignored
            "v": np.round(rng.normal(0, 1, n), 2),
        }
    )
    # shift one side of f2 so the two features differ
    pdf.loc[(pdf.feat == "f2") & (pdf.lab == "b"), "v"] += 1.5
    out = {
        r["feat"]: r
        for r in ks_2sample(
            spark.createDataFrame(pdf), "lab", "v", ["feat"], "a", "b"
        ).collect()
    }
    for feat in ("f1", "f2"):
        a = np.sort(pdf[(pdf.feat == feat) & (pdf.lab == "a")].v.to_numpy())
        b = np.sort(pdf[(pdf.feat == feat) & (pdf.lab == "b")].v.to_numpy())
        grid = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(a, grid, side="right") / len(a)
        fb = np.searchsorted(b, grid, side="right") / len(b)
        d = float(np.max(np.abs(fa - fb)))
        r = out[feat]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert abs(r["ks"] - d) < 1e-12
    assert out["f2"]["ks"] > out["f1"]["ks"]  # the injected shift shows

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ks_2sample(spark.createDataFrame(pdf), "lab", "v", [], "a", "b")
