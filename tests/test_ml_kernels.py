"""Tests for Jenks binning (M2), the IQR outlier pass (M3), and the grouped
ODR regression (F7)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.outliers import (
    bin_by_breaks,
    jenks_breaks,
    ps1based_outlier_rm_iqr,
)
from dataslicer_spark.operators.regression import (
    attach_solution,
    odr_fit_numpy,
    photometric_solution,
)


# ---------------------------------------------------------------------------
# M2 — Jenks
# ---------------------------------------------------------------------------

def _brute_jenks_cost(x, edges_idx):
    cost = 0.0
    bounds = [0] + list(edges_idx) + [len(x)]
    for a, b in zip(bounds[:-1], bounds[1:]):
        seg = x[a:b]
        cost += ((seg - seg.mean()) ** 2).sum()
    return cost


def test_jenks_is_optimal_small():
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(0, 100, 12))
    k = 3
    breaks = jenks_breaks(x, k)
    # engine cost
    bins = np.searchsorted(breaks[1:-1], x, side="left")
    cost = sum(
        ((x[bins == b] - x[bins == b].mean()) ** 2).sum()
        for b in np.unique(bins)
    )
    # brute force over all 2-cut positions
    best = min(
        _brute_jenks_cost(x, cuts)
        for cuts in itertools.combinations(range(1, len(x)), k - 1)
    )
    assert cost == pytest.approx(best, rel=1e-9)


def test_jenks_separates_obvious_clusters():
    x = np.concatenate([np.random.default_rng(4).normal(c, 0.1, 20)
                        for c in (0.0, 10.0, 50.0)])
    b = jenks_breaks(x, 3)
    assert len(b) == 4
    # right-closed convention: each inner edge is the last value of a class
    assert -1 < b[1] < 1 and 9 < b[2] < 11  # classes end at the clumps


def test_bin_by_breaks_matches_pd_cut(spark):
    rng = np.random.default_rng(5)
    vals = rng.uniform(0, 100, 200)
    breaks = jenks_breaks(vals, 5)
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)], "id long, v double"
    )
    got = (
        bin_by_breaks(df, "v", breaks, out_col="b")
        .toPandas().sort_values("id").b.to_numpy()
    )
    expect = pd.cut(
        vals, bins=breaks, labels=False, include_lowest=True
    )
    np.testing.assert_array_equal(got, expect)


# ---------------------------------------------------------------------------
# M3 — IQR outlier pass
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def clustered_df(spark):
    """120 clusters of 5 rows; clusters 0-2 get a large injected offset."""
    rng = np.random.default_rng(6)
    rows = []
    for cid in range(120):
        base_mag = rng.uniform(15, 20)
        offset = 5.0 if cid < 3 else rng.normal(0, 0.01)
        for i in range(5):
            cal = base_mag + rng.normal(0, 0.005)
            rows.append((cid, float(cal), float(cal - offset)))
    return spark.createDataFrame(rows, "clusterID long, cal_mag double, ps1mag double")


def test_iqr_outlier_pass_finds_injected(clustered_df):
    kept, outliers = ps1based_outlier_rm_iqr(
        clustered_df, "cal_mag", "ps1mag", norm_mag_diff_cut=2.5,
        n_mag_bins=5,
    )
    bad = {r.clusterID for r in outliers.select("clusterID").distinct().collect()}
    assert {0, 1, 2} <= bad
    assert len(bad) < 20  # few false positives
    assert kept.count() + outliers.count() == clustered_df.count()


def test_iqr_outlier_row_order_invariant(clustered_df):
    kept1, _ = ps1based_outlier_rm_iqr(
        clustered_df, "cal_mag", "ps1mag", 2.5, n_mag_bins=5
    )
    kept2, _ = ps1based_outlier_rm_iqr(
        clustered_df.orderBy(F.rand(seed=1)), "cal_mag", "ps1mag", 2.5, n_mag_bins=5
    )
    a = sorted(r.clusterID for r in kept1.select("clusterID").distinct().collect())
    b = sorted(r.clusterID for r in kept2.select("clusterID").distinct().collect())
    assert a == b


def test_iqr_nan_norm_is_outlier(spark):
    # two clusters with identical av_dist in a bin → IQR 0 → norm NaN/inf
    rows = [(0, 10.0, 10.0), (0, 10.1, 10.1), (1, 10.0, 10.0), (1, 10.1, 10.1)]
    df = spark.createDataFrame(rows, "clusterID long, cal_mag double, ps1mag double")
    kept, outliers = ps1based_outlier_rm_iqr(df, "cal_mag", "ps1mag", 2.5, n_mag_bins=1)
    # pandas parity: not (NaN < cut) → outlier; zero-IQR makes norm NaN (0/0)
    assert kept.count() == 0
    assert outliers.count() == 4


# ---------------------------------------------------------------------------
# F7 — ODR
# ---------------------------------------------------------------------------

def test_odr_reduces_to_wls_when_no_x_error():
    rng = np.random.default_rng(8)
    x = rng.uniform(-1, 1, 200)
    y = 20.0 - 0.05 * x + rng.normal(0, 0.01, 200)
    sy = np.full(200, 0.01)
    sx = np.zeros(200)
    b0, b1, sd0, sd1, _ = odr_fit_numpy(x, y, sx, sy)
    # closed-form WLS
    w = 1.0 / (sy * sy)
    A = np.array([[w.sum(), (w * x).sum()], [(w * x).sum(), (w * x * x).sum()]])
    rhs = np.array([(w * y).sum(), (w * x * y).sum()])
    expect = np.linalg.solve(A, rhs)
    assert b0 == pytest.approx(expect[0], rel=1e-10)
    assert b1 == pytest.approx(expect[1], rel=1e-10)
    assert sd0 > 0 and sd1 > 0


def test_odr_handles_x_errors_better_than_ols():
    rng = np.random.default_rng(9)
    true_b0, true_b1 = 20.0, -0.8
    xt = rng.uniform(-2, 2, 4000)
    x = xt + rng.normal(0, 0.5, 4000)   # large x errors → OLS attenuates
    y = true_b0 + true_b1 * xt + rng.normal(0, 0.05, 4000)
    ols = np.polyfit(x, y, 1)[0]
    b0, b1, *_ = odr_fit_numpy(
        x, y, np.full(4000, 0.5), np.full(4000, 0.05)
    )
    assert abs(b1 - true_b1) < abs(ols - true_b1)  # less attenuation
    assert b1 == pytest.approx(true_b1, abs=0.05)


def test_photometric_solution_grouped(spark):
    rng = np.random.default_rng(10)
    rows = []
    truths = {1: (25.0, 0.1), 2: (26.0, -0.2)}
    for fid, (zp, c) in truths.items():
        for _ in range(300):
            x = rng.uniform(-1, 1)
            y = zp + c * x + rng.normal(0, 0.01)
            rows.append((fid, float(x), float(y), 0.01, 0.01))
    df = spark.createDataFrame(
        rows, "FILTERID int, color double, ymag double, e_color double, e_ymag double"
    )
    sol = photometric_solution(
        df, x_col="color", y_col="ymag", sx_col="e_color", sy_col="e_ymag",
        group_cols=["FILTERID"],
    ).toPandas().set_index("FILTERID")
    for fid, (zp, c) in truths.items():
        assert sol.loc[fid, "fit_zp"] == pytest.approx(zp, abs=0.01)
        assert sol.loc[fid, "fit_clrcoeff"] == pytest.approx(c, abs=0.01)
        assert sol.loc[fid, "n_points"] == 300

    # attach back as constant columns (reference srcdf.py:350-359)
    joined = attach_solution(df, spark.createDataFrame(sol.reset_index()), ["FILTERID"])
    assert joined.count() == 600
    assert "fit_zp" in joined.columns


def test_photometric_solution_ungrouped(spark):
    rng = np.random.default_rng(12)
    rows = [
        (float(x), float(20.0 + 0.5 * x + rng.normal(0, 0.01)), 0.0, 0.01)
        for x in rng.uniform(-1, 1, 200)
    ]
    df = spark.createDataFrame(rows, "x double, y double, sx double, sy double")
    sol = photometric_solution(df, "x", "y", "sx", "sy").toPandas()
    assert len(sol) == 1
    assert sol.fit_zp[0] == pytest.approx(20.0, abs=0.01)
    assert sol.fit_clrcoeff[0] == pytest.approx(0.5, abs=0.01)


def test_bounded_sample_caps_driver_rows(spark):
    """The Jenks input collect must stay bounded by max_sample no matter
    how many clusters exist (100 TB guard: VERDICT r2 #3)."""
    from dataslicer_spark.operators.outliers import _bounded_sample_values

    big = spark.range(1_000_000).select(
        (F.col("id").cast("double") / 1000.0).alias("av_mag")
    )
    got = _bounded_sample_values(big, "av_mag", 5_000)
    assert len(got) == 5_000
    # deterministic across calls (hash order, not sampling RNG state)
    again = _bounded_sample_values(big, "av_mag", 5_000)
    assert np.array_equal(np.sort(got), np.sort(again))
    # uncapped path returns everything
    small = spark.range(100).select(F.col("id").cast("double").alias("av_mag"))
    assert len(_bounded_sample_values(small, "av_mag", None)) == 100
    assert len(_bounded_sample_values(small, "av_mag", 5_000)) == 100


def test_photometric_solution_keeps_null_group(spark):
    """A NULL group key is a real group (Spark groupBy semantics) — the
    batched grouped-map path must not let pandas' dropna default eat it."""
    import numpy as np

    from dataslicer_spark.operators.regression import photometric_solution

    rng = np.random.RandomState(5)
    rows = []
    for g in [1, None]:
        for i in range(20):
            x = float(rng.uniform(0, 2))
            rows.append((g, x, 20.0 - 0.01 * x + float(rng.normal(0, 1e-3)),
                         0.01, 0.01))
    df = spark.createDataFrame(
        rows, "ccdid int, x double, y double, sx double, sy double"
    )
    out = photometric_solution(df, "x", "y", "sx", "sy", group_cols=["ccdid"])
    got = {r["ccdid"]: r["n_points"] for r in out.collect()}
    assert set(got) == {1, None}
    assert got[None] == 20
