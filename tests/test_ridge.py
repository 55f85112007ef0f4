"""Exact distributed ridge regression (operators/ridge.py)."""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pytest

from dataslicer_spark.operators.ridge import (
    ridge_fit_exact,
    ridge_moments,
    ridge_predict,
    ridge_weights,
)


def _py_solve(rows, lam):
    """Independent exact solve with Fractions (Gaussian elimination)."""
    X = [[1] + list(r[:-1]) for r in rows]
    y = [r[-1] for r in rows]
    k = len(X[0])
    A = [[Fraction(sum(X[r][i] * X[r][j] for r in range(len(X))))
          for j in range(k)] for i in range(k)]
    b = [Fraction(sum(X[r][i] * y[r] for r in range(len(X))))
         for i in range(k)]
    for i in range(1, k):
        A[i][i] += lam
    # gaussian elimination over fractions
    for col in range(k):
        piv = next(r for r in range(col, k) if A[r][col] != 0)
        A[col], A[piv] = A[piv], A[col]
        b[col], b[piv] = b[piv], b[col]
        for r in range(k):
            if r != col and A[r][col] != 0:
                f = A[r][col] / A[col][col]
                for c in range(k):
                    A[r][c] -= f * A[col][c]
                b[r] -= f * b[col]
    return [b[i] / A[i][i] for i in range(k)]


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(200):
        a, b2, c = (int(v) for v in rng.integers(0, 40, 3))
        y = 7 + 3 * a - 2 * b2 + c + int(rng.integers(-3, 4))
        rows.append((i, a, b2, c, y))
    df = spark.createDataFrame(
        rows, "id long, a long, b long, c long, y long"
    )
    return rows, df


def test_exact_solution_matches_fraction_solve(data):
    rows, df = data
    for lam in (0, 1, 50):
        det, nums = ridge_fit_exact(df, ["a", "b", "c"], "y", lam=lam)
        want = _py_solve([r[1:] for r in rows], lam)
        got = [Fraction(v, det) for v in nums]
        assert got == want, lam


def test_recovers_generating_coefficients(data):
    rows, df = data
    det, nums = ridge_fit_exact(df, ["a", "b", "c"], "y", lam=0)
    w = ridge_weights(det, nums)
    assert abs(w[1] - 3) < 0.1 and abs(w[2] + 2) < 0.1 and abs(w[3] - 1) < 0.1


def test_partitioning_invariance(data):
    _, df = data
    a = ridge_fit_exact(df, ["a", "b"], "y", lam=1)
    b = ridge_fit_exact(df.repartition(17), ["a", "b"], "y", lam=1)
    assert a == b


def test_predictions_deterministic_and_match_manual(spark):
    df = spark.createDataFrame([(1, 2, 10)], "id long, a long, y long")
    out = ridge_predict(df, ["a"], [1.5, 0.25]).collect()[0]
    assert out.pred == 1.5 + 0.25 * 2.0


def test_singular_and_width_guards(spark):
    df = spark.createDataFrame(
        [(1, 2, 2, 5), (2, 4, 4, 9)], "id long, a long, b long, y long"
    )
    with pytest.raises(ValueError, match="singular"):
        ridge_fit_exact(df, ["a", "b"], "y", lam=0)  # b = a → collinear
    # λ regularizes the collinearity away
    det, nums = ridge_fit_exact(df, ["a", "b"], "y", lam=1)
    assert det != 0
    wide = df
    with pytest.raises(ValueError, match="3 features"):
        ridge_fit_exact(wide, ["a", "b", "a", "b"], "y")


def test_null_rows_dropped(spark):
    df = spark.createDataFrame(
        [(1, 1, 3), (2, None, 9), (3, 2, 5)], "id long, a long, y long"
    )
    XtX, Xty, n = ridge_moments(df, ["a"], "y")
    assert n == 2
    assert XtX == [[2, 3], [3, 5]]
    assert Xty == [8, 13]


def test_group_ols_matches_numpy_and_degenerate(spark):
    from dataslicer_spark.operators.aggregates import group_ols

    rng = np.random.default_rng(9)
    rows = []
    for g, (slope, icept) in (("a", (3.0, 10.0)), ("b", (-2.0, 5.0))):
        for i in range(100):
            x = int(rng.integers(0, 50))
            y = int(round(slope * x + icept + rng.integers(-2, 3)))
            rows.append((g, x, y))
    rows += [("c", 7, 1), ("c", 7, 9)]  # zero x-variance → NULL slope
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in group_ols(df, ["g"], "x", "y").collect()}

    import numpy as _np

    for g in ("a", "b"):
        xs = _np.array([r[1] for r in rows if r[0] == g], dtype=_np.int64)
        ys = _np.array([r[2] for r in rows if r[0] == g], dtype=_np.int64)
        n = len(xs)
        b_num = int(n * (xs * ys).sum() - xs.sum() * ys.sum())
        b_den = int(n * (xs * xs).sum() - xs.sum() ** 2)
        assert (got[g].b_num, got[g].b_den) == (b_num, b_den)
        assert abs(got[g].slope - (3.0 if g == "a" else -2.0)) < 0.1
        want_icept = (
            float(ys.sum()) - (float(b_num) / float(b_den)) * float(xs.sum())
        ) / float(n)
        assert got[g].intercept == want_icept
    assert got["c"].slope is None and got["c"].intercept is None
