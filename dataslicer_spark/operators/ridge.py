"""Exact distributed ridge regression (normal equations + Cramer's rule)
— the regression member of the classical-ML-at-scale trio next to
k-means (clustering) and the batch perceptron (classification).

Shape: ONE aggregate job builds the (d+1)×(d+1) moment matrix
``[XᵀX + λI | Xᵀy]`` over integer features — map-side partial sums, so
the wire carries d² cells per partition, never rows (the same contract
as operators/pca.py's Gram kernel).  The solve happens on the driver in
EXACT integer arithmetic: Cramer's rule over the integer normal matrix
gives each weight as the rational ``det(A_j) / det(A)`` with
arbitrary-precision Python ints — no float linear algebra, no
conditioning concerns at these sizes, and (the point) an external SQL
engine can replay the determinants from the same aggregate cells.

Floats enter exactly once, by contract: each weight becomes
``float(num) / float(det)`` (both casts correctly rounded, then one
double division) — the same operation order as the oracle's
``CAST(num AS DOUBLE)/CAST(det AS DOUBLE)`` — and predictions evaluate
as a fixed-order double expression, so results are bit-identical across
engines.

Scope: integer (or integer-quantized) features, d ≤ 3 (+intercept) —
the Leibniz expansion the oracle mirrors is (d+1)! terms, and int128
headroom bounds the cell magnitudes; both are compile-time choices, not
algorithmic limits (at larger d you'd swap the driver solve for
``numpy.linalg.solve`` and lose only the SQL oracle, not the
distributed shape).
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import check_col


def _det_int(M: list[list[int]]) -> int:
    """Exact integer determinant, Leibniz expansion (n ≤ 4 here)."""
    n = len(M)
    total = 0
    for perm in permutations(range(n)):
        inv = sum(
            1
            for i in range(n)
            for j in range(i + 1, n)
            if perm[i] > perm[j]
        )
        prod = 1
        for i in range(n):
            prod *= M[i][perm[i]]
        total += -prod if inv % 2 else prod
    return total


def ridge_moments(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
) -> tuple[list[list[int]], list[int], int]:
    """One pass: ``(XᵀX, Xᵀy, n)`` as exact ints over the bias-augmented
    feature vector ``[1, f_1, …, f_d]``.  NULL rows are dropped.

    The distributed sums are int64 (Spark's widest integral type):
    ``Σ x_i·x_j`` must stay below 2⁶³ — under the session's ANSI mode an
    overflow THROWS rather than wrapping, so a violation is loud.  The
    int128 headroom note in the module docstring applies to the oracle's
    determinant algebra, which consumes these int64 cells."""
    check_col([label_col, *feature_cols], df)
    cond = F.col(label_col).isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    clean = df.filter(cond)
    xs: list[Column] = [F.lit(1).cast("long")] + [
        F.col(c).cast("long") for c in feature_cols
    ]
    y = F.col(label_col).cast("long")
    k = len(xs)
    aggs = []
    for i in range(k):
        for j in range(i, k):
            aggs.append(F.sum(xs[i] * xs[j]).alias(f"xx_{i}_{j}"))
        aggs.append(F.sum(xs[i] * y).alias(f"xy_{i}"))
    row = clean.agg(*aggs).collect()[0]
    XtX = [[0] * k for _ in range(k)]
    Xty = [0] * k
    for i in range(k):
        for j in range(i, k):
            v = int(row[f"xx_{i}_{j}"] or 0)
            XtX[i][j] = XtX[j][i] = v
        Xty[i] = int(row[f"xy_{i}"] or 0)
    n = XtX[0][0]
    return XtX, Xty, n


def ridge_fit_exact(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lam: int = 0,
) -> tuple[int, list[int]]:
    """Solve ``(XᵀX + λI)w = Xᵀy`` exactly: returns ``(det, nums)`` with
    ``w_j = nums[j] / det`` as exact rationals.  λ (integer) is added to
    every diagonal entry except the intercept's (standard ridge does not
    penalize the bias).  Raises on a singular system (det = 0)."""
    if len(feature_cols) > 3:
        raise ValueError(
            "ridge_fit_exact supports ≤3 features (+intercept); the "
            "(d+1)! Leibniz oracle and int128 headroom bound d"
        )
    XtX, Xty, _ = ridge_moments(df, feature_cols, label_col)
    k = len(Xty)
    A = [list(r) for r in XtX]
    for i in range(1, k):
        A[i][i] += int(lam)
    det = _det_int(A)
    if det == 0:
        raise ValueError("singular normal matrix (det=0) — drop a feature")
    nums = []
    for j in range(k):
        Aj = [list(r) for r in A]
        for i in range(k):
            Aj[i][j] = Xty[i]
        nums.append(_det_int(Aj))
    return det, nums


def ridge_weights(det: int, nums: list[int]) -> list[float]:
    """The contractual float conversion: round numerator and denominator
    to double FIRST, then one double division (mirrors the oracle's
    CAST(...)/CAST(...))."""
    fd = float(det)
    return [float(v) / fd for v in nums]


def ridge_predict(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    pred_col: str = "pred",
) -> DataFrame:
    """Map-only prediction: ``w0 + w1·f1 + …`` evaluated left-to-right
    in doubles (fixed operation order → engine-exact)."""
    check_col(feature_cols, df)
    acc: Column = F.lit(float(weights[0]))
    for wv, c in zip(weights[1:], feature_cols):
        acc = acc + F.lit(float(wv)) * F.col(c).cast("double")
    return df.withColumn(pred_col, acc)


__all__ = [
    "ridge_moments",
    "ridge_fit_exact",
    "ridge_weights",
    "ridge_predict",
]
