"""F7 — grouped errors-in-variables (ODR) linear regression
(SURVEY.md §2.7/2.8).

Reference: ``srcdf.photometric_solution`` (srcdf.py:220-363) fits
``y = ZP + c·x`` with ``scipy.odr`` (errors on BOTH axes), seeds
``beta0=[20, −0.01]`` (srcdf.py:330), and appends the fitted scalars as
four constant columns ``fit_zp / sig_fit_zp / fit_clrcoeff /
sig_fit_clrcoeff`` (srcdf.py:350-359).

scipy is not available in this environment, so the kernel is a pure-numpy
iteratively-reweighted orthogonal fit: for the linear model the ODR
objective is Σ (yᵢ − b0 − b1·xᵢ)² / (σy,ᵢ² + b1²·σx,ᵢ²); holding the
weights wᵢ = 1/(σy,ᵢ² + b1²·σx,ᵢ²) fixed gives a weighted least squares
with a closed form, and iterating to a fixed point solves the full
objective (standard IRLS for errors-in-variables; equivalent to Deming
regression when error ratios are constant).  Parameter errors follow
scipy.odr's convention: sqrt(diag(cov)·s²) with s² = χ²/(n−2).

Spark shape: ``applyInPandas`` per group (the groups are per
(EXPID, RCID, FILTERID) — thousands of rows each), then the tiny result is
broadcast-joined back (the reference's "append constant columns").
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..utils import check_col


def _profile_chi2(b1: float, x, y, sx, sy) -> tuple[float, float]:
    """Concentrated ODR objective: for the linear model, optimizing out the
    latent x̂ᵢ gives χ²(b0,b1) = Σ (yᵢ−b0−b1·xᵢ)² / (σyᵢ² + b1²σxᵢ²); b0 is
    then the weighted mean of (y − b1·x).  Returns (χ², b0)."""
    w = 1.0 / (sy * sy + b1 * b1 * sx * sx)
    sw = w.sum()
    b0 = (w * (y - b1 * x)).sum() / sw
    r = y - b0 - b1 * x
    return float((w * r * r).sum()), float(b0)


def odr_fit_numpy(
    x: np.ndarray,
    y: np.ndarray,
    sx: np.ndarray,
    sy: np.ndarray,
    beta0: tuple[float, float] = (20.0, -0.01),
    max_iter: int = 200,
    tol: float = 1e-14,
) -> tuple[float, float, float, float, int]:
    """Fit y = b0 + b1·x with errors on both axes (true ODR, not IRLS:
    the weights' dependence on b1 is part of the objective, so the slope is
    found by exact 1-D minimization of the profile χ² — grid-bracketed
    golden-section; deterministic).

    Returns (b0, b1, sd_b0, sd_b1, n_evals).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    sx = np.asarray(sx, dtype=np.float64)
    sy = np.asarray(sy, dtype=np.float64)
    n_eval = 0

    def S(b1: float) -> float:
        nonlocal n_eval
        n_eval += 1
        return _profile_chi2(b1, x, y, sx, sy)[0]

    # center the bracket on the WLS slope (exact when sx ≡ 0)
    w0 = np.where(sy > 0, 1.0 / np.maximum(sy * sy, 1e-300), 1.0)
    sw = w0.sum()
    swx = (w0 * x).sum()
    swy = (w0 * y).sum()
    swxx = (w0 * x * x).sum()
    swxy = (w0 * x * y).sum()
    det = sw * swxx - swx * swx
    c = (sw * swxy - swx * swy) / det if det != 0 else float(beta0[1])
    if not np.isfinite(c):
        c = float(beta0[1])
    if not np.any(sx > 0):
        # pure WLS: closed form, no search needed
        b1 = c
        b0 = (swxx * swy - swx * swxy) / det
    else:
        # expand a grid around c until the minimum is interior
        span = max(1.0, abs(c))
        lo = hi = None
        for _ in range(60):
            grid = np.linspace(c - span, c + span, 41)
            vals = np.array([S(g) for g in grid])
            k = int(np.argmin(vals))
            if 0 < k < len(grid) - 1:
                lo, hi = grid[k - 1], grid[k + 1]
                break
            span *= 4.0
        if lo is None:
            lo, hi = c - span, c + span
        # golden-section refine
        gr = (np.sqrt(5.0) - 1) / 2
        a, b = float(lo), float(hi)
        c1 = b - gr * (b - a)
        c2 = a + gr * (b - a)
        f1, f2 = S(c1), S(c2)
        for _ in range(max_iter):
            if b - a <= tol * max(1.0, abs(a) + abs(b)):
                break
            if f1 < f2:
                b, c2, f2 = c2, c1, f1
                c1 = b - gr * (b - a)
                f1 = S(c1)
            else:
                a, c1, f1 = c1, c2, f2
                c2 = a + gr * (b - a)
                f2 = S(c2)
        b1 = (a + b) / 2
        _, b0 = _profile_chi2(b1, x, y, sx, sy)

    # linearized covariance at the solution, scaled by reduced chi²
    # (scipy.odr convention: sd_beta = sqrt(diag(cov) * res_var))
    w = 1.0 / (sy * sy + b1 * b1 * sx * sx)
    sw = w.sum()
    swx = (w * x).sum()
    swxx = (w * x * x).sum()
    det = sw * swxx - swx * swx
    chi2, b0 = _profile_chi2(b1, x, y, sx, sy)
    dof = max(len(x) - 2, 1)
    s2 = chi2 / dof
    sd_b0 = float(np.sqrt(swxx / det * s2))
    sd_b1 = float(np.sqrt(sw / det * s2))
    return float(b0), float(b1), sd_b0, sd_b1, n_eval


def photometric_solution(
    df: DataFrame,
    x_col: str,
    y_col: str,
    sx_col: str,
    sy_col: str,
    group_cols: Sequence[str] | None = None,
    beta0: tuple[float, float] = (20.0, -0.01),
    min_points: int = 3,
) -> DataFrame:
    """Per-group ODR fit → small DataFrame of fitted scalars.

    Output columns: group cols + ``fit_zp, sig_fit_zp, fit_clrcoeff,
    sig_fit_clrcoeff, n_points`` (names per srcdf.py:350-359; zp = b0,
    clrcoeff = b1).  Rows with zero/NULL errors on both axes are dropped
    first (reference P5, srcdf.py:276-282 drops zero-error rows).
    """
    check_col([x_col, y_col, sx_col, sy_col], df)
    groups = list(group_cols) if group_cols else []
    if groups:
        check_col(groups, df)
    work = df.select(*groups, x_col, y_col, sx_col, sy_col).filter(
        F.col(y_col).isNotNull()
        & F.col(x_col).isNotNull()
        & ~((F.coalesce(F.col(sy_col), F.lit(0.0)) == 0)
            & (F.coalesce(F.col(sx_col), F.lit(0.0)) == 0))
    )
    if not groups:
        work = work.withColumn("__g", F.lit(1))
        groups_eff = ["__g"]
    else:
        groups_eff = groups

    fields = [next(f for f in work.schema.fields if f.name == g) for g in groups_eff]
    schema = T.StructType(
        fields
        + [
            T.StructField("fit_zp", T.DoubleType()),
            T.StructField("sig_fit_zp", T.DoubleType()),
            T.StructField("fit_clrcoeff", T.DoubleType()),
            T.StructField("sig_fit_clrcoeff", T.DoubleType()),
            T.StructField("n_points", T.LongType()),
        ]
    )

    # one Python call per Arrow batch of key-sorted groups (not per group
    # — see utils.grouped_map_in_pandas), each group fit in numpy
    def fit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        keys = dict(zip(groups_eff, key))
        if len(pdf) < min_points:
            vals = dict(fit_zp=np.nan, sig_fit_zp=np.nan, fit_clrcoeff=np.nan,
                        sig_fit_clrcoeff=np.nan, n_points=len(pdf))
        else:
            sx = pdf[sx_col].fillna(0.0).to_numpy()
            sy = pdf[sy_col].fillna(0.0).to_numpy()
            b0, b1, sd0, sd1, _ = odr_fit_numpy(
                pdf[x_col].to_numpy(), pdf[y_col].to_numpy(), sx, sy, beta0
            )
            vals = dict(fit_zp=b0, sig_fit_zp=sd0, fit_clrcoeff=b1,
                        sig_fit_clrcoeff=sd1, n_points=len(pdf))
        return pd.DataFrame([{**keys, **vals}])

    from ..utils import grouped_map_in_pandas

    out = grouped_map_in_pandas(work, groups_eff, fit, schema)
    return out.drop("__g") if not groups else out


def attach_solution(
    df: DataFrame, solution: DataFrame, group_cols: Sequence[str] | None = None
) -> DataFrame:
    """Broadcast the fitted scalars back onto the source rows — the Spark
    form of the reference's append-constant-columns (srcdf.py:350-359)."""
    if group_cols:
        return df.join(F.broadcast(solution), on=list(group_cols), how="left")
    return df.crossJoin(F.broadcast(solution))


__all__ = ["odr_fit_numpy", "photometric_solution", "attach_solution"]
