"""M2 Jenks natural-breaks binning + M3 IQR-based outlier rejection
(SURVEY.md §2.8).

Reference: ``ps1based_outlier_rm_iqr`` (_objtable_methods.py:265-421):
per-cluster mean magnitude & mean offset vs the reference catalog → Jenks
natural breaks over the means (``jenkspy`` + ``pd.cut``,
_objtable_methods.py:344-346) → per-bin median + IQR of the offset →
``norm = |offset − median_bin| / IQR_bin`` → clusters with
``not (norm < cut)`` are outliers (pandas semantics: NaN norm ⇒ outlier).

Spark design: the per-cluster aggregation shuffles once; the Jenks DP runs
driver-side on the *aggregated* per-cluster means (a few thousand values —
bounded by cluster count, not row count; at extreme cluster counts pass
``max_sample`` to fit breaks on a sample).  Binning and the norm filter are
pure Catalyst expressions.  Tri-valued logic is handled explicitly:
``coalesce(norm < cut, false)`` reproduces pandas' NaN-is-outlier behavior
(Spark would otherwise silently drop NULL comparisons — SURVEY.md §2.8 M3).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import check_col


def jenks_breaks(values, n_bins: int, max_fit_n: int = 2000) -> list[float]:
    """Fisher-Jenks natural breaks via O(k·n²) dynamic programming
    (numpy-vectorized inner loop).

    Returns ``n_bins + 1`` edges (min … max), same contract as
    ``jenkspy.jenks_breaks``.  Above ``max_fit_n`` values the DP runs on a
    deterministic quantile skeleton (every ⌈n/max_fit_n⌉-th sorted value) —
    the DP is quadratic, and breaks fitted on the skeleton are
    indistinguishable for binning purposes.
    """
    x = np.sort(np.asarray(values, dtype=np.float64))
    n = len(x)
    if n == 0:
        raise ValueError("jenks_breaks: empty input")
    if n > max_fit_n:
        idx = np.round(np.linspace(0, n - 1, max_fit_n)).astype(np.int64)
        x = x[idx]
        n = len(x)
    k = min(n_bins, n)
    # prefix sums → SSE of any segment in O(1)
    s1 = np.concatenate([[0.0], np.cumsum(x)])
    s2 = np.concatenate([[0.0], np.cumsum(x * x)])

    def sse(i: int, j: int) -> float:  # segment x[i:j]
        m = j - i
        s = s1[j] - s1[i]
        return (s2[j] - s2[i]) - s * s / m

    INF = float("inf")
    cost = np.full((k + 1, n + 1), INF)
    back = np.zeros((k + 1, n + 1), dtype=np.int64)
    cost[0, 0] = 0.0
    for m in range(1, k + 1):
        for j in range(m, n + 1):
            i = np.arange(m - 1, j)
            width = j - i
            s = s1[j] - s1[i]
            c = cost[m - 1, i] + (s2[j] - s2[i]) - s * s / width
            a = int(np.argmin(c))
            cost[m, j] = c[a]
            back[m, j] = i[a]
    # recover break positions; edge = last value of the left class
    # (right-closed bins, jenkspy convention)
    edges = [float(x[-1])]
    j = n
    for m in range(k, 0, -1):
        i = back[m, j]
        edges.append(float(x[i - 1]) if i > 0 else float(x[0]))
        j = i
    return list(reversed(edges))


def bin_by_breaks(
    df: DataFrame, col: str, breaks: Sequence[float], out_col: str = "mag_bin"
) -> DataFrame:
    """Assign bin index 0..k−1 by break edges, matching
    ``pd.cut(..., include_lowest=True)``: intervals are right-closed,
    the first is also left-closed; values outside the edges get NULL."""
    check_col(col, df)
    c = F.col(col)
    expr = F.lit(None).cast("int")
    k = len(breaks) - 1
    # build from the last bin backwards so the first matching WHEN wins
    cases = F.when((c >= breaks[0]) & (c <= breaks[1]), F.lit(0))
    for i in range(1, k):
        cases = cases.when((c > breaks[i]) & (c <= breaks[i + 1]), F.lit(i))
    expr = cases.otherwise(F.lit(None).cast("int"))
    return df.withColumn(out_col, expr)


def _bounded_sample_values(
    df: DataFrame, col: str, max_sample: int | None
) -> np.ndarray:
    """Collect ``col`` to the driver, capped at ``max_sample`` rows no
    matter how large ``df`` is.

    The cap is enforced DISTRIBUTEDLY: order by a value hash and take the
    first ``max_sample`` (TakeOrderedAndProject — each executor keeps at
    most ``max_sample`` rows, the driver merges).  Hash order makes the
    subset pseudo-random yet deterministic across runs/partitionings —
    no count-then-sample second job, and the driver never sees more than
    ``max_sample`` values even at a 10⁶⁺ cluster count.
    """
    sel = df.select(F.col(col)).filter(
        F.col(col).isNotNull() & ~F.isnan(F.col(col))
    )
    if max_sample is not None:
        sel = sel.orderBy(F.xxhash64(F.col(col))).limit(max_sample)
    return np.asarray([r[0] for r in sel.collect()], dtype=np.float64)


def ps1based_outlier_rm_iqr(
    df: DataFrame,
    cal_mag_col: str,
    ref_mag_col: str,
    norm_mag_diff_cut: float,
    cluster_col: str = "clusterID",
    n_mag_bins: int = 10,
    max_sample: int | None = 200_000,
) -> tuple[DataFrame, DataFrame]:
    """M3 — reject clusters whose mean offset from the reference catalog is
    an IQR-outlier within their magnitude bin.  Returns (kept, outliers).

    Pipeline (one cluster-key shuffle + driver-side Jenks on aggregates):

    1. per-cluster ``av_mag = mean(cal)``, ``av_dist = mean(cal − ref)``
       (reference ``norm_mag_dist`` _objtable_methods.py:337-363);
    2. Jenks breaks over av_mag (M2) → ``mag_bin``;
    3. per-bin ``median(av_dist)``, ``IQR(av_dist)`` (A5);
    4. ``norm = |av_dist − median_bin| / IQR_bin``;
    5. outlier clusters: ``NOT coalesce(norm < cut, false)`` — NULL/NaN
       norm (e.g. zero IQR, unbinned cluster) ⇒ outlier, as in pandas.
    """
    check_col([cal_mag_col, ref_mag_col, cluster_col], df)
    per_cluster = df.groupBy(cluster_col).agg(
        F.avg(F.col(cal_mag_col)).alias("av_mag"),
        F.avg(F.col(cal_mag_col) - F.col(ref_mag_col)).alias("av_dist"),
    )
    per_cluster = per_cluster.cache()

    mags = _bounded_sample_values(per_cluster, "av_mag", max_sample)
    breaks = jenks_breaks(mags, n_mag_bins)

    binned = bin_by_breaks(per_cluster, "av_mag", breaks, out_col="mag_bin")
    per_bin = binned.groupBy("mag_bin").agg(
        (
            F.percentile(F.col("av_dist"), F.lit(0.75))
            - F.percentile(F.col("av_dist"), F.lit(0.25))
        ).alias("iqr_dist"),
        F.median(F.col("av_dist")).alias("median_dist"),
    )
    # try_divide: zero IQR → NULL norm (ANSI mode would raise); NULL norm is
    # an outlier below, matching pandas' NaN-propagating division.
    scored = binned.join(F.broadcast(per_bin), on="mag_bin", how="left").withColumn(
        "norm",
        F.try_divide(
            F.abs(F.col("av_dist") - F.col("median_dist")), F.col("iqr_dist")
        ),
    )
    # pandas parity: NaN / NULL norm ⇒ outlier (not (NaN < cut) is True)
    is_ok = F.coalesce(
        F.when(F.isnan(F.col("norm")), F.lit(False)).otherwise(
            F.col("norm") < norm_mag_diff_cut
        ),
        F.lit(False),
    )
    verdict = scored.select(cluster_col, is_ok.alias("__ok"))
    kept = df.join(verdict.filter(F.col("__ok")).drop("__ok"), cluster_col, "inner")
    outliers = df.join(
        verdict.filter(~F.col("__ok")).drop("__ok"), cluster_col, "inner"
    )
    return kept, outliers


__all__ = ["jenks_breaks", "bin_by_breaks", "ps1based_outlier_rm_iqr"]
