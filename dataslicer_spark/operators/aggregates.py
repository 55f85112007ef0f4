"""Aggregation operators (SURVEY.md §2.4: A2-A7).

All are single-pass ``groupBy().agg(...)`` plans — Catalyst splits them into
partial (map-side) and final aggregation automatically, so each is one
shuffle of the *aggregated* keys, not the raw rows.  The reference computes
several of these with per-group Python loops (e.g. the RCID loop at
``_objtable_methods.py:248-250``); those collapse into one pass here.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import check_col, spread


def cluster_centroid(
    df: DataFrame,
    group_col: str = "clusterID",
    xname: str = "ra",
    yname: str = "dec",
) -> DataFrame:
    """A2 — per-cluster centroid: unweighted mean position.

    Reference: ``objtable.compute_cluster_centroid`` (objtable.py:171-198).
    """
    check_col([group_col, xname, yname], df)
    return df.groupBy(group_col).agg(
        F.avg(xname).alias(f"{xname}_centroid"),
        F.avg(yname).alias(f"{yname}_centroid"),
        F.count(F.lit(1)).alias("n_members"),
    )


def _fp_sum(col, bits: int):
    """Order-independent fixed-point sum: floor(x·2^k) into int64.

    Power-of-two scaling is exact in IEEE doubles, so the quantized sum is
    bit-reproducible regardless of partial-aggregation order / partitioning
    — used by the ``deterministic=True`` paths for cross-engine checksums.
    """
    m = float(2**bits)
    return F.sum(F.floor(col * F.lit(m)).cast("long")).cast("double") / m


def cluster_centroid_weighted(
    df: DataFrame,
    err_col: str,
    group_col: str = "clusterID",
    xname: str = "ra",
    yname: str = "dec",
    deterministic: bool = False,
) -> DataFrame:
    """A2 (weighted) — inverse-variance-weighted centroid.

    The reference declares this and raises ``NotImplementedError``
    (objtable.py:195-196); SURVEY.md §2.4 specifies the intent:
    ``sum(x/e²)/sum(1/e²)``.

    ``deterministic=True`` swaps double sums for fixed-point sums so the
    result is bit-reproducible across partitionings/engines (oracle checks).
    """
    check_col([group_col, xname, yname, err_col], df)
    w = 1.0 / (F.col(err_col) * F.col(err_col))
    if deterministic:
        sx = _fp_sum(F.col(xname) * w, 20)
        sy = _fp_sum(F.col(yname) * w, 20)
        sw = _fp_sum(w, 30)
    else:
        sx, sy, sw = F.sum(F.col(xname) * w), F.sum(F.col(yname) * w), F.sum(w)
    return df.groupBy(group_col).agg(
        (sx / sw).alias(f"{xname}_centroid"),
        (sy / sw).alias(f"{yname}_centroid"),
        F.count(F.lit(1)).alias("n_members"),
    )


def group_stats(
    df: DataFrame, group_col: str | Sequence[str], value_col: str
) -> DataFrame:
    """A3 — the reference's generic per-group stats dict
    (``group_stats`` df_utils.py:241-251): min/max/count/mean/std.

    Column naming follows ``<stat>_<col>`` so oracle SQL can alias
    identically.  ``stddev_samp`` matches pandas' ddof=1 default.
    """
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    check_col(groups + [value_col], df)
    c = F.col(value_col)
    return df.groupBy(*groups).agg(
        F.min(c).alias(f"min_{value_col}"),
        F.max(c).alias(f"max_{value_col}"),
        F.count(c).alias(f"count_{value_col}"),
        F.avg(c).alias(f"mean_{value_col}"),
        F.stddev_samp(c).alias(f"std_{value_col}"),
    )


def calibration_quality(
    df: DataFrame,
    cal_mag_col: str,
    ref_mag_col: str,
    group_cols: Sequence[str] = ("OBSMJD", "EXPID", "FIELDID", "FILTERID", "RCID"),
    mag_lo: float = 17.5,
    mag_hi: float = 18.5,
    order_cols: Sequence[str] = ("EXPID", "RCID"),
    deterministic: bool = False,
) -> DataFrame:
    """A4 — per-exposure calibration-quality aggregate.

    Reference: ``calculate_quality`` (_objtable_methods.py:190-262): filter
    to a magnitude bin, derive ``abs_millimag_diff = |cal − ref|·1000``,
    then per (exposure × readout-channel) compute mean→bias, std→spread,
    median, count→n_calibrators.  The reference loops over ``RCID`` values
    in Python (:248-250); here it is one groupBy over all keys, one shuffle.
    Exact ``median`` (Spark ≥3.4) matches the pandas median.

    Aggregates run on ``|cal − ref|`` and are scaled to millimag at the end
    (same value, keeps fixed-point headroom).  ``deterministic=True`` uses
    order-independent fixed-point sums for bias/spread.
    """
    check_col(list(group_cols) + [cal_mag_col, ref_mag_col], df)
    d0 = F.col("__absdiff")
    if deterministic:
        mean_d = _fp_sum(d0, 20) / F.count(d0)
        sx = _fp_sum(d0, 20)
        sxx = _fp_sum(d0 * d0, 6)
        n = F.count(d0).cast("double")
        std_d = F.sqrt((sxx - sx * sx / n) / (n - 1))
    else:
        mean_d, std_d = F.avg(d0), F.stddev_samp(d0)
    out = (
        df.filter((F.col(cal_mag_col) >= mag_lo) & (F.col(cal_mag_col) <= mag_hi))
        .withColumn("__absdiff", F.abs(F.col(cal_mag_col) - F.col(ref_mag_col)))
        .groupBy(*group_cols)
        .agg(
            (mean_d * 1000.0).alias("bias"),
            (std_d * 1000.0).alias("spread"),
            (F.median(d0) * 1000.0).alias("median_absdiff"),
            F.count(d0).alias("n_calibrators"),
        )
    )
    return out.orderBy(*order_cols)


def iqr_by_bin(
    df: DataFrame,
    bin_col: str,
    value_col: str,
    method: str = "auto",
    approx_threshold: int = 100_000,
    accuracy: int = 10_000,
) -> DataFrame:
    """A5 — per-bin inter-quartile range and median.

    Reference: ``_objtable_methods.py:345-358``.

    Spark's exact ``percentile`` buffers every value of a group in executor
    memory — correct for post-aggregation bins, an OOM at 100 TB.
    ``method`` gates the physical strategy:

    - ``'exact'``: exact interpolated percentiles (cross-engine
      deterministic — the oracle path).
    - ``'approx'``: ``percentile_approx`` (KLL-style mergeable summary,
      bounded memory, rank error ≤ n/``accuracy``; partial+final agg, no
      per-group buffering).
    - ``'auto'`` (default): one cheap count-only probe (map-side combined,
      no value buffering) picks exact when the largest bin holds ≤
      ``approx_threshold`` rows, approx above.  Callers that know their
      scale should pass ``method`` explicitly and skip the probe scan.
    """
    check_col([bin_col, value_col], df)
    if method not in ("auto", "exact", "approx"):
        raise ValueError(
            f"method must be 'auto', 'exact' or 'approx', got {method!r}"
        )
    # guide §2.5: percentile partials buffer/sketch every value — on a
    # narrow scan (one row group → 1-3 tasks) that serializes the whole
    # pass (r11 a5 profile: 1.65 s three-task partial stage).  Guarded
    # no-op on already-wide inputs; exact percentiles are partition-
    # independent, approx stays within its published rank-error bound.
    df = spread(df)
    if method == "auto":
        biggest = (
            df.groupBy(bin_col).count().agg(F.max("count")).first()[0] or 0
        )
        method = "exact" if biggest <= approx_threshold else "approx"
    c = F.col(value_col)
    if method == "exact":
        return df.groupBy(bin_col).agg(
            (F.percentile(c, F.lit(0.75)) - F.percentile(c, F.lit(0.25))).alias(
                f"iqr_{value_col}"
            ),
            F.median(c).alias(f"median_{value_col}"),
        )
    # one KLL summary per group, quartiles read out of the single sketch
    qs = F.percentile_approx(
        c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(accuracy)
    )
    return (
        df.groupBy(bin_col)
        .agg(qs.alias("__q"))
        .select(
            bin_col,
            (F.col("__q")[2] - F.col("__q")[0]).alias(f"iqr_{value_col}"),
            F.col("__q")[1].alias(f"median_{value_col}"),
        )
    )


def distinct_stats(
    df: DataFrame,
    id_cols: Sequence[str] = (),
    sum_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """A6 — scalar summary: distinct counts, sums, maxima in one pass.

    Reference: ``stats()`` (PS1Cal_matching.py:219-328) computes these with
    separate pandas passes (and mislabels max as ``min_magnitude`` — bug B6;
    we use honest names).  ``countDistinct`` is exact; at 100 TB switch the
    call site to ``approx_count_distinct`` when a 2% error is acceptable.
    """
    aggs = (
        [F.countDistinct(c).alias(f"n_{c}") for c in id_cols]
        + [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
        + [F.max(c).alias(f"max_{c}") for c in max_cols]
    )
    if not aggs:
        raise ValueError("no aggregate columns requested")
    return df.agg(*aggs)


def distinct_values(df: DataFrame, col: str) -> list:
    """A7 — small driver-side distinct list (drives catalog pruning).

    Reference: ``unique().tolist()`` at PS1Cal_matching.py:68-69.  Only for
    low-cardinality columns (fields, RCIDs) — the collect is bounded.
    """
    check_col(col, df)
    return [r[0] for r in df.select(col).distinct().collect()]


def group_ols(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    x_scale_bits: int = 0,
    y_scale_bits: int = 0,
) -> DataFrame:
    """Per-group simple linear regression (OLS ``y ~ a + b·x``) in exact
    integer closed form — FULLY distributed, no driver solve at all
    (the per-group complement of operators/ridge.py's global Cramer fit
    and operators/regression.py's errors-in-variables ODR).

    Inputs quantize once (``floor(v·2^bits)`` — bits 0 for
    already-integral columns), then one hash aggregate per group builds
    the five moment cells and the slope/intercept come from the classic
    closed form as EXACT integer numerators/denominators::

        b = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    evaluated in int64 column arithmetic (caller owns the magnitude
    budget: ``n·Σxy`` must fit — scale bits trade precision for
    headroom).  The float slope is ONE double division of the exact
    ints; the intercept ``(Σy − b·Σx)/n`` evaluates in doubles with a
    FIXED operation order (an exact integer form would need int128 —
    ``Σy·b_den`` overflows int64), so both replay bit for bit in a SQL
    oracle that mirrors the same order.  Groups with zero x-variance
    get NULL slope (denominator 0, via try_divide), not a crash.

    Output: group cols + n, b_num, b_den, slope, intercept.
    """
    check_col([x_col, y_col, *group_cols], df)
    xq = F.floor(
        F.col(x_col).cast("double") * F.lit(float(1 << x_scale_bits))
    ).cast("long")
    yq = F.floor(
        F.col(y_col).cast("double") * F.lit(float(1 << y_scale_bits))
    ).cast("long")
    cells = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(*group_cols, xq.alias("__x"), yq.alias("__y"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__x").alias("__sx"),
            F.sum("__y").alias("__sy"),
            F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
            F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        )
    )
    b_num = F.col("n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    b_den = F.col("n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    out = cells.withColumn("b_num", b_num).withColumn("b_den", b_den)
    slope = F.try_divide(
        F.col("b_num").cast("double"), F.col("b_den").cast("double")
    )
    intercept = F.try_divide(
        F.col("__sy").cast("double")
        - slope * F.col("__sx").cast("double"),
        F.col("n").cast("double"),
    )
    return out.select(
        *group_cols,
        "n",
        "b_num",
        "b_den",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )



def weighted_median(
    df,
    group_cols,
    value_col: str,
    weight_col: str,
    weight_scale: float = 1.0,
):
    """Per-group lower weighted median — the smallest value v whose
    cumulative weight reaches half the group total (2·cumw(v) ≥ W).

    Exactness device: weights are quantized once to int64
    (``floor(w·weight_scale)``) and everything after is integer — the
    cumulative sum, the doubling, the comparison — so there is no
    float accumulation to diverge across engines or partitionings; the
    VALUE column is never arithmetic'd at all, just ordered.

    Shape: weights pre-aggregate per (group, value) — the window walks
    DISTINCT VALUES per group, not rows — then one partitioned cumsum
    and a min-filter.  Two key shuffles total, both with map-side
    partials.  Rows with NULL value/weight or non-positive quantized
    weight are dropped (a zero-weight observation cannot carry a
    median).

    Returns one row per group: ``total_weight`` (int64, quantized
    units) and ``weighted_median`` (the value column's type).
    """
    from pyspark.sql import Window

    keys = list(group_cols)
    check_col(keys + [value_col, weight_col], df)
    wq = F.floor(
        F.col(weight_col).cast("double") * F.lit(float(weight_scale))
    ).cast("long")
    base = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(weight_col).isNotNull()
        )
        .select(*keys, F.col(value_col).alias("__v"), wq.alias("__w"))
        .filter(F.col("__w") > 0)
    )
    per_value = base.groupBy(*keys, "__v").agg(
        F.sum("__w").alias("__wsum")
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*keys)
    h = per_value.withColumn(
        "__cum", F.sum("__wsum").over(w_cum)
    ).withColumn("__tot", F.sum("__wsum").over(w_tot))
    return (
        h.filter(F.lit(2) * F.col("__cum") >= F.col("__tot"))
        .groupBy(*keys)
        .agg(
            F.max("__tot").cast("long").alias("total_weight"),
            F.min("__v").alias("weighted_median"),
        )
    )


__all__ = [
    "cluster_centroid",
    "weighted_median",
    "group_ols",
    "cluster_centroid_weighted",
    "group_stats",
    "calibration_quality",
    "iqr_by_bin",
    "distinct_stats",
    "distinct_values",
]
