"""Distribution-drift detection between two corpus snapshots — the
monitoring stage of a training-data pipeline (did this month's crawl
shift against last month's? did a schema migration silently change a
column's distribution?).

Metric: per-group **total variation distance** between the two
snapshots' histograms of a value column.  TVD = ½·Σ_b |p_b − q_b| needs
per-bucket ratios, which would put an IEEE division inside a sum — not
engine-exact.  The cross-multiplied identity avoids it:

    TVD = Σ_b |a_b·N_B − b_b·N_A|  /  (2·N_A·N_B)

where a_b/b_b are integer bucket counts and N_A/N_B the per-group
totals: the numerator is pure int64 (order-independent sum of exact
products), floats enter once in the final division.  Magnitude budget:
``a_b·N_B ≤ N_A·N_B`` must stay below 2⁶³ ≈ 9.2·10¹⁸ — fine to ~3·10⁹
rows per side per group; beyond that, pre-aggregate to coarser buckets
or shard groups.

Scale shape: the two snapshots union into ONE scan with a side flag; a
hash aggregate keyed by (group, bucket) does the counting with map-side
partials (the wire carries bucket rows, never events); totals come from
a window partitioned BY GROUP over the bucket histogram (partitioned —
no global exchange); the final per-group aggregate is group-count-sized.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..utils import check_col


def histogram_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    bucket_width: float,
) -> DataFrame:
    """Per-group drift report between snapshot A and snapshot B.

    Rows with NULL ``value_col`` form their own bucket (a NULL-rate
    shift IS drift).  Groups present in only one snapshot get TVD 1.0's
    numerator shape naturally (every bucket's mass is unmatched) but a
    NULL tvd via ``try_divide`` when a side is empty — surfacing
    "this group appeared/vanished" explicitly instead of folding it
    into the metric.

    Returns one row per group: ``n_a, n_b`` (int64 totals), ``l1_cross``
    (the exact integer numerator), ``tvd`` (one double division;
    0 = identical distributions, 1 = disjoint).
    """
    keys = list(group_cols)
    check_col(keys + [value_col], df_a)
    check_col(keys + [value_col], df_b)
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    def bucketed(df: DataFrame, side: int) -> DataFrame:
        # floor(v / w) in doubles: one division + floor, identical IEEE
        # ops in any engine.  NULL v → NULL bucket (its own group).
        b = F.floor(
            F.col(value_col).cast("double") / F.lit(float(bucket_width))
        ).cast("long")
        return df.select(
            *keys, b.alias("__bucket"), F.lit(side).alias("__side")
        )

    u = bucketed(df_a, 0).unionByName(bucketed(df_b, 1))
    hist = u.groupBy(*keys, "__bucket").agg(
        F.sum(F.when(F.col("__side") == 0, 1).otherwise(0)).alias("__a"),
        F.sum(F.when(F.col("__side") == 1, 1).otherwise(0)).alias("__b"),
    )
    per_group = Window.partitionBy(*keys)
    h = hist.withColumn("__na", F.sum("__a").over(per_group)).withColumn(
        "__nb", F.sum("__b").over(per_group)
    )
    out = h.groupBy(*keys).agg(
        F.max("__na").cast("long").alias("n_a"),
        F.max("__nb").cast("long").alias("n_b"),
        F.sum(
            F.abs(F.col("__a") * F.col("__nb") - F.col("__b") * F.col("__na"))
        )
        .cast("long")
        .alias("l1_cross"),
    )
    return out.withColumn(
        "tvd",
        F.try_divide(
            F.col("l1_cross").cast("double"),
            (F.lit(2) * F.col("n_a") * F.col("n_b")).cast("double"),
        ),
    )


__all__ = ["histogram_drift"]


def ks_2sample(
    df: DataFrame,
    label_col: str,
    value_col: str,
    by_cols: Sequence[str],
    label_a,
    label_b,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per ``by_cols``
    group between the rows labeled ``label_a`` and ``label_b``:
    ``D = max_v |F_A(v) − F_B(v)|`` evaluated at every distinct observed
    value — exact for any discrete or pre-binned distribution (bucket
    continuous values upstream; the ECDF sup over observed points IS the
    exact KS).  The classic drift *test statistic* complementing
    :func:`histogram_drift`'s total-variation report (KS weights the
    worst single quantile gap; TVD integrates all gaps).

    Engine-exactness uses the same cross-multiplication trick as TVD:
    cumulative integer counts ``A_v·N_B − B_v·N_A`` stay pure int64
    (budget: N_A·N_B < 2⁶³ — fine to ~3·10⁹ rows per side per group),
    one IEEE division at the end.

    Scale shape: one scan → hash aggregate keyed on (group, value) with
    map-side partials (the wire carries distinct-value rows, never
    observations); the running ECDF is a window partitioned BY GROUP
    over that compact histogram; per-group totals broadcast back.  A
    group's distinct values land in one task — with many groups that is
    the parallelism unit; for a single giant high-cardinality group,
    pre-bin.

    Output: ``by_cols`` + ``n_a``, ``n_b`` (side totals) + ``ks``.
    """
    by = list(by_cols)
    check_col(by + [label_col, value_col], df)
    if not by:
        raise ValueError("by_cols must be non-empty (add a constant "
                         "feature column for a single global test)")
    lab = F.col(label_col)
    counts = (
        df.filter(lab.isin([label_a, label_b]))
        .groupBy(*by, value_col)
        .agg(
            F.sum(F.when(lab == label_a, 1).otherwise(0)).alias("__ca"),
            F.sum(F.when(lab == label_b, 1).otherwise(0)).alias("__cb"),
        )
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.select(
        *by,
        F.sum("__ca").over(w).alias("__cum_a"),
        F.sum("__cb").over(w).alias("__cum_b"),
    )
    totals = counts.groupBy(*by).agg(
        F.sum("__ca").alias("n_a"), F.sum("__cb").alias("n_b")
    )
    j = cum.join(F.broadcast(totals), by)
    return j.groupBy(*by).agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        (
            F.max(
                F.abs(
                    F.col("__cum_a") * F.col("n_b")
                    - F.col("__cum_b") * F.col("n_a")
                )
            ).cast("double")
            / (F.first("n_a") * F.first("n_b")).cast("double")
        ).alias("ks"),
    )
