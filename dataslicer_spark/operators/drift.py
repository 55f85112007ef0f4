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
