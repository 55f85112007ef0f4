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


def embedding_centroid_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    by_cols: Sequence[str],
    vec_col: str = "embedding",
    fp_bits: int = 30,
    fp2_bits: int = 40,
) -> DataFrame:
    """Embedding-space drift between two snapshots: per ``by_cols``
    group, the squared L2 distance and cosine similarity between the two
    snapshots' centroid vectors — the geometric complement of
    :func:`histogram_drift`/:func:`ks_2sample` for dense-vector columns
    (a crawl whose embedding centroid moves has topically drifted even
    when its scalar metadata has not).

    Exactness: per-dimension centroids use the fixed-point integer sums
    of emb_label_centroids (floor(x·2^fp_bits) on int64); the per-dim
    products ((cₐ−c_b)², cₐ·c_b, cₐ², c_b²) are deterministic doubles
    re-quantized at 2^fp2_bits before the cross-dimension sum, so the
    final reduction is again order-independent int64 and the only
    floating steps are fixed-order divisions and two sqrts.  Magnitude
    budget: |value| ≤ ~2⁸ at fp2_bits=40 across ≤ 2¹⁴ dims.

    Plan: both snapshots posexplode into ONE union scan (side flag) →
    hash aggregate on (group, dim, side) with map-side partials — the
    wire carries n_groups·dims·2 rows, never vectors → per-dim join by
    pivot, one final group-sized aggregate.

    Output: ``by_cols`` + ``n_a``, ``n_b``, ``dist2`` (squared centroid
    L2), ``centroid_cos``.  Groups present in only one snapshot are
    dropped (inner per-dim match).
    """
    by = list(by_cols)
    check_col(by + [vec_col], df_a)
    check_col(by + [vec_col], df_b)
    fp = float(2 ** fp_bits)
    fp2 = float(2 ** fp2_bits)

    def sums(df: DataFrame, side: int) -> DataFrame:
        ex = df.select(
            *by, F.posexplode(vec_col).alias("__dim", "__x")
        )
        return ex.groupBy(*by, "__dim").agg(
            F.count(F.lit(1)).alias(f"n_{side}"),
            F.sum(
                F.floor(F.col("__x").cast("double") * F.lit(fp)).cast("long")
            ).alias(f"s_{side}"),
        )

    j = sums(df_a, 0).join(sums(df_b, 1), by + ["__dim"])
    ca = (F.col("s_0").cast("double") / F.lit(fp)) / F.col("n_0")
    cb = (F.col("s_1").cast("double") / F.lit(fp)) / F.col("n_1")
    q = lambda e: F.floor(e * F.lit(fp2)).cast("long")  # noqa: E731
    per_dim = j.select(
        *by,
        F.col("n_0"),
        F.col("n_1"),
        q((ca - cb) * (ca - cb)).alias("__d2"),
        q(ca * cb).alias("__ab"),
        q(ca * ca).alias("__aa"),
        q(cb * cb).alias("__bb"),
    )
    return per_dim.groupBy(*by).agg(
        F.first("n_0").alias("n_a"),
        F.first("n_1").alias("n_b"),
        (F.sum("__d2").cast("double") / F.lit(fp2)).alias("dist2"),
        (
            (F.sum("__ab").cast("double") / F.lit(fp2))
            / (
                F.sqrt(F.sum("__aa").cast("double") / F.lit(fp2))
                * F.sqrt(F.sum("__bb").cast("double") / F.lit(fp2))
            )
        ).alias("centroid_cos"),
    )
