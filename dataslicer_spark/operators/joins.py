"""Join operators (SURVEY.md §2.3: J1, J2, J7, J8, J9; W3).

Scale notes:

- Metadata/dimension enrichment (J1/J2) always broadcasts the small side —
  at 100 TB the fact table never shuffles for these joins.
- The anti-join (J7) and group-quantified filter (J8) are expressed so
  Catalyst can pick broadcast variants when the right side is small, and so
  AQE can convert at runtime.
- ``union_reindex`` (J9) never uses a global sort: ids come from
  ``monotonically_increasing_id`` (partition-local, collision-free).
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..utils import check_col, translate_query_expr


def merge_metadata_to_sources(
    sources: DataFrame,
    metadata: DataFrame,
    metadata_cols: Sequence[str] | None = None,
    join_on: str = "OBSID",
    how: str = "inner",
) -> DataFrame:
    """J1 — enrich the fact table with file-level (dimension) attributes.

    Reference: ``dataset.merge_metadata_to_sources`` (dataset.py:206-246):
    inner equi-join on OBSID after pre-projecting the metadata columns.
    Spark-first: the metadata side is broadcast (it is one row per file —
    thousands of rows even at 100 TB), so the fact side never shuffles.
    """
    check_col(join_on, sources)
    check_col(join_on, metadata)
    if metadata_cols is not None:
        check_col(metadata_cols, metadata)
        keep = list(dict.fromkeys(list(metadata_cols) + [join_on]))
        metadata = metadata.select(*keep)
    # Drop overlapping non-key columns from the metadata side (the reference
    # relies on pandas suffixing; we keep the fact table's version).
    overlap = (set(metadata.columns) & set(sources.columns)) - {join_on}
    if overlap:
        metadata = metadata.drop(*overlap)
    return sources.join(F.broadcast(metadata), on=join_on, how=how)


def anti_join(
    df1: DataFrame, df2: DataFrame, on: Sequence[str] | None = None
) -> DataFrame:
    """J7 — rows of df1 with no match in df2.

    Reference: ``subtract_dfs`` (df_utils.py:176-184) = left merge with
    indicator, keep ``left_only`` — a value-based anti-join over **all**
    columns after deduplicating df2.  ``on=None`` reproduces that; passing
    keys gives the practical keyed anti-join.
    """
    if on is None:
        on = [c for c in df1.columns if c in set(df2.columns)]
    return df1.join(df2.select(*on).dropDuplicates(), on=list(on), how="left_anti")


def select_clusters(
    df: DataFrame,
    cond: str | Column,
    group_col: str = "clusterID",
    params: dict[str, Any] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """J8/W3 — group-quantified filter: keep groups where ALL rows satisfy
    ``cond``; return (kept, rejected).

    Reference: ``select_clusters`` (_objtable_methods.py:424-488): find
    violators with ``query("not(cond)")``, collect their distinct cluster
    ids, purge them.  Spark-first: a window ``min(cond)`` per group — one
    shuffle on ``group_col``, no driver-side id list, no second scan.  Rows
    where ``cond`` is NULL count as violations (pandas ``not(NaN<x)`` keeps
    them in the violator set — tri-valued-logic parity via coalesce).
    """
    check_col(group_col, df)
    c = F.expr(translate_query_expr(cond, params)) if isinstance(cond, str) else cond
    ok = F.coalesce(c, F.lit(False)).cast("int")
    w = Window.partitionBy(group_col)
    flagged = df.withColumn("__all_ok", F.min(ok).over(w))
    kept = flagged.filter(F.col("__all_ok") == 1).drop("__all_ok")
    rejected = flagged.filter(F.col("__all_ok") == 0).drop("__all_ok")
    return kept, rejected


def union_reindex(
    df: DataFrame,
    other: DataFrame,
    reindex: bool = True,
    srcid_key: str = "sourceid",
) -> DataFrame:
    """J9 — append two source tables, optionally re-assigning unique ids.

    Reference: ``srcdf.add`` (srcdf.py:64-105) concats and re-indexes
    ``sourceid`` 0..n-1 (and is a silent no-op in-place — bug B3; we return
    the union).  Spark-first: ``unionByName(allowMissingColumns=True)`` and
    ``monotonically_increasing_id()`` for ids — unique without a global
    sort/shuffle (ids are not dense, which is the scale-correct contract).
    """
    out = df.unionByName(other, allowMissingColumns=True)
    if reindex:
        out = out.withColumn(srcid_key, F.monotonically_increasing_id())
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    by_cols: Sequence[str] = (),
    bucket_width: int | float = None,  # type: ignore[assignment]
) -> DataFrame:
    """Point-in-interval join for BIG × BIG inputs: every (point,
    interval) pair with ``lo ≤ point ≤ hi`` (and equal ``by_cols``).

    Spark has no native range join — the naive inequality join plans as
    BroadcastNestedLoop/cartesian, an O(|P|·|I|) death at scale.  Here
    both sides bucket on ``floor(value / bucket_width)``: an interval
    explodes to the buckets it covers, a point lands in exactly one, and
    the match becomes a hash equi-join on ``(by_cols, bucket)`` plus a
    residual range filter.  No duplicate pairs by construction (a point
    joins an interval only in the point's single home bucket).

    Cost model: interval explode factor is ``len/bucket_width + 1`` —
    pick a width near the typical interval length (p50 is a good rule)
    so the blow-up stays O(1) while buckets stay selective.  Degenerate
    hot buckets (a bucket shared by many long intervals) behave like any
    skewed join key — AQE skew-split applies to the equi-join.

    Returns all point columns plus the interval's columns.
    """
    if bucket_width is None or bucket_width <= 0:
        raise ValueError("bucket_width must be a positive number")
    by = list(by_cols)
    check_col(by + [point_col], points)
    check_col(by + [lo_col, hi_col], intervals)
    overlap = (set(intervals.columns) - set(by)) & set(points.columns)
    if overlap:
        raise ValueError(
            f"interval columns collide with point columns: {sorted(overlap)}"
        )
    bad = {"__bucket"} & (set(points.columns) | set(intervals.columns))
    if bad:
        raise ValueError(
            f"input columns collide with internals: {sorted(bad)}"
        )
    b = F.lit(bucket_width)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b), F.floor(F.col(hi_col) / b)
            )
        ),
    )
    pt = points.withColumn("__bucket", F.floor(F.col(point_col) / b))
    out = pt.join(iv, by + ["__bucket"]).filter(
        (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) <= F.col(hi_col))
    )
    return out.drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_range: tuple[str, str],
    right_range: tuple[str, str],
    by_cols: Sequence[str] = (),
    bucket_width: int | float = None,  # type: ignore[assignment]
) -> DataFrame:
    """Interval × interval OVERLAP join for BIG × BIG inputs: every
    pair with ``l_lo ≤ r_hi AND r_lo ≤ l_hi`` (closed intervals, equal
    ``by_cols``) — sessions × maintenance windows, span annotations ×
    span annotations, validity ranges × validity ranges.

    Same problem as :func:`interval_join` — Spark plans the naive
    inequality join as a nested loop — but interval×interval bucketing
    has a duplicate hazard: both sides explode to every bucket they
    cover, so an overlapping pair would meet once per SHARED bucket.
    The fix is an exactly-once assignment, no dedup shuffle: accept a
    pair only in the bucket of the intersection's START,
    ``greatest(floor(l_lo/w), floor(r_lo/w))``.  If the intervals
    overlap, the intersection start ``s = max(l_lo, r_lo)`` satisfies
    ``s ≤ min(l_hi, r_hi)``, so ``floor(s/w)`` is covered by BOTH
    explodes, and ``floor`` is monotone so ``floor(max(a,b)/w) =
    max(floor(a/w), floor(b/w))`` — every overlapping pair meets in
    exactly that one bucket and non-overlapping pairs never pass the
    residual predicate.

    Cost model matches :func:`interval_join`: explode factor
    ``len/bucket_width + 1`` per side — pick a width near the typical
    interval length.  Rows with NULL bounds or ``lo > hi`` are dropped
    (an empty interval overlaps nothing; a descending ``sequence``
    would otherwise mis-explode).  Returns all left columns plus the
    right's; names must not collide (rename upstream).
    """
    if bucket_width is None or bucket_width <= 0:
        raise ValueError("bucket_width must be a positive number")
    l_lo, l_hi = left_range
    r_lo, r_hi = right_range
    by = list(by_cols)
    check_col(by + [l_lo, l_hi], left)
    check_col(by + [r_lo, r_hi], right)
    overlap = (set(right.columns) - set(by)) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right columns collide with left columns: {sorted(overlap)}"
        )
    bad = {"__bucket"} & (set(left.columns) | set(right.columns))
    if bad:
        raise ValueError(
            f"input columns collide with internals: {sorted(bad)}"
        )
    b = F.lit(bucket_width)

    def explode_side(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.filter(
            F.col(lo).isNotNull()
            & F.col(hi).isNotNull()
            & (F.col(lo) <= F.col(hi))
        ).withColumn(
            "__bucket",
            F.explode(
                F.sequence(F.floor(F.col(lo) / b), F.floor(F.col(hi) / b))
            ),
        )

    lf = explode_side(left, l_lo, l_hi)
    rt = explode_side(right, r_lo, r_hi)
    out = lf.join(rt, by + ["__bucket"]).filter(
        (F.col(l_lo) <= F.col(r_hi))
        & (F.col(r_lo) <= F.col(l_hi))
        & (
            F.col("__bucket")
            == F.greatest(
                F.floor(F.col(l_lo) / b), F.floor(F.col(r_lo) / b)
            )
        )
    )
    return out.drop("__bucket")


__all__ = [
    "merge_metadata_to_sources",
    "anti_join",
    "select_clusters",
    "union_reindex",
    "interval_join",
    "interval_overlap_join",
]
