"""Window-function operators (SURVEY.md §2.5: W1, W2, W3).

The reference computes these with per-row loops or groupby-apply; each is a
single ``Window`` spec here — one shuffle on the partition key, no Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..utils import check_col


def closest_match(
    df: DataFrame,
    partition_col: str | Sequence[str],
    order_col: str | Column,
    tiebreak_cols: Sequence[str] = (),
    keep_rank: bool = False,
) -> DataFrame:
    """W1 — keep the best row per group (e.g. nearest catalog star per
    source).

    Reference: astropy ``match_to_catalog_sky`` usage
    (PS1Cal_matching.py:100-104) and the per-row ``findclosest`` loop
    (:199-200).  Deterministic ties: always order by explicit tiebreakers
    after the distance (SURVEY.md §7 watch-list).
    """
    parts = [partition_col] if isinstance(partition_col, str) else list(partition_col)
    check_col(parts, df)
    order = [order_col] + [F.col(c) for c in tiebreak_cols]
    w = Window.partitionBy(*parts).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return out.withColumnRenamed("__rn", "match_rank") if keep_rank else out.drop("__rn")


def largest_wins(
    df: DataFrame,
    partition_col: str | Sequence[str],
    size_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """W2 — on multi-match, keep the match with the largest ``size_col``.

    Reference: the dust-grain loop overwrites tags in ascending-radius order
    so the largest grain wins (srcdf.py:666-682); this is
    ``row_number() over (partition by src order by r desc) = 1``.
    """
    return closest_match(df, partition_col, F.col(size_col).desc(), tiebreak_cols)


def group_all_satisfy(
    df: DataFrame, group_col: str, cond: Column
) -> DataFrame:
    """W3 — boolean per-row flag: does EVERY row in my group satisfy cond?

    NULL cond counts as a violation (coalesce to false) to match pandas
    NaN semantics (SURVEY.md §2.8 M3 note).
    """
    check_col(group_col, df)
    ok = F.coalesce(cond, F.lit(False)).cast("int")
    return df.withColumn(
        "all_satisfy", (F.min(ok).over(Window.partitionBy(group_col)) == 1)
    )


def group_mean_attached(
    df: DataFrame, group_col: str, value_col: str, out_col: str | None = None
) -> DataFrame:
    """Per-group mean re-attached to every row without an agg+join.

    Reference does agg-then-merge (_objtable_methods.py:337-363); a window
    avg is the same shuffle with no join.
    """
    check_col([group_col, value_col], df)
    out_col = out_col or f"mean_{value_col}"
    return df.withColumn(
        out_col, F.avg(value_col).over(Window.partitionBy(group_col))
    )


__all__ = ["closest_match", "largest_wins", "group_all_satisfy", "group_mean_attached"]
