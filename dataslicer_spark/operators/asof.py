"""As-of (point-in-time) join — a time-series primitive Spark lacks
natively, built as a single-shuffle composition (north-star extension;
the reference has no temporal joins — its time is the OBSMJD double,
SURVEY.md §1.1).

Semantics (``direction='backward'``): each left row matches the most
recent right row with ``right.ts <= left.ts`` within the same ``by``
key (inclusive); ``'forward'`` mirrors (earliest right with
``right.ts >= left.ts``).  ``tolerance`` bounds the gap.

Scale design — the naive formulations both fail at 100 TB:

- inequality join + window("closest per left row") explodes to every
  (left, right) pair within key before pruning;
- per-key ``applyInPandas`` ships both tables through Python.

Instead: tag the two sides, ``unionByName``, and run ONE window pass
ordered by (ts, side): ``last(right_payload, ignorenulls=True)`` over
the unbounded-preceding frame gives every left row its latest preceding
right payload.  Cost = one shuffle on ``by`` + one sort — the same price
as a single sort-merge join stage, with no pair fanout.  Skewed keys
split fine under AQE since the window partitions by ``by``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..utils import check_col


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: Sequence[str],
    value_cols: Sequence[str],
    direction: str = "backward",
    tolerance: Column | None = None,
    tiebreak_col: str | None = None,
    matched_ts_name: str = "matched_ts",
) -> DataFrame:
    """Left as-of join: all left columns + ``matched_ts`` + each of
    ``value_cols`` from the matched right row (NULL when no match).

    ``tiebreak_col`` (right-side column) makes the choice among right
    rows sharing an exact timestamp deterministic (largest wins);
    without it, pre-deduplicate the right side per (by, ts).
    ``tolerance``: a Column interval/number in ``ts_col``'s ordering —
    matches farther than this are nulled out.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = list(by_cols)
    check_col(by + [ts_col], left)
    check_col(
        by + [ts_col] + list(value_cols)
        + ([tiebreak_col] if tiebreak_col else []),
        right,
    )
    overlap = set(value_cols) | {matched_ts_name}
    overlap &= set(left.columns)
    if overlap:
        raise ValueError(
            f"output columns collide with left columns: {sorted(overlap)}"
        )
    internal = {"__side", "__rv", "__m"}
    clash = internal & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"input columns collide with asof_join internals: {sorted(clash)}"
        )
    # NULL-ts right rows can never satisfy the as-of inequality (SQL ASOF /
    # merge_asof semantics); without this they'd sort nulls-first and be
    # picked as "earliest" matches
    right = right.filter(F.col(ts_col).isNotNull())

    # payload struct: leading (ts, tiebreak) make last()'s implicit
    # max-at-equal-sort-position deterministic
    payload_fields = [F.col(ts_col).alias("__mts")]
    if tiebreak_col is not None:
        payload_fields.append(F.col(tiebreak_col).alias("__tb"))
    payload_fields += [F.col(c).alias(c) for c in value_cols]

    r = right.select(
        *by,
        F.col(ts_col).alias(ts_col),
        F.lit(0).alias("__side"),
        F.struct(*payload_fields).alias("__rv"),
    )
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__rv", F.lit(None).cast(r.schema["__rv"].dataType)
    )
    u = l.unionByName(r.select(*by, ts_col, "__side", "__rv"),
                      allowMissingColumns=True)

    if direction == "backward":
        # right rows sort before left at equal ts (inclusive match);
        # __rv orders right-row ties so last() picks the max payload
        order = [F.col(ts_col).asc(), F.col("__side").asc(), F.col("__rv").asc()]
        w = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = F.last("__rv", ignorenulls=True).over(w)
    else:
        order = [F.col(ts_col).asc(), F.col("__side").desc(), F.col("__rv").desc()]
        w = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(0, Window.unboundedFollowing)
        )
        matched = F.first("__rv", ignorenulls=True).over(w)

    out = (
        u.withColumn("__m", matched)
        .filter(F.col("__side") == 1)
        .drop("__side", "__rv")
    )
    if tolerance is not None:
        gap = (
            F.col(ts_col) - F.col("__m.__mts")
            if direction == "backward"
            else F.col("__m.__mts") - F.col(ts_col)
        )
        out = out.withColumn(
            "__m", F.when(gap <= tolerance, F.col("__m"))
        )
    cols = [F.col(c) for c in left.columns]
    cols.append(F.col("__m.__mts").alias(matched_ts_name))
    cols += [F.col(f"__m.{c}").alias(c) for c in value_cols]
    return out.select(*cols)


__all__ = ["asof_join"]
