"""Slowly-changing-dimension (type 2) history from a change log — the
MERGE-INTO-less lakehouse pattern (no Delta in this environment): pure
DataFrame ops, so it runs on plain parquet and carries a SQL oracle.

``scd2_history`` turns an append-only change log (key, ts, attributes)
into one row per (key, version) with ``valid_from`` / ``valid_to``
(NULL = current), collapsing consecutive rows whose tracked attributes
did not change.

Scale: one shuffle on the key (both window passes share the same
partitioning — Catalyst reuses the exchange), no joins, no driver state.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..utils import check_col


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Change log → SCD2 history.

    Rows are versioned per key in (ts, tiebreak) order; a new version
    starts when any tracked attribute differs from the previous row
    (NULL-safe comparison).  Output: key + attrs + ``valid_from`` (the
    change ts) + ``valid_to`` (next change ts; NULL for the current
    version).  Pass ``tiebreak_col`` when (key, ts) is not unique.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    check_col(keys + [ts_col] + attrs, changes)
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    # row_number, not lag(ts).isNull(): a NULL-ts first row would make the
    # SECOND row look like a partition start too
    first = F.row_number().over(w) == 1
    versions = changes.withColumn("__new_version", first | changed).filter(
        F.col("__new_version")
    )
    return versions.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    )


def scd2_current(history: DataFrame) -> DataFrame:
    """The current snapshot: versions with open validity."""
    check_col(["valid_to"], history)
    return history.filter(F.col("valid_to").isNull()).drop("valid_to")


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """CDC MERGE: apply an insert/update/delete change log onto a
    snapshot and return the new snapshot — the Debezium/``MERGE INTO``
    pattern on plain parquet.

    Per key, only the LATEST change (max ``seq_col``; (key, seq) must be
    unique) decides the outcome: op ``'D'`` deletes the key, anything
    else upserts the change's ``attr_cols`` (insert if the key is new,
    overwrite if it exists).  Keys never mentioned in the log pass
    through untouched.  Equivalent to the SQL
    ``FULL OUTER JOIN (latest change per key)`` with
    coalesce-by-precedence — which is exactly the shape built here.

    Scale: the latest-change reduction is one shuffle on the key with
    map-side partial aggregation (``max_by`` struct per key, not a
    window sort), and the merge join shuffles both sides on the same
    key — with snapshot and log bucketed on the key
    (``sources/bucketed.py``) the whole MERGE is exchange-free.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    check_col(keys + [seq_col, op_col] + attrs, changes)
    check_col(keys + attrs, snapshot)
    payload = F.struct(F.col(op_col).alias("__op"), *[F.col(a) for a in attrs])
    latest = changes.groupBy(*keys).agg(
        F.max_by(payload, F.col(seq_col)).alias("__c")
    )
    merged = snapshot.alias("s").join(
        latest.alias("c"), on=keys, how="full_outer"
    )
    has_change = F.col("c.__c").isNotNull()
    deleted = has_change & (F.col("c.__c.__op") == F.lit("D"))
    out_attrs = [
        F.when(has_change, F.col(f"c.__c.{a}"))
        .otherwise(F.col(f"s.{a}"))
        .alias(a)
        for a in attrs
    ]
    return merged.filter(~deleted).select(*keys, *out_attrs)


def snapshot_as_of(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str,
    attr_cols: Sequence[str],
    as_of,
) -> DataFrame:
    """Time travel over a changelog-backed table: reconstruct the state
    the table had at sequence point ``as_of`` by replaying only the
    changelog prefix ``seq_col <= as_of`` onto the base snapshot —
    the ``VERSION AS OF`` read of lakehouse formats, on plain parquet.

    Delegates to :func:`apply_changelog`, so the plan is one predicate-
    pushed changelog scan (the ``seq`` filter prunes row groups when the
    log is written seq-sorted or partitioned by seq range — exactly how
    sources/lake.py lays out CDC output) followed by the standard MERGE
    shape.  Use a seq-range loop of calls to diff versions, or
    :func:`scd2_history` when you need EVERY version materialized.
    """
    check_col([seq_col], changes)
    prefix = changes.filter(F.col(seq_col) <= F.lit(as_of))
    return apply_changelog(
        snapshot, prefix, key_cols, seq_col, op_col, attr_cols
    )


__all__ = [
    "scd2_history",
    "scd2_current",
    "apply_changelog",
    "snapshot_as_of",
]
