"""Bucketed tables: pre-shuffled storage for exchange-free repeated
joins — THE storage-layout lever for 100 TB fact-to-fact joins.

A shuffle join on two 50 TB fact tables moves both sides across the
network every time the join runs.  When the same join key is used query
after query (orders⋈lineitem, doc⋈chunk, user⋈event), hash-bucketing
both tables on that key AT WRITE TIME pays the shuffle once: each
bucket ``b`` of the left table joins only bucket ``b`` of the right
table, so every subsequent join is map-side — Catalyst plans a
SortMergeJoin with NO Exchange on either side (`.explain` shows the
scan feeding the join directly).

Spark specifics encoded here:

- ``bucketBy`` is only valid for ``saveAsTable`` (catalog-managed
  parquet) — path-based ``parquet(path)`` writes silently drop bucket
  metadata, so this module insists on table names;
- both sides must have the SAME bucket count on the SAME keys;
  otherwise Spark re-shuffles the mismatched side (still correct, half
  the benefit) — ``bucketed_join`` validates via the catalog before
  planning;
- we ``repartition(n_buckets, keys)`` before writing so each task owns
  exactly one bucket → one file per bucket (no per-task file
  fragmentation), and ``sortBy`` keeps each bucket file key-sorted —
  cheap merge-sort input even though Spark conservatively re-sorts
  (it does not trust file order across multiple files per bucket);
- the reader side needs ``spark.sql.sources.bucketing.enabled`` (on by
  default); AQE never converts a bucketed SMJ back to a shuffle.

Used by the ``j11_bucketed_join`` query, whose plan audit asserts the
join runs with zero Exchange operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..utils import check_col

__all__ = ["write_bucketed", "bucketed_join", "bucket_spec"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Save ``df`` as a catalog-managed parquet table hash-bucketed on
    ``bucket_cols``.  ``sort_cols`` default to the bucket columns so
    each bucket file comes out key-sorted (nearly-sorted input for the
    join's sort stage; range-friendly parquet row-group stats)."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    check_col(bucket_cols, df)
    sort_cols = sort_cols or bucket_cols
    check_col(sort_cols, df)
    (
        # one task per bucket → one file per bucket → sort elision
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def bucket_spec(spark: SparkSession, table: str) -> tuple[list[str], int] | None:
    """(bucket_cols, n_buckets) from the catalog, or None if the table
    isn't bucketed."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    cols: list[str] | None = None
    n: int | None = None
    for r in rows:
        if r.col_name == "Num Buckets":
            n = int(r.data_type)
        elif r.col_name == "Bucket Columns":
            cols = [
                c.strip(" `")
                for c in r.data_type.strip("[]").split(",")
                if c.strip(" `")
            ]
    if cols is None or n is None:
        return None
    return cols, n


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket keys without any
    shuffle.  Raises if either table's bucketing doesn't line up with
    ``on`` — a silent mismatch would quietly reintroduce the Exchange
    this layout exists to avoid (correct but paying full freight).

    The ``merge`` hint pins a SortMergeJoin: a broadcast plan would
    also avoid the shuffle but collects one side to the driver, which
    is exactly what a fact-to-fact join cannot afford at scale."""
    for t in (left_table, right_table):
        spec = bucket_spec(spark, t)
        if spec is None:
            raise ValueError(f"table {t!r} is not bucketed")
        cols, n = spec
        if cols != list(on):
            raise ValueError(
                f"table {t!r} is bucketed on {cols}, join is on {list(on)}"
            )
        if t == left_table:
            n_left = n
        elif n != n_left:
            raise ValueError(
                f"bucket counts differ: {left_table}={n_left}, {t}={n} — "
                "Spark would re-shuffle the smaller side"
            )
    return spark.table(left_table).join(
        spark.table(right_table).hint("merge"), list(on), how
    )
