"""Streaming → lake: the table-format-free upsert pattern.

A parquet lake has no MERGE INTO; the scalable pattern without a table
format is **append + compact-on-read**:

- :func:`stream_append_to_lake` — Spark's native file sink appends each
  micro-batch as new partition-dir files, exactly-once (the sink's
  transaction log in ``_spark_metadata`` + the query checkpoint make
  replayed batches idempotent).
- :func:`latest_view` — the read side resolves upserts: latest row per
  key wins (one window pass — ``windows.largest_wins``).
- periodic :func:`~dataslicer_spark.sources.lake.compact_lake` bounds
  the small-files growth the appends create.

State is bounded everywhere: the sink holds no rows, the view is a
plain query, compaction is offline.  (With a table format — Delta,
Iceberg — steps 1+2 collapse into MERGE INTO; this module documents the
engine-native equivalent.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.windows import largest_wins


def stream_append_to_lake(
    spark: SparkSession,
    source_dir: str,
    schema,
    lake_path: str,
    checkpoint_path: str,
    partition_cols: Sequence[str] = (),
    trigger_available_now: bool = True,
):
    """Append a file-source stream into a partitioned parquet lake via
    the native file sink (exactly-once: sink transaction log +
    checkpoint).  Returns the started StreamingQuery."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    w = (
        stream.writeStream.format("parquet")
        .option("path", lake_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if partition_cols:
        w = w.partitionBy(*list(partition_cols))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def latest_view(
    spark: SparkSession,
    lake_path: str,
    key_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Current state of an append-only upsert lake: the latest row per
    key (ties on ``ts_col`` resolve deterministically inside
    ``largest_wins`` ordering; give it a monotone version column when
    timestamps can tie)."""
    df = spark.read.parquet(lake_path)
    return largest_wins(df, list(key_cols), ts_col)


__all__ = ["stream_append_to_lake", "latest_view"]
