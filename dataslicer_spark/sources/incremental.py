"""Incremental file ingestion: scan only what arrived since the last run.

The reference reloads its whole directory every session (objtable.py:93-110
re-reads every FITS file unless the CSV cache is fresh); the lake-scale
form is a modification-time high-watermark — each run reads ONLY files
newer than the watermark the previous run recorded, using Spark's
``_metadata`` hidden struct (file_path / file_modification_time /
file_size), which is served from the file listing the scan does anyway:
no extra I/O, no file content read for skipped files.

This is batch incremental ingestion (the cron-job pattern).  For
continuous arrival, the same directory can be consumed exactly-once with
Structured Streaming's file source (``spark.readStream``) — see
streaming/lakesink.py for the sink half.

Watermark semantics: files with ``modification_time > watermark`` are
new.  A file REWRITTEN in place re-qualifies (its mtime advances) — at
lake scale writers append new files rather than rewriting, so this is
the desired at-least-once re-read of mutated data.  Readers that need
exactly-once must pair this with content fingerprints
(``dedup.dedup_against``) downstream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WATERMARK_FILE = "_incremental_watermark"


def scan_since(
    spark: SparkSession,
    path: str,
    watermark_ms: int,
    fmt: str = "parquet",
) -> DataFrame:
    """Rows from files modified strictly after ``watermark_ms`` (epoch
    millis), with ``_file_path`` and ``_file_mtime_ms`` provenance
    columns.

    The mtime predicate binds to ``_metadata.file_modification_time`` —
    evaluated against the scan's file listing, so unchanged files are
    never opened.
    """
    df = spark.read.format(fmt).load(path).select(
        "*",
        F.col("_metadata.file_path").alias("_file_path"),
        (
            F.unix_millis(F.col("_metadata.file_modification_time"))
        ).alias("_file_mtime_ms"),
    )
    return df.filter(F.col("_file_mtime_ms") > F.lit(int(watermark_ms)))


def current_watermark(spark: SparkSession, path: str, fmt: str = "parquet") -> int:
    """The directory's max file modification time (epoch millis) — store
    this after a successful incremental run (``save_watermark``).  One
    listing-only aggregation: no row data is read (the aggregate needs
    only ``_metadata``)."""
    row = (
        spark.read.format(fmt)
        .load(path)
        .select(
            F.unix_millis(F.col("_metadata.file_modification_time")).alias("m")
        )
        .agg(F.max("m").alias("m"))
        .first()
    )
    return int(row["m"]) if row and row["m"] is not None else 0


def load_watermark(state_dir: str) -> int:
    """Read the stored watermark (0 if none — first run reads everything)."""
    p = os.path.join(state_dir, WATERMARK_FILE)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(f.read().strip() or 0)


def save_watermark(state_dir: str, watermark_ms: int) -> None:
    """Atomically persist the watermark (write-then-rename) so a crashed
    run never leaves a torn value — re-running with the old watermark
    just re-reads the last batch (at-least-once)."""
    os.makedirs(state_dir, exist_ok=True)
    p = os.path.join(state_dir, WATERMARK_FILE)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(int(watermark_ms)))
    os.replace(tmp, p)


def incremental_ingest(
    spark: SparkSession,
    path: str,
    state_dir: str,
    fmt: str = "parquet",
    safety_lag_ms: int = 2_000,
) -> DataFrame:
    """The composed pattern: read files newer than the stored watermark;
    call the returned frame's actions, then ``commit_watermark`` (also
    returned) AFTER the downstream write succeeds — watermark advances
    only on success, so failures replay the batch.

    ``safety_lag_ms`` closes the listing race: a file committed with the
    SAME mtime as the max the listing saw, but after the listing ran,
    would be skipped forever by the strict ``>`` filter.  Committing
    ``max_mtime − lag`` instead re-reads the last ``lag`` of files each
    run (at-least-once, the documented contract) — dedup downstream
    (``dedup.dedup_against`` on content fingerprints, or the lake sink's
    upsert) makes the replay idempotent.  Set 0 only when the writer
    guarantees strictly increasing mtimes.

    Returns ``(new_rows, commit_watermark)``.
    """
    wm = load_watermark(state_dir)
    new_rows = scan_since(spark, path, wm, fmt)
    hi = current_watermark(spark, path, fmt)

    def commit() -> None:
        save_watermark(state_dir, max(hi - int(safety_lag_ms), wm))

    return new_rows, commit
