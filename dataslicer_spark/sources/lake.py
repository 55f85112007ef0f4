"""Partitioned-lake layout: the scale-native form of S8
("metadata-driven file pruning", dataset.py:143-147 + objtable.py:85-88).

The reference prunes files by first filtering its metadata table and then
loading only the matching paths — a hand-rolled partition pruner.  On a
lake, the same metadata keys (FIELDID / RCID / FILTERID …) become
``partitionBy`` columns, and the pruning is supplied by the engine:

- **static pruning**: a literal predicate on a partition column never
  lists, opens, or reads non-matching directories;
- **dynamic partition pruning (DPP)**: a selective dimension filter
  prunes fact partitions at *runtime* via a reused broadcast — the
  "load only files whose metadata matches" behavior, with the metadata
  predicate living on the joined dimension table.

``metadata_driven_prune`` (api.py) remains the fallback for unpartitioned
data; this module is the layout you migrate to at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..utils import check_col


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write a partition-pruned lake layout.

    Choose low-cardinality, high-selectivity keys (the reference's
    metadata predicates: filter band, readout channel, field) — each
    distinct combination becomes a directory; predicates on them skip
    whole directories at planning time.  ``max_records_per_file`` bounds
    file sizes for downstream parallelism."""
    check_col(partition_cols, df)
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*list(partition_cols)).parquet(path)


def read_lake(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned lake; partition columns come back as columns and
    predicates on them prune directories (see tests for the plan proof)."""
    return spark.read.parquet(path)


def compact_lake(
    spark: SparkSession,
    path: str,
    partition_cols: Sequence[str],
    target_mb: int = 128,
) -> int:
    """Rewrite a lake to ~``target_mb`` parquet files — the small-files
    maintenance pass every streaming/incremental-ingest lake needs (1000s
    of KB-sized files per partition turn a 100 TB scan into a metadata
    stampede: one task, one open, one footer-read per file).

    File count is sized from the lake's actual on-disk bytes (listed
    driver-side from the filesystem — no data read), then rewritten via
    ``repartitionByRange`` on (partition columns, rand): range
    partitioning keeps each task inside ~one partition directory (a hash
    ``repartition`` would scatter every partition value across every
    task — n_tasks × n_partitions tiny files, the very problem being
    fixed) while the random tail key splits dominant partitions across
    proportionally many tasks.  The rewrite goes to a temp directory
    first and swaps in only after success — a crash mid-compaction
    leaves the original lake intact.

    Returns the number of data files after compaction.  (On object
    stores swap via the catalog/manifest instead of a rename; this
    filesystem variant documents the pattern.)
    """
    import math
    import os
    import shutil

    total_bytes = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total_bytes += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))

    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    check_col(partition_cols, df)
    tmp = path.rstrip("/") + ".__compacting__"
    cols = [F.col(c) for c in partition_cols] + [F.rand(42)]
    (
        df.repartitionByRange(n_files, *cols)
        .write.mode("overwrite")
        .partitionBy(*list(partition_cols))
        .parquet(tmp)
    )
    old = path.rstrip("/") + ".__old__"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


__all__ = ["write_partitioned", "read_lake", "compact_lake"]
