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


__all__ = ["write_partitioned", "read_lake"]
