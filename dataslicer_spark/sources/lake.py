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

import os
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
    first and swaps in via two renames; a crash before the swap leaves
    the original intact, and a crash between the renames is repaired by
    the next call (leftover ``__old__``/temp dirs are recovered on
    entry).

    Returns the number of data files after compaction.  (On object
    stores swap via the catalog/manifest instead of a rename; this
    filesystem variant documents the pattern.)
    """
    import math
    import shutil

    # recover from a previously crashed compaction: a leftover temp dir is
    # garbage; a leftover __old__ next to an intact lake is garbage too,
    # while __old__ WITHOUT a lake is the original — restore it
    tmp = path.rstrip("/") + ".__compacting__"
    old = path.rstrip("/") + ".__old__"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)

    total_bytes = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total_bytes += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))

    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    check_col(partition_cols, df)
    cols = [F.col(c) for c in partition_cols] + [F.rand(42)]
    (
        df.repartitionByRange(n_files, *cols)
        .write.mode("overwrite")
        .partitionBy(*list(partition_cols))
        .parquet(tmp)
    )
    # two-rename swap: a crash BEFORE the first rename leaves the lake
    # untouched; between the renames there is a brief no-lake window that
    # the recovery block above repairs on the next call (object-store /
    # catalog deployments swap a manifest pointer instead)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 12,
    max_records_per_file: int = 1_000_000,
    n_files: int | None = None,
) -> None:
    """Write ``df`` clustered on a Z-order (Morton) curve over ``cols``
    — multi-dimensional data skipping for a plain parquet lake: rows
    close in EVERY listed dimension land in the same files, so parquet
    min/max stats prune files for predicates on ANY of the columns (a
    lexicographic sort only helps the leading column).

    Construction: each column is equi-width bucketed to ``bits`` bits
    (``width_bucket`` against the column's min/max — one tiny agg), the
    bucket indices are bit-interleaved into the Morton code with pure
    integer expressions (whole-stage codegen, no UDF), and the write is
    ``repartitionByRange`` on the code — a range shuffle, the same cost
    as any global sort-write.

    The same pattern table formats call OPTIMIZE ZORDER BY; here it is
    engine-native.  Skew caveat: heavily duplicated values collapse
    into one bucket — acceptable, Z-order is a locality heuristic.
    """
    from pyspark.sql import functions as F

    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("zorder needs at least two columns")
    check_col(cols, df)
    n = int(bits)
    ranges = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).first()

    buckets = []
    for i, c in enumerate(cols):
        lo, hi = ranges[f"lo_{i}"], ranges[f"hi_{i}"]
        if lo is None or hi is None or hi <= lo:
            buckets.append(F.lit(0).cast("long"))
            continue
        b = F.width_bucket(
            F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(2**n)
        )
        # width_bucket: 0 below, 2^n+1 above; clamp into [0, 2^n-1]
        buckets.append(
            F.greatest(
                F.least(b - 1, F.lit(2**n - 1)), F.lit(0)
            ).cast("long")
        )

    code = F.lit(0).cast("long")
    for bit in range(n):
        for i, b in enumerate(buckets):
            code = code.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1)),
                    bit * len(cols) + i,
                )
            )

    out = df.withColumn("__z", code)
    if n_files is None:
        n_files = max(out.sparkSession.sparkContext.defaultParallelism, 8)
    (
        out.repartitionByRange(n_files, F.col("__z"))
        .drop("__z")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def delete_from_lake(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    key_col: str,
    partition_cols: Sequence[str],
) -> int:
    """Delete every lake row whose ``key_col`` appears in ``keys`` — the
    GDPR/right-to-be-forgotten pass — rewriting ONLY the partition
    directories that actually contain a matching key.

    Plan: a broadcast semi-join finds the affected partition values (at
    100 TB the deletion key list is dimension-sized); rows of affected
    partitions are re-read, anti-joined against the keys, and written
    back with dynamic partition overwrite, so untouched directories are
    never listed, read, or rewritten.  A partition whose rows are ALL
    deleted writes no files under dynamic overwrite — those directories
    are removed explicitly afterwards.

    Returns the number of rows deleted.
    """
    import shutil

    from pyspark.sql import functions as F

    pcols = list(partition_cols)
    lake = spark.read.parquet(path)
    check_col([key_col] + pcols, lake)
    check_col([key_col], keys)
    kd = F.broadcast(keys.select(key_col).distinct())

    affected_vals = (
        lake.join(kd, key_col, "left_semi").select(*pcols).distinct().cache()
    )
    affected = lake.join(F.broadcast(affected_vals), pcols, "left_semi")
    remaining = affected.join(kd, key_col, "left_anti")
    # one semi-join count — not before/after scans of every affected row
    n_deleted = affected.join(kd, key_col, "left_semi").count()

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        remaining.write.mode("overwrite").partitionBy(*pcols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    # remove directories whose every row was deleted (dynamic overwrite
    # rewrote nothing there, leaving the old files); directory names use
    # Spark's Hive-style escaping, so build them with the engine's own
    # escaper — a hand-built "col=value" path silently misses values
    # containing ':', '%', spaces, … and the "deleted" data would remain
    esc = spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    emptied = affected_vals.join(
        remaining.select(*pcols).distinct(), pcols, "left_anti"
    ).collect()
    for row in emptied:
        parts = []
        for c in pcols:
            v = row[c]
            if v is None:
                parts.append(f"{esc.escapePathName(c)}=__HIVE_DEFAULT_PARTITION__")
            else:
                parts.append(
                    f"{esc.escapePathName(c)}={esc.escapePathName(str(v))}"
                )
        target = os.path.join(path, *parts)
        if not os.path.exists(target):
            raise RuntimeError(
                f"expected emptied partition directory missing: {target}"
            )
        shutil.rmtree(target)
    affected_vals.unpersist()
    return n_deleted


__all__ = [
    "write_partitioned", "read_lake", "compact_lake", "delete_from_lake",
    "zorder_write",
]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two table snapshots — the CDC-validation /
    migration-audit primitive: classify every key as ``added``,
    ``removed``, ``changed`` or ``unchanged``.

    ONE full-outer equi-join on the key (both sides shuffle once on the
    same key — co-partitioned, no fanout); change detection is a
    null-safe column comparison (``<=>``), so NULL→value and
    value→NULL edits register as changes while NULL==NULL does not.
    ``compare_cols`` defaults to all shared non-key columns.  Duplicate
    keys in either snapshot are rejected up front (a diff over non-keyed
    rows is ill-defined) — detected with one count aggregate per side.

    Output: key columns + ``change`` + per-side structs ``old_row`` /
    ``new_row`` (NULL for the absent side).
    """
    from pyspark.sql import functions as F

    check_col(key_cols, old)
    check_col(key_cols, new)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    check_col(compare_cols, old)
    check_col(compare_cols, new)
    for side, df in (("old", old), ("new", new)):
        dups = (
            df.groupBy(*key_cols).count().filter(F.col("count") > 1).limit(1)
        )
        if dups.count():
            raise ValueError(
                f"{side} snapshot has duplicate keys on {key_cols} — "
                "snapshot_diff requires keyed rows"
            )
    o = old.select(
        *key_cols, F.struct(*compare_cols).alias("old_row"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *key_cols, F.struct(*compare_cols).alias("new_row"),
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, key_cols, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col("old_row")[c].eqNullSafe(F.col("new_row")[c])
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, change.alias("change"),
                         "old_row", "new_row")
