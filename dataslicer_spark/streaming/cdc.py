"""Streaming CDC → snapshot: ``MERGE INTO`` as a micro-batch loop.

The batch operator (``operators/scd.apply_changelog``) merges one change
log into one snapshot; the streaming form drives it from a file stream
inside ``foreachBatch`` (the same pattern as ``streaming/train.py`` and
``streaming/dedup_stream.py``): per micro-batch, read the current
snapshot, merge the batch's changes (latest-wins per key, ``'D'``
deletes), and atomically swap the new snapshot in with the two-rename
protocol of ``sources/lake.compact_lake`` — readers always see either
the old or the new complete snapshot, never a half-written directory.

Correctness across batches requires the CDC stream property: for any
key, later batches carry larger ``seq_col`` values than earlier ones
(true of any log-offset/LSN-derived sequence).  Under that invariant
the sequential per-batch merge equals the one-shot merge of the whole
log — the reconciliation pytest asserts exactly this.

Scale notes: each micro-batch rewrites the snapshot — the honest cost
of MERGE on plain parquet (a table format turns it into a partition- or
file-scoped rewrite; ``sources/lake.delete_from_lake`` shows the
partition-scoped variant).  Bound it by keying the snapshot into
partition dirs and merging only partitions the batch touches, or by
widening the trigger so each rewrite absorbs more changes.  The merge
itself is the batch operator's shape: map-side ``max_by`` partials, one
co-keyed full-outer join, no windows.
"""

from __future__ import annotations

import os
import shutil
from typing import Sequence

from pyspark.sql import SparkSession

from ..operators.scd import apply_changelog


def stream_apply_changelog(
    spark: SparkSession,
    source_dir: str,
    schema,
    snapshot_path: str,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str,
    attr_cols: Sequence[str],
    max_files_per_trigger: int = 1,
) -> dict:
    """Drain a parquet change-file stream into the snapshot at
    ``snapshot_path`` (created if absent; ``availableNow`` — processes
    the backlog and stops).  Returns
    ``{"n_batches", "n_changes", "n_rows"}`` (final snapshot size).

    Local-filesystem snapshot only (POSIX-rename swap, as in
    ``compact_minhash_index``); the change SOURCE may be any stream the
    file source reads."""
    from urllib.parse import urlparse

    if urlparse(snapshot_path).scheme not in ("", "file"):
        raise ValueError(
            "stream_apply_changelog needs a local snapshot path "
            f"(two-rename swap); got {snapshot_path!r}"
        )
    state = {"n_batches": 0, "n_changes": 0, "n_rows": 0}
    keys = list(key_cols)
    attrs = list(attr_cols)

    def step(batch_df, _batch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            return
        if os.path.isdir(snapshot_path):
            snap = spark.read.parquet(snapshot_path).select(*keys, *attrs)
        else:
            snap = batch_df.select(*keys, *attrs).limit(0)
        merged = apply_changelog(
            snap, batch_df, keys, seq_col, op_col, attrs
        )
        tmp = snapshot_path + ".__merging__"
        old = snapshot_path + ".__old__"
        for leftover in (tmp, old):
            if os.path.exists(leftover):
                shutil.rmtree(leftover)
        # write the merge BEFORE touching the live dir (the plan reads
        # it), then swap: readers see old or new, never a partial dir
        merged.write.mode("overwrite").parquet(tmp)
        n_rows = spark.read.parquet(tmp).count()
        if os.path.isdir(snapshot_path):
            os.rename(snapshot_path, old)
        os.rename(tmp, snapshot_path)
        shutil.rmtree(old, ignore_errors=True)
        state["n_batches"] += 1
        state["n_changes"] += n
        state["n_rows"] = n_rows

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(step)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state


__all__ = ["stream_apply_changelog"]
