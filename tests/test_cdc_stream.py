"""streaming/cdc.stream_apply_changelog: micro-batch MERGE loop —
sequential per-batch merges reconcile with the one-shot batch merge,
deletes drop keys, the snapshot dir swap stays atomic-complete."""

from __future__ import annotations

import os

import pytest

from dataslicer_spark.operators.scd import apply_changelog
from dataslicer_spark.streaming.cdc import stream_apply_changelog

SCHEMA = "k int, seq long, op string, val double"


def _write_batch(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_cdc_reconciles_with_batch_merge(spark, tmp_path):
    src = str(tmp_path / "changes")
    snap = str(tmp_path / "snapshot")
    # initial snapshot
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, val double"
    ).write.parquet(snap)

    # seq monotone per key across batches (the CDC log property)
    b1 = [(1, 1, "U", 11.0), (4, 2, "I", 40.0), (2, 3, "U", 21.0)]
    b2 = [(2, 4, "D", 0.0), (4, 5, "U", 41.0), (5, 6, "I", 50.0)]
    b3 = [(5, 7, "D", 0.0), (1, 8, "U", 12.0)]
    _write_batch(spark, b1, src)
    _write_batch(spark, b2, src)
    _write_batch(spark, b3, src)

    state = stream_apply_changelog(
        spark, src, SCHEMA, snap, ["k"], "seq", "op", ["val"]
    )
    assert state["n_changes"] == 8 and state["n_batches"] >= 1

    got = {
        r.k: r.val for r in spark.read.parquet(snap).collect()
    }
    # one-shot merge of the full log over the original snapshot
    full = apply_changelog(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, val double"
        ),
        spark.createDataFrame(b1 + b2 + b3, SCHEMA),
        ["k"], "seq", "op", ["val"],
    )
    want = {r.k: r.val for r in full.collect()}
    assert got == want == {1: 12.0, 3: 30.0, 4: 41.0}
    assert state["n_rows"] == 3


def test_stream_cdc_bootstraps_missing_snapshot(spark, tmp_path):
    src = str(tmp_path / "changes")
    snap = str(tmp_path / "snapshot")
    _write_batch(spark, [(7, 1, "I", 70.0), (8, 2, "D", 0.0)], src)
    stream_apply_changelog(
        spark, src, SCHEMA, snap, ["k"], "seq", "op", ["val"]
    )
    assert {
        (r.k, r.val) for r in spark.read.parquet(snap).collect()
    } == {(7, 70.0)}
    # no leftover temp/old dirs
    parent = os.path.dirname(snap)
    assert sorted(os.listdir(parent)) == [
        "changes", os.path.basename(snap)
    ]


def test_stream_cdc_rejects_remote_snapshot(spark, tmp_path):
    with pytest.raises(ValueError, match="local"):
        stream_apply_changelog(
            spark, str(tmp_path), SCHEMA, "s3://bucket/snap",
            ["k"], "seq", "op", ["val"],
        )
