"""Incremental file ingestion (sources/incremental): high-watermark scan
over _metadata.file_modification_time."""

import os
import time

from dataslicer_spark.sources.incremental import (
    current_watermark,
    incremental_ingest,
    load_watermark,
    save_watermark,
    scan_since,
)


def _write(spark, path, ids, mode="append"):
    spark.createDataFrame([(i,) for i in ids], "id long").coalesce(1).write.mode(
        mode
    ).parquet(path)


def test_scan_since_reads_only_new_files(spark, tmp_path):
    lake = str(tmp_path / "lake")
    _write(spark, lake, [1, 2, 3])
    wm = current_watermark(spark, lake)
    assert wm > 0
    # nothing new yet
    assert scan_since(spark, lake, wm).count() == 0
    time.sleep(1.1)  # mtime granularity
    _write(spark, lake, [4, 5])
    new = scan_since(spark, lake, wm)
    assert sorted(r["id"] for r in new.collect()) == [4, 5]
    # provenance columns present
    assert {"_file_path", "_file_mtime_ms"} <= set(new.columns)


def test_incremental_ingest_commit_protocol(spark, tmp_path):
    # safety_lag_ms=0: exact watermark semantics (writer-ordered mtimes)
    lake = str(tmp_path / "lake")
    state = str(tmp_path / "state")
    _write(spark, lake, [1, 2])
    rows, commit = incremental_ingest(spark, lake, state, safety_lag_ms=0)
    assert rows.count() == 2  # first run: watermark 0 -> everything
    commit()
    assert load_watermark(state) > 0
    # second run with no new files: empty
    rows2, commit2 = incremental_ingest(spark, lake, state, safety_lag_ms=0)
    assert rows2.count() == 0
    # crash before commit: watermark unchanged -> batch replays
    time.sleep(1.1)
    _write(spark, lake, [3])
    rows3, commit3 = incremental_ingest(spark, lake, state, safety_lag_ms=0)
    assert rows3.count() == 1  # sees the new file
    # no commit3() call (simulated crash) — next run sees it again
    rows4, commit4 = incremental_ingest(spark, lake, state, safety_lag_ms=0)
    assert rows4.count() == 1
    commit4()
    rows5, _ = incremental_ingest(spark, lake, state, safety_lag_ms=0)
    assert rows5.count() == 0


def test_incremental_safety_lag_replays_boundary(spark, tmp_path):
    """With the default lag, files near the watermark replay on the next
    run (at-least-once through the listing race) rather than vanish."""
    lake = str(tmp_path / "lake")
    state = str(tmp_path / "state")
    _write(spark, lake, [1, 2])
    rows, commit = incremental_ingest(
        spark, lake, state, safety_lag_ms=60_000
    )
    assert rows.count() == 2
    commit()
    # next run: the just-written files are inside the lag window -> replay
    rows2, _ = incremental_ingest(spark, lake, state, safety_lag_ms=60_000)
    assert rows2.count() == 2


def test_watermark_atomic_roundtrip(tmp_path):
    state = str(tmp_path / "s")
    assert load_watermark(state) == 0
    save_watermark(state, 12345)
    assert load_watermark(state) == 12345
    save_watermark(state, 99999)
    assert load_watermark(state) == 99999
    assert not os.path.exists(os.path.join(state, "_incremental_watermark.tmp"))
