"""Streaming append + compact-on-read upsert (streaming/lakesink.py):
two micro-batches with overlapping keys resolve to latest-wins; a
restart with no new input appends nothing (exactly-once)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _write_batch(spark, src, rows, ts0):
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    pdf["ts"] = ts0 + pdf.index
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)


def test_stream_upsert_latest_wins(spark):
    from dataslicer_spark.streaming.lakesink import (
        latest_view,
        stream_append_to_lake,
    )

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in")
        lake = os.path.join(d, "lake")
        ckpt = os.path.join(d, "ckpt")
        _write_batch(spark, src, [(1, "a"), (2, "b")], ts0=100)
        schema = spark.read.parquet(src).schema

        def run_once():
            q = stream_append_to_lake(spark, src, schema, lake, ckpt)
            q.awaitTermination(120)

        run_once()
        # batch 2: k=2 updated, k=3 new
        _write_batch(spark, src, [(2, "b2"), (3, "c")], ts0=200)
        run_once()

        cur = {
            r.k: (r.v, r.ts)
            for r in latest_view(spark, lake, ["k"], "ts").collect()
        }
        assert cur == {1: ("a", 100), 2: ("b2", 200), 3: ("c", 201)}
        # full history retained (append-only), view resolves it
        assert spark.read.parquet(lake).count() == 4

        # exactly-once: re-run with no new source files appends nothing
        run_once()
        assert spark.read.parquet(lake).count() == 4
