"""Online perceptron training over a file stream (streaming/train.py)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.classifier import batch_perceptron_fit
from dataslicer_spark.streaming.train import stream_perceptron_train


def test_streamed_model_equals_sequential_batch_replay(spark):
    rows = [
        (i, 1 if (2 * (i % 7) - (i % 5) - 3) > 0 else -1, i % 7, i % 5)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, y int, a long, b long")

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in")
        os.makedirs(src)
        # three files with pinned ascending mtimes → deterministic
        # micro-batch order under maxFilesPerTrigger=1
        parts = [
            df.filter(F.col("id") % 3 == r).coalesce(1) for r in range(3)
        ]
        for r, p in enumerate(parts):
            sub = os.path.join(d, f"stage{r}")
            p.write.parquet(sub)
            f = [x for x in os.listdir(sub) if x.endswith(".parquet")][0]
            dst = os.path.join(src, f"part-{r}.parquet")
            os.rename(os.path.join(sub, f), dst)
            os.utime(dst, (1_700_000_000 + r, 1_700_000_000 + r))

        w_stream, n_batches = stream_perceptron_train(
            spark, src, df.schema, ["a", "b"], "y", lr=2
        )
    assert n_batches == 3

    # offline replay: one step per file in the same order
    w = None
    for r in range(3):
        w = batch_perceptron_fit(
            df.filter(F.col("id") % 3 == r), ["a", "b"], "y",
            n_epochs=1, lr=2, init_weights=w,
        )
    assert w_stream == w
    assert w_stream != [0, 0, 0]  # it actually learned something


def test_init_weights_validation(spark):
    df = spark.createDataFrame([(1, 1, 2)], "id long, y int, a long")
    with pytest.raises(ValueError, match="init_weights"):
        batch_perceptron_fit(df, ["a"], "y", init_weights=[1, 2, 3])
    # resuming from weights continues, not restarts
    w1 = batch_perceptron_fit(df, ["a"], "y", n_epochs=1)
    w2 = batch_perceptron_fit(df, ["a"], "y", n_epochs=1, init_weights=w1)
    w_two_epochs = batch_perceptron_fit(df, ["a"], "y", n_epochs=2)
    assert w2 == w_two_epochs
