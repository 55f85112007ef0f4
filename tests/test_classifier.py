"""Batch-perceptron quality classifier (operators/classifier.py):
integer-exact distributed training.  Core claim: the epoch trajectory is
order- and partitioning-independent int64 math, so a pure-python replay
reproduces Spark's weights exactly.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.classifier import (
    add_text_features,
    batch_perceptron_fit,
    perceptron_predict,
)


def _numpy_fit(X, y, n_epochs, lr=1):
    w = np.zeros(X.shape[1] + 1, dtype=np.int64)
    Xb = np.hstack([np.ones((len(X), 1), dtype=np.int64), X])
    for _ in range(n_epochs):
        m = y * (Xb @ w) <= 0
        w = w + lr * (Xb[m] * y[m, None]).sum(axis=0)
    return w


@pytest.fixture(scope="module")
def toy(spark):
    rng = np.random.default_rng(11)
    X = rng.integers(0, 50, size=(200, 3))
    y = np.where(2 * X[:, 0] - X[:, 1] + 3 * X[:, 2] - 60 > 0, 1, -1)
    rows = [
        (int(i), int(y[i]), int(X[i, 0]), int(X[i, 1]), int(X[i, 2]))
        for i in range(len(X))
    ]
    df = spark.createDataFrame(rows, "id long, y int, a long, b long, c long")
    return X, y, df


def test_fit_matches_numpy_replay(toy):
    X, y, df = toy
    for epochs in (1, 4):
        w_np = _numpy_fit(X.astype(np.int64), y.astype(np.int64), epochs)
        w_sp = batch_perceptron_fit(df, ["a", "b", "c"], "y", n_epochs=epochs)
        assert list(w_np) == w_sp


def test_fit_partitioning_invariance(toy):
    _, _, df = toy
    a = batch_perceptron_fit(df, ["a", "b", "c"], "y", n_epochs=3)
    b = batch_perceptron_fit(
        df.repartition(17), ["a", "b", "c"], "y", n_epochs=3
    )
    assert a == b


def test_predict_scores_and_zero_margin(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, -1), (3, 0)], "id long, a long"
    )
    out = {
        r.id: (r.score, r.pred)
        for r in perceptron_predict(df, ["a"], [0, 1]).collect()
    }
    assert out == {1: (2, 1), 2: (-1, -1), 3: (0, -1)}  # 0 margin → −1


def test_null_rows_ignored_in_fit_scored_null_in_predict(spark):
    df = spark.createDataFrame(
        [(1, 1, 10), (2, -1, None), (3, -1, 2)],
        "id long, y int, a long",
    )
    w = batch_perceptron_fit(df, ["a"], "y", n_epochs=2)
    w_np = _numpy_fit(
        np.array([[10], [2]], dtype=np.int64),
        np.array([1, -1], dtype=np.int64),
        2,
    )
    assert w == list(w_np)
    scored = {r.id: (r.score, r.pred) for r in
              perceptron_predict(df, ["a"], w).collect()}
    assert scored[2] == (None, -1)


def test_learns_separable_quality_signal(spark):
    # origin-separable signal (batch-gradient perceptron steps move the
    # whole misclassified sum at once, so a separator far from the origin
    # needs many epochs — centered features converge in a few)
    rows = [(i, 1, 1 + i) for i in range(20)] + [
        (100 + i, -1, -1 - i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, y int, f long")
    w = batch_perceptron_fit(df, ["f"], "y", n_epochs=10)
    out = perceptron_predict(df, ["f"], w)
    acc = out.filter(F.col("pred") == F.col("y")).count() / out.count()
    assert acc == 1.0


def test_text_features_match_manual(spark):
    df = spark.createDataFrame(
        [(1, "Ab c, 12!")], "doc_id long, text string"
    )
    r = add_text_features(df).collect()[0]
    assert (r.f_len, r.f_spaces, r.f_digits, r.f_upper, r.f_punct) == (
        9, 2, 2, 1, 2
    )


def test_lr_schedule_matches_numpy_and_validates(toy):
    X, y, df = toy

    def np_fit(schedule):
        w = np.zeros(X.shape[1] + 1, dtype=np.int64)
        Xb = np.hstack([np.ones((len(X), 1), dtype=np.int64), X])
        for lr in schedule:
            m = y * (Xb @ w) <= 0
            w = w + lr * (Xb[m] * y[m, None]).sum(axis=0)
        return list(w)

    sched = [8, 4, 2, 1]
    got = batch_perceptron_fit(
        df, ["a", "b", "c"], "y", n_epochs=4, lr=sched
    )
    assert got == np_fit(sched)
    with pytest.raises(ValueError, match="schedule"):
        batch_perceptron_fit(df, ["a"], "y", n_epochs=3, lr=[1, 2])


def test_substring_count_literal_only(spark):
    from dataslicer_spark.operators.classifier import substring_count

    df = spark.createDataFrame([(1, "aXbXXc")], "id long, t string")
    assert df.select(substring_count(F.col("t"), "X").alias("n")).first().n == 3
    assert (
        df.select(substring_count(F.col("t"), "XX").alias("n")).first().n == 1
    )
    with pytest.raises(ValueError, match="literal"):
        substring_count(F.col("t"), "a.*b")


def test_engines_agree_and_validate(toy):
    X, y, df = toy
    sched = [4, 2, 1]
    a = batch_perceptron_fit(
        df, ["a", "b", "c"], "y", n_epochs=3, lr=sched, engine="expr"
    )
    b = batch_perceptron_fit(
        df, ["a", "b", "c"], "y", n_epochs=3, lr=sched, engine="arrow"
    )
    assert a == b
    with pytest.raises(ValueError, match="engine"):
        batch_perceptron_fit(df, ["a"], "y", engine="numpy")


def test_hashed_bow_features(spark):
    import hashlib

    from dataslicer_spark.operators.classifier import hashed_bow_features

    df = spark.createDataFrame(
        [(1, "cat dog cat"), (2, ""), (3, None), (4, "  cat  ")],
        "doc_id long, text string",
    )
    dim = 8
    out = hashed_bow_features(
        df.filter(F.col("text").isNotNull()), "doc_id", "text", dim=dim
    )
    rows = {r.doc_id: [r[f"f{j}"] for j in range(dim)] for r in out.collect()}
    slot = lambda t: int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim
    want1 = [0] * dim
    want1[slot("cat")] += 2
    want1[slot("dog")] += 1
    assert rows[1] == want1
    assert rows[2] == [0] * dim          # empty text → all-zero row kept
    want4 = [0] * dim
    want4[slot("cat")] = 1
    assert rows[4] == want4
