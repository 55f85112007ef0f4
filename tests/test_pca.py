"""Distributed PCA (operators/pca): exactness of the fixed-point Gram
reduction, numpy parity of fit+project, and the no-Python projection plan."""

import numpy as np
import pytest

from dataslicer_spark.operators.pca import (
    embedding_gram,
    pca_fit,
    pca_project,
)

DIM = 8


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.RandomState(7)
    X = rng.normal(size=(200, DIM)).astype(np.float32)
    # correlated structure so PCA has a meaningful spectrum
    X[:, 1] = 0.7 * X[:, 0] + 0.3 * X[:, 1]
    rows = [(int(i), [float(v) for v in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(5), X.astype(np.float64)


def test_gram_exact_vs_numpy(spark, vec_df):
    df, X = vec_df
    out = {
        (r["i"], r["j"]): r["s_fp"]
        for r in embedding_gram(df, "embedding", dim=DIM).collect()
    }
    scale = float(1 << 30)
    iu, ju = np.triu_indices(DIM)
    assert len(out) == len(iu)
    for i, j in zip(iu, ju):
        expected = int(np.floor(X[:, i] * X[:, j] * scale).sum())
        assert out[(i + 1, j + 1)] == expected, (i, j)


def test_gram_partitioning_invariant(spark, vec_df):
    df, _ = vec_df
    a = sorted(
        map(tuple, embedding_gram(df.coalesce(1), dim=DIM).collect())
    )
    b = sorted(
        map(tuple, embedding_gram(df.repartition(13), dim=DIM).collect())
    )
    assert a == b


def test_fit_matches_numpy(spark, vec_df):
    df, X = vec_df
    comps, vals, mean = pca_fit(df, "embedding", dim=DIM, k=3)
    np.testing.assert_allclose(mean, X.mean(axis=0), atol=1e-6)
    cov = np.cov(X, rowvar=False)
    ev, evec = np.linalg.eigh(cov)
    order = np.argsort(ev)[::-1][:3]
    np.testing.assert_allclose(vals, ev[order], rtol=1e-6, atol=1e-6)
    for k in range(3):
        ref = evec[:, order[k]]
        idx = int(np.argmax(np.abs(comps[k])))
        if ref[idx] < 0:
            ref = -ref
        np.testing.assert_allclose(comps[k], ref, atol=1e-5)


def test_project_matches_numpy(spark, vec_df):
    df, X = vec_df
    comps, _vals, mean = pca_fit(df, "embedding", dim=DIM, k=2)
    out = pca_project(df, comps, mean, "embedding", out_col="pca")
    got = {r["vec_id"]: np.array(r["pca"]) for r in out.collect()}
    expected = (X - mean) @ comps.T
    for i in range(len(X)):
        np.testing.assert_allclose(got[i], expected[i], atol=1e-5)


def test_project_plan_stays_jvm_side(spark, vec_df):
    df, _ = vec_df
    comps, _v, mean = pca_fit(df, "embedding", dim=DIM, k=2)
    plan = (
        pca_project(df, comps, mean, "embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def test_fit_empty_raises(spark):
    df = spark.createDataFrame([], "embedding array<float>")
    with pytest.raises(ValueError):
        pca_fit(df, "embedding", dim=DIM, k=2)
