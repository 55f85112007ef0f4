"""operators/bootstrap.bootstrap_mean_ci — exact Python (hashlib) replay
of the hash-derived Poisson bootstrap, CI sanity, invariances."""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from dataslicer_spark.operators.bootstrap import (
    bootstrap_mean_ci,
    poisson1_thresholds,
)

FP = 1 << 20


def _py_replicates(rows, n_replicates, salt="bs"):
    """Bit-exact Python replay: same block-sliced md5 (one digest per 3
    replicates, three 40-bit slices), same thresholds, same math."""
    from dataslicer_spark.operators.bootstrap import PER_DIGEST

    ts = poisson1_thresholds()
    means = []
    for b in range(n_replicates):
        g, j = divmod(b, PER_DIGEST)
        sw = cnt = 0
        for rid, v in rows:
            h = hashlib.md5(f"{salt}{rid}:{g}".encode()).hexdigest()
            u = int(h[10 * j : 10 * (j + 1)], 16)
            w = next((k for k, t in enumerate(ts) if u < t), len(ts))
            vq = math.floor(v * FP)
            sw += w * vq
            cnt += w
        if cnt > 0:
            means.append(sw / (cnt * FP))
    return means


def test_exact_python_replay(spark):
    rng = random.Random(2)
    rows = [(i, rng.uniform(0, 100)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = bootstrap_mean_ci(df, "v", "id", n_replicates=16, trim=1).collect()[0]
    means = sorted(_py_replicates(rows, 16))
    assert got["n_replicates"] == len(means)
    assert got["ci_lo"] == means[1]  # bit-identical, not approx
    assert got["ci_hi"] == means[-2]
    exact_mean = sum(math.floor(v * FP) for _, v in rows) / (len(rows) * FP)
    assert got["mean"] == exact_mean
    assert got["n_rows"] == 300


def test_ci_brackets_mean_and_shrinks(spark):
    rng = random.Random(4)
    small = [(i, rng.gauss(50, 10)) for i in range(200)]
    big = [(i, rng.gauss(50, 10)) for i in range(5000)]
    for rows in (small, big):
        df = spark.createDataFrame(rows, "id long, v double")
        r = bootstrap_mean_ci(df, "v", "id").collect()[0]
        assert r["ci_lo"] < r["mean"] < r["ci_hi"]
    rs = bootstrap_mean_ci(
        spark.createDataFrame(small, "id long, v double"), "v", "id"
    ).collect()[0]
    rb = bootstrap_mean_ci(
        spark.createDataFrame(big, "id long, v double"), "v", "id"
    ).collect()[0]
    assert (rb["ci_hi"] - rb["ci_lo"]) < (rs["ci_hi"] - rs["ci_lo"])


def test_partitioning_invariance_bitwise(spark):
    rng = random.Random(6)
    rows = [(i, rng.uniform(-5, 5)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, v double")
    one = bootstrap_mean_ci(df.coalesce(1), "v", "id").collect()[0]
    many = bootstrap_mean_ci(df.repartition(16), "v", "id").collect()[0]
    assert one == many


def test_poisson_weight_mass_is_plausible(spark):
    # mean multiplicity over all (row, replicate) cells ≈ 1
    rows = [(i, 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v double")
    r = bootstrap_mean_ci(df, "v", "id", n_replicates=32).collect()[0]
    # every replicate's mean of constant-1 data is exactly 1
    assert r["ci_lo"] == 1.0 and r["ci_hi"] == 1.0


def test_trim_guard(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, "v", "id", n_replicates=4, trim=2)
