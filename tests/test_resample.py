"""Resample/forward-fill (operators/resample.py): pandas resample parity
and grid-shape properties."""

from __future__ import annotations

import numpy as np
import pandas as pd

from dataslicer_spark.operators.resample import resample_ffill, time_grid


def test_time_grid_covers_span(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "ts": [950, 2050, 100]})
    )
    grid = time_grid(df, "ts", ["k"], step_us=1000).toPandas()
    g1 = sorted(grid[grid.k == 1].grid_ts)
    assert g1 == [0, 1000, 2000]  # buckets of first..last obs inclusive
    g2 = sorted(grid[grid.k == 2].grid_ts)
    assert g2 == [0]


def test_resample_matches_pandas(spark):
    rng = np.random.default_rng(11)
    n = 200
    obs = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n),
            "ts": rng.choice(np.arange(0, 50_000, 7), n, replace=False).astype(
                "int64"
            ),
            "v": rng.normal(size=n).round(3),
        }
    )
    obs = obs.drop_duplicates(["k", "ts"])
    step = 1000
    out = resample_ffill(
        spark.createDataFrame(obs), "ts", ["k"], ["v"], step_us=step
    ).toPandas()

    for k, grp in obs.groupby("k"):
        grp = grp.sort_values("ts")
        lo = grp.ts.min() - grp.ts.min() % step
        hi = grp.ts.max() - grp.ts.max() % step
        ticks = np.arange(lo, hi + 1, step)
        # pandas ground truth: merge_asof onto the grid
        expect = pd.merge_asof(
            pd.DataFrame({"ts": ticks}), grp, on="ts", direction="backward"
        )
        got = out[out.k == k].sort_values("grid_ts").reset_index(drop=True)
        assert list(got.grid_ts) == list(ticks)
        exp_v = expect.v.tolist()
        got_v = got.v.tolist()
        for a, b in zip(exp_v, got_v):
            assert (pd.isna(a) and (b is None or pd.isna(b))) or a == b


def test_resample_fills_empty_buckets(spark):
    obs = pd.DataFrame({"k": [1, 1], "ts": [0, 5000], "v": [1.0, 2.0]})
    out = (
        resample_ffill(spark.createDataFrame(obs), "ts", ["k"], ["v"], 1000)
        .toPandas()
        .sort_values("grid_ts")
    )
    # ticks 0..4000 carry v=1.0 (forward fill across 4 empty buckets)
    assert out[out.grid_ts < 5000].v.tolist() == [1.0] * 5
    assert out[out.grid_ts >= 5000].v.tolist() == [2.0]


def test_time_grid_negative_epochs_floor_aligned(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "ts": [-2500, 1500]})
    )
    grid = sorted(
        time_grid(df, "ts", ["k"], step_us=1000).toPandas().grid_ts
    )
    # floor alignment: bucket of -2500 is -3000 (not -2000)
    assert grid == [-3000, -2000, -1000, 0, 1000]
