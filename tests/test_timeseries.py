"""Time-series analytics (operators/timeseries.py): brute-force parity
for rolling windows, funnel ordering/horizon semantics, cohort retention,
np.interp parity for linear interpolation, and plan-shape asserts
(single exchange for the chained funnel windows; no join in interpolate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.timeseries import (
    funnel_conversion,
    interpolate_linear,
    retention_cohorts,
    rolling_window_stats,
)

_FP = float(2**20)


@pytest.fixture(scope="module")
def ts_events(spark):
    rng = np.random.default_rng(7)
    n = 600
    pdf = pd.DataFrame(
        {
            "user": rng.integers(0, 12, n),
            "ts": rng.integers(0, 10_000, n).astype("int64"),
            "typ": rng.choice(["a", "b", "c", "x"], n),
            "val": np.round(rng.normal(10, 3, n), 3),
            "eid": np.arange(n, dtype="int64"),
        }
    )
    # force some exact-duplicate timestamps within a user (frame peers)
    pdf.loc[1, ["user", "ts"]] = pdf.loc[0, ["user", "ts"]]
    return spark.createDataFrame(pdf), pdf


def test_rolling_brute_force(ts_events):
    df, pdf = ts_events
    width = 500
    out = (
        rolling_window_stats(df, "ts", ["user"], "val", width)
        .select(
            "user", "ts", "eid", "roll_n", "roll_sum", "roll_max",
            "roll_mean", "roll_std",
        )
        .toPandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        w = pdf[
            (pdf.user == row.user)
            & (pdf.ts >= row.ts - width)
            & (pdf.ts <= row.ts)
        ]
        assert row.roll_n == len(w)
        v = w.val.to_numpy()
        s1 = np.floor(v * _FP).astype("int64").sum() / _FP
        s2 = np.floor(v * v * 2**14).astype("int64").sum() / 2**14
        assert row.roll_sum == pytest.approx(s1, abs=0)
        assert row.roll_max == v.max()
        assert row.roll_mean == pytest.approx(s1 / len(v), abs=0)
        assert row.roll_std == pytest.approx(
            np.sqrt(max(s2 / len(v) - (s1 / len(v)) ** 2, 0.0)), abs=0
        )


def test_rolling_row_order_invariance(ts_events, spark):
    df, _ = ts_events
    a = (
        rolling_window_stats(df, "ts", ["user"], "val", 500)
        .select("eid", "roll_n", "roll_sum")
        .toPandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    b = (
        rolling_window_stats(
            df.orderBy(F.rand(3)).repartition(7), "ts", ["user"], "val", 500
        )
        .select("eid", "roll_n", "roll_sum")
        .toPandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def _funnel_truth(pdf, steps, horizon=None):
    reached = [0] * len(steps)
    for _, u in pdf.groupby("user"):
        prev_t = None
        t1 = None
        for i, s in enumerate(steps):
            c = u[u.typ == s]
            if prev_t is not None:
                c = c[c.ts >= prev_t]
            if not len(c):
                break
            t = c.ts.min()
            if i == 0:
                t1 = t
            if horizon is not None and i > 0 and t - t1 > horizon:
                break
            reached[i] += 1
            prev_t = t
    return reached


def test_funnel_brute_force(ts_events):
    df, pdf = ts_events
    out = (
        funnel_conversion(df, ["a", "b", "c"], "ts", "user", "typ")
        .toPandas()
        .sort_values("step_index")
    )
    assert list(out.step) == ["a", "b", "c"]
    assert list(out.n_users) == _funnel_truth(pdf, ["a", "b", "c"])


def test_funnel_horizon(ts_events):
    df, pdf = ts_events
    out = (
        funnel_conversion(df, ["a", "b", "c"], "ts", "user", "typ", horizon_us=800)
        .toPandas()
        .sort_values("step_index")
    )
    assert list(out.n_users) == _funnel_truth(pdf, ["a", "b", "c"], horizon=800)
    # monotone funnel
    n = list(out.n_users)
    assert n[0] >= n[1] >= n[2]


def test_funnel_requires_order(spark):
    """A user doing b before a (and never after) reaches step 1 only."""
    pdf = pd.DataFrame(
        {"user": [1, 1], "ts": [100, 200], "typ": ["b", "a"]}
    )
    out = (
        funnel_conversion(
            spark.createDataFrame(pdf), ["a", "b"], "ts", "user", "typ"
        )
        .toPandas()
        .sort_values("step_index")
    )
    assert list(out.n_users) == [1, 0]


def test_funnel_single_exchange(ts_events):
    """The chained per-step window minima reuse one exchange on user."""
    df, _ = ts_events
    plan = (
        funnel_conversion(df, ["a", "b", "c"], "ts", "user", "typ")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchanges = plan.count("Exchange hashpartitioning")
    # one for the windows + one for the per-user collapse (partial agg
    # may keep it), nothing per-step
    assert n_exchanges <= 2, plan


def test_retention(ts_events):
    df, pdf = ts_events
    period = 2000
    out = retention_cohorts(df, "ts", "user", period).toPandas()
    truth = {}
    first = pdf.groupby("user").ts.min()
    for _, r in pdf.iterrows():
        cohort = first[r.user] // period * period
        off = r.ts // period - cohort // period
        truth.setdefault((cohort, off), set()).add(r.user)
    expect = {(c, o): len(s) for (c, o), s in truth.items()}
    got = {
        (r.cohort_start, r.period_offset): r.n_users for _, r in out.iterrows()
    }
    assert got == expect


def test_sessionize_brute_force(ts_events):
    from dataslicer_spark.operators.timeseries import sessionize

    df, pdf = ts_events
    gap = 700
    out = (
        sessionize(df, "ts", "user", gap, tiebreak_col="eid")
        .select("eid", "session_seq")
        .toPandas()
        .set_index("eid")
        .session_seq
    )
    for _, grp in pdf.groupby("user"):
        g = grp.sort_values(["ts", "eid"])
        seq, prev = 0, None
        for _, r in g.iterrows():
            if prev is None or r.ts - prev >= gap:
                seq += 1
            prev = r.ts
            assert out[r.eid] == seq


def test_sessionize_matches_session_window_count(spark, sf_dir):
    """Session ordinals and the built-in session_window agree on the
    number of sessions per user (same >= gap boundary rule)."""
    import os
    from pyspark.sql import functions as F2
    from dataslicer_spark.operators.timeseries import sessionize
    from dataslicer_spark.streaming.events import (
        _epoch_us, load_events, session_stats,
    )

    events = load_events(spark, sf_dir)
    labeled = sessionize(
        events.select(
            "user_id", _epoch_us(F2.col("ts")).alias("ts_us"), "event_id"
        ),
        "ts_us", "user_id", gap_us=1_800_000_000, tiebreak_col="event_id",
    )
    n_ours = (
        labeled.groupBy("user_id")
        .agg(F2.max("session_seq").alias("n"))
        .toPandas()
        .set_index("user_id")
        .n
    )
    n_builtin = (
        session_stats(events, gap="30 minutes")
        .groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
    )
    pd.testing.assert_series_equal(
        n_ours.sort_index(), n_builtin.sort_index(),
        check_names=False, check_dtype=False,
    )


def test_debounce_brute_force(ts_events):
    from dataslicer_spark.operators.timeseries import debounce

    df, pdf = ts_events
    # unique (user, ts): keep max eid per (user, ts) like the query does
    uniq = pdf.sort_values("eid").groupby(["user", "ts"], as_index=False).last()
    sdf = debounce(
        df.orderBy(F.col("eid").desc()).dropDuplicates(["user", "ts"]),
        "ts", ["user"], window_us=600,
    )
    got = set(sdf.select("eid").toPandas().eid)
    expect = set()
    for _, grp in uniq.groupby("user"):
        g = grp.sort_values("ts")
        last_kept = None
        for _, r in g.iterrows():
            if last_kept is None or r.ts >= last_kept + 600:
                expect.add(r.eid)
                last_kept = r.ts
    assert got == expect


def test_debounce_differs_from_sessionize_on_burst_chains(spark):
    """Events 10 apart with window 15: debounce keeps every other one
    (anchors restart the window); gaps-and-islands would chain the whole
    burst into one island and keep only the first."""
    from dataslicer_spark.operators.timeseries import debounce

    pdf = pd.DataFrame({"key": [1] * 5, "ts": [0, 10, 20, 30, 40]})
    out = (
        debounce(spark.createDataFrame(pdf), "ts", ["key"], window_us=15)
        .toPandas()
        .sort_values("ts")
    )
    assert list(out.ts) == [0, 20, 40]


def test_interpolate_np_parity(spark):
    rng = np.random.default_rng(11)
    rows = []
    for key in range(5):
        n = rng.integers(2, 15)
        ts = np.sort(rng.choice(np.arange(0, 5000), size=n, replace=False))
        vals = np.round(rng.normal(50, 10, n), 3)
        rows += [(key, int(t), float(v)) for t, v in zip(ts, vals)]
    pdf = pd.DataFrame(rows, columns=["key", "ts", "val"])
    df = spark.createDataFrame(pdf)
    step = 250
    out = interpolate_linear(df, "ts", ["key"], "val", step).toPandas()
    for key, grp in pdf.groupby("key"):
        ticks = np.arange(
            grp.ts.min() // step * step, grp.ts.max() // step * step + 1, step
        )
        expect = np.interp(ticks, grp.ts, grp.val)
        got = (
            out[out.key == key]
            .sort_values("grid_ts")
            .val_interp.to_numpy()
        )
        sub = out[out.key == key].sort_values("grid_ts")
        assert list(sub.grid_ts) == list(ticks)
        np.testing.assert_allclose(got, expect, rtol=1e-12)


def test_interpolate_exact_hit_and_edges(spark):
    pdf = pd.DataFrame(
        {"key": [1] * 3, "ts": [1000, 2000, 3500], "val": [10.0, 30.0, 60.0]}
    )
    df = spark.createDataFrame(pdf)
    out = (
        interpolate_linear(df, "ts", ["key"], "val", 500)
        .toPandas()
        .sort_values("grid_ts")
    )
    got = dict(zip(out.grid_ts, out.val_interp))
    assert got[1000] == 10.0  # exact observation
    assert got[2000] == 30.0
    assert got[1500] == 20.0  # midpoint
    assert got[3500] == 60.0
    assert got[3000] == pytest.approx(30.0 + 30.0 * 1000 / 1500)


def test_interpolate_no_join_in_plan(spark):
    pdf = pd.DataFrame(
        {"key": [1, 1, 2], "ts": [0, 100, 50], "val": [1.0, 2.0, 3.0]}
    )
    df = spark.createDataFrame(pdf)
    plan = (
        interpolate_linear(df, "ts", ["key"], "val", 50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan


def test_interval_join_brute_force(spark):
    from dataslicer_spark.operators.joins import interval_join

    rng = np.random.default_rng(5)
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 200),
            "p": rng.integers(0, 1000, 200).astype("int64"),
            "pid": np.arange(200, dtype="int64"),
        }
    )
    lo = rng.integers(0, 900, 60).astype("int64")
    iv = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 60),
            "lo": lo,
            # overlapping, variable-length intervals (incl. zero-length)
            "hi": lo + rng.integers(0, 300, 60),
            "iid": np.arange(60, dtype="int64"),
        }
    )
    out = interval_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(iv),
        "p", "lo", "hi", by_cols=["k"], bucket_width=64,
    )
    got = {(r.pid, r.iid) for r in out.collect()}
    expect = {
        (p.pid, i.iid)
        for _, p in pts.iterrows()
        for _, i in iv.iterrows()
        if p.k == i.k and i.lo <= p.p <= i.hi
    }
    assert got == expect


def test_interval_overlap_join_brute_force(spark):
    from dataslicer_spark.operators.joins import interval_overlap_join

    rng = np.random.default_rng(9)
    n_l, n_r = 120, 90
    llo = rng.integers(0, 900, n_l).astype("int64")
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 3, n_l),
            "a_lo": llo,
            # variable lengths incl. zero-length and bucket-spanning
            "a_hi": llo + rng.integers(0, 250, n_l),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    rlo = rng.integers(0, 900, n_r).astype("int64")
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 3, n_r),
            "b_lo": rlo,
            "b_hi": rlo + rng.integers(0, 250, n_r),
            "rid": np.arange(n_r, dtype="int64"),
        }
    )
    out = interval_overlap_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        ("a_lo", "a_hi"),
        ("b_lo", "b_hi"),
        by_cols=["k"],
        bucket_width=64,
    )
    rows = out.collect()
    got = [(r.lid, r.rid) for r in rows]
    # exactly-once: the bucketed plan must not emit duplicate pairs
    assert len(got) == len(set(got))
    expect = {
        (a.lid, b.rid)
        for _, a in left.iterrows()
        for _, b in right.iterrows()
        if a.k == b.k and a.a_lo <= b.b_hi and b.b_lo <= a.a_hi
    }
    assert set(got) == expect


def test_interval_overlap_join_drops_invalid_and_no_nested_loop(spark):
    from dataslicer_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        pd.DataFrame(
            {"a_lo": [0, 10, None], "a_hi": [5, 3, 7],
             "lid": [1, 2, 3]}
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame({"b_lo": [0], "b_hi": [100], "rid": [1]})
    )
    out = interval_overlap_join(
        left, right, ("a_lo", "a_hi"), ("b_lo", "b_hi"), bucket_width=8
    )
    # lo>hi (empty) and NULL-bound rows are dropped, valid row matches
    assert [r.lid for r in out.collect()] == [1]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_interval_join_no_nested_loop(spark):
    from dataslicer_spark.operators.joins import interval_join

    pts = spark.createDataFrame(pd.DataFrame({"p": [1], "pid": [1]}))
    iv = spark.createDataFrame(pd.DataFrame({"lo": [0], "hi": [5], "iid": [1]}))
    plan = (
        interval_join(pts, iv, "p", "lo", "hi", bucket_width=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_interval_join_validation(spark):
    from dataslicer_spark.operators.joins import interval_join

    pts = spark.createDataFrame(pd.DataFrame({"p": [1], "x": [1]}))
    iv = spark.createDataFrame(pd.DataFrame({"lo": [0], "hi": [5], "x": [2]}))
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(pts, iv, "p", "lo", "hi", bucket_width=0)
    with pytest.raises(ValueError, match="collide"):
        interval_join(pts, iv, "p", "lo", "hi", bucket_width=10)


def test_interpolate_ignores_null_observations(spark):
    """A NULL-valued observation must not contribute an endpoint: ticks
    interpolate between the surrounding non-null points (a kept NULL row
    would mispair its timestamp with an older value)."""
    pdf = pd.DataFrame(
        {"key": [1, 1, 1], "ts": [0, 100, 200],
         "val": [10.0, None, 30.0]}
    )
    out = (
        interpolate_linear(
            spark.createDataFrame(pdf), "ts", ["key"], "val", 50
        )
        .toPandas()
        .sort_values("grid_ts")
    )
    got = dict(zip(out.grid_ts, out.val_interp))
    assert got[100] == pytest.approx(20.0)
    assert got[150] == pytest.approx(25.0)


def test_debounce_window_validation(spark):
    from dataslicer_spark.operators.timeseries import debounce

    pdf = pd.DataFrame({"key": [1], "ts": [0]})
    with pytest.raises(ValueError, match="window_us"):
        debounce(spark.createDataFrame(pdf), "ts", ["key"], window_us=0)


def test_interval_join_internal_collision(spark):
    from dataslicer_spark.operators.joins import interval_join

    pts = spark.createDataFrame(
        pd.DataFrame({"p": [1], "__bucket": [9]})
    )
    iv = spark.createDataFrame(pd.DataFrame({"lo": [0], "hi": [5]}))
    with pytest.raises(ValueError, match="__bucket"):
        interval_join(pts, iv, "p", "lo", "hi", bucket_width=10)


def test_interpolate_collision_guard(spark):
    pdf = pd.DataFrame({"key": [1], "ts": [0], "val": [1.0], "__side": [9]})
    with pytest.raises(ValueError, match="__side"):
        interpolate_linear(
            spark.createDataFrame(pdf), "ts", ["key"], "val", 50
        )


def test_stream_debounce_matches_batch(spark, tmp_path):
    """Streaming debounce (state across micro-batches) equals the batch
    operator on in-order arrival: events split chronologically into three
    files consumed one per micro-batch."""
    import os

    from dataslicer_spark.operators.timeseries import debounce
    from dataslicer_spark.streaming.events import stream_debounce

    rows = []
    eid = 0
    for uid in range(20):
        t = 0
        for _ in range(60):
            t += (uid * 7919 + eid * 104729) % 2_000_000_000 + 1
            rows.append((uid, t, eid))
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, ts_us long, event_id long")
    window_us = 3_600_000_000

    expected = sorted(
        (r["user_id"], r["ts_us"])
        for r in debounce(df, "ts_us", ["user_id"], window_us).collect()
    )

    src = str(tmp_path / "in")
    os.makedirs(src)
    # three chronological slices -> three micro-batches sharing state
    cuts = df.approxQuantile("ts_us", [0.33, 0.66], 0.0)
    parts = [
        df.filter(F.col("ts_us") <= cuts[0]),
        df.filter((F.col("ts_us") > cuts[0]) & (F.col("ts_us") <= cuts[1])),
        df.filter(F.col("ts_us") > cuts[1]),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(os.path.join(src, f"f{i}"))
    # flatten: move part files up so the stream sees 3 files
    import glob
    import shutil

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    import time as _time

    base = _time.time()
    for i in range(3):
        for f in glob.glob(os.path.join(src, f"f{i}", "*.parquet")):
            dst = os.path.join(flat, f"{i:02d}.parquet")
            shutil.copy(f, dst)
            # the file source orders micro-batches by modification time;
            # copies can tie on mtime, which would feed batches out of
            # chronological order (the documented cross-batch-disorder
            # divergence) — pin strictly increasing mtimes
            os.utime(dst, (base + i, base + i))

    stream = stream_debounce(
        spark, flat, df.schema, "ts_us", "user_id", window_us,
        max_files_per_trigger=1,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dbnc")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["user_id"], r["ts_us"])
        for r in spark.sql("select * from dbnc").collect()
    )
    assert got == expected


# ---------------------------------------------------------------------------
# ewma_smooth / cusum_changepoints — brute-force parity vs pure-pandas replay
# ---------------------------------------------------------------------------


def test_ewma_brute_force(spark):
    from dataslicer_spark.operators.timeseries import ewma_smooth

    rng = np.random.default_rng(11)
    n = 400
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 9, n),
            "ord": np.arange(n, dtype="int64"),
            "x": np.round(rng.normal(50, 20, n), 4),
        }
    )
    alpha = 0.3
    out = (
        ewma_smooth(spark.createDataFrame(pdf), ["k"], "ord", "x", alpha)
        .toPandas()
        .sort_values("ord")
        .reset_index(drop=True)
    )
    # pure-python replay with the documented recurrence
    exp = {}
    state: dict[int, float] = {}
    for _, r in pdf.sort_values("ord").iterrows():
        k = int(r.k)
        e = r.x if k not in state else alpha * r.x + (1.0 - alpha) * state[k]
        state[k] = e
        exp[int(r.ord)] = e
    got = dict(zip(out["ord"].astype(int), out["ewma"]))
    assert got.keys() == exp.keys()
    for o in exp:
        assert got[o] == exp[o]  # bit-identical, same op order


def test_ewma_single_row_groups_and_validation(spark):
    from dataslicer_spark.operators.timeseries import ewma_smooth

    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "ord": [0, 1], "x": [3.5, -1.25]})
    )
    out = ewma_smooth(df, ["k"], "ord", "x", 0.5).toPandas()
    assert sorted(out["ewma"]) == [-1.25, 3.5]  # seed = first value
    with pytest.raises(ValueError):
        ewma_smooth(df, ["k"], "ord", "x", 0.0)


def test_cusum_brute_force_with_resets(spark):
    from dataslicer_spark.operators.timeseries import cusum_changepoints

    rng = np.random.default_rng(13)
    n = 500
    # level shift mid-series per key so alarms actually fire
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n),
            "ord": np.arange(n, dtype="int64"),
            "x": np.round(rng.normal(10, 2, n), 4),
        }
    )
    pdf.loc[pdf["ord"] % 3 == 0, "x"] += 25.0  # upward bursts
    tgt, slack, h = 10.0, 3.0, 30.0
    out = (
        cusum_changepoints(
            spark.createDataFrame(pdf), ["k"], "ord", "x", tgt, slack, h
        )
        .toPandas()
        .sort_values("ord")
        .reset_index(drop=True)
    )
    sp_state: dict[int, float] = {}
    sn_state: dict[int, float] = {}
    n_alarms = 0
    for _, r in pdf.sort_values("ord").iterrows():
        k = int(r.k)
        sp = max(0.0, sp_state.get(k, 0.0) + ((r.x - tgt) - slack))
        sn = max(0.0, sn_state.get(k, 0.0) + ((tgt - r.x) - slack))
        alarm = sp > h or sn > h
        row = out[out["ord"] == r.ord].iloc[0]
        assert row.s_pos == sp and row.s_neg == sn and bool(row.alarm) == alarm
        if alarm:
            n_alarms += 1
            sp_state[k], sn_state[k] = 0.0, 0.0
        else:
            sp_state[k], sn_state[k] = sp, sn
    assert n_alarms > 0  # the reset path was actually exercised
    with pytest.raises(ValueError):
        cusum_changepoints(
            spark.createDataFrame(pdf), ["k"], "ord", "x", tgt, slack, 0.0
        )


def test_holt_brute_force(spark):
    from dataslicer_spark.operators.timeseries import holt_smooth

    rng = np.random.default_rng(19)
    n = 300
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 7, n),
            "ord": np.arange(n, dtype="int64"),
            # drifting series so trend is non-trivial
            "x": np.round(rng.normal(0, 1, n), 4) + np.arange(n) * 0.05,
        }
    )
    a, b = 0.5, 0.25
    out = (
        holt_smooth(spark.createDataFrame(pdf), ["k"], "ord", "x", a, b)
        .toPandas()
        .sort_values("ord")
        .reset_index(drop=True)
    )
    lv_state: dict[int, float] = {}
    tr_state: dict[int, float] = {}
    for _, r in pdf.sort_values("ord").iterrows():
        k = int(r.k)
        if k not in lv_state:
            lv, tr = r.x, 0.0
        else:
            lv_new = a * r.x + (1.0 - a) * (lv_state[k] + tr_state[k])
            tr = b * (lv_new - lv_state[k]) + (1.0 - b) * tr_state[k]
            lv = lv_new
        lv_state[k], tr_state[k] = lv, tr
        row = out[out["ord"] == r.ord].iloc[0]
        assert row.level == lv and row.trend == tr  # bit-identical
    # trend learned the drift: rows interleave across 7 keys, so a key's
    # consecutive observations step ~0.05·7 = 0.35 on average
    tail = out.groupby("k").tail(1)
    assert 0.0 < tail.trend.mean() < 0.6
    with pytest.raises(ValueError):
        holt_smooth(spark.createDataFrame(pdf), ["k"], "ord", "x", 0.0, b)
    with pytest.raises(ValueError):
        holt_smooth(spark.createDataFrame(pdf), ["k"], "ord", "x", a, 1.5)
