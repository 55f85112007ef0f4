"""Round-8 session-2 operators: embedding centroid drift, Benford
first-digit audit, naive seasonal decomposition, and k-core peeling —
brute-force parity vs numpy/pure-python replays."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from dataslicer_spark.operators.drift import embedding_centroid_drift
from dataslicer_spark.operators.graph import kcore
from dataslicer_spark.operators.stats import benford_first_digit
from dataslicer_spark.operators.timeseries import seasonal_decompose_naive


def _emb_frame(spark, rng, n, dim, shift=0.0):
    rows = [
        (int(i), [float(x) for x in rng.normal(shift, 1, dim)], int(i % 3))
        for i in range(n)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )


def test_centroid_drift_brute_force(spark):
    rng = np.random.default_rng(3)
    a = _emb_frame(spark, rng, 60, 16)
    b = _emb_frame(spark, rng, 45, 16, shift=0.8)
    out = {
        r["label"]: r
        for r in embedding_centroid_drift(a, b, ["label"]).collect()
    }
    pa = a.toPandas()
    pb = b.toPandas()
    for lab in (0, 1, 2):
        ca = np.mean(np.stack(pa[pa.label == lab].embedding.to_numpy()), 0)
        cb = np.mean(np.stack(pb[pb.label == lab].embedding.to_numpy()), 0)
        r = out[lab]
        assert r["n_a"] == (pa.label == lab).sum()
        assert r["n_b"] == (pb.label == lab).sum()
        assert r["dist2"] == pytest.approx(float(np.sum((ca - cb) ** 2)),
                                           abs=1e-5)
        cos = float(
            np.dot(ca, cb) / (np.linalg.norm(ca) * np.linalg.norm(cb))
        )
        assert r["centroid_cos"] == pytest.approx(cos, abs=1e-5)
    # drifted snapshots: real distance, cos below 1
    assert all(r["dist2"] > 1.0 for r in out.values())


def test_centroid_drift_identical_snapshots(spark):
    rng = np.random.default_rng(4)
    a = _emb_frame(spark, rng, 30, 8)
    out = embedding_centroid_drift(a, a, ["label"]).collect()
    for r in out:
        assert r["dist2"] == pytest.approx(0.0, abs=1e-9)
        assert r["centroid_cos"] == pytest.approx(1.0, abs=1e-9)
        assert r["n_a"] == r["n_b"]


def test_benford_brute_force(spark):
    rng = np.random.default_rng(9)
    # log-uniform magnitudes → roughly Benford; include junk the filter
    # must drop (zeros, negatives)
    vals = list(np.exp(rng.uniform(0, 10, 2000))) + [0.0, -3.2, 0.001]
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    out = {r["digit"]: r for r in benford_first_digit(df, "v").collect()}
    qs = [int(math.floor(v * 100 + 0.5)) for v in vals]
    qs = [q for q in qs if q > 0]
    exp_counts: dict[int, int] = {}
    for q in qs:
        d = int(str(q)[0])
        exp_counts[d] = exp_counts.get(d, 0) + 1
    assert sum(r["n"] for r in out.values()) == len(qs)
    for d, c in exp_counts.items():
        r = out[d]
        assert r["n"] == c
        assert r["frac"] == c / len(qs)
        assert r["benford"] == math.log10(1 + 1 / d)
        assert r["abs_dev"] == abs(r["frac"] - r["benford"])
    # roughly Benford-shaped: digit 1 most common
    assert out[1]["n"] == max(r["n"] for r in out.values())
    with pytest.raises(ValueError):
        benford_first_digit(df, "v", scale=0)


def test_seasonal_decompose_brute_force(spark):
    rng = np.random.default_rng(21)
    n = 400
    period, bucket, hw = 240, 40, 30
    pdf = pd.DataFrame(
        {
            "k": rng.choice(["a", "b"], n),
            "ts": rng.choice(np.arange(0, 2400, dtype="int64"), n,
                             replace=False),
            "v": np.round(rng.normal(5, 2, n), 3),
        }
    )
    out = seasonal_decompose_naive(
        spark.createDataFrame(pdf), ["k"], "ts", "v",
        period_us=period, bucket_us=bucket, trend_halfwidth_us=hw,
    ).toPandas()
    assert len(out) == n
    # identity holds exactly by construction
    assert (out["residual"]
            == out["v"] - out["trend"] - out["seasonal"]).all()
    fp = float(2 ** 20)
    for k, grp in pdf.groupby("k"):
        g = grp.sort_values("ts").reset_index(drop=True)
        trends = {}
        for _, row in g.iterrows():
            w = g[(g.ts >= row.ts - hw) & (g.ts <= row.ts + hw)]
            s = sum(int(math.floor(x * fp)) for x in w.v)
            trends[row.ts] = (s / fp) / len(w)
        season: dict[int, list] = {}
        for _, row in g.iterrows():
            ph = int((row.ts % period) // bucket)
            season.setdefault(ph, []).append(row.v - trends[row.ts])
        smean = {
            ph: (sum(int(math.floor(x * fp)) for x in xs) / fp) / len(xs)
            for ph, xs in season.items()
        }
        sub = out[out.k == k]
        for _, r in sub.iterrows():
            assert r["trend"] == trends[r["ts"]]
            assert r["phase"] == int((r["ts"] % period) // bucket)
            assert r["seasonal"] == smean[r["phase"]]


def _brute_kcore(edges: list[tuple[int, int]], k: int):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for u in list(adj):
            if len(adj[u]) < k:
                for v in adj[u]:
                    adj[v].discard(u)
                del adj[u]
                changed = True
    return {u: len(vs) for u, vs in adj.items() if vs}


def test_kcore_brute_force(spark):
    rng = np.random.default_rng(17)
    edges = list(
        {
            (int(a), int(b)) if a < b else (int(b), int(a))
            for a, b in rng.integers(0, 40, (150, 2))
            if a != b
        }
    )
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"])
    )
    for k in (2, 3, 4):
        got = {r["node"]: r["core_deg"] for r in kcore(df, k).collect()}
        assert got == _brute_kcore(edges, k)
    # k above the max degree → empty core
    assert kcore(df, 1000).count() == 0
    with pytest.raises(ValueError):
        kcore(df, 0)


# ---------------------------------------------------------------------------
# mutual_nn / minmax_downsample
# ---------------------------------------------------------------------------


def test_mutual_nn_brute_force(spark):
    from dataslicer_spark.operators.similarity import mutual_nn

    rng = np.random.default_rng(31)
    dim = 12
    a_rows = [(i, [float(x) for x in rng.normal(0, 1, dim)]) for i in range(8)]
    # b: noisy copies of a[0..3] (should mutually pair) + unrelated
    b_rows = []
    for j in range(4):
        vec = np.array(a_rows[j][1]) + rng.normal(0, 0.05, dim)
        b_rows.append((100 + j, [float(x) for x in vec]))
    b_rows += [
        (200 + j, [float(x) for x in rng.normal(5, 1, dim)])
        for j in range(3)
    ]
    a = spark.createDataFrame(
        pd.DataFrame(a_rows, columns=["vec_id", "embedding"])
    )
    b = spark.createDataFrame(
        pd.DataFrame(b_rows, columns=["vec_id", "embedding"])
    )
    got = {
        (r.a_id, r.b_id): r.cosine for r in mutual_nn(a, b).collect()
    }
    # each noisy copy pairs with its source, bidirectionally
    for j in range(4):
        assert (j, 100 + j) in got
        assert got[(j, 100 + j)] > 0.95
    # mutuality: an a-row can appear at most once, same for b
    a_ids = [k[0] for k in got]
    b_ids = [k[1] for k in got]
    assert len(a_ids) == len(set(a_ids)) and len(b_ids) == len(set(b_ids))


def test_minmax_downsample_brute_force(spark):
    from dataslicer_spark.operators.timeseries import minmax_downsample

    rng = np.random.default_rng(33)
    n = 500
    pdf = pd.DataFrame(
        {
            "k": rng.choice(["a", "b"], n),
            "ts": rng.integers(0, 10_000, n).astype("int64"),
            "v": np.round(rng.normal(0, 10, n), 2),
        }
    )
    w = 1000
    out = minmax_downsample(
        spark.createDataFrame(pdf), ["k"], "ts", "v", bucket_us=w
    ).toPandas()
    for (k, bs), grp in pdf.assign(b=(pdf.ts // w) * w).groupby(["k", "b"]):
        sub = out[(out.k == k) & (out.bucket_start == bs)]
        assert set(sub["kind"]) == {"min", "max"}
        lo = sub[sub.kind == "min"].iloc[0]
        hi = sub[sub.kind == "max"].iloc[0]
        vmin, vmax = grp.v.min(), grp.v.max()
        assert lo.value == vmin and hi.value == vmax
        # tie-determinism: earliest ts for min, latest for max
        assert lo.ts_us == grp[grp.v == vmin].ts.min()
        assert hi.ts_us == grp[grp.v == vmax].ts.max()
    # two rows per non-empty (key, bucket)
    n_buckets = pdf.assign(b=(pdf.ts // w)).groupby(["k", "b"]).ngroups
    assert len(out) == 2 * n_buckets
    with pytest.raises(ValueError):
        minmax_downsample(spark.createDataFrame(pdf), ["k"], "ts", "v", 0)
