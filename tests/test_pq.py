"""Product quantization (operators/pq): codebook shapes, encode
determinism, compression, ADC recall vs exact brute force, re-rank."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.pq import pq_encode, pq_search, train_pq
from dataslicer_spark.operators.similarity import cosine_topk

DIM = 16
M = 4


@pytest.fixture(scope="module")
def corpus(spark):
    # 20 well-separated cluster centers, 30 points each: ANN recall on
    # this geometry should be near-perfect
    rng = np.random.RandomState(3)
    centers = rng.normal(size=(20, DIM)) * 10
    rows = []
    vid = 0
    for c in range(20):
        for _ in range(30):
            v = centers[c] + rng.normal(size=DIM) * 0.3
            v = v / np.linalg.norm(v)  # unit sphere: L2 order == cos order
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(4).cache()


def test_train_shapes_and_determinism(spark, corpus):
    cb1 = train_pq(corpus, m=M, k=16, seed=7)
    cb2 = train_pq(corpus, m=M, k=16, seed=7)
    assert cb1.shape == (M, 16, DIM // M)
    np.testing.assert_array_equal(cb1, cb2)


def test_encode_shape_and_partition_invariance(spark, corpus):
    cb = train_pq(corpus, m=M, k=16, seed=7)
    a = {
        r["vec_id"]: tuple(r["pq_code"])
        for r in pq_encode(corpus, cb).collect()
    }
    b = {
        r["vec_id"]: tuple(r["pq_code"])
        for r in pq_encode(corpus.repartition(11), cb).collect()
    }
    assert a == b
    assert all(len(c) == M for c in a.values())
    assert all(0 <= x < 16 for c in a.values() for x in c)


def test_adc_retrieves_query_cluster(spark, corpus):
    # PQ's contract on clustered data: ADC top-k lands in the query's
    # cluster (coarse retrieval); fine within-cluster order needs re-rank
    cb = train_pq(corpus, m=M, k=64, seed=7)
    codes = pq_encode(corpus, cb).cache()
    queries = corpus.filter(F.col("vec_id") % 100 == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = pq_search(codes, queries, cb, k=5)
    hits = {}
    for r in approx.collect():
        hits.setdefault(r["query_id"], []).append(r["vec_id"])
    assert len(hits) == queries.count()
    fracs = []
    for q, ids in hits.items():
        assert len(ids) == 5
        cluster = q // 30
        fracs.append(np.mean([vid // 30 == cluster for vid in ids]))
    assert np.mean(fracs) >= 0.9, fracs


def test_rerank_recall_against_bruteforce(spark, corpus):
    cb = train_pq(corpus, m=M, k=64, seed=7)
    codes = pq_encode(corpus, cb).cache()
    queries = corpus.filter(F.col("vec_id") % 100 == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(corpus, queries, k=5)
    approx = pq_search(
        codes, queries, cb, k=5, rerank=corpus, rerank_factor=10,
        include_self=False,
    )
    ex, ap = {}, {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(ex) == set(ap)
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    assert np.mean(recalls) >= 0.8, recalls


def test_rerank_restores_exact_order_at_top(spark, corpus):
    cb = train_pq(corpus, m=M, k=64, seed=7)
    codes = pq_encode(corpus, cb).cache()
    queries = corpus.filter(F.col("vec_id") == 42).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    rr = pq_search(
        codes, queries, cb, k=3, rerank=corpus, rerank_factor=8
    ).collect()
    assert [r["rank"] for r in sorted(rr, key=lambda r: r["rank"])] == [1, 2, 3]
    # with self in corpus, rank 1 must be the query itself (cos=1)
    best = min(rr, key=lambda r: r["rank"])
    assert best["vec_id"] == 42
    assert best["cos_sim"] == pytest.approx(1.0, abs=1e-9)


def test_bad_params_raise(spark, corpus):
    with pytest.raises(ValueError):
        train_pq(corpus, m=5, k=16)  # 5 does not divide 16
    with pytest.raises(ValueError):
        train_pq(corpus, m=4, k=300)  # > uint8


def test_ivf_pq_composition(spark, corpus):
    from dataslicer_spark.operators.pq import ivf_pq_search
    from dataslicer_spark.operators.similarity import build_ivf_index

    cb = train_pq(corpus, m=M, k=64, seed=7)
    codes = pq_encode(corpus, cb)
    centroids, assigned = build_ivf_index(corpus, n_lists=8, seed=5)
    assigned_codes = codes.join(
        assigned.select("vec_id", "list_id"), "vec_id"
    ).cache()
    queries = corpus.filter(F.col("vec_id") % 150 == 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(corpus, queries, k=5)
    approx = ivf_pq_search(
        centroids, assigned_codes, queries, cb, k=5, n_probe=4,
        rerank=corpus, rerank_factor=10, include_self=False,
    )
    ex, ap = {}, {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(ex) == set(ap)
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    assert np.mean(recalls) >= 0.7, recalls


def test_ivf_pq_prunes_unprobed_lists(spark, corpus):
    from dataslicer_spark.operators.pq import ivf_pq_search
    from dataslicer_spark.operators.similarity import build_ivf_index

    cb = train_pq(corpus, m=M, k=64, seed=7)
    codes = pq_encode(corpus, cb)
    centroids, assigned = build_ivf_index(corpus, n_lists=8, seed=5)
    assigned_codes = codes.join(assigned.select("vec_id", "list_id"), "vec_id")
    queries = corpus.filter(F.col("vec_id") == 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_pq_search(
        centroids, assigned_codes, queries, cb, k=3, n_probe=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "list_id" in plan  # the isin prune is in the plan
    assert out.count() == 3


def test_ivf_pq_respects_per_query_probes(spark, corpus):
    """Each query's hits must come from its OWN probed lists, not the
    union of the batch's lists (the constraint that keeps per-query cost
    at n_probe/n_lists)."""
    from dataslicer_spark.operators.pq import ivf_pq_search
    from dataslicer_spark.operators.similarity import build_ivf_index

    cb = train_pq(corpus, m=M, k=64, seed=7)
    codes = pq_encode(corpus, cb)
    centroids, assigned = build_ivf_index(corpus, n_lists=8, seed=5)
    assigned_codes = codes.join(assigned.select("vec_id", "list_id"), "vec_id")
    queries = corpus.filter(F.col("vec_id").isin([5, 555])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_pq_search(
        centroids, assigned_codes, queries, cb, k=5, n_probe=1
    ).collect()
    list_of = {
        r["vec_id"]: r["list_id"]
        for r in assigned.select("vec_id", "list_id").collect()
    }
    # recompute each query's single probed list in numpy
    qv = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in corpus.filter(F.col("vec_id").isin([5, 555])).collect()
    }
    for qid, v in qv.items():
        d2 = ((v[None, :] - centroids) ** 2).sum(axis=1)
        own = int(np.argmin(d2))
        hits = [r["vec_id"] for r in out if r["query_id"] == qid]
        assert hits, qid
        assert all(list_of[h] == own for h in hits), (qid, own)


def test_pq_index_save_load_roundtrip(spark, tmp_path):
    """Search results from a reloaded PQ index are identical to the
    in-memory index (exact codebook doubles survive the parquet trip)."""
    import numpy as np

    from dataslicer_spark.operators.pq import (
        load_pq_index, pq_encode, pq_search, save_pq_index, train_pq,
    )

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(200)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.filter("vec_id < 3").select(
        corpus.vec_id.alias("query_id"), "embedding"
    )
    cbs = train_pq(corpus, m=4, k=16, seed=3)
    codes = pq_encode(corpus, cbs)
    want = sorted(
        map(tuple, pq_search(codes, queries, cbs, k=5).collect())
    )

    path = str(tmp_path / "pqidx")
    save_pq_index(cbs, codes, path)
    cbs2, codes2 = load_pq_index(spark, path)
    assert np.array_equal(cbs, cbs2)
    got = sorted(
        map(tuple, pq_search(codes2, queries, cbs2, k=5).collect())
    )
    assert got == want


# ----------------------------------------------------- IVF incremental

def test_ivf_append_equals_full_build_search(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from dataslicer_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_search,
        load_ivf_index,
        save_ivf_index,
    )

    emb = spark.read.parquet(
        os.path.join("/root/testdata/sf0.001", "embeddings.parquet")
    )
    first = emb.filter("vec_id % 2 = 0")
    rest = emb.filter("vec_id % 2 = 1")
    path = str(tmp_path / "ivf")
    # build on half; centroids train on that half only
    cents, assigned = build_ivf_index(first, n_lists=8)
    save_ivf_index(cents, assigned, path)
    append_to_ivf_index(rest, path)

    c2, lists = load_ivf_index(spark, path)
    assert lists.count() == emb.count()
    # searching with n_probe = n_lists is exact over the union corpus:
    # must equal brute-force top-k on the full table
    from dataslicer_spark.operators.similarity import cosine_topk

    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = {
        (r.query_id, r.rank, r.vec_id)
        for r in ivf_search(c2, lists, q, k=4, n_probe=8).collect()
    }
    b = {
        (r.query_id, r.rank, r.vec_id)
        for r in cosine_topk(emb, q, k=4).collect()
    }
    assert a == b
    # appended vectors landed in existing list dirs (partition layout)
    import glob

    dirs = {os.path.basename(p) for p in glob.glob(path + "/lists/list_id=*")}
    assert dirs and all(d.startswith("list_id=") for d in dirs)


def test_ivf_rebalance_recovers_recall_after_drift(spark, tmp_path):
    """Quantizer-drift remediation end to end: build on 8 tight blobs,
    append 4 NEW blobs placed exactly on the trained quantizer's
    Voronoi boundaries (midpoints of centroid pairs — each new blob's
    members split across two old lists, so an n_probe=1 search loses
    the half in the unprobed list), then retrain with
    rebalance_ivf_index and watch recall@10 recover."""
    import numpy as np
    from pyspark.sql import functions as F

    from dataslicer_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        cosine_topk,
        ivf_drift_stats,
        ivf_search,
        load_ivf_index,
        rebalance_ivf_index,
        save_ivf_index,
    )

    rng = np.random.default_rng(11)
    dim = 8
    centers = rng.normal(0, 10, (8, dim))
    base = [
        (i, (centers[i % 8] + rng.normal(0, 0.4, dim)).tolist())
        for i in range(400)
    ]

    def to_df(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    base_df = to_df(base)
    path = str(tmp_path / "ivf")
    cents, assigned = build_ivf_index(base_df, n_lists=8, train_sample=400)
    save_ivf_index(cents, assigned, path)
    # drift blobs at midpoints of the ACTUAL trained centroids — the
    # worst case for a frozen quantizer, by construction
    mids = [(cents[2 * j] + cents[2 * j + 1]) / 2 for j in range(4)]
    drift = [
        (i, (mids[i % 4] + rng.normal(0, 0.4, dim)).tolist())
        for i in range(400, 800)
    ]
    qs = [
        (i, (mids[i % 4] + rng.normal(0, 0.4, dim)).tolist())
        for i in range(25)
    ]
    drift_df = to_df(drift)
    q_df = to_df(qs).withColumnRenamed("vec_id", "query_id")
    append_to_ivf_index(drift_df, path)

    truth: dict[int, set] = {}
    full = base_df.unionByName(drift_df)
    for r in cosine_topk(full, q_df, k=10).collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)

    def recall_at_10() -> float:
        c2, lists = load_ivf_index(spark, path)
        got: dict[int, set] = {}
        for r in ivf_search(c2, lists, q_df, k=10, n_probe=1).collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        return float(
            np.mean(
                [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
            )
        )

    pre = recall_at_10()
    assert pre < 0.8, f"drift construction should hurt recall, got {pre}"
    new_cents = rebalance_ivf_index(spark, path, n_lists=12)
    assert new_cents is not None and len(new_cents) == 12
    post = recall_at_10()
    assert post >= 0.9, f"rebalance should recover recall, got {post}"
    stats = ivf_drift_stats(spark, path)
    assert stats["n_vectors"] == 800 and stats["n_lists"] == 12
    # index contents unchanged by the rewrite — same ids exactly
    _c, lists = load_ivf_index(spark, path)
    assert lists.count() == 800
    assert lists.agg(F.countDistinct("vec_id")).collect()[0][0] == 800


def test_ivf_rebalance_threshold_skips_healthy_index(spark, tmp_path):
    import numpy as np

    from dataslicer_spark.operators.similarity import (
        build_ivf_index,
        ivf_drift_stats,
        rebalance_ivf_index,
        save_ivf_index,
    )

    rng = np.random.default_rng(3)
    rows = [(i, rng.normal(0, 1, 4).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    cents, assigned = build_ivf_index(df, n_lists=4, train_sample=200)
    save_ivf_index(cents, assigned, path)
    imb = ivf_drift_stats(spark, path)["imbalance"]
    # conditional call with a threshold above the measured imbalance:
    # must be a no-op returning None
    assert rebalance_ivf_index(spark, path, max_imbalance=imb + 0.1) is None
    # threshold below: rebuild happens and returns centroids
    out = rebalance_ivf_index(spark, path, max_imbalance=0.0)
    assert out is not None and len(out) == 4
