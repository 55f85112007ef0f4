"""Weighted MinHash / Consistent Weighted Sampling (Ioffe ICDM'10) —
repetition-aware near-dup that set-based MinHash structurally misses."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.weighted_minhash import (
    weighted_minhash_pairs,
    weighted_minhash_signatures,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


@pytest.fixture(scope="module")
def planted(spark, docs):
    """40 docs + repetition-amplified copies (first 15% of tokens
    appended, ids +700000): exact shingle-count J_w ≈ 1/1.15 ≈ 0.87,
    while SET Jaccard is ≈ 1 — the pair class this operator exists
    for."""
    sample = docs.limit(40)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    m = F.greatest(F.floor((F.size(toks) * 3) / 20).cast("int"), F.lit(3))
    mutated = sample.select(
        (F.col("doc_id") + 700000).alias("doc_id"),
        F.concat_ws(
            " ", F.concat(toks, F.slice(toks, 1, m))
        ).alias("text"),
    )
    return sample.select("doc_id", "text").unionByName(mutated)


def test_cws_match_probability_is_weighted_jaccard():
    """Core CWS property P[sample match] = J_w, numerically: planted
    repetition pair with exact J_w computed from shingle counts."""
    import collections

    from dataslicer_spark.operators.weighted_minhash import (
        _cws_signature,
        _row_shingles,
        _shingle_seeds,
    )

    txt = " ".join(f"tok{(i * 7) % 53}" for i in range(60))
    toks = txt.split()
    m = max(3, (3 * len(toks)) // 20)
    txt2 = " ".join(toks + toks[:m])
    ca = collections.Counter(_row_shingles(txt, 3))
    cb = collections.Counter(_row_shingles(txt2, 3))
    allt = set(ca) | set(cb)
    j = sum(min(ca[t], cb[t]) for t in allt) / sum(
        max(ca[t], cb[t]) for t in allt
    )
    cache: dict = {}
    h = 4000
    u1, c1 = np.unique(
        np.asarray(_row_shingles(txt, 3), dtype=object), return_counts=True
    )
    u2, c2 = np.unique(
        np.asarray(_row_shingles(txt2, 3), dtype=object), return_counts=True
    )
    s1 = _cws_signature(_shingle_seeds(u1, cache), c1, h)
    s2 = _cws_signature(_shingle_seeds(u2, cache), c2, h)
    est = float((s1 == s2).mean())
    # sd ≈ sqrt(J(1-J)/4000) ≈ 0.0054 — 5σ tolerance
    assert abs(est - j) < 0.03, (est, j)


def test_batched_kernel_matches_per_row_reference(spark, planted):
    """The batch-vectorized UDF must be bit-identical to the per-row
    _cws_signature reference on every doc (seeds = the same JVM
    xxhash64 shingle hashes the production path uses)."""
    from dataslicer_spark.functions.text import word_shingles
    from dataslicer_spark.operators.weighted_minhash import _cws_signature

    got = {
        r.id: list(r.signature)
        for r in weighted_minhash_signatures(planted, "doc_id")
        .toPandas().itertuples()
    }
    hashed = planted.select(
        "doc_id",
        F.transform(
            word_shingles(F.col("text"), 3), lambda s: F.xxhash64(s)
        ).alias("h"),
    ).collect()
    for row in hashed:
        if not row.h:
            assert row.doc_id not in got
            continue
        uniq, counts = np.unique(
            np.asarray(row.h, dtype=np.int64), return_counts=True
        )
        ref = _cws_signature(
            uniq.astype(np.uint64), counts.astype(np.int64), 64
        )
        assert got[row.doc_id] == list(ref), row.doc_id


def test_signatures_deterministic_and_partition_independent(spark, planted):
    a = weighted_minhash_signatures(planted, "doc_id").toPandas()
    b = weighted_minhash_signatures(
        planted.repartition(13), "doc_id"
    ).toPandas()
    am = {r.id: list(r.signature) for r in a.itertuples()}
    bm = {r.id: list(r.signature) for r in b.itertuples()}
    assert am == bm
    assert all(len(v) == 64 for v in am.values())


def test_weighted_pairs_find_repetition_amplified_copies(spark, planted):
    """Every planted (doc, amplified-copy) pair surfaces with the exact
    shingle-count weighted Jaccard; a doubled doc (J_w = 0.5) does NOT
    pass the 0.8 threshold — the asymmetry set-Jaccard can't see."""
    out = weighted_minhash_pairs(
        planted, "doc_id", threshold=0.8, verify="exact"
    ).toPandas()
    found = {(r.id_a, r.id_b): r.wjaccard for r in out.itertuples()}
    planted_ids = [
        r.doc_id for r in planted.filter(F.col("doc_id") < 700000)
        .select("doc_id").collect()
    ]
    hits = [i for i in planted_ids if (i, i + 700000) in found]
    assert len(hits) >= 0.9 * len(planted_ids), len(hits)
    for i in hits:
        j = found[(i, i + 700000)]
        assert 0.8 <= j < 1.0, j


def test_doubled_doc_is_half_not_one(spark):
    """doc ⊕ doc has weighted Jaccard ≈ 1/2 (every interior shingle
    count doubles) — verify='exact' reports it, and it is correctly
    EXCLUDED at near-dup thresholds while included at t=0.4."""
    base = " ".join(f"w{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, base), (2, base + " " + base)], "doc_id long, text string"
    )
    hi = weighted_minhash_pairs(df, "doc_id", threshold=0.8,
                                verify="exact").count()
    lo = weighted_minhash_pairs(df, "doc_id", threshold=0.4,
                                verify="exact").toPandas()
    assert hi == 0
    assert len(lo) == 1
    assert abs(lo.wjaccard[0] - 0.5) < 0.03  # n/(2n+2+junction shingles)


def test_estimator_tracks_exact(spark, planted):
    exact = weighted_minhash_pairs(
        planted, "doc_id", threshold=0.8, verify="exact"
    ).toPandas()
    est = weighted_minhash_pairs(
        planted, "doc_id", threshold=0.5, verify=True
    ).toPandas()
    em = {(r.id_a, r.id_b): r.est_wjaccard for r in est.itertuples()}
    errs = [
        abs(em[(r.id_a, r.id_b)] - r.wjaccard)
        for r in exact.itertuples()
        if (r.id_a, r.id_b) in em
    ]
    assert len(errs) >= 0.9 * len(exact)
    # per-pair sd ≈ sqrt(.87*.13/64) ≈ 0.042
    assert sum(errs) / len(errs) < 0.08, sum(errs) / len(errs)
    assert max(errs) < 0.25, max(errs)


def test_parameter_validation_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "xy"), (3, None)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="divisible"):
        weighted_minhash_pairs(df, "doc_id", num_hashes=64, bands=7)
    with pytest.raises(ValueError, match="verify"):
        weighted_minhash_pairs(df, "doc_id", verify="nope")
    sigs = weighted_minhash_signatures(df, "doc_id").toPandas()
    # doc 2 (< n tokens) and doc 3 (null) drop
    assert sorted(sigs.id.tolist()) == [1]
