"""Decontamination (operators/decontam.py), temperature resampling, and
per-group quantile filtering (operators/sampling.py): brute-force parity
and determinism."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.decontam import contamination_pairs, decontaminate
from dataslicer_spark.operators.sampling import (
    quantile_filter_by_group,
    temperature_resample,
)


def _shingles(text: str, n: int) -> set[str]:
    toks = text.strip().lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture(scope="module")
def corpora(spark):
    corpus = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                "the quick brown fox jumps over the lazy dog",      # hits e0
                "quick brown fox jumps over a sleeping cat",        # partial
                "completely unrelated words about spark engines",   # clean
                "another clean document with fresh content here",   # clean
                "the quick brown fox jumps over the lazy dog today",# hits e0
                "alpha beta gamma delta epsilon zeta eta theta",    # hits e1
                "alpha beta gamma unrelated tail of words here",    # partial
                "",                                                 # empty
            ],
        }
    )
    eval_df = pd.DataFrame(
        {
            "eval_id": [100, 101],
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "alpha beta gamma delta epsilon zeta eta theta",
            ],
        }
    )
    return spark.createDataFrame(corpus), spark.createDataFrame(eval_df), corpus, eval_df


def test_contamination_pairs_matches_bruteforce(spark, corpora):
    c_df, e_df, c_pd, e_pd = corpora
    n, min_common = 3, 2
    got = {
        (r.doc_id, r.eval_id): (r.n_common, r.n_eval_sh)
        for r in contamination_pairs(
            c_df, e_df, "doc_id", "eval_id", n=n, min_common=min_common
        ).collect()
    }
    want = {}
    for _, c in c_pd.iterrows():
        cs = _shingles(c.text, n)
        for _, e in e_pd.iterrows():
            es = _shingles(e.text, n)
            common = len(cs & es)
            if common >= min_common:
                want[(c.doc_id, e.eval_id)] = (common, len(es))
    assert got == want
    # coverage is exact integer ratio
    for r in contamination_pairs(
        c_df, e_df, "doc_id", "eval_id", n=n, min_common=min_common
    ).collect():
        assert r.coverage == r.n_common / r.n_eval_sh


def test_decontaminate_splits_corpus(spark, corpora):
    c_df, e_df, c_pd, e_pd = corpora
    clean, stats = decontaminate(c_df, e_df, "doc_id", "eval_id", n=3, min_common=2)
    flagged = {r.doc_id for r in stats.collect()}
    kept = {r.doc_id for r in clean.collect()}
    assert flagged and flagged.isdisjoint(kept)
    assert flagged | kept == set(c_pd.doc_id)
    # exact duplicates of an eval doc must be flagged with full coverage
    by_id = {r.doc_id: r for r in stats.collect()}
    assert by_id[0].max_coverage == 1.0
    # clean docs stay
    assert 2 in kept and 3 in kept


def test_max_posting_drops_hot_shingles(spark):
    # shingle "x x x" occurs in both eval docs -> max_posting=1 removes it
    c = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["x x x unique trail words"]})
    )
    e = spark.createDataFrame(
        pd.DataFrame({"eval_id": [1, 2], "text": ["x x x a b c", "x x x d e f"]})
    )
    with_hot = contamination_pairs(c, e, "doc_id", "eval_id", n=3, min_common=1)
    no_hot = contamination_pairs(
        c, e, "doc_id", "eval_id", n=3, min_common=1, max_posting=1
    )
    assert with_hot.count() == 2 and no_hot.count() == 0


def _h32(salt: str, key) -> int:
    return int(hashlib.md5((salt + str(key)).encode()).hexdigest()[:8], 16)


def test_temperature_resample_matches_reference(spark):
    # skewed sources: 1000 / 100 / 10 rows
    rows = [(i, "big") for i in range(1000)]
    rows += [(1000 + i, "mid") for i in range(100)]
    rows += [(1100 + i, "small") for i in range(10)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source"]))
    out = temperature_resample(
        df, "source", "doc_id", alpha=0.5, target_fraction=0.5, salt="t"
    )
    got = {r.doc_id for r in out.collect()}

    # python reference of the documented math
    ns = {"big": 1000, "mid": 100, "small": 10}
    ws = {s: math.floor(math.sqrt(n) * (1 << 20)) for s, n in ns.items()}
    big_w, n_tot = sum(ws.values()), sum(ns.values())
    target = float(math.floor(0.5 * n_tot))
    thr = {
        s: math.floor(min(1.0, target * ws[s] / big_w / ns[s]) * 4294967296.0)
        for s in ns
    }
    want = {
        doc_id
        for doc_id, src in rows
        if _h32("t", doc_id) < thr[src]
    }
    assert got == want
    # alpha<1 flattens: small sources keep a larger fraction
    kept_frac = {
        s: len([d for d, src in rows if src == s and d in got]) / ns[s]
        for s in ns
    }
    # (small and mid both hit the p=1 clip at this skew, hence >=)
    assert kept_frac["small"] >= kept_frac["mid"] > kept_frac["big"]
    # determinism under repartition/reorder
    got2 = {
        r.doc_id
        for r in temperature_resample(
            df.repartition(13).orderBy(F.rand(5)),
            "source", "doc_id", alpha=0.5, target_fraction=0.5, salt="t",
        ).collect()
    }
    assert got2 == got


def test_quantile_filter_by_group_exact_counts(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(40),
            "g": ["a"] * 30 + ["b"] * 10,
            "score": [float(i % 7) for i in range(30)] + [float(i) for i in range(10)],
        }
    )
    df = spark.createDataFrame(pdf)
    out = quantile_filter_by_group(df, "g", "score", 0.25, "doc_id").toPandas()
    # exact per-group counts: ceil(0.25 * 30) = 8, ceil(0.25 * 10) = 3
    assert dict(out.g.value_counts()) == {"a": 8, "b": 3}
    # kept rows are the top-scored ones, ties broken by smallest doc_id
    want_b = set(pdf[pdf.g == "b"].nlargest(3, "score").doc_id)
    assert set(out[out.g == "b"].doc_id) == want_b
    a_rows = pdf[pdf.g == "a"].sort_values(["score", "doc_id"], ascending=[False, True])
    assert set(out[out.g == "a"].doc_id) == set(a_rows.head(8).doc_id)


def test_temperature_resample_edge_fractions(spark):
    rows = [(i, "a") for i in range(200)] + [(200 + i, "b") for i in range(50)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source"]))
    # alpha=1, target 1.0: p_s = 1 exactly for every source -> all kept.
    # (With alpha<1 and target 1.0 some mass is lost by design: small
    # sources clip at p=1 and the surplus is not redistributed.)
    assert (
        temperature_resample(
            df, "source", "doc_id", alpha=1.0, target_fraction=1.0
        ).count()
        == 250
    )
    flattened = temperature_resample(
        df, "source", "doc_id", alpha=0.5, target_fraction=1.0
    )
    by_src = {r.source: r.n for r in flattened.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert by_src["b"] == 50 and by_src["a"] < 200  # clip keeps b whole
    # target 0.0: floor(0 * N) = 0 -> threshold 0 -> nothing kept
    assert (
        temperature_resample(df, "source", "doc_id", target_fraction=0.0).count()
        == 0
    )
    # single source: reduces to plain hash subsampling near the target
    single = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(2000), "source": ["x"] * 2000})
    )
    n = temperature_resample(
        single, "source", "doc_id", target_fraction=0.5
    ).count()
    assert abs(n - 1000) < 100


def test_temperature_resample_alpha_one_preserves_mix(spark):
    # alpha=1: weights proportional to n_s -> uniform keep probability
    rows = [(i, "a") for i in range(1000)] + [(1000 + i, "b") for i in range(100)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "source"]))
    out = temperature_resample(
        df, "source", "doc_id", alpha=1.0, target_fraction=0.5
    )
    frac = {
        r.source: r.n / (1000 if r.source == "a" else 100)
        for r in out.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert abs(frac["a"] - frac["b"]) < 0.15


def test_quantile_filter_empty_and_single_row_groups(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "g": ["only"], "score": [0.5]})
    )
    # ceil(0.25 * 1) = 1 -> the lone row survives
    assert quantile_filter_by_group(df, "g", "score", 0.25, "doc_id").count() == 1
    empty = df.filter(F.col("doc_id") < 0)
    assert quantile_filter_by_group(empty, "g", "score", 0.25, "doc_id").count() == 0


# ------------------------------------------------- semantic decontamination

def test_cosine_threshold_match_brute_force(spark):
    """Map-only argmax kernel ≡ brute-force numpy over random vectors,
    including the smallest-ref-id tiebreak and zero-norm ref drops."""
    import numpy as np

    from dataslicer_spark.operators.similarity import cosine_threshold_match

    rng = np.random.default_rng(13)
    C = rng.normal(0, 1, (60, 6))
    corpus = spark.createDataFrame(
        [(i, C[i].tolist()) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    # refs: copies of some corpus rows (exact hits), one zero vector
    # (must be dropped), one duplicated vector under two ids (tiebreak)
    R = {100: C[3], 101: C[17], 102: np.zeros(6), 103: C[17]}
    refs = spark.createDataFrame(
        [(k, v.tolist()) for k, v in R.items()],
        "ref_id long, embedding array<double>",
    )
    out = {
        r.vec_id: (r.ref_id, r.cosine)
        for r in cosine_threshold_match(
            corpus, refs, threshold=0.999
        ).collect()
    }
    m = float(2**30)

    def fpcos(a, b):
        d = np.floor(a * b * m).astype(np.int64).sum() / m
        na = math.sqrt(np.floor(a * a * m).astype(np.int64).sum() / m)
        nb = math.sqrt(np.floor(b * b * m).astype(np.int64).sum() / m)
        return d / (na * nb)

    expect = {}
    for i in range(60):
        best = None
        for rid in (100, 101, 103):  # 102 is zero-norm: dropped
            c = fpcos(C[i], np.asarray(R[rid]))
            if best is None or c > best[1]:
                best = (rid, c)
        if best[1] >= 0.999:
            expect[i] = best
    assert set(out) == set(expect)
    for i, (rid, c) in expect.items():
        assert out[i][0] == rid, f"row {i}: tiebreak/argmax"
        assert out[i][1] == pytest.approx(c, abs=0)
    # row 17 matches BOTH 101 and 103 at the same cosine -> smallest id
    assert out[17][0] == 101


def test_semantic_decontaminate_splits(spark):
    import numpy as np

    from dataslicer_spark.operators.decontam import semantic_decontaminate

    rng = np.random.default_rng(3)
    C = rng.normal(0, 1, (40, 5))
    corpus = spark.createDataFrame(
        [(i, C[i].tolist()) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    ev = spark.createDataFrame(
        [(900, C[5].tolist()), (901, C[11].tolist())],
        "eval_id long, embedding array<double>",
    )
    clean, flagged = semantic_decontaminate(
        corpus, ev, threshold=0.999, eval_id="eval_id"
    )
    bad = {r.vec_id: r.nearest_eval_id for r in flagged.collect()}
    kept = {r.vec_id for r in clean.collect()}
    assert bad == {5: 900, 11: 901}
    assert kept == set(range(40)) - {5, 11}
    assert all(
        r.cosine >= 0.999 for r in flagged.collect()
    )
