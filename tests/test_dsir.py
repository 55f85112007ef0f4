"""DSIR importance selection: brute-force parity against a pure-Python
replica of the hashed-n-gram integer model, plus selection semantics."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.dsir import dsir_select

DOCS = [
    (0, "en", "the quick brown fox jumps over the lazy dog"),
    (1, "en", "the quick brown fox"),
    (2, "de", "der schnelle braune fuchs springt"),
    (3, "de", "the quick brown fuchs"),
    (4, "fr", "le renard brun rapide"),
    (5, "en", "dog dog dog"),
    (6, "fr", None),
]

N_BUCKETS, SCALE = 64, 1 << 20


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % N_BUCKETS


def _grams(text: str) -> list[str]:
    toks = [t for t in text.split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _brute(k: int) -> list[tuple[int, str, int]]:
    live = [(i, lang, t) for i, lang, t in DOCS if t is not None]
    cnt_r: Counter = Counter()
    cnt_t: Counter = Counter()
    for _, lang, t in live:
        for g in _grams(t):
            b = _bucket(g)
            cnt_r[b] += 1
            if lang == "en":
                cnt_t[b] += 1
    s = {b: ((cnt_t[b] + 1) * SCALE) // (cnt_r[b] + 1) for b in cnt_r}
    scored = [
        (i, lang, sum(s[_bucket(g)] for g in _grams(t)))
        for i, lang, t in live
    ]
    scored.sort(key=lambda x: (-x[2], x[0]))
    return scored[:k]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, lang string, text string")


def test_dsir_matches_bruteforce(spark, docs_df):
    rows = dsir_select(
        docs_df,
        F.col("lang") == "en",
        k=10,
        n_buckets=N_BUCKETS,
        scale=SCALE,
        carry_cols=["lang"],
    ).collect()
    want = _brute(10)
    assert [(r.doc_id, r.lang, r.importance) for r in rows] == want
    assert [r.rank for r in rows] == list(range(1, len(want) + 1))


def test_dsir_target_docs_rank_high(spark, docs_df):
    rows = dsir_select(
        docs_df, F.col("lang") == "en", k=3, n_buckets=N_BUCKETS,
        carry_cols=["lang"],
    ).collect()
    # the en-like docs (en docs + the half-English de doc) dominate the
    # top ranks over the purely non-target docs
    assert all(r.lang in ("en", "de") for r in rows)


def test_dsir_k_bounds_output(spark, docs_df):
    assert dsir_select(docs_df, F.col("lang") == "en", k=2).count() == 2
