"""BM25 top-k retrieval: brute-force parity on a hand-built corpus,
determinism of ties, and the no-match exclusion rule."""

from __future__ import annotations

import math

import pytest

from dataslicer_spark.operators.retrieval import bm25_topk

K1, B = 1.2, 0.75

DOCS = [
    (0, "spark fast spark fast spark"),
    (1, "vector vector slow table row"),
    (2, "spark vector fast"),
    (3, "the a of and or but not"),
    (4, "fast fast fast fast fast fast fast fast"),
    (5, "spark"),
    (6, None),
]


def _brute_bm25(query):
    corpus = {i: (t.split() if t else None) for i, t in DOCS}
    live = {i: t for i, t in corpus.items() if t is not None}
    n = len(live)
    avgdl = sum(len(t) for t in live.values()) / n
    out = {}
    for i, toks in live.items():
        score, matched = 0.0, 0
        for q in query:
            tf = toks.count(q)
            if tf:
                matched += 1
            df = sum(1 for t in live.values() if q in t)
            idf = (n - df + 0.5) / (df + 0.5)
            s = idf * ((tf * (K1 + 1.0)) / (tf + K1 * (1 - B + B * len(toks) / avgdl)))
            score += math.floor(s * 2**20)
        if matched:
            out[i] = (score / 2**20, matched)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_bruteforce(spark, docs_df):
    got = {
        r.doc_id: (r.bm25, r.n_matched)
        for r in bm25_topk(docs_df, ["spark", "vector", "fast"], k=10).collect()
    }
    want = _brute_bm25(["spark", "vector", "fast"])
    assert set(got) == set(want)
    for i in want:
        assert got[i][1] == want[i][1]
        assert got[i][0] == pytest.approx(want[i][0], abs=2e-6)


def test_bm25_ordering_and_k(spark, docs_df):
    rows = bm25_topk(docs_df, ["spark", "fast"], k=3).collect()
    assert len(rows) == 3
    assert [r.rank for r in rows] == [1, 2, 3]
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    # stopword-only doc 3 and null doc 6 never appear for any k
    all_rows = bm25_topk(docs_df, ["spark", "fast"], k=10).collect()
    assert {r.doc_id for r in all_rows}.isdisjoint({3, 6})


def test_bm25_tie_breaks_by_id(spark):
    dup = spark.createDataFrame(
        [(10, "x y z"), (11, "x y z"), (12, "q")], "doc_id long, text string"
    )
    rows = bm25_topk(dup, ["x"], k=5).collect()
    assert [r.doc_id for r in rows] == [10, 11]
    assert rows[0].bm25 == rows[1].bm25


def test_bm25_input_validation(spark, docs_df):
    with pytest.raises(ValueError):
        bm25_topk(docs_df, [])
    with pytest.raises(ValueError):
        bm25_topk(docs_df, ["a", "a"])


def test_multi_matches_single_per_query(spark, docs_df):
    from dataslicer_spark.operators.retrieval import bm25_topk_multi

    queries = spark.createDataFrame(
        [("q0", ["spark", "vector", "fast"]), ("q1", ["spark"]),
         ("q2", ["vector", "slow"])],
        "qid string, terms array<string>",
    )
    multi = bm25_topk_multi(docs_df, queries, k=10).collect()
    by_q = {}
    for r in multi:
        by_q.setdefault(r.qid, []).append(r)
    for qid, terms in (("q0", ["spark", "vector", "fast"]),
                       ("q1", ["spark"]), ("q2", ["vector", "slow"])):
        single = bm25_topk(docs_df, terms, k=10).collect()
        got = sorted(by_q[qid], key=lambda r: r.rank)
        assert [(r.doc_id, r.rank, r.n_matched) for r in got] == [
            (r.doc_id, r.rank, r.n_matched) for r in single
        ]
        for g, s in zip(got, single):
            assert g.bm25 == pytest.approx(s.bm25, abs=1e-12)


def test_multi_k_bounds_each_query(spark, docs_df):
    from dataslicer_spark.operators.retrieval import bm25_topk_multi

    queries = spark.createDataFrame(
        [("a", ["spark", "fast"]), ("b", ["vector"])],
        "qid string, terms array<string>",
    )
    rows = bm25_topk_multi(docs_df, queries, k=2).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.qid, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 2
               for v in per_q.values())


def test_rrf_fuse_brute_parity(spark):
    from dataslicer_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(3, 1), (1, 2), (9, 3)], "doc_id long, rank int"
    )
    rows = rrf_fuse([a, b], "doc_id", k=10).collect()
    S = 1 << 40

    def s(r):
        return S // (60 + r)

    want = {1: (s(1) + s(2), 2), 2: (s(2), 1), 3: (s(3) + s(1), 2),
            9: (s(3), 1)}
    got = {r.doc_id: (r.rrf, r.n_lists) for r in rows}
    assert got == want
    order = [r.doc_id for r in sorted(rows, key=lambda r: r.rank)]
    assert order == sorted(want, key=lambda d: (-want[d][0], d))
    with pytest.raises(ValueError):
        rrf_fuse([], "doc_id")
