"""Persistent BM25 inverted index (operators/retrieval_index.py):
bit-parity with the one-shot scorer, incremental append, postings
pruning, meta round-trip."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.retrieval import bm25_topk
from dataslicer_spark.operators.retrieval_index import (
    append_to_bm25_index,
    build_bm25_index,
    search_bm25_index,
)


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")


def test_index_search_bit_identical_to_one_shot(spark, docs, tmp_path):
    path = str(tmp_path / "idx")
    build_bm25_index(docs, path)
    terms = ["table", "part", "window"]
    a = [tuple(r) for r in search_bm25_index(spark, path, terms, k=10).collect()]
    b = [tuple(r) for r in bm25_topk(docs, terms, k=10).collect()]
    assert a == b and len(a) == 10


def test_index_append_equals_full_build(spark, docs, tmp_path):
    p1, p2 = str(tmp_path / "inc"), str(tmp_path / "full")
    build_bm25_index(docs.filter("doc_id % 3 = 0"), p1)
    append_to_bm25_index(docs.filter("doc_id % 3 = 1"), p1)
    append_to_bm25_index(docs.filter("doc_id % 3 = 2"), p1)
    build_bm25_index(docs, p2)
    terms = ["spark", "vector"]
    a = [tuple(r) for r in search_bm25_index(spark, p1, terms, k=8).collect()]
    b = [tuple(r) for r in search_bm25_index(spark, p2, terms, k=8).collect()]
    assert a == b


def test_index_probe_prunes_postings_scan(spark, docs, tmp_path):
    path = str(tmp_path / "idx")
    build_bm25_index(docs, path)
    out = search_bm25_index(spark, path, ["table"], k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the term IN filter reaches the postings parquet scan
    assert "PushedFilters: [In(term" in plan or "PushedFilters: [IsNotNull(term)" in plan or "In(term" in plan


def test_index_custom_id_col_and_validation(spark, tmp_path):
    df = spark.createDataFrame(
        [(7, "x y x"), (8, "y z")], "k int, body string"
    )
    path = str(tmp_path / "idx")
    build_bm25_index(df, path, id_col="k", text_col="body")
    out = search_bm25_index(spark, path, ["x"], k=5)
    assert out.columns[0] == "k"
    assert [r.k for r in out.collect()] == [7]
    with pytest.raises(ValueError):
        search_bm25_index(spark, path, [])
    with pytest.raises(ValueError):
        search_bm25_index(spark, path, ["a", "a"])


def test_index_doclens_counts_unmatched_docs(spark, tmp_path):
    # doc 2 matches nothing but must still shape N / avgdl
    df = spark.createDataFrame(
        [(1, "q q q"), (2, "filler words only here")],
        "doc_id int, text string",
    )
    path = str(tmp_path / "idx")
    build_bm25_index(df, path)
    one_shot = [tuple(r) for r in bm25_topk(df, ["q"], k=5).collect()]
    via_index = [
        tuple(r) for r in search_bm25_index(spark, path, ["q"], k=5).collect()
    ]
    assert via_index == one_shot and len(via_index) == 1


def test_positional_index_phrase_parity_and_gate(spark, docs, tmp_path):
    from dataslicer_spark.operators.retrieval import phrase_search
    from dataslicer_spark.operators.retrieval_index import (
        search_phrase_index,
    )

    pos_path = str(tmp_path / "pos")
    build_bm25_index(
        docs.filter("doc_id < 250"), pos_path, store_positions=True
    )
    # append inherits the positional layout from meta
    append_to_bm25_index(docs.filter("doc_id >= 250"), pos_path)
    a = sorted(
        tuple(r)
        for r in search_phrase_index(
            spark, pos_path, ["table", "part"]
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in phrase_search(
            docs.filter("trim(text) <> ''"), ["table", "part"]
        ).collect()
    )
    assert a == b and len(a) > 0
    # BM25 probe unaffected by the positional layout
    one = [tuple(r) for r in bm25_topk(docs, ["spark", "fast"], k=5).collect()]
    via = [
        tuple(r)
        for r in search_bm25_index(spark, pos_path, ["spark", "fast"], k=5).collect()
    ]
    assert one == via

    flat_path = str(tmp_path / "flat")
    build_bm25_index(docs, flat_path)  # no positions
    with pytest.raises(ValueError, match="store_positions"):
        search_phrase_index(spark, flat_path, ["table"])
    with pytest.raises(ValueError):
        search_phrase_index(spark, pos_path, [])


def test_verify_bm25_index_consistent_and_tamper(spark, docs, tmp_path):
    import glob
    import os as _os

    from dataslicer_spark.operators.retrieval_index import (
        verify_bm25_index,
    )

    path = str(tmp_path / "idx")
    build_bm25_index(docs.filter("doc_id < 300"), path)
    append_to_bm25_index(docs.filter("doc_id >= 300"), path)
    rep = verify_bm25_index(spark, path)
    assert rep["n_docs"] == docs.filter("trim(text) <> ''").count()
    assert rep["n_mismatched"] == 0
    assert rep["n_orphan_postings"] == 0 and rep["n_orphan_doclens"] == 0
    # simulate a crash between the two appends: postings land, doclens
    # don't -> orphaned posting ids must be reported
    extra = docs.filter("doc_id < 5").selectExpr(
        "doc_id + 900000 as doc_id", "text"
    )
    from dataslicer_spark.operators.retrieval_index import (
        _tables,
        _tokenize,
    )

    posts, _ = _tables(_tokenize(extra, "doc_id", "text"))
    posts.write.mode("append").parquet(_os.path.join(path, "postings"))
    rep2 = verify_bm25_index(spark, path)
    assert rep2["n_orphan_postings"] == 5 and rep2["n_mismatched"] == 0
