"""streaming/search_stream.stream_index_ingest: streamed batches land in
the persistent BM25 index; a post-stream search equals one-shot BM25
over the full corpus."""

from __future__ import annotations

import os

from dataslicer_spark.operators.retrieval import bm25_topk
from dataslicer_spark.operators.retrieval_index import (
    build_bm25_index,
    search_bm25_index,
)
from dataslicer_spark.streaming.search_stream import stream_index_ingest

SCHEMA = "doc_id long, text string"


def test_stream_index_ingest_matches_one_shot(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    src = str(tmp_path / "incoming")
    idx = str(tmp_path / "bm25idx")
    # bootstrap an empty index, then stream three disjoint batches
    build_bm25_index(docs.limit(0), idx)
    for m in (0, 1, 2):
        docs.filter(f"doc_id % 3 = {m}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    state = stream_index_ingest(spark, src, SCHEMA, idx)
    assert state["n_docs"] == docs.count() and state["n_batches"] >= 1

    terms = ["table", "part", "window"]
    via_index = [
        tuple(r)
        for r in search_bm25_index(spark, idx, terms, k=10).collect()
    ]
    one_shot = [tuple(r) for r in bm25_topk(docs, terms, k=10).collect()]
    assert via_index == one_shot
