"""Streaming corpus → searchable BM25 index: the retrieval analog of
``streaming/dedup_stream.py``.

A crawl pipeline's documents arrive as a file stream; each micro-batch
appends its postings and doclens to the persistent inverted index
(``operators/retrieval_index.py``), so the corpus is searchable
immediately after each trigger WITHOUT ever re-tokenizing what was
already ingested.  Corpus statistics (N, Σdl, df) are derived on probe
from the stored tables, so a search between any two batches is exactly
the one-shot ``bm25_topk`` over everything ingested so far — the parity
the batch pytest asserts.

Pair with ``stream_dedup_ingest`` upstream when the stream may re-send
documents: the BM25 append contract requires new ids (an id appended
twice double-counts its postings).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.retrieval_index import append_to_bm25_index


def stream_index_ingest(
    spark: SparkSession,
    source_path: str,
    schema,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
) -> dict:
    """Drain a parquet file stream into the BM25 index at ``index_path``
    (must exist — ``build_bm25_index`` on an empty frame bootstraps it;
    ``availableNow``: processes the backlog and stops).  Returns
    ``{"n_batches", "n_docs"}``."""
    state = {"n_batches": 0, "n_docs": 0}

    def step(batch_df, _batch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            return
        append_to_bm25_index(batch_df, index_path, id_col, text_col)
        state["n_batches"] += 1
        state["n_docs"] += n

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
        .writeStream.foreachBatch(step)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state


__all__ = ["stream_index_ingest"]
