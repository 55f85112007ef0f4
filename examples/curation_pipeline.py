"""End-user drive of the round-7 curation operators: paragraph-granular
cleaning → per-site caps → budgeted selection → epoch-balanced mixture →
a searchable index — the "shape the corpus to a token target" workflow
that follows the dedup/decontam pipeline (examples/llm_pipeline.py).

Run:  python examples/curation_pipeline.py  [sf_dir]
      (default /root/testdata/sf0.001)

Stage-by-stage (scale notes inline):

  1. paragraph quality filter  — CCNet shape: drop bad blocks, keep docs
                                 (array HOFs, map-only, no shuffle)
  2. per-site quota            — hash-deterministic cap per source
  3. token-budget selection    — best docs until the budget is spent
                                 (bucketed prefix sum, no global sort)
  4. epoch mixture             — per-source token budgets with
                                 upsampling epochs (broadcast + explode)
  5. hard negatives            — contrastive mining on the embedding
                                 table (map-side partial top-k kernel)
  6. BM25 index + phrase probe — persist postings once, search twice
  7. CDC refresh               — merge a simulated change log into the
                                 curated snapshot (latest-wins MERGE)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataslicer_spark.api import SlicerFrame
from dataslicer_spark.operators.retrieval_index import search_bm25_index
from dataslicer_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation-pipeline")
    docs = SlicerFrame(
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    )
    n0 = docs.df.count()
    print(f"[0] corpus: {n0} docs")

    # 1. paragraph-granular cleaning: reassemble docs from good blocks
    cleaned = docs.filter_paragraphs(
        "doc_id", para_tokens=20, min_distinct_ratio=0.72
    )
    kept_tokens = cleaned.df.agg(
        F.sum("n_kept_tokens").alias("t")
    ).collect()[0]["t"]
    cleaned = cleaned.df.filter(F.col("n_kept_tokens") > 0).select(
        "doc_id", "source",
        F.col("filtered_text").alias("text"),
        F.col("n_kept_tokens").alias("n_tok"),
    )
    print(f"[1] paragraph filter: {cleaned.count()} docs, "
          f"{kept_tokens} tokens kept")

    # 2. per-site cap: no domain dominates
    capped = SlicerFrame(cleaned).cap_per_group(
        "source", "doc_id", cap=40, salt="cur"
    )
    print(f"[2] per-site cap: {capped.df.count()} docs")

    # 3. token budget: keep the highest-distinct-ratio docs
    tk = F.split(F.trim(F.col("text")), r"\s+")
    scored = capped.df.withColumn(
        "score",
        F.size(F.array_distinct(tk)).cast("double")
        / F.size(tk).cast("double"),
    )
    budget = max(2000, int(kept_tokens * 0.6))
    selected = SlicerFrame(scored).select_token_budget(
        "score", "n_tok", "doc_id", budget
    )
    got = selected.df.agg(F.max("cum_tokens").alias("m")).collect()[0]["m"]
    print(f"[3] token budget {budget}: {selected.df.count()} docs, "
          f"{got} tokens")

    # 4. epoch mixture: balance 4 sources to equal token shares,
    # upsampling scarce ones up to 2.5 epochs
    per_source = budget // 8
    targets = {f"src{j}": float(per_source) for j in range(4)}
    mixed = selected.mix_epochs(
        "source", "n_tok", "doc_id", targets, max_epochs=2.5, salt="cur"
    )
    print(f"[4] epoch mixture: {mixed.df.count()} doc-epochs over "
          f"{len(targets)} sources")

    # 5. hard negatives from the embedding table
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    anchors = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    negs = SlicerFrame(emb).mine_hard_negatives(anchors, k=3)
    print(f"[5] hard negatives: {negs.df.count()} (anchor, negative) pairs")

    # 6. persist a BM25 index over the curated corpus; search it twice
    idx = tempfile.mkdtemp(prefix="curation_bm25_")
    try:
        SlicerFrame(selected.df.select("doc_id", "text")).to_bm25_index(idx)
        hits = search_bm25_index(spark, idx, ["table", "scan"], k=5)
        print(f"[6] bm25 index search: top doc "
              f"{[r.doc_id for r in hits.collect()]}")
        phrases = SlicerFrame(
            selected.df.select("doc_id", "text")
        ).search_phrase(["table", "part"])
        print(f"[6] phrase 'table part': {phrases.df.count()} docs")
    finally:
        shutil.rmtree(idx, ignore_errors=True)

    # 7. CDC refresh of the curated snapshot: a change log retracts two
    # docs and revises one
    sample_ids = [r.doc_id for r in selected.df.limit(3).collect()]
    changes = spark.createDataFrame(
        [
            (sample_ids[0], 1, "D", None),
            (sample_ids[1], 2, "D", None),
            (sample_ids[2], 3, "U", 999),
        ],
        "doc_id long, seq int, op string, n_tok int",
    )
    refreshed = SlicerFrame(
        selected.df.select("doc_id", "n_tok")
    ).apply_changelog(changes, ["doc_id"], "seq", "op", ["n_tok"])
    print(f"[7] cdc refresh: {refreshed.df.count()} docs "
          f"(was {selected.df.count()})")

    print("curation pipeline complete")


if __name__ == "__main__":
    main()
