"""Incremental-ingestion drive: the persistent MinHash/LSH index and its
streaming form on the documents table — the daily-crawl dedup loop.

Run:  python examples/incremental_ingest.py  [sf_dir]
      (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataslicer_spark.operators.dedup_index import (
    build_minhash_index,
    dedup_against_minhash_index,
)
from dataslicer_spark.session import get_spark
from dataslicer_spark.streaming.dedup_stream import stream_dedup_ingest


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("incremental-ingest")
    work = tempfile.mkdtemp(prefix="ingest_demo_")
    try:
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id", "text")
        half = docs.filter(F.col("doc_id") % 2 == 0)

        # day 0: index the existing corpus (signatures only — no bodies)
        idx = os.path.join(work, "mhidx")
        build_minhash_index(half, idx, "doc_id")
        print("indexed docs:", half.count())

        # day 1 batch: fresh docs + near-dup mutations of indexed ones
        toks = F.split(F.trim(F.col("text")), r"\s+")
        mutated = half.limit(50).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat_ws(
                " ", F.slice(toks, 1, F.greatest(F.size(toks) - 3, F.lit(1)))
            ).alias("text"),
        )
        batch = docs.subtract(half).unionByName(mutated)
        survivors, matches = dedup_against_minhash_index(
            batch, idx, "doc_id", threshold=0.5
        )
        print(
            "batch:", batch.count(),
            "| near-dups of indexed docs:", matches.count(),
            "| survivors appended:", survivors.count(),
        )

        # streaming form: two micro-batches through the same loop
        src = os.path.join(work, "incoming")
        for shift in (2_000_000, 3_000_000):
            docs.limit(25).select(
                (F.col("doc_id") + shift).alias("doc_id"), "text"
            ).coalesce(1).write.mode("append").parquet(src)
        stats = stream_dedup_ingest(
            spark, src, "doc_id long, text string", idx, "doc_id",
            threshold=0.5,
        )
        print("stream:", stats)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
