"""Web-corpus ingestion drive: the crawl-to-training-shards pipeline —
WARC shards in, deduplicated quality-filtered shards out.

Stages (each a first-class operator in the engine):

1. ingest WARC shards (``sources/warc.py``) — here we first EXPORT the
   documents table as gzipped WARC to play the role of a crawl drop;
2. ExactSubstr span scrub (``operators/span_dedup.py``) — remove
   repeated boilerplate passages, keeping one copy corpus-wide;
3. near-dup document filter against a persistent MinHash index
   (``operators/dedup_index.py``);
4. quality gate (``functions/text.py`` heuristics);
5. deterministic training-shard export + manifest (``sources/shards.py``).

Run:  python examples/web_ingest.py  [sf_dir]
      (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataslicer_spark.functions.text import add_text_quality
from dataslicer_spark.operators.dedup_index import (
    build_minhash_index,
    dedup_against_minhash_index,
)
from dataslicer_spark.operators.span_dedup import (
    remove_duplicated_spans,
    span_dedup_stats,
)
from dataslicer_spark.session import get_spark
from dataslicer_spark.sources.shards import (
    read_manifest,
    verify_shards,
    write_training_shards,
)
from dataslicer_spark.sources.warc import read_warc, write_warc


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("web-ingest")
    work = tempfile.mkdtemp(prefix="web_ingest_")
    try:
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id", "text")

        # --- stage 0: fake the crawl drop — export as WARC shards
        crawl = os.path.join(work, "crawl")
        boiler = (
            "subscribe to our newsletter all rights reserved "
            "terms of service apply"
        )
        write_warc(
            docs.select(
                F.concat(
                    F.lit("http://corpus.local/doc/"), F.col("doc_id")
                ).alias("uri"),
                # every 5th page carries the same boilerplate banner
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.concat(F.lit(boiler + " "), F.col("text")),
                ).otherwise(F.col("text")).alias("text"),
            ),
            crawl, "uri", "text", n_shards=4,
        )

        # --- stage 1: ingest
        pages = (
            read_warc(spark, crawl)
            .filter(F.col("warc_type") == "response")
            .select(
                F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
                .cast("long")
                .alias("doc_id"),
                F.col("payload").alias("text"),
            )
        )
        n_pages = pages.count()
        print(f"ingested {n_pages} pages from WARC")

        # --- stage 2: ExactSubstr boilerplate scrub
        frac = (
            span_dedup_stats(pages, "doc_id", k=8)
            .agg(F.avg("dup_frac").alias("f"))
            .collect()[0].f
        )
        scrubbed = remove_duplicated_spans(pages, "doc_id", k=8)
        removed = (
            scrubbed.agg(F.sum("n_removed_tokens").alias("n")).collect()[0].n
        )
        print(f"span scrub: mean dup_frac={frac:.3f}, "
              f"removed {removed} tokens")
        scrubbed = scrubbed.select("doc_id", "text")

        # --- stage 3: near-dup filter vs a persistent index (seeded
        # with the first half of the corpus, as if from prior crawls)
        idx = os.path.join(work, "mhidx")
        seed = scrubbed.filter(F.col("doc_id") % 2 == 0)
        build_minhash_index(seed, idx, "doc_id")
        toks = F.split(F.trim(F.col("text")), r"\s+")
        recrawl = seed.limit(40).select(  # mutated re-crawls of indexed pages
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat_ws(
                " ", F.slice(toks, 1, F.greatest(F.size(toks) - 3, F.lit(1)))
            ).alias("text"),
        )
        batch = scrubbed.filter(F.col("doc_id") % 2 == 1).unionByName(recrawl)
        survivors, matches = dedup_against_minhash_index(
            batch, idx, "doc_id", threshold=0.5
        )
        kept = seed.unionByName(survivors)
        print(f"near-dup filter: {matches.count()} batch docs matched "
              f"the index; corpus now {kept.count()}")

        # --- stage 4: quality gate
        scored = add_text_quality(kept)
        good = scored.filter(F.col("quality_score") >= 0.3).select(
            "doc_id", "text"
        )
        print(f"quality gate kept {good.count()} docs")

        # --- stage 5: training shards + manifest
        out = os.path.join(work, "shards")
        good = good.withColumn(
            "n_tokens", F.size(F.split(F.trim("text"), r"\s+"))
        )
        write_training_shards(good, out, "doc_id", 4, token_col="n_tokens")
        m = read_manifest(out)
        bad = verify_shards(spark, out).filter(~F.col("ok")).count()
        print(
            f"shards: {m['n_shards']} shards, {m['total_rows']} rows, "
            f"{m['total_tokens']} tokens, verify failures: {bad}"
        )
        assert bad == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
