"""End-user drive of the LLM training-data pipeline: raw documents →
training-ready packed sequences, composed from the engine's operators
the way a data-curation team would script it.

Run:  python examples/llm_pipeline.py  [sf_dir]  (default /root/testdata/sf0.001)

Stage-by-stage (each prints surviving rows; scale notes inline):

  1. exact dedup                 — fingerprint groupBy (bodies never shuffle)
  2. near-dup resolution         — MinHash-LSH pairs → connected components
  3. quality scoring + CDF cut   — keep each language's top half
  3b. DSIR importance ranking    — hashed-n-gram similarity to the en slice
  4. decontamination             — drop docs sharing 3-grams with eval set
  5. temperature resampling      — flatten the source mix (α = 0.5)
  6. PII scrubbing               — email/IP/number redaction + audit count
  7. train/val/test split        — content-hash, engine/order stable
  8. sequence packing            — 512-token bins, then materialized packs
  9. BM25 retrieval probe        — keyword audit of the final corpus
  10. shard export + verify      — deterministic shards, manifest, checksums
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataslicer_spark.functions.text import add_text_quality, scrub_pii
from dataslicer_spark.operators.decontam import decontaminate
from dataslicer_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    resolve_duplicate_groups,
)
from dataslicer_spark.operators.sampling import (
    add_split,
    materialize_packs,
    pack_documents,
    quantile_filter_by_group,
    temperature_resample,
)
from dataslicer_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("llm-pipeline")

    # Row-count provenance for the whole curation funnel: each traced
    # stage attaches a Spark Observation, so every "rows survived"
    # number below is harvested from actions the pipeline runs ANYWAY —
    # zero extra count() jobs (the reference logged these invariants
    # eagerly, dataset_base.py:224-229; trace.TraceLog is the lazy-
    # engine equivalent).  Funnel printed once at the end.
    from dataslicer_spark.trace import TraceLog

    trace = TraceLog()
    docs = trace.record(
        "input", spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    )

    # 1. exact dedup
    uniq, _ = exact_dedup(docs, "doc_id")
    uniq = trace.record("exact_dedup", uniq)

    # 2. near-dup resolution: candidate pairs -> components -> survivors
    pairs = minhash_lsh_pairs(uniq, "doc_id", threshold=0.8)
    groups = resolve_duplicate_groups(pairs)
    losers = groups.filter(~F.col("is_kept")).select("doc_id")
    kept = trace.record(
        "near_dup_resolution", uniq.join(losers, "doc_id", "left_anti")
    )

    # 3. quality + per-language CDF cut (top 50% per lang)
    scored = add_text_quality(kept)
    good = trace.record(
        "quality_cut",
        quantile_filter_by_group(
            scored, "lang", "quality_score", 0.5, "doc_id"
        ).select("doc_id", "text", "lang", "source"),
    )

    # 3b. DSIR target-domain selection: rank the pool by hashed-n-gram
    # similarity to the English slice (Xie et al. 2023) — here just
    # reported, not cut, so the demo corpus keeps its volume
    from dataslicer_spark.operators.dsir import dsir_select

    top_like_en = dsir_select(
        good, F.col("lang") == "en", k=5, n_buckets=1024,
        carry_cols=["lang"],
    )
    print("dsir: top-5 most-English-like docs "
          f"{[(r.doc_id, r.lang) for r in top_like_en.collect()]}")

    # 4. decontaminate against a held-out eval slice
    sp = add_split(
        good, "doc_id", weights=(0.9, 0.1), names=("pretrain", "eval"),
        salt="ex",
    )
    pretrain = sp.filter(F.col("split") == "pretrain").drop("split")
    evalset = sp.filter(F.col("split") == "eval").select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    clean, contam = decontaminate(
        pretrain, evalset, "doc_id", "eval_id", n=3, min_common=2
    )
    clean = trace.record("decontaminate", clean)
    print(f"decontamination removed {contam.count()} docs")

    # 4b. trigram-LM gibberish filter: model on the pretrain split, drop
    # the lowest-scoring 5% (CCNet-style frequency form)
    from dataslicer_spark.functions.text import trigram_lm_scores, trigram_model

    model = trigram_model(clean, "text", max_chars=512)
    lm = trigram_lm_scores(clean, model, "doc_id", "text", max_chars=512)
    lm_kept = trace.record(
        "trigram_lm_filter",
        quantile_filter_by_group(
            clean.join(lm.select("doc_id", "score"), "doc_id")
            .withColumn("__one", F.lit(1)),
            "__one", "score", 0.95, "doc_id",
        ).drop("__one", "score"),
    )

    # 4c. model-based quality filter: train a batch perceptron (the
    # fastText-classifier role in CCNet/LLaMA curation) on substring
    # count features, weak-labeled by a rule it must recover; keep
    # positively-scored docs.  Decaying integer lr damps batch zigzag.
    from dataslicer_spark.operators.classifier import (
        batch_perceptron_fit, perceptron_predict, substring_count,
    )

    fpats = [("f_the", " the "), ("f_fast", "fast"), ("f_slow", "slow"),
             ("f_big", "big"), ("f_small", "small")]
    feats = lm_kept.select(
        "doc_id",
        *[substring_count(F.col("text"), p).alias(n) for n, p in fpats],
    ).withColumn(
        "y",
        F.when(F.col("f_fast") > F.col("f_slow"), F.lit(1)).otherwise(
            F.lit(-1)
        ),
    ).persist()
    fcols = [n for n, _ in fpats]
    try:
        w = batch_perceptron_fit(
            feats, fcols, "y", n_epochs=6, lr=[16, 8, 4, 2, 1, 1]
        )
        clf_scored = perceptron_predict(feats, fcols, w)
        n_pos = clf_scored.filter(F.col("pred") == 1).count()
        acc = clf_scored.filter(
            F.col("pred") == F.col("y")
        ).count() / max(feats.count(), 1)
        print(f"classifier: {n_pos} quality-positive docs, "
              f"train acc {acc:.2f} (weights {w})")
    finally:
        feats.unpersist()

    # 4d. train a BPE tokenizer on the cleaned corpus and tokenize
    from dataslicer_spark.operators.bpe import bpe_apply, bpe_fit

    merges = bpe_fit(lm_kept, "text", n_merges=4, max_chars=256)
    toked = bpe_apply(lm_kept, merges, "text", max_chars=256)
    avg_tokens = toked.agg(F.avg("n_bpe_tokens")).first()[0]
    print(f"bpe: learned merges {merges}; avg {avg_tokens:.0f} tokens/doc")

    # 5. temperature resampling across sources
    resampled = trace.record(
        "temperature_resample",
        temperature_resample(
            lm_kept, "source", "doc_id", alpha=0.5, target_fraction=0.75
        ),
    )
    # ONE action executes the whole funnel and fills every traced
    # stage's count — this is the only job these six numbers cost
    resampled.write.format("noop").mode("overwrite").save()
    print("curation funnel (row-count provenance, one materializing job):")
    for label, n in trace.rows(strict=False):
        print(f"  {label:>22}: {n}")

    # 6. PII scrubbing
    scrubbed = scrub_pii(resampled, "text")
    n_redacted = scrubbed.agg(
        F.sum(
            F.col("n_email") + F.col("n_ip") + F.col("n_number")
        ).alias("n")
    ).first()["n"]
    print(f"PII redactions applied: {n_redacted}")

    # 7. deterministic split
    final = add_split(scrubbed, "doc_id", salt="ex2")
    final.groupBy("split").count().orderBy("split").show()

    # 8. pack the train split into 512-token sequences
    train = final.filter(F.col("split") == "train").withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    packed = pack_documents(train, "doc_id", "n_tokens", max_tokens=512)
    seqs = materialize_packs(packed, "doc_id", "n_tokens", "text")
    print(f"packed sequences: {seqs.count()}")
    seqs.select("pack_id", "n_docs", "total_tokens").orderBy("pack_id").show(5)

    # 9. corpus QA: BM25 keyword retrieval over the final corpus — the
    # "what did we actually keep about X?" audit tool
    from dataslicer_spark.operators.retrieval import bm25_topk

    hits = bm25_topk(
        final.select("doc_id", "text"), ["spark", "vector"], k=3
    )
    print("bm25 probe ('spark vector'): "
          f"{[(r.doc_id, round(r.bm25, 3)) for r in hits.collect()]}")

    # 10. export the train split as deterministic shards + manifest,
    # then run the trainer-side integrity check
    import tempfile

    from dataslicer_spark.sources.shards import (
        verify_shards,
        write_training_shards,
    )

    out = tempfile.mkdtemp(prefix="train_shards_")
    manifest = write_training_shards(
        train.select("doc_id", "text", "n_tokens"), out, "doc_id", 4,
        token_col="n_tokens",
    )
    n_ok = verify_shards(spark, out).filter(F.col("ok")).count()
    print(f"shards: {len(manifest['shards'])} written, {n_ok} verified, "
          f"{manifest['total_tokens']} tokens")


if __name__ == "__main__":
    main()
