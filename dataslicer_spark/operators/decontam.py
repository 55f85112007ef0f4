"""Benchmark decontamination: flag training documents that share n-gram
shingles with an evaluation/benchmark set (north-star training-pipeline
extension; the reference engine has no corpus-vs-corpus operator — its
closest surface is the pairwise match in dataslicer/objtable.py, which is
within-table only).

This is the standard n-gram collision decontamination used for LLM
training corpora (documented publicly in the GPT-3, PaLM, and Llama
reports): a training document is *contaminated* when it shares at least
``min_common`` distinct word n-grams with some eval document.

Scale design — the asymmetry is the whole point:

- The eval/benchmark side is small (thousands of documents, MBs) while
  the corpus side is the 100 TB table.  Eval shingles are therefore
  **broadcast**; the corpus is scanned once, exploded to (id, shingle)
  and hash-joined against the broadcast set map-side — the corpus is
  never shuffled by shingle.
- Only colliding (corpus_id, eval_id, shingle) triples survive the
  broadcast join; the single shuffle aggregates those by pair.  Its size
  is bounded by true-collision volume, not corpus size.
- ``max_posting`` optionally drops eval shingles occurring in more than
  that many eval docs (stop-shingles) — same guard as
  dedup.ngram_jaccard_pairs.
- Verification math is exact integer arithmetic (shingle counts), so the
  result is independent of partitioning and engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles
from ..utils import check_col


def _shingle_set(
    df: DataFrame, id_col: str, text_col: str, n: int, out_id: str
) -> DataFrame:
    """(id, shingle) with per-document distinct shingles."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias("s"),
    )


def contamination_pairs(
    corpus: DataFrame,
    eval_df: DataFrame,
    corpus_id: str,
    eval_id: str,
    text_col: str = "text",
    n: int = 8,
    min_common: int = 1,
    max_posting: int | None = None,
) -> DataFrame:
    """(corpus doc, eval doc) pairs sharing ≥ ``min_common`` distinct
    n-gram shingles, with overlap statistics.

    Returns columns: ``corpus_id, eval_id, n_common, n_eval_sh,
    coverage`` where coverage = n_common / n_eval_sh (the fraction of the
    eval document's shingles present in the training document — the
    quantity decontamination thresholds are stated in).
    """
    check_col([corpus_id, text_col], corpus)
    check_col([eval_id, text_col], eval_df)
    ev = _shingle_set(eval_df, eval_id, text_col, n, "__eid")
    if max_posting is not None:
        hot = (
            ev.groupBy("s")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_posting)
            .select("s")
        )
        ev = ev.join(hot, "s", "inner")
    ev_sizes = ev.groupBy("__eid").agg(F.count(F.lit(1)).alias("n_eval_sh"))
    co = _shingle_set(corpus, corpus_id, text_col, n, "__cid")
    pairs = (
        co.join(F.broadcast(ev), "s", "inner")
        .groupBy("__cid", "__eid")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    return (
        pairs.join(F.broadcast(ev_sizes), "__eid", "inner")
        .select(
            F.col("__cid").alias(corpus_id),
            F.col("__eid").alias(eval_id),
            "n_common",
            "n_eval_sh",
            (
                F.col("n_common").cast("double")
                / F.col("n_eval_sh").cast("double")
            ).alias("coverage"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    corpus_id: str,
    eval_id: str,
    text_col: str = "text",
    n: int = 8,
    min_common: int = 1,
    max_posting: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split the corpus into (clean, contaminated_stats).

    ``clean`` is the corpus minus every document contaminated against any
    eval document (left-anti join on the flagged id set — one small
    shuffle of ids, never of bodies).  ``contaminated_stats`` aggregates
    the pair table per corpus document: how many eval docs it hits and
    the worst overlap.
    """
    pairs = contamination_pairs(
        corpus, eval_df, corpus_id, eval_id, text_col, n, min_common, max_posting
    )
    stats = pairs.groupBy(corpus_id).agg(
        F.count(F.lit(1)).alias("n_eval_matches"),
        F.max("n_common").alias("max_common"),
        F.max("coverage").alias("max_coverage"),
    )
    clean = corpus.join(stats.select(corpus_id), corpus_id, "left_anti")
    return clean, stats


def semantic_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold: float,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    eval_id: str = "vec_id",
    eval_vec: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """SEMANTIC decontamination: flag training rows whose embedding is
    cosine-≥ ``threshold`` to ANY eval/benchmark embedding — the
    complement of n-gram :func:`decontaminate` (paraphrased or
    translated benchmark leaks share no shingles but sit next to the
    eval point in embedding space; both passes together are the
    standard curation pair).

    Returns ``(clean, flagged)``: ``clean`` = corpus rows with no eval
    neighbor at the threshold; ``flagged`` = (corpus_id,
    nearest_eval_id, cosine) for contaminated rows, nearest-first
    evidence for an audit.

    Scale shape mirrors the n-gram pass — the asymmetry is the point:
    the eval set is small and BROADCAST inside the Arrow kernel of
    :func:`~.similarity.cosine_threshold_match` (per-corpus-row argmax
    over the whole eval matrix, MAP-ONLY — no ranking window, no
    shuffle, ≤1 emitted row per corpus row), so the 100 TB corpus is
    scanned once and never shuffles.  Fixed-point cosine (``fp_dot``
    recipe) keeps the threshold decision and the emitted scores
    engine-exact, so the whole pass replays in SQL.
    """
    from .similarity import cosine_threshold_match

    check_col([corpus_id, corpus_vec], corpus)
    check_col([eval_id, eval_vec], eval_df)
    flagged = cosine_threshold_match(
        corpus,
        eval_df,
        threshold,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        ref_id=eval_id,
        ref_vec=eval_vec,
    ).select(
        F.col("vec_id").alias(corpus_id),
        F.col("ref_id").alias("nearest_eval_id"),
        "cosine",
    )
    clean = corpus.join(
        flagged.select(corpus_id), corpus_id, "left_anti"
    )
    return clean, flagged


__all__ = ["contamination_pairs", "decontaminate", "semantic_decontaminate"]


def ngram_novelty(
    corpus: DataFrame,
    ref: DataFrame,
    corpus_id: str,
    text_col: str = "text",
    n: int = 3,
    hashed: bool = True,
) -> DataFrame:
    """Per-document n-gram novelty vs a reference corpus: the fraction
    of a document's DISTINCT word n-grams that do NOT occur anywhere in
    ``ref`` — the memorization/overlap score that complements
    :func:`decontaminate` (which flags; this quantifies).  Low novelty →
    the document is mostly restatements of the reference (near-dup of
    training data, benchmark leakage, boilerplate); high novelty → new
    content worth keeping.

    Plan: both sides explode to per-doc distinct shingles; the reference
    set is reduced to DISTINCT shingles (one aggregate) and left-joined;
    one final doc-keyed aggregate with exact integer counts and a single
    IEEE division — engine-reproducible.  With ``hashed=True`` the join
    key is the 64-bit ``xxhash64`` of the shingle, so the shuffle
    carries 8-byte keys instead of n-gram strings (the production
    default at 100 TB; an engine-specific hash, so the DuckDB oracle
    twin ``txt_ngram_novelty`` runs ``hashed=False``, and the pytest
    asserts the two modes agree).

    Documents with fewer than ``n`` words have no shingles and are
    absent from the output (no 0/0 row).
    """
    check_col([corpus_id, text_col], corpus)
    check_col([text_col], ref)
    doc_sh = _shingle_set(corpus, corpus_id, text_col, n, corpus_id)
    ref_sh = (
        ref.select(
            F.explode(
                F.array_distinct(word_shingles(F.col(text_col), n))
            ).alias("s")
        )
        .distinct()
    )
    if hashed:
        doc_sh = doc_sh.select(corpus_id, F.xxhash64("s").alias("s"))
        ref_sh = ref_sh.select(F.xxhash64("s").alias("s"))
    flagged = doc_sh.join(
        ref_sh.withColumn("__seen", F.lit(1)), "s", "left"
    )
    return flagged.groupBy(corpus_id).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(
            F.when(F.col("__seen").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_novel"),
        (
            F.sum(
                F.when(F.col("__seen").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("novel_frac"),
    )
