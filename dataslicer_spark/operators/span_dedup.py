"""Exact duplicated-substring (span) deduplication — the ExactSubstr
pass of Lee et al. 2022, *"Deduplicating Training Data Makes Language
Models Better"* (arXiv:2107.06499), re-expressed for Spark.

Document-level dedup (``operators/dedup.py``) misses the dominant
duplication mode in web corpora: long VERBATIM passages (boilerplate,
licenses, quoted articles) embedded inside otherwise-distinct
documents.  The reference treatment builds a corpus-wide suffix array
and removes every repeated substring of ≥ k tokens, keeping one
occurrence.  A suffix array is a single-machine construction; the
Spark-native equivalent used here is the standard windowed-fingerprint
reformulation with identical output semantics for fixed k:

  a token position is inside a removable span  ⇔  it is covered by some
  k-token window whose content occurs elsewhere in the corpus at an
  earlier (doc, pos) — i.e. every repeated substring of length ≥ k is
  exactly the union of its repeated k-windows.

Plan shape (the part that matters at 100 TB):

1. each document emits its overlapping k-token windows as md5
   fingerprints via JVM ``transform``/``posexplode`` — no Python, rows
   out = tokens in (same growth as shingling, which the dedup family
   already pays);
2. the global-first-occurrence rank is a window over the fingerprint —
   partial aggregation does not apply to ``row_number`` but the key is
   a 128-bit content hash, so the shuffle is uniform; a pathological
   boilerplate window (one fingerprint in millions of docs) is exactly
   the AQE skew-partition case, and only ``(fp, doc, pos)`` triples
   ever shuffle — never text;
3. duplicate occurrences collapse per document with a gaps-and-islands
   merge (two narrow window functions over the doc key);
4. the scrub re-joins the merged spans to the documents ON THE DOC KEY
   (one co-partitioned shuffle) and drops covered tokens with an
   array-lambda filter — no second explode of the corpus.

Windows and ranks are engine-portable (md5 of the literal window text,
``row_number`` over a total order), so the whole pipeline has an exact
DuckDB twin — see ``plans/extension_queries.py`` ``txt_span_dedup``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..utils import check_col, spread

__all__ = [
    "duplicated_spans",
    "span_dedup_stats",
    "remove_duplicated_spans",
]


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def _window_fps(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, pos, fp): md5 fingerprint of the k-token window starting at
    0-based token position ``pos``.  Documents shorter than k emit no
    windows (they cannot contain a length-≥k repeat)."""
    toks = _tokens(text_col)
    wins = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )
    # spread before the per-window md5 transform (guide §2.5): one md5
    # per token position runs at the scan's partitioning — one task on a
    # one-row-group table; guarded no-op on wide inputs
    return (
        spread(df.select(F.col(id_col), F.col(text_col)))
        .filter(F.trim(F.col(text_col)) != "")
        .filter(F.size(toks) >= k)
        .select(F.col(id_col).alias("__id"), F.posexplode(wins))
        .select(
            F.col("__id").alias(id_col),
            F.col("pos"),
            F.col("col").alias("fp"),
        )
    )


def duplicated_spans(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 50
) -> DataFrame:
    """Merged token spans to remove: ``(id, span_start, span_end)``
    (0-based, inclusive) covering every k-window occurrence that is NOT
    the corpus-global first occurrence of its content.

    "First" = smallest ``(id, pos)`` — total, deterministic, and the
    same tiebreak the oracle replays, so exactly one copy of every
    repeated passage survives corpus-wide."""
    check_col([id_col, text_col], df)
    if k < 2:
        raise ValueError("k must be >= 2")
    occ = _window_fps(df, id_col, text_col, k)
    dup = (
        occ.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("fp").orderBy(id_col, "pos")
            ),
        )
        .filter(F.col("rk") > 1)
        .select(
            id_col,
            F.col("pos").alias("start"),
            (F.col("pos") + k - 1).alias("end"),
        )
    )
    # gaps-and-islands: merge overlapping/adjacent dup windows per doc
    w = Window.partitionBy(id_col).orderBy("start")
    prior_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        dup.withColumn(
            "new_island",
            (F.col("start") > F.coalesce(prior_end, F.lit(-1)) + 1).cast(
                "int"
            ),
        )
        .withColumn(
            "island",
            F.sum("new_island").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy(id_col, "island")
        .agg(
            F.min("start").alias("span_start"),
            F.max("end").alias("span_end"),
        )
        .drop("island")
    )


def span_dedup_stats(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 50
) -> DataFrame:
    """Per-document duplication profile: ``(id, n_tokens, dup_spans,
    dup_tokens, dup_frac)``.  Docs with no removable span report zeros —
    the corpus-health view (``dup_frac`` ≈ the fraction ExactSubstr
    would delete) that decides whether running the scrub is worth it."""
    spans = duplicated_spans(df, id_col, text_col, k)
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dup_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias(
            "dup_tokens"
        ),
    )
    toks = _tokens(text_col)
    n_tok = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(
        F.size(toks)
    )
    return (
        df.select(F.col(id_col), n_tok.alias("n_tokens"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("dup_spans", F.lit(0)).cast("long").alias("dup_spans"),
            F.coalesce("dup_tokens", F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            F.when(F.col("n_tokens") > 0,
                   F.coalesce("dup_tokens", F.lit(0)).cast("double")
                   / F.col("n_tokens").cast("double"))
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )


def remove_duplicated_spans(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 50
) -> DataFrame:
    """ExactSubstr scrub: rewrite ``text_col`` with every non-first
    repeated span removed (tokens re-joined with single spaces).  Adds
    ``n_removed_tokens``; all other columns pass through.

    The merged spans per document are joined back on the document key —
    a single co-partitioned shuffle carrying only ``(id, start, end)``
    triples — and tokens are dropped with an array-lambda filter
    (`exists` over the per-doc span list), so document text is never
    exploded or shuffled."""
    spans = duplicated_spans(df, id_col, text_col, k)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = _tokens(text_col)
    covered = lambda i: F.exists(  # noqa: E731
        F.col("__spans"),
        lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
    )
    kept = F.filter(toks, lambda t, i: ~covered(i))
    out = (
        df.join(per_doc, id_col, "left")
        .withColumn(
            "__clean",
            F.when(F.col("__spans").isNull(), F.col(text_col)).otherwise(
                F.concat_ws(" ", kept)
            ),
        )
        .withColumn(
            "n_removed_tokens",
            F.when(F.col("__spans").isNull(), F.lit(0))
            .otherwise(F.size(toks) - F.size(kept))
            .cast("long"),
        )
    )
    return out.drop(text_col, "__spans").withColumnRenamed(
        "__clean", text_col
    )
