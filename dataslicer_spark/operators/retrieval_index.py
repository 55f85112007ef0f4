"""Persistent BM25 inverted index — build once, search every query
WITHOUT re-tokenizing the corpus.

The one-shot :func:`~.retrieval.bm25_topk` tokenizes the whole corpus
per query — right for ad-hoc audits, wrong for a query workload.  This
module persists exactly the two artifacts BM25 needs (the retrieval
analog of ``dedup_index.py``'s signature/band tables):

- ``postings``: one ``(term, id, tf)`` row per distinct (doc, term) —
  range-partitioned and sorted BY TERM at write time, so a probe's
  ``term IN (...)`` filter prunes parquet row groups by min/max stats
  and the scan reads ~only the query terms' postings, not the corpus;
- ``doclens``: one ``(id, dl)`` row per document — the N/Σdl corpus
  statistics come from this id-sized table, never from text.

A probe is then: scan the pruned postings → pivot the |Q| tf cells per
doc (conditional-sum aggregate, integer partials) → join onto doclens →
the SHARED fixed-point scoring kernel (:func:`~.retrieval.
score_bm25_cells`) — bit-identical to ``bm25_topk`` on the same corpus
by construction, which is what the oracle asserts.

Appending a batch appends its postings and doclens (parquet append, no
rewrite); corpus statistics are derived on probe from the stored
tables, so they are correct immediately after any append.  Compact with
``sources/lake.compact_lake`` when small files accumulate.

Scale: the index build is one explode + one (id, term) aggregate; the
probe moves postings for |Q| terms plus the id-sized doclens table;
document text is read once at build time and never again.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..utils import check_col, local_df, spread
from .retrieval import score_bm25_cells

_POSTINGS, _DOCLENS, _META = "postings", "doclens", "meta"


def _tokenize(
    docs: DataFrame, id_col: str, text_col: str, positions: bool = False
) -> DataFrame:
    """Whitespace tokens — identical to bm25_topk's tokenization.
    ``positions=True`` adds the 0-based token offset (phrase probes)."""
    base = docs.filter(F.col(text_col).isNotNull())
    if positions:
        out = base.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), r"\s+")).alias(
                "pos", "term"
            ),
        )
    else:
        out = base.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("term"),
        )
    return out.filter(F.col("term") != "")


def _tables(
    df: DataFrame, positions: bool = False
) -> tuple[DataFrame, DataFrame]:
    # doclens folds out of the postings aggregate (dl = Σ tf per id) —
    # the token stream is scanned once, not once per table.  NOTE: with
    # positions on, dl counts via tf (number of occurrences), identical
    # to the positionless layout — empty-token filtering happens in
    # _tokenize either way.
    if positions:
        postings = df.groupBy("term", "id").agg(
            F.count(F.lit(1)).alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    else:
        postings = df.groupBy("term", "id").agg(
            F.count(F.lit(1)).alias("tf")
        )
    doclens = postings.groupBy("id").agg(F.sum("tf").alias("dl"))
    return postings, doclens


def build_bm25_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: int = 8,
    store_positions: bool = False,
) -> None:
    """Create the index at ``path`` from the corpus (may be empty).

    ``store_positions=True`` adds a sorted 0-based position array per
    posting, enabling :func:`search_phrase_index` (phrase queries
    without a corpus scan) at ~token-count storage instead of
    distinct-term count; BM25 probes are unaffected either way —
    parquet column pruning skips the array."""
    check_col([id_col, text_col], docs)
    # spread the corpus before the token explode (guide §2.5): the
    # split/explode map pass otherwise runs at the scan's partitioning
    # (one task on a one-row-group table), feeding the postings shuffle
    # single-threaded; guarded no-op on many-file corpora
    toks = _tokenize(
        spread(docs.select(id_col, text_col)), id_col, text_col,
        store_positions,
    )
    postings, _ = _tables(toks, store_positions)
    # term-clustered layout: range partition + in-file sort puts each
    # term's postings in contiguous row groups ⇒ min/max stats prune
    # probe scans down to the query terms
    (
        postings.repartitionByRange(n_partitions, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(os.path.join(path, _POSTINGS))
    )
    spark = docs.sparkSession
    # doclens from the postings JUST WRITTEN (dl = Σ tf per id): the
    # text is exploded once; this pass reads compact integer parquet
    (
        spark.read.parquet(os.path.join(path, _POSTINGS))
        .groupBy("id")
        .agg(F.sum("tf").alias("dl"))
        .write.mode("overwrite")
        .parquet(os.path.join(path, _DOCLENS))
    )
    local_df(
        spark,
        [("id_col", id_col), ("text_col", text_col), ("tokenizer", "ws"),
         ("positions", "1" if store_positions else "0")],
        "key string, value string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, _META)
    )


def append_to_bm25_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Append a document batch (ids must be new — appending an existing
    id would double-count its postings; dedup upstream, e.g. with the
    MinHash index loop)."""
    check_col([id_col, text_col], new_docs)
    spark = new_docs.sparkSession
    meta = {
        r["key"]: r["value"]
        for r in spark.read.parquet(os.path.join(path, _META)).collect()
    }
    with_pos = meta.get("positions", "0") == "1"
    # spread before the token explode, like build_bm25_index
    toks = _tokenize(
        spread(new_docs.select(id_col, text_col)), id_col, text_col, with_pos
    )
    postings, doclens = _tables(toks, with_pos)
    # one explode for both tables: cache the batch's postings (batch-
    # sized), append them, fold doclens out of the cached frame
    postings = postings.persist()
    postings.write.mode("append").parquet(os.path.join(path, _POSTINGS))
    doclens.write.mode("append").parquet(os.path.join(path, _DOCLENS))
    postings.unpersist()


def search_bm25_index(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` over the indexed corpus — same output contract (and
    bit-identical scores) as running ``bm25_topk`` on the full corpus.

    Plan: pruned postings scan (``term IN`` pushdown) → per-doc tf
    cells → join onto doclens (docs matching no term still count in the
    N/Σdl statistics via the left join) → shared scoring kernel.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")
    meta = {
        r["key"]: r["value"]
        for r in spark.read.parquet(os.path.join(path, _META)).collect()
    }
    id_col = meta.get("id_col", "doc_id")
    postings = spark.read.parquet(os.path.join(path, _POSTINGS))
    doclens = spark.read.parquet(os.path.join(path, _DOCLENS))
    tf_cells = [
        F.sum(F.when(F.col("term") == F.lit(t), F.col("tf"))).alias(
            f"tf_{i}"
        )
        for i, t in enumerate(query_terms)
    ]
    hits = (
        postings.filter(F.col("term").isin(*set(query_terms)))
        .groupBy("id")
        .agg(*tf_cells)
    )
    per_doc = doclens.join(hits, "id", "left").na.fill(
        {f"tf_{i}": 0 for i in range(len(query_terms))}
    )
    return score_bm25_cells(
        per_doc.withColumnRenamed("id", id_col),
        len(query_terms),
        id_col,
        k,
        k1,
        b,
    )


def search_phrase_index(
    spark: SparkSession,
    path: str,
    phrase: list[str],
) -> DataFrame:
    """Exact consecutive-phrase retrieval over the stored positional
    postings — same output contract as :func:`~.retrieval.
    phrase_search` on the full corpus ((id, n_matches, first_pos)),
    without re-tokenizing it: the probe reads the phrase terms'
    postings (term IN pushdown + row-group pruning), explodes their
    position arrays, and runs the same co-partitioned (doc, pos+i)
    join chain.  Requires ``store_positions=True`` at build time."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    meta = {
        r["key"]: r["value"]
        for r in spark.read.parquet(os.path.join(path, _META)).collect()
    }
    if meta.get("positions", "0") != "1":
        raise ValueError(
            "index was built without store_positions=True — phrase "
            "probes need positional postings"
        )
    postings = spark.read.parquet(os.path.join(path, _POSTINGS))
    hits = (
        postings.filter(F.col("term").isin(*set(phrase)))
        .select("id", "term", F.explode("positions").alias("pos"))
    )
    first = (
        hits.filter(F.col("term") == phrase[0])
        .select("id", F.col("pos").alias("p0"))
    )
    cur = first
    for i, term in enumerate(phrase[1:], start=1):
        nxt = hits.filter(F.col("term") == term).select(
            "id", (F.col("pos") - i).alias("p0")
        )
        cur = cur.join(nxt, ["id", "p0"])
    return cur.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("p0").alias("first_pos"),
    )


def verify_bm25_index(spark: SparkSession, path: str) -> dict:
    """Index integrity check (the trainer-handoff pattern of
    ``sources/shards.verify_shards``): every doc's stored ``dl`` must
    equal the sum of its posting tf's, and neither table may reference
    ids the other lacks — the invariant a crash between the postings
    and doclens appends would break.  Returns ``{"n_docs", "n_terms",
    "n_mismatched", "n_orphan_postings", "n_orphan_doclens"}``; all-zero
    tails mean consistent.  One aggregate over each id-keyed table —
    runs at index (not corpus) cost, so it is cheap enough to run after
    every append batch."""
    postings = spark.read.parquet(os.path.join(path, _POSTINGS))
    doclens = spark.read.parquet(os.path.join(path, _DOCLENS))
    sums = postings.groupBy("id").agg(F.sum("tf").alias("__sum_tf"))
    joined = doclens.join(sums, "id", "full_outer")
    agg = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (
                F.col("dl").isNotNull()
                & F.col("__sum_tf").isNotNull()
                & (F.col("dl") != F.col("__sum_tf"))
            ).cast("int")
        ).alias("mismatched"),
        F.sum(F.col("dl").isNull().cast("int")).alias("orphan_postings"),
        F.sum(F.col("__sum_tf").isNull().cast("int")).alias(
            "orphan_doclens"
        ),
    ).collect()[0]
    n_terms = postings.select("term").distinct().count()
    return {
        "n_docs": int(agg["n"]),
        "n_terms": int(n_terms),
        "n_mismatched": int(agg["mismatched"] or 0),
        "n_orphan_postings": int(agg["orphan_postings"] or 0),
        "n_orphan_doclens": int(agg["orphan_doclens"] or 0),
    }


__all__ = [
    "build_bm25_index",
    "append_to_bm25_index",
    "search_bm25_index",
    "search_phrase_index",
    "verify_bm25_index",
]
