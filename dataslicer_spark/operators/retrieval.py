"""BM25 keyword retrieval — score a document corpus against a fixed
query-term set and return the global top-k.

The missing piece between the text-quality operators and the ANN stack:
`similarity.py` retrieves by embedding; this retrieves by lexical
overlap, the standard first stage of a retrieval pipeline (and the
usual recall backstop next to a dense index).

Plan shape (what matters at 100 TB):

- ONE explode + ONE hash aggregate: per-document term frequencies for
  the |Q| query terms and the document length come out of a single
  ``groupBy(doc)`` with conditional-count cells — map-side partials,
  |Q|+1 integer columns per doc on the wire, tokens themselves never
  shuffle.
- corpus statistics (N, Σdl, per-term document frequencies) reduce the
  per-doc frame to ONE row, cross-joined back (broadcast by AQE — it is
  a single row).
- scoring is a map-only projection; the global top-k is
  ``orderBy().limit(k)`` — Spark's distributed TakeOrdered (per-partition
  heap + driver merge of k·P rows), never a single-partition window.

Cross-engine determinism (DuckDB oracle): BM25's textbook
``ln((N-df+0.5)/(df+0.5)+1)`` IDF is transcendental — Java and DuckDB
may disagree in the last ulp — so this uses the log-free Robertson
odds-ratio IDF ``(N-df+0.5)/(df+0.5)`` directly.  Every remaining
operation is IEEE +,-,*,/ with pinned association order (bit-identical
across engines on identical operands), and the per-term scores are
combined with the same binary fixed-point device as
``star_queries.dsum`` so the cross-term sum is integer arithmetic.
The ranking is a genuine BM25 family member (per-term monotone in the
standard IDF), and the k1/b saturation behaviour is untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import check_col

#: fractional bits for the per-term fixed-point scores (values ≲ 1e4
#: per term at any realistic corpus size: idf ≤ N, saturation ≤ k1+1).
FP_BITS = 20


def _fp(col: Column) -> Column:
    return F.floor(col * F.lit(float(2**FP_BITS))).cast("long")


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by (log-free) BM25 against ``query_terms``.

    Returns ``(id_col, rank, bm25, n_matched)`` ordered by
    ``bm25 DESC, id ASC`` (deterministic tie-break).  Documents matching
    no query term are excluded.  Whitespace tokenization, exact term
    match — normalize/stem upstream if needed.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")
    check_col([id_col, text_col], docs)

    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")

    # one aggregate: dl + a tf cell per query term (integer partials)
    tf_cells = [
        F.count(F.when(F.col("term") == F.lit(t), 1)).alias(f"tf_{i}")
        for i, t in enumerate(query_terms)
    ]
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"), *tf_cells
    )
    return score_bm25_cells(per_doc, len(query_terms), id_col, k, k1, b)


def score_bm25_cells(
    per_doc: DataFrame,
    n_terms: int,
    id_col: str,
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    """Score + rank a ``(id, dl, tf_0..tf_{n-1})`` frame with the
    log-free fixed-point BM25 recipe — shared verbatim by the one-shot
    :func:`bm25_topk` and the persistent-index probe
    (``retrieval_index.search_bm25_index``), so both paths are
    bit-identical by construction."""
    # corpus stats: one row (N, Σdl, df per term)
    df_cells = [
        F.count(F.when(F.col(f"tf_{i}") > 0, 1)).alias(f"df_{i}")
        for i in range(n_terms)
    ]
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *df_cells,
    )

    scored = per_doc.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)

    term_fps: list[Column] = []
    for i in range(n_terms):
        tf = F.col(f"tf_{i}").cast("double")
        idf = (
            (F.col("n_docs") - F.col(f"df_{i}")).cast("double") + F.lit(0.5)
        ) / (F.col(f"df_{i}").cast("double") + F.lit(0.5))
        ts = idf * ((tf * F.lit(k1 + 1.0)) / (tf + F.lit(k1) * norm))
        term_fps.append(_fp(ts))

    total = term_fps[0]
    for t in term_fps[1:]:
        total = total + t
    n_matched = None
    for i in range(n_terms):
        m = F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)
        n_matched = m if n_matched is None else n_matched + m

    out = (
        scored.select(
            F.col(id_col),
            (total.cast("double") / F.lit(float(2**FP_BITS))).alias("bm25"),
            n_matched.cast("int").alias("n_matched"),
        )
        .filter(F.col("n_matched") > 0)
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col).asc())
    return out.withColumn("rank", F.row_number().over(w)).select(
        id_col, "rank", "bm25", "n_matched"
    )


def bm25_topk_multi(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "qid",
    terms_col: str = "terms",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Batch form of :func:`bm25_topk`: top-``k`` documents for EVERY
    query in a query table ``(qid, terms array<string>)`` — the shape a
    real retrieval workload has (thousands of queries against one
    corpus), where per-query single scans would rescan the corpus per
    query.

    Returns ``(qid, id, rank, bm25, n_matched)`` with rank 1..k inside
    each query, ordered ``bm25 DESC, id ASC``.

    Plan shape: the corpus tokenizes ONCE; the exploded query-term table
    (tiny by definition) broadcasts onto the token stream, so only
    matching tokens survive into the (doc, qid, term) aggregate; per-term
    document frequencies and the one-row corpus stats broadcast back;
    scoring joins tf with per-doc lengths on the doc key (both sides
    already doc-keyed); the final top-k is one window over qid — every
    shuffle is keyed, nothing quadratic, the corpus crosses the wire once
    as matched (doc, qid, term) counts.

    Same cross-engine arithmetic contract as :func:`bm25_topk` (log-free
    odds-ratio IDF, pinned IEEE order, per-term fixed point).
    """
    from pyspark.sql import Window

    check_col([id_col, text_col], docs)
    check_col([qid_col, terms_col], queries)

    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")

    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )

    qterms = queries.select(
        F.col(qid_col).alias("qid"),
        F.explode(F.col(terms_col)).alias("term"),
    ).distinct()

    tf = (
        toks.join(F.broadcast(qterms), "term")
        .groupBy(id_col, "qid", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = (
        tf.select(id_col, "term").distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    scored = (
        tf.join(dl, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    tfd = F.col("tf").cast("double")
    idf = (
        (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    term_fp = _fp(idf * ((tfd * F.lit(k1 + 1.0)) / (tfd + F.lit(k1) * norm)))

    per_doc = scored.groupBy("qid", id_col).agg(
        F.sum(term_fp).alias("__fp"),
        F.count(F.lit(1)).cast("int").alias("n_matched"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        per_doc.select(
            "qid",
            id_col,
            (F.col("__fp").cast("double") / F.lit(float(2**FP_BITS))).alias(
                "bm25"
            ),
            "n_matched",
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "rank", "bm25", "n_matched")
    )



def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase retrieval over a positional inverted index: find
    documents containing the consecutive token sequence ``phrase`` and
    return (id, n_matches, first_pos) — the capability BM25's
    bag-of-words scoring cannot express ("table part" as a unit, not
    two independent terms).

    Plan shape: the corpus explodes to (doc, pos, term) postings ONLY
    for terms that appear in the phrase — the ``isin`` prefilter runs
    before the shuffle, so the postings that move are the phrase terms'
    postings, not the corpus's.  The positional index then self-joins
    ``len(phrase)-1`` times on ``(doc, pos+i)`` — each join key carries
    the offset so consecutive positions meet — and the surviving
    first-term positions aggregate per document.  At scale this is the
    standard positional-index query: postings lists shuffle on the
    (doc) key once, the joins are co-partitioned, and document bodies
    never move.

    Tokenization matches :func:`bm25_topk` (whitespace split), so one
    index serves both.
    """
    check_col([id_col, text_col], docs)
    if not phrase:
        raise ValueError("phrase must have at least one term")
    postings = (
        docs.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), r"\s+")).alias(
                "pos", "term"
            ),
        )
        .filter(F.col("term").isin(*set(phrase)))
    )
    first = (
        postings.filter(F.col("term") == phrase[0])
        .select("id", F.col("pos").alias("p0"))
    )
    cur = first
    for i, term in enumerate(phrase[1:], start=1):
        nxt = postings.filter(F.col("term") == term).select(
            "id", (F.col("pos") - i).alias("p0")
        )
        cur = cur.join(nxt, ["id", "p0"])
    return cur.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("p0").alias("first_pos"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k_rrf: int = 60,
    k: int = 10,
    scale: int = 1 << 40,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al., SIGIR 2009): combine N
    ranked lists into one by ``score(d) = Σ_lists 1/(k_rrf + rank_d)``
    — the standard hybrid-retrieval combiner (BM25 ∪ dense ANN), robust
    to incomparable score scales because only RANKS enter.

    Integer form for cross-engine exactness: each list contributes
    ``scale div (k_rrf + rank)`` (BIGINT division), summed exactly —
    order-independent and monotone in the true RRF score (ranks are
    small; at the default scale two ranks collide only beyond ~10⁶).

    Returns ``(id, rrf, n_lists, rank)`` — top-``k`` by
    ``rrf DESC, id ASC``.  Map-only per list + one id-keyed aggregate +
    a distributed TakeOrdered: each input is already a top-k (bounded),
    so every stage is candidate-sized, never corpus-sized.
    """
    from functools import reduce

    from pyspark.sql import Window

    if not rankings:
        raise ValueError("rankings must be non-empty")
    parts = []
    for r in rankings:
        check_col([id_col, rank_col], r)
        parts.append(
            r.select(
                F.col(id_col),
                F.expr(
                    f"cast({int(scale)} as bigint) div "
                    f"(cast({int(k_rrf)} as bigint) + cast({rank_col} as bigint))"
                ).alias("__s"),
            )
        )
    u = reduce(lambda a, b: a.unionByName(b), parts)
    out = (
        u.groupBy(id_col)
        .agg(
            F.sum("__s").alias("rrf"),
            F.count(F.lit(1)).cast("int").alias("n_lists"),
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return out.withColumn("rank", F.row_number().over(w)).select(
        id_col, "rrf", "n_lists", "rank"
    )


__all__ = ["bm25_topk", "bm25_topk_multi", "rrf_fuse"]
