"""DSIR-style data selection: hashed n-gram importance scoring.

Data Selection via Importance Resampling (Xie et al., 2023,
arXiv:2302.03169) picks pretraining documents from a raw pool by how
much they resemble a target corpus: fit bag-of-hashed-n-gram models of
the target and raw distributions, weight each raw document by the
likelihood ratio, and resample.  This implements the deterministic
top-k variant with an integer ratio surrogate:

- features: unigrams + word bigrams hashed into ``n_buckets`` via
  ``uint32(md5(gram)) % n_buckets`` (md5 is md5 in every engine — the
  same cross-engine device as the MinHash/SimHash operators);
- per-bucket weight ``s_b = ((cnt_target[b]+1) · scale) div
  (cnt_raw[b]+1)`` — add-one-smoothed frequency ratio in pure BIGINT
  arithmetic (the log-ratio sum of the paper is replaced by a
  linearized ratio sum: monotone per bucket, order-independent, and
  bit-identical across engines, where ``ln`` is not);
- document importance = Σ over the document's grams of the gram's
  bucket weight (an exact integer dot product ``Σ_b tf_b·s_b``);
- selection: global top-k by (importance DESC, id ASC).

Plan shape at 100 TB: gram construction is MAP-ONLY (unigrams and
bigrams come from array ops on the token array — tokens never shuffle);
the bucket model is ONE hash aggregate with conditional-count cells
producing ``n_buckets`` rows; that bounded model broadcasts back onto
the gram stream; per-document scores are one more integer hash
aggregate; the top-k is a distributed TakeOrdered.  Int64 budget:
``(cnt_target+1)·scale`` caps the corpus at ~8·10¹² target grams at the
default ``scale`` (2²⁰) — lower ``scale`` for more.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import check_col


def _grams(text: Column) -> Column:
    """Unigrams + word bigrams of a whitespace-tokenized text column,
    as one array — built with array ops only (no explode-then-window,
    which would shuffle every token)."""
    toks = F.filter(F.split(text, r"\s+"), lambda x: x != F.lit(""))
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bigrams)


def dsir_select(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    n_buckets: int = 65536,
    scale: int = 1 << 20,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Top-``k`` documents by hashed-n-gram importance w.r.t. the target
    slice ``is_target`` (a boolean Column over ``df``'s rows).

    Returns ``(id_col, *carry_cols, importance, rank)`` ordered by
    ``importance DESC, id ASC``.  The raw distribution is the WHOLE
    corpus (target included), matching the paper's raw-pool framing;
    documents already in the target slice are scored too — filter on a
    carried flag if you want novel documents only.
    """
    check_col([id_col, text_col] + (carry_cols or []), df)
    carry = carry_cols or []

    grams = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            is_target.alias("__is_t"),
            F.explode(_grams(F.col(text_col))).alias("__gram"),
        )
        .withColumn(
            "__bucket",
            F.conv(F.substring(F.md5(F.col("__gram")), 1, 8), 16, 10)
            .cast("long")
            % F.lit(n_buckets),
        )
    )

    # one (doc, bucket) aggregate feeds BOTH the bucket model and the
    # document scores — the two consumers share the identical exploded
    # subtree + exchange, so Spark's ReuseExchange tokenizes the corpus
    # ONCE (vs once per consumer when each reads the raw gram stream);
    # the wire carries (doc, bucket, tf) integer cells, never grams
    tfagg = grams.groupBy(id_col, *carry, "__is_t", "__bucket").agg(
        F.count(F.lit(1)).alias("__tf")
    )

    model = tfagg.groupBy("__bucket").agg(
        F.sum("__tf").alias("__cnt_r"),
        F.sum(F.when(F.col("__is_t"), F.col("__tf")).otherwise(0)).alias(
            "__cnt_t"
        ),
    )
    weights = model.select(
        "__bucket",
        F.expr(f"((__cnt_t + 1L) * {int(scale)}L) div (__cnt_r + 1L)").alias(
            "__s_b"
        ),
    )

    scored = (
        tfagg.join(F.broadcast(weights), "__bucket")
        .groupBy(id_col, *carry)
        .agg(F.sum(F.col("__tf") * F.col("__s_b")).alias("importance"))
    )
    out = scored.orderBy(
        F.col("importance").desc(), F.col(id_col).asc()
    ).limit(k)

    from pyspark.sql import Window

    w = Window.orderBy(F.col("importance").desc(), F.col(id_col).asc())
    return out.withColumn("rank", F.row_number().over(w)).select(
        id_col, *carry, "importance", "rank"
    )


__all__ = ["dsir_select"]
