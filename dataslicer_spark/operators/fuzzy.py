"""Fuzzy (edit-distance) string joins — the entity-resolution primitive
for record linkage and near-identical key matching (north-star
extension; the reference joins only on exact synthesized keys,
``metadata.py:167-169``).

Algorithm: symmetric-deletion blocking (the SymSpell construction,
public domain — Garbe 2012): every string emits itself plus each of its
``len`` delete-one-character variants; two strings within edit distance 1
necessarily share a variant (equality → the original; substitution at i →
both i-deletions match; insert/delete → the longer side's deletion equals
the shorter original).  Candidates are therefore an exact superset for
k ≤ 1 — no recall loss — and the final ``levenshtein`` filter makes the
output exact.

Scale design: the variant explode is map-side (``len+1`` rows per
string, bounded by string length); the only shuffle is the equi-join on
variant strings — the same inverted-index shape as the shingle-based
n-gram dedup (`dedup.ngram_jaccard_pairs`).  No cartesian product, no
per-row UDF: variant generation is a codegen `transform` over
`sequence`, and `levenshtein` is a JVM builtin.  Hot variants (shared
by many strings) behave like hot shingles — AQE skew-split applies; for
adversarial key distributions add a variant-frequency cap exactly like
``max_posting`` in the n-gram index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import check_col


def _deletion_variants(col: str):
    """Array of the string plus each delete-one variant (JVM codegen)."""
    return F.expr(
        f"concat(array({col}), transform(sequence(1, length({col})), "
        f"i -> concat(substring({col}, 1, i-1), substring({col}, i+1))))"
    )


def edit_distance_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs of rows whose ``text_col`` values are within edit
    distance ``max_dist`` (currently ≤ 1 — the deletion-neighborhood
    block guarantees completeness only there; larger k needs multi-delete
    neighborhoods, which grow combinatorially).

    Returns ``(id_a, id_b, name_a, name_b, dist)`` with ``id_a < id_b``.
    """
    if not 0 <= max_dist <= 1:
        raise ValueError(
            "edit_distance_self_join supports max_dist in {0, 1}: the "
            "delete-1 neighborhood is only complete for k <= 1"
        )
    check_col([id_col, text_col], df)
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("s"),
        F.explode(_deletion_variants(text_col)).alias("var"),
    )
    a = v.select(
        F.col("id").alias("id_a"), F.col("s").alias("name_a"), "var"
    )
    b = v.select(
        F.col("id").alias("id_b"), F.col("s").alias("name_b"), "var"
    )
    cand = (
        a.join(b, "var")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return cand.withColumn("dist", dist).filter(F.col("dist") <= max_dist)


__all__ = ["edit_distance_self_join"]
