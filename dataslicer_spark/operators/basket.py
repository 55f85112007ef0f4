"""Market-basket co-occurrence mining — pairwise association rules
(support / confidence / lift), the a-priori k=2 workhorse of
recommendation and affinity analytics (Agrawal & Srikant, VLDB 1994).

Scale shape: the pair space materializes ONLY within a basket — a
self-equi-join on the basket key — so the cost is Σ |basket|², bounded
by the largest basket, not the catalog.  That makes oversized baskets
the classic skew-killer, so ``max_basket_size`` drops them up front
(the standard production mitigation: a basket with 10⁴ items
contributes 10⁸ pairs and no usable signal).  Counts aggregate with
map-side combine; ``min_pair_count`` prunes the long tail before the
metric joins.

Determinism: all counts are exact integers; each ratio metric is ONE
double division of two exact integer products (fixed operation order),
so results replay bit for bit in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import check_col


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket_size: int | None = 1000,
) -> DataFrame:
    """Unordered item pairs (item_a < item_b) with co-occurrence stats:
    (item_a, item_b, pair_cnt, cnt_a, cnt_b, support, confidence, lift).

    ``confidence`` is P(b | a) for the a→b direction (the a < b row
    carries both counts, so the b→a confidence is ``pair_cnt/cnt_b``);
    ``lift`` is symmetric.  The total-basket count is collected once
    (a bounded scalar, like the k-means teleport base).
    """
    check_col([basket_col, item_col], df)
    items = (
        df.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .filter(F.col("__b").isNotNull() & F.col("__i").isNotNull())
        .distinct()
    )
    if max_basket_size is not None:
        sizes = items.groupBy("__b").agg(
            F.count(F.lit(1)).alias("__sz")
        ).filter(F.col("__sz") <= max_basket_size)
        items = items.join(sizes.select("__b"), "__b")
    # materialize once (localCheckpoint, self-releasing): the distinct
    # relation backs the count action, both self-join sides, and the
    # per-item counts — lazy, each reference would re-run the distinct
    items = items.localCheckpoint(eager=True)
    n_baskets = items.select("__b").distinct().count()
    if n_baskets == 0:
        return items.select(
            F.col("__i").alias("item_a"),
            F.col("__i").alias("item_b"),
            F.lit(0).cast("long").alias("pair_cnt"),
            F.lit(0).cast("long").alias("cnt_a"),
            F.lit(0).cast("long").alias("cnt_b"),
            F.lit(0.0).alias("support"),
            F.lit(0.0).alias("confidence"),
            F.lit(0.0).alias("lift"),
        ).limit(0)
    a = items.select("__b", F.col("__i").alias("item_a"))
    b = items.select("__b", F.col("__i").alias("item_b"))
    pairs = (
        a.join(b, "__b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= min_pair_count)
    )
    counts = items.groupBy("__i").agg(F.count(F.lit(1)).alias("__cnt"))
    out = (
        pairs.join(
            counts.select(
                F.col("__i").alias("item_a"), F.col("__cnt").alias("cnt_a")
            ),
            "item_a",
        )
        .join(
            counts.select(
                F.col("__i").alias("item_b"), F.col("__cnt").alias("cnt_b")
            ),
            "item_b",
        )
    )
    n = F.lit(int(n_baskets)).cast("long")
    return out.select(
        "item_a",
        "item_b",
        "pair_cnt",
        "cnt_a",
        "cnt_b",
        (F.col("pair_cnt").cast("double") / n.cast("double")).alias(
            "support"
        ),
        (
            F.col("pair_cnt").cast("double")
            / F.col("cnt_a").cast("double")
        ).alias("confidence"),
        (
            (F.col("pair_cnt") * n).cast("double")
            / (F.col("cnt_a") * F.col("cnt_b")).cast("double")
        ).alias("lift"),
    )


__all__ = ["association_rules"]
