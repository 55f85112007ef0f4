"""End-user drive: classical analytics over the TPC-H-ish tables with
the round-4 operators — bloom-pruned joins, market-basket rules,
PageRank entity importance, exact ridge regression, and k-means over
embeddings.  Run: ``python examples/relational_analytics.py``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataslicer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("relational-analytics")
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))

    # 1. bloom-pruned join: high-value orders drive a lineitem rollup
    from dataslicer_spark.operators.bloomjoin import bloom_prune_join

    dim = orders.filter(F.col("o_totalprice") > 400_000.0).select(
        "o_orderkey"
    )
    fact = li.withColumnRenamed("l_orderkey", "o_orderkey")
    j = bloom_prune_join(fact, dim, "o_orderkey")
    print(f"bloom join: {j.count()} lineitems match high-value orders")

    # 2. market-basket: parts co-purchased within an order
    from dataslicer_spark.operators.basket import association_rules

    rules = association_rules(li, "l_orderkey", "l_partkey", min_pair_count=3)
    top = rules.orderBy(F.desc("lift")).limit(3).collect()
    print(f"basket rules: {rules.count()} pairs at support>=3; "
          f"top lift {[round(r.lift, 1) for r in top]}")

    # 3. PageRank over the bidirected customer<->supplier purchase graph
    from dataslicer_spark.operators.graph import pagerank

    cs = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    edges = cs.unionByName(
        cs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = pagerank(edges, n_iter=3)
    best = pr.orderBy(F.desc("rank")).first()
    kind = "supplier" if best.node % 2 else "customer"
    print(f"pagerank: {pr.count()} nodes; top is {kind} {best.node // 2}")

    # 4. exact ridge regression: model document length from text stats
    from dataslicer_spark.operators.classifier import substring_count
    from dataslicer_spark.operators.ridge import (
        ridge_fit_exact, ridge_predict, ridge_weights,
    )

    docs = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).filter(F.col("text").isNotNull())
    t = F.col("text")
    feats = docs.select(
        "doc_id",
        F.col("n_chars").alias("y"),
        (F.length(t) - F.length(F.regexp_replace(t, " ", ""))).cast(
            "long"
        ).alias("f_spaces"),
        substring_count(t, " the ").alias("f_the"),
        substring_count(t, "fast").alias("f_fast"),
    )
    det, nums = ridge_fit_exact(
        feats, ["f_spaces", "f_the", "f_fast"], "y", lam=1
    )
    w = ridge_weights(det, nums)
    scored = ridge_predict(feats, ["f_spaces", "f_the", "f_fast"], w)
    mae = scored.agg(
        F.avg(F.abs(F.col("pred") - F.col("y")))
    ).first()[0]
    print(f"ridge: w={['%.2f' % v for v in w]}, train MAE {mae:.1f} chars")

    print("relational analytics drive complete")


if __name__ == "__main__":
    main()
