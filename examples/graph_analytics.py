"""End-user drive: graph analytics over the purchase data, start to end.

Builds the part co-occurrence graph (parts sharing a high-value order),
then runs the full graph suite — triangle census, BFS reachability,
label-propagation communities, PageRank centrality — and prints the
small human-readable summaries an analyst would read.

Run: python examples/graph_analytics.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataslicer_spark.operators.graph import (  # noqa: E402
    bfs_hops,
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
)
from dataslicer_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("graph-analytics")

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    hi = orders.filter(F.col("o_totalprice") > 450_000.0).select("o_orderkey")
    liw = li.join(hi, li.l_orderkey == hi.o_orderkey, "left_semi")
    a = liw.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = liw.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
        .cache()
    )
    print(f"graph: {edges.count()} co-occurrence edges")

    census = triangle_count(edges).collect()[0]
    print(
        f"census: {census['n_vertices']} vertices, {census['n_edges']} edges, "
        f"{census['n_triangles']} triangles, "
        f"clustering coefficient {census['clustering_coeff']:.4f}"
    )

    comps = connected_components(edges)
    n_comp = comps.select("rep").distinct().count()
    print(f"connected components: {n_comp}")

    hops = bfs_hops(edges, edges.agg(F.min('src').alias('node')), max_hops=3)
    hist = {r["dist"]: r["n_nodes"] for r in
            hops.groupBy("dist").count().withColumnRenamed("count", "n_nodes").collect()}
    print(f"BFS reachability from the smallest part: {dict(sorted(hist.items()))}")

    comm = label_propagation(edges, n_iter=3)
    sizes = (
        comm.groupBy("label").count().orderBy(F.desc("count")).limit(5).collect()
    )
    print("largest communities:", [(r["label"], r["count"]) for r in sizes])

    pr = pagerank(
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ),
        n_iter=3,
    )
    top = pr.orderBy(F.desc("rank")).limit(5).collect()
    print("most central parts:", [(r["node"], r["rank"]) for r in top])

    edges.unpersist()
    print("graph analytics complete.")


if __name__ == "__main__":
    main()
