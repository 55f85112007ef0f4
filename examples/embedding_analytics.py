"""End-user drive of the embedding-analytics surface: a vector corpus →
PCA compression → quantized storage → ANN index → near-dup audit →
kNN pseudo-labels, composed the way an embedding-curation team would
script it.

Run:  python examples/embedding_analytics.py  [sf_dir]
      (default /root/testdata/sf0.001)

Stage-by-stage (scale notes inline):

  1. PCA fit          — per-partition fixed-point Gram reduction; only
                        d×d crosses the wire, eigh on the driver's copy
  2. PCA project      — zip_with/aggregate expressions, no Python workers
  3. quantization     — int8 per-dimension scale/offset (emb_quantize's
                        operator), 4× smaller at rest
  4. ANN index        — IVF k-means inverted lists, list-partitioned
                        parquet persistence, partition-pruned probes
  5. PQ compression   — 8 one-byte codes per vector (32× smaller);
                        IVF×PQ search probes lists, ADC-scores codes,
                        exact-re-ranks the tiny candidate set
  6. near-dup audit   — LSH-bucketed cosine candidates + exact re-rank
  7. kNN labels       — majority vote of 5 nearest labeled neighbors
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataslicer_spark.operators.dedup import embedding_near_dup
from dataslicer_spark.operators.pca import pca_fit, pca_project
from dataslicer_spark.operators.similarity import (
    build_ivf_index,
    ivf_search,
    knn_classify,
)
from dataslicer_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("embedding-analytics")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    print(f"input: {n} vectors, 64-dim")

    # 1-2. PCA: fit on the corpus, project to 8 components
    comps, eigvals, mean = pca_fit(emb, "embedding", dim=64, k=8)
    explained = float(eigvals.sum())
    print(f"pca: top-8 eigenvalues sum {explained:.3f}")
    projected = pca_project(emb, comps, mean, "embedding", out_col="pca8")
    assert projected.filter(F.size("pca8") != 8).count() == 0
    print(f"pca: projected {projected.count()} vectors to 8 dims")

    # 3. int8 quantization of the projected vectors (scale/offset per dim)
    lo_hi = projected.select(
        F.array_min("pca8").alias("lo"), F.array_max("pca8").alias("hi")
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).first()
    scale = 255.0 / max(lo_hi["hi"] - lo_hi["lo"], 1e-9)
    quant = projected.withColumn(
        "pca8_q",
        F.transform(
            "pca8",
            lambda x: (
                F.round((x - F.lit(lo_hi["lo"])) * F.lit(scale)) - F.lit(128)
            ).cast("tinyint"),
        ),
    )
    print(f"quantized: {quant.filter(F.size('pca8_q') == 8).count()} rows int8")

    # 4. IVF index on the original vectors; probed search
    centroids, assigned = build_ivf_index(emb, n_lists=8, seed=7)
    queries = emb.filter(F.col("vec_id") % 100 == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = ivf_search(centroids, assigned, queries, k=3, n_probe=4)
    print(f"ivf: {hits.count()} hits for {queries.count()} queries")

    # 4b. persist → append a batch → drift check → conditional rebalance
    #     (the long-running-ingestion maintenance loop)
    import tempfile

    from dataslicer_spark.operators.similarity import (
        append_to_ivf_index,
        ivf_drift_stats,
        rebalance_ivf_index,
        save_ivf_index,
    )

    spark = emb.sparkSession
    idx_path = tempfile.mkdtemp(prefix="ex_ivf_") + "/ivf"
    half = emb.filter(F.col("vec_id") % 2 == 0)
    c0, a0 = build_ivf_index(half, n_lists=8, seed=7)
    save_ivf_index(c0, a0, idx_path)
    append_to_ivf_index(emb.filter(F.col("vec_id") % 2 == 1), idx_path)
    stats = ivf_drift_stats(spark, idx_path)
    print(
        f"ivf index: {stats['n_vectors']} vectors in {stats['n_lists']} "
        f"lists, imbalance {stats['imbalance']:.2f}"
    )
    out = rebalance_ivf_index(spark, idx_path, max_imbalance=4.0)
    print(
        "rebalance: skipped (healthy)" if out is None
        else f"rebalance: retrained {len(out)} lists"
    )

    # 5. PQ: 32x compression + IVF x PQ search with exact re-rank
    from dataslicer_spark.operators.pq import (
        ivf_pq_search,
        pq_encode,
        train_pq,
    )

    cb = train_pq(emb, m=8, k=64, seed=11)
    codes = pq_encode(emb, cb)
    assigned_codes = codes.join(assigned.select("vec_id", "list_id"), "vec_id")
    pq_hits = ivf_pq_search(
        centroids, assigned_codes, queries, cb, k=3, n_probe=4,
        rerank=emb, rerank_factor=8, include_self=False,
    )
    print(f"ivf-pq: {pq_hits.count()} re-ranked hits (codes are 8 B/vector)")

    # 6. near-duplicate audit via LSH-bucketed cosine candidates
    dups = embedding_near_dup(
        emb, "vec_id", "embedding", threshold=0.98, n_planes=6
    )
    print(f"near-dups at cos>=0.98: {dups.count()} pairs")

    # 7. kNN pseudo-labeling of an 'unlabeled' slice
    unlabeled = emb.filter(F.col("vec_id") % 20 == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    labeled = emb.filter(F.col("vec_id") % 20 != 7)
    labels = knn_classify(labeled, unlabeled, "label", k=5)
    print(f"knn: labeled {labels.count()} vectors")

    # 8. fixed-point k-means partitioning (integer-exact trajectory)
    from dataslicer_spark.operators.kmeans import kmeans

    clustered = kmeans(
        emb.select("vec_id", "embedding"), "vec_id", "embedding",
        k=8, n_iter=3,
    )
    print(f"kmeans: {clustered.select('cluster').distinct().count()} clusters")

    # 9. SemDeDup: within-cluster cosine near-dup pruning
    from dataslicer_spark.operators.dedup import semantic_dedup

    survivors, sem_pairs = semantic_dedup(
        emb.select("vec_id", "embedding"), threshold=0.35, k=8, n_iter=3
    )
    print(
        f"semdedup: kept {survivors.count()} vectors "
        f"({sem_pairs.count()} near-pairs inside clusters)"
    )

    # 10. MMR diversified retrieval: integer-dot top-20 candidates per
    #     query, then greedy 7*rel - 3*max-sim-to-selected picks 5 —
    #     the de-duplicating reranker (one pick per clone cluster)
    from dataslicer_spark.operators.similarity import (
        integer_dot_topn,
        mmr_rerank,
    )

    queries = emb.filter(F.col("vec_id") % 100 == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cand = integer_dot_topn(emb, queries, n=20)
    diversified = mmr_rerank(
        cand.join(emb.select("vec_id", "embedding"), "vec_id"), k=5
    )
    print(
        f"mmr: {diversified.count()} diversified picks for "
        f"{queries.count()} queries"
    )
    print("embedding analytics pipeline complete")


if __name__ == "__main__":
    main()
