"""Distributed k-means over an embedding column — engine-deterministic by
construction, so the full iterative trajectory carries a SQL oracle.

The reference has no clustering beyond DBSCAN (cluster.py); k-means is
part of the LLM-data-pipeline extension: coarse semantic partitioning of
an embedding corpus for curation — the clustering stage of SemDeDup
(Abbas et al., arXiv:2303.09540) and the coarse quantizer family used by
IVF ANN indexes.

Why fixed-point: classic float k-means is not reproducible across
engines (float mean is order-dependent), so no external oracle can
replay it.  Here every quantity is an int64:

- coordinates quantize ONCE to ``floor(x · 2^fp_bits)``;
- distances are integer squared-L2 sums (``Σ (x_i − c_i)²``);
- centroid updates are exact integer floor-division means
  (``(s − mod(s, n)) / n`` with a non-negative mod, portable across
  Python / Spark / DuckDB division semantics);
- ties in the argmin break to the smallest cluster id.

Every iteration's state is therefore exactly representable and the whole
trajectory — init, n_iter updates, final assignment — is replayed bit
for bit by the chained-CTE DuckDB oracle (plans/extension_queries.py).

Scale design:

- the corpus never shuffles for assignment: centroids inline as k×d
  literals, the argmin is a ``least``-of-structs over JVM ``zip_with``/
  ``aggregate`` expressions (whole-stage codegen, no Python);
- the update shuffles only partial sums: ``posexplode`` to
  (cluster, dim, val) feeds a hash aggregate whose map-side combine
  reduces each partition to ≤ k·d rows before the exchange — the wire
  carries ``partitions · k · d`` cells, never ``n · d``;
- the driver holds k·d ints per iteration (microscopic), exactly like
  MLlib's Lloyd's loop;
- one job per iteration re-reads the source: cache the projected
  vectors upstream for iterative sessions, or accept n_iter scans (at
  100 TB the update aggregates are the cost, not the scan).

Overflow bounds: |x| ≤ 2 and fp_bits = 20 give |X| ≤ 2²¹, squared
diffs ≤ 2⁴⁴, and d = 64 sums ≤ 2⁵⁰ — inside int64 with headroom.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import check_col, spread

FP_BITS_DEFAULT = 20


def quantize_expr(vec_col: str, fp_bits: int = FP_BITS_DEFAULT) -> Column:
    """``array<long>`` of ``floor(x · 2^fp_bits)`` — the one lossy step;
    everything downstream is exact integer math."""
    scale = float(1 << fp_bits)
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"),
    )


def _best_cluster(xq: Column, centroids: list[list[int]]) -> Column:
    """struct(d2, cluster) of the nearest centroid — integer squared L2,
    ties to the smallest cluster id (struct comparison does both)."""
    cands = []
    for j, cent in enumerate(centroids):
        carr = F.array(*[F.lit(int(v)) for v in cent])
        d2 = F.aggregate(
            F.zip_with(xq, carr, lambda x, c: (x - c) * (x - c)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        # named_struct, not struct(alias): `least` strips struct-field
        # aliases down to col1/col2
        cands.append(
            F.named_struct(
                F.lit("d2"), d2, F.lit("cluster"), F.lit(j)
            )
        )
    return cands[0] if len(cands) == 1 else F.least(*cands)


def init_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    fp_bits: int = FP_BITS_DEFAULT,
) -> list[list[int]]:
    """Deterministic pseudo-random seeds: the k rows with the smallest
    ``md5(cast(id as string))`` (hash order decorrelates from ingest
    order; ties break on the id).  A bounded k-row collect."""
    check_col([id_col, vec_col], df)
    rows = (
        df.filter(F.col(vec_col).isNotNull())
        .select(
            quantize_expr(vec_col, fp_bits).alias("__xq"),
            F.md5(F.col(id_col).cast("string")).alias("__h"),
            F.col(id_col).alias("__id"),
        )
        .orderBy("__h", "__id")
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("cannot initialize k-means on an empty frame")
    return [list(r["__xq"]) for r in rows]


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 3,
    fp_bits: int = FP_BITS_DEFAULT,
) -> list[list[int]]:
    """Lloyd's iterations; returns the final centroids (k×d ints in the
    ``fp_bits`` scale).  Empty clusters keep their previous centroid
    (mirrored by the oracle's UNION ALL branch)."""
    check_col([id_col, vec_col], df)
    # persist the projected vectors across iterations — n_iter jobs read
    # this one column instead of re-scanning the source each pass.
    # spread first (guide §2.5): the per-iteration Arrow kernel runs at
    # this frame's partitioning, and a one-row-group scan is one task —
    # guarded no-op on already-wide inputs
    src = spread(
        df.select(F.col(vec_col).alias("__v")).filter(F.col("__v").isNotNull())
    ).persist()
    try:
        return _fit_loop(src, df, id_col, vec_col, k, n_iter, fp_bits)
    finally:
        src.unpersist()


def _fit_loop(src, df, id_col, vec_col, k, n_iter, fp_bits):
    centroids = init_centroids(df, id_col, vec_col, k, fp_bits)
    dim = len(centroids[0])
    scale = float(1 << fp_bits)
    spark = df.sparkSession
    # (chunk × k × dim) int64 distance temporary bounded to ~16 MB
    chunk_rows = max(1, 2_000_000 // max(k * dim, 1))

    for _ in range(n_iter):
        # Arrow kernel, not a JVM HOF argmin: higher-order functions are
        # CodegenFallback (interpreted), and a k×d literal expression is
        # re-parsed and re-evaluated per exploded row — measured ~8 s per
        # iteration at 2k×64; this kernel runs the identical integer math
        # (floor-quantize, int64 squared L2, first-min tie-break) in
        # vectorized numpy and reduces each PARTITION to k·d partial
        # cells before anything shuffles
        bc = spark.sparkContext.broadcast(
            np.asarray(centroids, dtype=np.int64)
        )

        def partial_stats(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            C = bc.value
            sums = np.zeros((len(C), dim), dtype=np.int64)
            counts = np.zeros(len(C), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.floor(
                    np.stack(pdf["__v"].to_numpy()).astype(np.float64)
                    * scale
                ).astype(np.int64)
                for lo in range(0, len(X), chunk_rows):
                    xb = X[lo : lo + chunk_rows]
                    d2 = ((xb[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                    assign = d2.argmin(axis=1)  # first min = smallest id
                    for j in np.unique(assign):
                        sel = xb[assign == j]
                        sums[j] += sel.sum(axis=0)
                        counts[j] += len(sel)
            nz = np.nonzero(counts)[0]
            if len(nz):
                yield pd.DataFrame(
                    {
                        "cluster": np.repeat(nz, dim).astype(np.int32),
                        "dim": np.tile(np.arange(dim, dtype=np.int32), len(nz)),
                        "s": sums[nz].reshape(-1),
                        "n": np.repeat(counts[nz], dim),
                    }
                )

        stats = (
            src.mapInPandas(
                partial_stats, "cluster int, dim int, s long, n long"
            )
            .groupBy("cluster", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        bc.unpersist()
        new = [list(c) for c in centroids]  # empty clusters keep position
        for r in stats:
            s, n = int(r["s"]), int(r["n"])
            new[r["cluster"]][r["dim"]] = (s - ((s % n) + n) % n) // n
        centroids = new
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[int]],
    vec_col: str,
    fp_bits: int = FP_BITS_DEFAULT,
    cluster_col: str = "cluster",
    dist_col: str = "d2",
) -> DataFrame:
    """Attach (cluster, d2) for fixed centroids — a map-only plan (the
    centroid table rides in the expression as literals; no join, no
    shuffle, no Python).

    Two physical strategies, same integer math, bit-identical output:

    - small ``k·d`` (≤ 512): the centroid table inlines as literals in a
      ``least``-of-structs expression — zero Python, fine while the
      expression stays small;
    - large ``k·d``: an Arrow ``mapInPandas`` kernel (still map-only —
      centroids ride a broadcast, the corpus never shuffles).  The HOF
      literal expression is CodegenFallback (interpreted) and its cost
      is n·k·d PER ROW re-evaluation — at k=32,d=64 it was the
      superlinear term in the semantic-dedup scale probe and the IVF
      build path; vectorized numpy runs the identical floor-quantize /
      int64 squared-L2 / first-min math in chunked batches."""
    check_col(vec_col, df)
    # spread below the assignment work (guide §2.5): both strategies are
    # map-only and run at the input's partitioning — one task on a
    # one-row-group scan; guarded no-op when the input is already wide
    # or shuffle-rooted
    df = spread(df)
    k, dim = len(centroids), len(centroids[0])
    if k * dim <= 512:
        best = _best_cluster(quantize_expr(vec_col, fp_bits), centroids)
        # non-finite elements must yield null cluster/d2 (matching the
        # Arrow kernel's isfinite screen): without this, non-ANSI
        # CAST(floor(NaN*scale) AS LONG) silently becomes 0, producing an
        # arbitrary assignment instead of null
        finite = F.forall(
            F.col(vec_col),
            lambda x: x.isNotNull()
            & ~F.isnan(x.cast("double"))
            & (F.abs(x.cast("double")) != F.lit(float("inf"))),
        )
        best = F.when(finite, best)
        return df.withColumn("__b", best).select(
            "*",
            F.col("__b")["cluster"].alias(cluster_col),
            F.col("__b")["d2"].alias(dist_col),
        ).drop("__b")

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.int64))
    scale = float(1 << fp_bits)
    # (chunk × k × dim) int64 distance temporary bounded to ~16 MB,
    # matching _fit_loop
    chunk_rows = max(1, 2_000_000 // max(k * dim, 1))
    in_fields = list(df.schema.fields)
    out_schema = StructType(
        in_fields
        + [
            StructField(cluster_col, IntegerType(), True),
            StructField(dist_col, LongType(), True),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        for pdf in batches:
            pdf = pdf.copy()
            if not len(pdf):
                pdf[cluster_col] = pd.Series([], dtype="Int32")
                pdf[dist_col] = pd.Series([], dtype="Int64")
                yield pdf
                continue
            vecs = pdf[vec_col]
            # reject null / wrong-length / non-finite vectors: a NaN or
            # inf element would make floor(x*scale).astype(int64)
            # undefined (typically INT64_MIN) where the literal HOF path
            # propagates null — screen them out so they get null
            # cluster/d2 like that path
            ok = vecs.map(
                lambda v: v is not None
                and len(v) == dim
                and bool(np.isfinite(np.asarray(v, dtype=np.float64)).all())
            ).to_numpy()
            cl = np.full(len(pdf), -1, dtype=np.int64)
            d2o = np.zeros(len(pdf), dtype=np.int64)
            if ok.any():
                X = np.floor(
                    np.stack(vecs[ok].to_numpy()).astype(np.float64) * scale
                ).astype(np.int64)
                bi = np.empty(len(X), dtype=np.int64)
                bd = np.empty(len(X), dtype=np.int64)
                for lo in range(0, len(X), chunk_rows):
                    xb = X[lo : lo + chunk_rows]
                    d2 = ((xb[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                    bi[lo : lo + len(xb)] = d2.argmin(axis=1)  # first min
                    bd[lo : lo + len(xb)] = d2.min(axis=1)
                cl[ok] = bi
                d2o[ok] = bd
            pdf[cluster_col] = pd.array(
                [int(c) if c >= 0 else None for c in cl], dtype="Int32"
            )
            pdf[dist_col] = pd.array(
                [int(d) if c >= 0 else None for c, d in zip(cl, d2o)],
                dtype="Int64",
            )
            yield pdf

    return df.mapInPandas(assign, out_schema)


def kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 3,
    fp_bits: int = FP_BITS_DEFAULT,
) -> DataFrame:
    """fit + final assignment: (input columns…, cluster, d2)."""
    centroids = kmeans_fit(df, id_col, vec_col, k, n_iter, fp_bits)
    return kmeans_assign(df, centroids, vec_col, fp_bits)


__all__ = [
    "FP_BITS_DEFAULT",
    "quantize_expr",
    "init_centroids",
    "kmeans_fit",
    "kmeans_assign",
    "kmeans",
]
