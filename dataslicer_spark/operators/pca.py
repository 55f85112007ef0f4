"""Distributed PCA over an embedding column.

The reference has no dimensionality reduction; this is part of the
LLM-data-pipeline extension (embedding analytics: PCA whitening /
compression before clustering or ANN indexing).

Scale design — the only thing that crosses the wire is d×d, never n×d:

1. :func:`embedding_gram` computes the second-moment (Gram) matrix with a
   ``mapInPandas`` kernel that reduces each PARTITION to one upper-triangle
   accumulator (d(d+1)/2 int64 cells) before anything shuffles; the final
   ``groupBy(i, j)`` merges #partitions tiny frames.  Entries are
   fixed-point ``Σ floor(x_i·x_j·2^fp)`` int64 sums — exact, order- and
   partitioning-independent, and bit-identical to the DuckDB oracle's
   UNNEST construction (same per-element floor, integer sum).
2. :func:`pca_fit` adds first moments + count the same way, assembles the
   covariance on the driver (a d×d numpy object — microscopic), and
   eigendecomposes there.  n never appears in driver memory.
3. :func:`pca_project` applies the k×d component matrix as built-in
   ``zip_with``/``aggregate`` expressions — JVM codegen, no Python in the
   projection path.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import check_col, spread

FP_BITS_DEFAULT = 30


def _gram_kernel(
    vec_col: str, dim: int, fp_bits: int, with_first_moments: bool
):
    scale = float(1 << fp_bits)
    iu, ju = np.triu_indices(dim)
    # row-chunk so the b×d×d outer-product tensor stays ~16 MB
    chunk_rows = max(1, 2_000_000 // max(dim * dim, 1))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(len(iu), dtype=np.int64)
        first = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if X.ndim != 2 or X.shape[1] != dim:
                raise ValueError(
                    f"expected {dim}-dim vectors, got shape {X.shape}"
                )
            for s in range(0, len(X), chunk_rows):
                c = X[s : s + chunk_rows]
                P = np.einsum("bi,bj->bij", c, c)
                acc += (
                    np.floor(P[:, iu, ju] * scale).astype(np.int64).sum(axis=0)
                )
                if with_first_moments:
                    first += (
                        np.floor(c * scale).astype(np.int64).sum(axis=0)
                    )
            n += len(X)
        if n == 0:
            return
        out = pd.DataFrame(
            {
                "i": (iu + 1).astype(np.int32),
                "j": (ju + 1).astype(np.int32),
                "s_fp": acc,
                "n": np.int64(n),
            }
        )
        if with_first_moments:
            fm = pd.DataFrame(
                {
                    "i": np.arange(1, dim + 1, dtype=np.int32),
                    "j": np.zeros(dim, dtype=np.int32),
                    "s_fp": first,
                    "n": np.int64(n),
                }
            )
            out = pd.concat([out, fm], ignore_index=True)
        yield out

    return run


def embedding_gram(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    fp_bits: int = FP_BITS_DEFAULT,
) -> DataFrame:
    """Upper-triangle second-moment matrix of ``vec_col``:
    one row per ``1 ≤ i ≤ j ≤ dim`` with
    ``s_fp = Σ_rows floor(x_i · x_j · 2^fp_bits)`` (exact int64).

    Each partition ships d(d+1)/2 cells; the shuffle is O(#partitions·d²)
    regardless of row count.
    """
    check_col([vec_col], df)
    # spread below the kernel (guide §2.5): the per-partition moment
    # kernel runs at the input's partitioning; guarded no-op on wide
    # inputs
    part = spread(df.select(vec_col)).mapInPandas(
        _gram_kernel(vec_col, dim, fp_bits, with_first_moments=False),
        "i int, j int, s_fp long, n long",
    )
    return part.groupBy("i", "j").agg(F.sum("s_fp").alias("s_fp"))


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 4,
    fp_bits: int = FP_BITS_DEFAULT,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA: returns ``(components k×d, eigenvalues k, mean d)``.

    Moments reduce distributively (see module docstring); the driver sees
    only the d×d triangle + d first moments + a count, then runs
    ``numpy.linalg.eigh`` on the d×d covariance.  Components have a
    deterministic sign (largest-|coefficient| entry made positive).
    """
    check_col([vec_col], df)
    # spread below the kernel (guide §2.5): the per-partition moment
    # kernel runs at the input's partitioning; guarded no-op on wide
    # inputs
    part = spread(df.select(vec_col)).mapInPandas(
        _gram_kernel(vec_col, dim, fp_bits, with_first_moments=True),
        "i int, j int, s_fp long, n long",
    )
    rows = (
        part.groupBy("i", "j")
        .agg(F.sum("s_fp").alias("s_fp"), F.sum("n").alias("n"))
        .collect()
    )
    if not rows:
        raise ValueError("pca_fit: empty input")
    scale = float(1 << fp_bits)
    S = np.zeros((dim, dim))
    first = np.zeros(dim)
    for r in rows:
        if r["j"] == 0:
            first[r["i"] - 1] = r["s_fp"] / scale
        else:
            S[r["i"] - 1, r["j"] - 1] = r["s_fp"] / scale
            S[r["j"] - 1, r["i"] - 1] = r["s_fp"] / scale
    # every output row of one partition carries that partition's count, so
    # the grouped sum makes every cell's n the global row count
    n = int(rows[0]["n"])
    if n < 2:
        raise ValueError(f"pca_fit: need ≥2 rows, got {n}")
    mean = first / n
    cov = (S - n * np.outer(mean, mean)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k×d
    # deterministic sign: flip so the largest-|coeff| entry is positive
    for c in comps:
        idx = int(np.argmax(np.abs(c)))
        if c[idx] < 0:
            c *= -1.0
    return comps, vals[order], mean


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray | None = None,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project ``vec_col`` onto fitted components — pure built-in
    expressions (``zip_with`` + ``aggregate``), whole-stage codegen, no
    Python workers in the projection path.

    Output: input columns + ``out_col`` (array<double>, length k).
    """
    check_col([vec_col], df)
    comps = np.asarray(components, dtype=np.float64)
    mu = (
        np.zeros(comps.shape[1])
        if mean is None
        else np.asarray(mean, dtype=np.float64)
    )

    def dot(weights: Sequence[float], offset: float) -> F.Column:
        warr = F.array(*[F.lit(float(w)) for w in weights])
        prod = F.zip_with(
            F.col(vec_col).cast("array<double>"), warr, lambda a, b: a * b
        )
        return (
            F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
            - F.lit(float(offset))
        )

    projections = [dot(c, float(c @ mu)) for c in comps]
    return df.withColumn(out_col, F.array(*projections))
