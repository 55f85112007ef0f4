"""Product quantization (PQ) for billion-vector ANN at 100 TB scale.

Jégou, Douze, Schmid — "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011).  The reference has no vector search at all; the
engine's exact/IVF/LSH paths (operators/similarity.py) keep full float
vectors per row — 4·d bytes each.  PQ stores ``m`` one-byte codes
instead (d=64 → 256 B → 8 B, 32×), which is what makes an in-memory ANN
index possible when the corpus no longer fits as floats.

Scale design:

- **train** (:func:`train_pq`): per-subspace k-means codebooks fit
  driver-side on a bounded sample — the standard offline step (same
  policy as IVF's coarse quantizer).  Codebooks are ``m·k·(d/m)``
  floats — KBs — and ship to executors inside Arrow UDF closures.
- **encode** (:func:`pq_encode`): one ``mapInPandas`` pass, vectorized
  numpy argmin per subspace; map-only, composes with any partitioning.
- **search** (:func:`pq_search`): queries are collected (bounded, the
  cosine_topk broadcast contract) and each builds an ``m×k`` lookup
  table of partial squared distances — asymmetric distance computation
  (ADC): a candidate's score is ``m`` table lookups, no float vector is
  ever touched.  Per-partition top-k candidates → tiny global re-rank;
  optional exact re-rank against the float vectors joins only the
  ``rerank × |queries|`` surviving candidates.

Determinism: seeded sampling + fixed-iteration Lloyd's → codebooks are a
pure function of (data, seed); encode/search are then deterministic with
id tie-breaks.  No SQL oracle (k-means is not SQL-expressible) — recall
is property-tested against the exact brute-force operator, the policy
COVERAGE.md documents for engine-specific approximate paths.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..utils import check_col, local_df, spread
from .similarity import _kmeans_numpy


def train_pq(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 256,
    seed: int = 42,
    train_sample: int = 10_000,
) -> np.ndarray:
    """Fit PQ codebooks → array of shape ``(m, k', d/m)`` (``k' ≤ k``
    when the sample has fewer distinct points).

    ``m`` must divide the vector dimension; ``k ≤ 256`` keeps codes in
    one byte each.
    """
    check_col([vec_col], corpus)
    if k > 256:
        raise ValueError("k > 256 does not fit uint8 codes")
    # hash-ordered top-n: a DATA-deterministic, layout-independent sample
    # (plain limit() takes whatever partitions list first — different
    # file order or partitioning yields different codebooks, and a
    # source-clustered corpus would train on one region only)
    sample = (
        corpus.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col)))
        .limit(train_sample)
        .collect()
    )
    if not sample:
        raise ValueError("train_pq: empty corpus")
    M = np.array([np.asarray(r[0], dtype=np.float64) for r in sample])
    d = M.shape[1]
    if d % m != 0:
        raise ValueError(f"m={m} must divide dim={d}")
    ds = d // m
    books = []
    for j in range(m):
        sub = np.ascontiguousarray(M[:, j * ds : (j + 1) * ds])
        books.append(_kmeans_numpy(sub.copy(), k, seed + j))
    kk = min(len(b) for b in books)
    return np.stack([b[:kk] for b in books])


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Encode each vector as ``m`` codebook indices (map-only pass).

    Output: ``id_col`` + ``out_col`` (array<int>, length m) — the 32×
    smaller representation :func:`pq_search` scans.
    """
    check_col([id_col, vec_col], df)
    cb = np.asarray(codebooks, dtype=np.float64)
    m, k, ds = cb.shape

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                sub = X[:, j * ds : (j + 1) * ds]
                # ||x - c||² = ||x||² - 2x·c + ||c||²; x² constant per row
                d2 = (
                    -2.0 * sub @ cb[j].T
                    + (cb[j] ** 2).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"__id": pdf[id_col].to_numpy(), "__code": list(codes)}
            )

    schema = f"__id long, __code array<int>"
    # spread below the kernel (guide §2.5): map-only encode runs at
    # the input's partitioning; guarded no-op on wide inputs
    out = spread(df.select(id_col, vec_col)).mapInPandas(encode, schema)
    return out.select(
        F.col("__id").alias(id_col), F.col("__code").alias(out_col)
    )


def pq_search(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    rerank: DataFrame | None = None,
    rerank_vec: str = "embedding",
    rerank_factor: int = 4,
    include_self: bool = True,
    list_col: str | None = None,
    query_lists: dict | None = None,
) -> DataFrame:
    """ADC top-k over PQ codes for every query.

    ``list_col``/``query_lists`` (used by :func:`ivf_pq_search`): when
    set, ``codes`` carries an inverted-list id and each query is scored
    ONLY against rows whose list is in its own ``query_lists[qid]`` set —
    the per-query probe constraint that keeps IVF×PQ at
    ``n_probe/n_lists`` of the corpus per query.

    ADC ranks by squared **L2** distance (the PQ-native metric).  For
    cosine semantics, L2-normalize vectors before ``train_pq`` /
    ``pq_encode`` and normalize queries here — on the unit sphere
    ``‖x−q‖² = 2 − 2·cos`` so the orderings coincide.

    Queries are collected to the driver (bounded — the same contract as
    cosine_topk's broadcast side) and compiled into per-query ``m×k``
    distance tables; executors score candidates with ``m`` table lookups
    per row and keep a per-partition top heap, so only
    ``partitions × k'`` candidate rows reach the final per-query window.

    With ``rerank`` (a DataFrame carrying the original float vectors),
    the top ``rerank_factor × k`` ADC candidates are re-scored exactly
    (cosine) and the final ranking uses true similarity — the standard
    PQ + re-rank recipe.  Output: ``query_id, vec_id, rank`` (+
    ``adc_dist2`` without re-rank, ``cos_sim`` with).
    """
    check_col([id_col, code_col] + ([list_col] if list_col else []), codes)
    check_col([query_id, query_vec], queries)
    cb = np.asarray(codebooks, dtype=np.float64)
    m, kk, ds = cb.shape
    vid_type = codes.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[query_id].dataType.simpleString()
    qrows = queries.select(query_id, query_vec).collect()
    if not qrows:
        score_col = "cos_sim" if rerank is not None else "adc_dist2"
        return codes.sparkSession.createDataFrame(
            [],
            f"{query_id} {qid_type}, {id_col} {vid_type}, rank int, "
            f"{score_col} double",
        )
    qids = np.array([r[0] for r in qrows])
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
    # LUT[q, j, c] = || Q[q] subvector j − codebook[j][c] ||²
    luts = np.empty((len(Q), m, kk))
    for j in range(m):
        sub = Q[:, j * ds : (j + 1) * ds]
        luts[:, j, :] = (
            (sub[:, None, :] - cb[j][None, :, :]) ** 2
        ).sum(axis=2)
    n_keep = k * rerank_factor if rerank is not None else k
    allowed = None
    if list_col is not None and query_lists is not None:
        allowed = [
            np.array(sorted(query_lists.get(q, ())), dtype=np.int64)
            for q in qids
        ]

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per Arrow batch and query: argpartition keeps only the n_keep
        # best — the shuffle receives O(batches · queries · n_keep) rows,
        # never the corpus
        frames = []
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array(list(pdf[code_col]), dtype=np.int64)  # B×m
            ids = pdf[id_col].to_numpy()
            lists = (
                pdf[list_col].to_numpy(dtype=np.int64)
                if allowed is not None
                else None
            )
            for qi in range(len(Q)):
                Cq, idq = C, ids
                if allowed is not None:
                    # per-query probe constraint: score only this query's
                    # own n_probe lists, not the batch's union
                    mask = np.isin(lists, allowed[qi])
                    if not mask.any():
                        continue
                    Cq, idq = C[mask], ids[mask]
                # gather: sum over subspaces of LUT[qi, j, Cq[:, j]]
                d2 = luts[qi][np.arange(m)[None, :], Cq].sum(axis=1)
                take = min(n_keep, len(d2))
                idx = np.argpartition(d2, take - 1)[:take]
                frames.append(
                    pd.DataFrame(
                        {
                            "__qid": qids[qi],
                            "__vid": idq[idx],
                            "__d2": d2[idx],
                        }
                    )
                )
        if frames:
            yield pd.concat(frames, ignore_index=True)

    score_cols = [id_col, code_col] + ([list_col] if allowed is not None else [])
    # spread below the kernel (guide §2.5); guarded no-op on wide inputs
    part = spread(codes.select(*score_cols)).mapInPandas(
        score, f"__qid {qid_type}, __vid {vid_type}, __d2 double"
    )
    if not include_self:
        # queries drawn from the corpus: drop the trivial self match
        # (cosine_topk's include_self=False contract)
        part = part.filter(F.col("__vid") != F.col("__qid"))
    w = Window.partitionBy("__qid").orderBy(
        F.col("__d2").asc(), F.col("__vid").asc()
    )
    top = part.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= n_keep
    )
    if rerank is None:
        return top.select(
            F.col("__qid").alias(query_id),
            F.col("__vid").alias(id_col),
            "rank",
            F.col("__d2").alias("adc_dist2"),
        )
    # exact re-rank of the surviving candidates (tiny join surface)
    check_col([id_col, rerank_vec], rerank)
    qdf = local_df(
        codes.sparkSession,
        [(q, [float(x) for x in v]) for q, v in zip(qids.tolist(), Q)],
        f"{query_id} {qid_type}, __qv array<double>",
    )
    cand = (
        top.select(F.col("__qid").alias(query_id), F.col("__vid").alias(id_col))
        .join(rerank.select(id_col, rerank_vec), id_col)
        .join(F.broadcast(qdf), query_id)
    )
    v = F.col(rerank_vec).cast("array<double>")
    dot = F.aggregate(
        F.zip_with(v, F.col("__qv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
        )
    )
    nq = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("__qv"), F.col("__qv"), lambda a, b: a * b),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    scored = cand.withColumn("cos_sim", dot / (nv * nq))
    w2 = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "rank", "cos_sim")
    )


def ivf_pq_search(
    centroids: np.ndarray,
    assigned_codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    rerank: DataFrame | None = None,
    rerank_vec: str = "embedding",
    rerank_factor: int = 4,
    include_self: bool = True,
) -> DataFrame:
    """IVF × PQ — the billion-scale composition (FAISS's IVFADC layout):
    probe the ``n_probe`` nearest coarse lists per query, then ADC-score
    ONLY the PQ codes inside the probed lists.

    ``assigned_codes`` carries ``(id_col, code_col, list_id)`` — join
    :func:`pq_encode`'s output with ``build_ivf_index``'s assignment (or
    persist it list-partitioned like save_ivf_index, in which case the
    ``isin`` filter prunes partitions at scan time).  Cost per query:
    ``n_probe/n_lists`` of the corpus, at ``m`` byte-lookups per
    candidate — neither full floats nor unprobed lists are ever read.
    """
    check_col([id_col, code_col, "list_id"], assigned_codes)
    check_col([query_id, query_vec], queries)
    cents = np.asarray(centroids, dtype=np.float64)
    n_probe = min(n_probe, len(cents))
    qrows = queries.select(query_id, query_vec).collect()
    if not qrows:
        score_col = "cos_sim" if rerank is not None else "adc_dist2"
        qid_type = queries.schema[query_id].dataType.simpleString()
        vid_type = assigned_codes.schema[id_col].dataType.simpleString()
        return assigned_codes.sparkSession.createDataFrame(
            [],
            f"{query_id} {qid_type}, {id_col} {vid_type}, rank int, "
            f"{score_col} double",
        )
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
    d2c = ((Q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(d2c, axis=1)[:, :n_probe]
    # scan prune: the union of probed lists (partition pruning on a
    # list-partitioned index); the PER-QUERY constraint is enforced
    # inside pq_search via query_lists — without it every query would
    # score the whole union, degrading to brute-force ADC as the query
    # batch grows
    query_lists = {
        r[0]: {int(x) for x in probe[i]} for i, r in enumerate(qrows)
    }
    probed = sorted({int(x) for x in probe.ravel()})
    pruned = assigned_codes.filter(F.col("list_id").isin(probed))
    return pq_search(
        pruned,
        queries,
        codebooks,
        k=k,
        id_col=id_col,
        code_col=code_col,
        query_id=query_id,
        query_vec=query_vec,
        rerank=rerank,
        rerank_vec=rerank_vec,
        rerank_factor=rerank_factor,
        include_self=include_self,
        list_col="list_id",
        query_lists=query_lists,
    )


def save_pq_index(
    codebooks: np.ndarray, codes: DataFrame, path: str
) -> None:
    """Persist a PQ index: the trained codebooks as a (subspace, code,
    centroid) table plus the uint8-code corpus — the build-once /
    search-many shape (mirrors ``similarity.save_ivf_index``).  The
    codes table is ~32× smaller than the raw vectors, so a later search
    job scans megabytes where the corpus was gigabytes."""
    spark = codes.sparkSession
    cb = np.asarray(codebooks, dtype=np.float64)
    m, k, _ds = cb.shape
    rows = [
        (j, c, [float(x) for x in cb[j, c]])
        for j in range(m)
        for c in range(k)
    ]
    local_df(
        spark, rows, "subspace int, code int, centroid array<double>"
    ).write.mode("overwrite").parquet(f"{path}/codebooks")
    codes.write.mode("overwrite").parquet(f"{path}/codes")


def load_pq_index(spark, path: str) -> tuple[np.ndarray, DataFrame]:
    """Load ``(codebooks, codes)`` written by :func:`save_pq_index`."""
    rows = spark.read.parquet(f"{path}/codebooks").collect()
    m = 1 + max(r.subspace for r in rows)
    k = 1 + max(r.code for r in rows)
    ds = len(rows[0].centroid)
    cb = np.empty((m, k, ds), dtype=np.float64)
    for r in rows:
        cb[r.subspace, r.code] = r.centroid
    return cb, spark.read.parquet(f"{path}/codes")
