"""Approximate-nearest-neighbor similarity search over embedding columns
(north-star extension per BASELINE.json).

Two tiers:

- :func:`cosine_topk` — exact brute-force top-k (broadcast the query set,
  scan the corpus once, per-query ``row_number`` ≤ k).  The correctness
  baseline, and the right plan whenever |queries| is small: the corpus
  never shuffles, one pass, no index build.
- :func:`hyperplane_lsh_topk` — random-hyperplane (sign) LSH: corpus and
  queries hash to sign-pattern buckets; candidates come from bucket
  equi-joins (optionally multi-probe over single-bit flips), then exact
  cosine re-ranks.  The 100 TB path: the corpus shuffles once at index
  build, queries touch only matching buckets.

All cosines use the fixed-point dot product (order-independent integer
sums) so results are deterministic across partitionings and engines.

Constructions from the public literature: sign-random-projection LSH
(Charikar, STOC 2002), IVF coarse quantization + inverted-list probing
(Sivic/Zisserman "Video Google" 2003; the IVF stage of Jégou et al.'s
IVFADC, TPAMI 2011), distributed top-k pruning shapes per REPOSE
(ICDE 2021, PAPERS.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import DoubleType, StructField, StructType

from ..utils import check_col, local_df, spread
from .dedup import fp_dot


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def add_hyperplane_bucket(
    df: DataFrame,
    vec_col: str,
    n_planes: int = 12,
    seed: int = 42,
    dim: int | None = None,
    out_col: str = "bucket",
) -> DataFrame:
    """Sign-pattern LSH bucket id: bit i = (v · plane_i) ≥ 0.

    Planes are generated driver-side from a fixed seed (deterministic) and
    inlined as literals — they are tiny (n_planes × dim doubles).
    """
    check_col(vec_col, df)
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = (fp_dot(F.col(vec_col), p) >= 0).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return df.withColumn(out_col, bucket)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (brute force baseline).

    Output: (query_id, rank, vec_id, cosine) — deterministic ties
    (cosine desc, corpus id asc).
    """
    check_col([corpus_id, corpus_vec], corpus)
    check_col([query_id, query_vec], queries)
    # spread the corpus side (guide §2.5): the per-pair fixed-point dot
    # runs at the corpus scan's partitioning — one task on a
    # one-row-group table; guarded no-op on wide inputs
    c = spread(corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("__cv"),
        F.sqrt(fp_dot(F.col(corpus_vec), F.col(corpus_vec))).alias("__cn"),
    ))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv"),
        F.sqrt(fp_dot(F.col(query_vec), F.col(query_vec))).alias("__qn"),
    )
    joined = c.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.filter(F.col("vec_id") != F.col("query_id"))
    scored = joined.withColumn(
        "cosine",
        F.try_divide(fp_dot(F.col("__cv"), F.col("__qv")), F.col("__cn") * F.col("__qn")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def mutual_nn(
    a: DataFrame,
    b: DataFrame,
    a_id: str = "vec_id",
    b_id: str = "vec_id",
    a_vec: str = "embedding",
    b_vec: str = "embedding",
) -> DataFrame:
    """Mutual nearest neighbors between two vector sets — the standard
    embedding-space alignment primitive (bitext mining, cross-snapshot
    entity matching, teacher/student pairing): emit (a, b) exactly when
    b is a's top-1 cosine match in B AND a is b's top-1 in A.  Mutuality
    is the classic precision filter — one-directional best matches pair
    every row, mutual ones only the genuinely aligned.

    Exact brute force via :func:`cosine_topk` in both directions (ties
    broken by id, so the result is engine-deterministic and the DuckDB
    twin replays it).  Each direction broadcasts its query set over a
    corpus scan — use on blocked/bucketed subsets at scale, or feed
    IVF/LSH candidate lists (:func:`ivf_topk`) for the full-corpus case.

    Output: ``(a_id, b_id, cosine)``.
    """
    ab = cosine_topk(
        b,
        a.select(F.col(a_id).alias("query_id"), F.col(a_vec).alias("embedding")),
        k=1,
        corpus_id=b_id,
        corpus_vec=b_vec,
        include_self=True,
    ).select(
        F.col("query_id").alias("a_id"),
        F.col("vec_id").alias("b_id"),
        "cosine",
    )
    ba = cosine_topk(
        a,
        b.select(F.col(b_id).alias("query_id"), F.col(b_vec).alias("embedding")),
        k=1,
        corpus_id=a_id,
        corpus_vec=a_vec,
        include_self=True,
    ).select(
        F.col("vec_id").alias("a_id"),
        F.col("query_id").alias("b_id"),
    )
    return ab.join(ba, ["a_id", "b_id"]).select("a_id", "b_id", "cosine")


def cosine_topk_batched(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    include_self: bool = False,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact top-k cosine neighbors via an Arrow-batched matrix kernel
    with **map-side partial top-k** — same results as :func:`cosine_topk`
    (bit-identical: the kernel runs :func:`fp_dot`'s fixed-point recipe,
    ``floor(x·y·2^30)`` int64 sums, in numpy doubles — identical IEEE
    ops), different physical plan:

    - the query batch is a Spark **broadcast variable** (a numpy matrix,
      not a join side), so there is no nc×nq joined relation at all;
    - each corpus partition emits at most ``|queries|·k`` candidate rows
      (its local top-k per query), so the final ranking window shuffles
      ``partitions·nq·k`` rows instead of ``nc·nq`` scored pairs — the
      difference between a bounded merge and an all-pairs shuffle at
      100 TB;
    - ``carry_cols`` pass corpus attributes (e.g. a label) through the
      kernel, eliminating the nn→corpus re-join a consumer like
      :func:`knn_classify` would otherwise need.

    The corpus never shuffles and is streamed batch-at-a-time; kernel
    temporaries are row-chunked to a fixed byte budget regardless of
    Arrow batch size.  Queries are collected driver-side — they are the
    small/broadcast side by contract, exactly as :func:`cosine_topk`
    broadcasts them.  NULL-vector rows are dropped on BOTH sides
    (corpus rows: the HOF path scores them NULL, ranking last —
    identical results at ≥k real candidates; query rows: a NULL query
    produces no output rows here, where the HOF path emits k
    all-NULL-cosine neighbors for it — filter or handle NULL query
    vectors upstream if one-row-per-query matters).

    Output: (query_id, rank, vec_id, cosine, *carry_cols).
    """
    check_col([corpus_id, corpus_vec, *carry_cols], corpus)
    check_col([query_id, query_vec], queries)
    reserved = {"query_id", "vec_id", "cosine", "rank", "__s"}
    bad = reserved.intersection(carry_cols)
    if bad:
        raise ValueError(f"carry_cols collide with output columns: {sorted(bad)}")
    spark = corpus.sparkSession
    m = float(2**30)

    qrows = queries.select(query_id, query_vec).collect()
    qrows = [r for r in qrows if r[1] is not None]
    out_fields = [
        StructField("query_id", queries.schema[query_id].dataType),
        StructField("vec_id", corpus.schema[corpus_id].dataType),
        StructField("cosine", DoubleType()),
        *[StructField(c, corpus.schema[c].dataType) for c in carry_cols],
    ]
    out_schema = StructType(out_fields)
    # spread below the kernel (guide §2.5): the batched top-k kernel
    # runs at the corpus scan's partitioning — one task on a
    # one-row-group table; guarded no-op on wide/shuffle-rooted inputs
    src = spread(corpus.select(corpus_id, corpus_vec, *carry_cols))
    if not qrows:
        return (
            spark.createDataFrame([], out_schema)
            .withColumn("rank", F.lit(1))
            .select("query_id", "rank", "vec_id", "cosine", *carry_cols)
        )

    qids = [r[0] for r in qrows]
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qn = np.sqrt(np.floor(Q * Q * m).astype(np.int64).sum(axis=1) / m)
    bc = spark.sparkContext.broadcast((qids, Q, qn))

    nq, dim = Q.shape
    # row-chunk the (chunk × nq × dim) scoring temporary to ~128 MB
    chunk_rows = max(1, 16_000_000 // max(nq * dim, 1))

    def kernel(it):
        qids_l, Qm, qn_l = bc.value
        qarr = np.asarray(qids_l, dtype=object)
        for pdf in it:
            vecs = pdf.iloc[:, 1]
            ok = vecs.notna().to_numpy()
            pdf = pdf.iloc[ok]
            if len(pdf) == 0:
                continue
            C = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            cids = pdf.iloc[:, 0].to_numpy()
            cn = np.sqrt(np.floor(C * C * m).astype(np.int64).sum(axis=1) / m)
            outs = []
            for lo in range(0, len(C), chunk_rows):
                hi = min(lo + chunk_rows, len(C))
                dots = (
                    np.floor(C[lo:hi, None, :] * Qm[None, :, :] * m)
                    .astype(np.int64)
                    .sum(axis=2)
                    .astype(np.float64)
                    / m
                )
                denom = cn[lo:hi, None] * qn_l[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dots / denom
                cos[denom == 0.0] = np.nan  # NULL via Arrow, like try_divide
                outs.append(cos)
            cos = np.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
            # rank NULLs last (desc_nulls_last), keep NaN for emission
            filled = np.where(np.isnan(cos), -np.inf, cos)
            if not include_self:
                filled[cids[:, None] == qarr[None, :]] = np.nan
                # np.nan in `filled` marks EXCLUDED pairs from here on
            frames = []
            for j in range(nq):
                col = filled[:, j]
                keep = ~np.isnan(col)
                idx = np.nonzero(keep)[0]
                if len(idx) == 0:
                    continue
                if len(idx) > k:
                    vals = col[idx]
                    thresh = np.partition(vals, len(vals) - k)[len(vals) - k]
                    idx = idx[vals >= thresh]  # superset incl. boundary ties
                cand = pd.DataFrame(
                    {
                        "query_id": [qids_l[j]] * len(idx),
                        "vec_id": cids[idx],
                        "cosine": cos[idx, j],
                        "__s": col[idx],
                    }
                )
                for c in carry_cols:
                    cand[c] = pdf[c].to_numpy()[idx]
                cand = cand.sort_values(
                    ["__s", "vec_id"], ascending=[False, True], kind="mergesort"
                ).head(k)
                frames.append(cand.drop(columns="__s"))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    partial = src.mapInPandas(kernel, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine", *carry_cols)
    )


def cosine_threshold_match(
    corpus: DataFrame,
    refs: DataFrame,
    threshold: float,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    ref_id: str = "ref_id",
    ref_vec: str = "embedding",
) -> DataFrame:
    """Per-CORPUS-row nearest reference at or above ``threshold`` —
    ``(vec_id, ref_id, cosine)`` for every corpus row whose best cosine
    against the (small, broadcast) reference set clears the bar; rows
    below it emit nothing.

    This is the shape :func:`cosine_topk_batched` cannot express: that
    kernel ranks corpus rows PER QUERY (top-k per reference), while
    threshold matching needs ALL corpus rows per reference — unbounded
    per query, but exactly ≤1 output row per CORPUS row.  Here the
    argmax runs inside the Arrow kernel across the whole broadcast
    reference matrix, so the plan is MAP-ONLY: the corpus never
    shuffles, emits at most one row each, and there is no ranking
    window at all.  Ties break to the smallest ``ref_id`` (total
    order).  Fixed-point cosine (the :func:`fp_dot` recipe in numpy
    doubles — identical IEEE ops) keeps scores and the threshold
    decision engine-exact, so SQL oracles replay the pass bit for bit.

    NULL corpus vectors and NULL/zero-norm reference rows are dropped.
    """
    check_col([corpus_id, corpus_vec], corpus)
    check_col([ref_id, ref_vec], refs)
    spark = corpus.sparkSession
    m = float(2**30)
    rrows = [
        r
        for r in refs.select(ref_id, ref_vec).collect()
        if r[1] is not None
    ]
    out_schema = StructType(
        [
            StructField("vec_id", corpus.schema[corpus_id].dataType),
            StructField("ref_id", refs.schema[ref_id].dataType),
            StructField("cosine", DoubleType()),
        ]
    )
    # spread below the kernel (guide §2.5) — see cosine_topk_batched
    src = spread(corpus.select(corpus_id, corpus_vec))
    if not rrows:
        return spark.createDataFrame([], out_schema)
    # sort by ref id so numpy argmax (first max) IS the tiebreak
    rrows.sort(key=lambda r: r[0])
    rids = [r[0] for r in rrows]
    R = np.array([list(r[1]) for r in rrows], dtype=np.float64)
    rn = np.sqrt(np.floor(R * R * m).astype(np.int64).sum(axis=1) / m)
    keep = rn > 0.0
    rids = [i for i, k_ in zip(rids, keep) if k_]
    R, rn = R[keep], rn[keep]
    if len(rids) == 0:
        return spark.createDataFrame([], out_schema)
    bc = spark.sparkContext.broadcast((rids, R, rn))
    nr, dim = R.shape
    chunk_rows = max(1, 16_000_000 // max(nr * dim, 1))
    thr = float(threshold)

    def kernel(it):
        rids_l, Rm, rn_l = bc.value
        rarr = np.asarray(rids_l, dtype=object)
        for pdf in it:
            ok = pdf.iloc[:, 1].notna().to_numpy()
            pdf = pdf.iloc[ok]
            if len(pdf) == 0:
                continue
            C = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64)
            cids = pdf.iloc[:, 0].to_numpy()
            cn = np.sqrt(np.floor(C * C * m).astype(np.int64).sum(axis=1) / m)
            for lo in range(0, len(C), chunk_rows):
                hi = min(lo + chunk_rows, len(C))
                dots = (
                    np.floor(C[lo:hi, None, :] * Rm[None, :, :] * m)
                    .astype(np.int64)
                    .sum(axis=2)
                    .astype(np.float64)
                    / m
                )
                denom = cn[lo:hi, None] * rn_l[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dots / denom
                cos[denom == 0.0] = -np.inf
                best = cos.argmax(axis=1)  # first max = smallest ref id
                rows = np.arange(len(best))
                bestcos = cos[rows, best]
                sel = bestcos >= thr
                if not sel.any():
                    continue
                yield pd.DataFrame(
                    {
                        "vec_id": cids[lo:hi][sel],
                        "ref_id": rarr[best[sel]],
                        "cosine": bestcos[sel],
                    }
                )

    return src.mapInPandas(kernel, out_schema)


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int | None = 10,
    multiprobe_bits: int = 1,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    seed: int = 42,
    include_self: bool = False,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join + exact cosine re-rank.

    ``multiprobe_bits=m``: each query also probes buckets within Hamming
    distance ≤ m of its own pattern (single-bit flips for m=1), trading
    join fanout for recall — the standard multi-probe LSH move so one
    table shuffle serves high recall without more hash tables.

    ``n_planes=None`` derives the width from corpus size
    (``dedup.derive_n_planes`` — bucket occupancy, and so per-query
    candidate volume, stays bounded as the corpus grows; one extra
    ``count()``).
    """
    check_col([corpus_id, corpus_vec], corpus)
    check_col([query_id, query_vec], queries)
    if n_planes is None:
        from .dedup import derive_n_planes

        n_planes = derive_n_planes(corpus.count())
    dim = len(corpus.select(corpus_vec).first()[0])
    # spread the corpus side (guide §2.5) — see cosine_topk
    c = add_hyperplane_bucket(
        spread(corpus.select(
            F.col(corpus_id).alias("vec_id"),
            F.col(corpus_vec).alias("__cv"),
            F.sqrt(fp_dot(F.col(corpus_vec), F.col(corpus_vec))).alias("__cn"),
        )),
        "__cv", n_planes=n_planes, seed=seed, dim=dim,
    )
    q = add_hyperplane_bucket(
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col(query_vec).alias("__qv"),
            F.sqrt(fp_dot(F.col(query_vec), F.col(query_vec))).alias("__qn"),
        ),
        "__qv", n_planes=n_planes, seed=seed, dim=dim,
    )
    if multiprobe_bits >= 1:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(n_planes)
            ],
        )
        q = q.withColumn("bucket", F.explode(probes))
    joined = c.join(q, "bucket")
    if not include_self:
        joined = joined.filter(F.col("vec_id") != F.col("query_id"))
    scored = joined.withColumn(
        "cosine",
        F.try_divide(fp_dot(F.col("__cv"), F.col("__qv")), F.col("__cn") * F.col("__qn")),
    ).dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _kmeans_numpy(M: np.ndarray, k: int, seed: int, n_iter: int = 20) -> np.ndarray:
    """Seeded Lloyd's k-means on a sample matrix (coarse quantizer for IVF;
    deterministic — fixed init, fixed iteration count)."""
    rng = np.random.default_rng(seed)
    centroids = M[rng.choice(len(M), size=min(k, len(M)), replace=False)]
    for _ in range(n_iter):
        d2 = ((M[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(len(centroids)):
            members = M[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return centroids


def build_ivf_index(
    corpus: DataFrame,
    n_lists: int | None = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    seed: int = 42,
    train_sample: int = 10_000,
) -> tuple[np.ndarray, DataFrame]:
    """Train the IVF coarse quantizer and assign the corpus to inverted
    lists → ``(centroids, assigned)`` with ``assigned`` columns
    (vec_id, embedding, norm, list_id).

    The quantizer trains driver-side on a bounded sample (IVF training is
    always a sampled offline step); centroids ship to executors inside an
    Arrow UDF closure.  Build once, search many — persist with
    :func:`save_ivf_index` for cross-job reuse.

    ``n_lists=None`` derives the FAISS rule of thumb ``≈ √n`` (clamped to
    [4, 65536]; one extra ``count()``): per-probe scan cost ~n/√n and
    quantizer cost ~√n both stay sublinear as the corpus grows, where a
    fixed list count silently degrades each probe toward a full scan.
    """
    check_col([corpus_id, corpus_vec], corpus)
    if n_lists is None:
        n_rows = corpus.count()
        n_lists = max(4, min(65_536, int(n_rows**0.5)))
    # hash-ordered top-n: data-deterministic and layout-independent
    # (plain limit() trains on whatever partitions list first — a
    # source-clustered corpus would give the quantizer one region only)
    sample = (
        corpus.select(corpus_vec)
        .orderBy(F.xxhash64(F.col(corpus_vec)))
        .limit(train_sample)
        .collect()
    )
    M = np.array([list(r[0]) for r in sample], dtype=np.float64)
    centroids = _kmeans_numpy(M, n_lists, seed)
    return centroids, assign_to_ivf_lists(
        centroids, corpus, corpus_id, corpus_vec
    )


def assign_to_ivf_lists(
    centroids: np.ndarray,
    vectors: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Assign vectors to their nearest coarse centroid — the shared
    quantization step of the initial build and every incremental append
    (centroids ship inside an Arrow UDF closure; assignment is map-only).
    Output columns: (vec_id, embedding, norm, list_id)."""
    check_col([corpus_id, corpus_vec], vectors)
    cents = centroids

    @pandas_udf("long")
    def nearest_list(vs: pd.Series) -> pd.Series:
        X = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1))

    return vectors.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("embedding"),
        F.sqrt(fp_dot(F.col(corpus_vec), F.col(corpus_vec))).alias("norm"),
        nearest_list(F.col(corpus_vec)).alias("list_id"),
    )


def append_to_ivf_index(
    new_vectors: DataFrame,
    path: str,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> None:
    """Incrementally add a vector batch to a persisted IVF index: load
    the (small) centroid table, quantize the batch with the SAME
    assignment kernel as the build, and parquet-append into the
    ``list_id``-partitioned lists — searches see the new vectors
    immediately, no rebuild, and partition pruning keeps working because
    appends land in the existing list directories.

    The quantizer is intentionally NOT retrained (the FAISS contract):
    recall for the new vectors matches the build-time distribution; if
    the data distribution drifts far enough that new vectors crowd few
    lists or scatter a dense new region across list boundaries, recall
    decays — detect it with :func:`ivf_drift_stats` and repair it with
    :func:`rebalance_ivf_index`.
    """
    spark = new_vectors.sparkSession
    rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(),
        key=lambda r: r.list_id,
    )
    centroids = np.array([list(r.centroid) for r in rows], dtype=np.float64)
    assigned = assign_to_ivf_lists(
        centroids, new_vectors, corpus_id, corpus_vec
    )
    assigned.write.partitionBy("list_id").mode("append").parquet(
        f"{path}/lists"
    )


def ivf_drift_stats(spark, path: str) -> dict:
    """Quantizer-drift summary over a persisted IVF index — the check a
    long-running ingestion loop runs between appends to decide when
    :func:`rebalance_ivf_index` is due.

    Returns ``{"n_vectors", "n_lists", "n_nonempty_lists",
    "max_list_share", "imbalance"}`` where ``imbalance`` is the largest
    list's size relative to the perfectly-balanced share
    (``max_count · n_lists / n``): 1.0 = uniform, ``n_lists`` = total
    collapse into one list.  A healthy freshly-built index sits in
    [1, ~4]; sustained growth past that means appended vectors are
    crowding few lists (distribution shift) and per-probe cost is
    degrading toward a full scan.  One count aggregate over the list
    table (parquet footers prune to the two needed columns); the result
    is ``n_lists`` rows collected driver-side — bounded and cheap.
    """
    counts = [
        (r["list_id"], r["cnt"])
        for r in spark.read.parquet(f"{path}/lists")
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ]
    n_lists = spark.read.parquet(f"{path}/centroids").count()
    n = sum(c for _, c in counts)
    mx = max((c for _, c in counts), default=0)
    return {
        "n_vectors": n,
        "n_lists": n_lists,
        "n_nonempty_lists": len(counts),
        "max_list_share": (mx / n) if n else 0.0,
        "imbalance": (mx * n_lists / n) if n else 0.0,
    }


def rebalance_ivf_index(
    spark,
    path: str,
    n_lists: int | None = None,
    seed: int = 42,
    train_sample: int = 10_000,
    max_imbalance: float | None = None,
) -> np.ndarray | None:
    """Retrain the coarse quantizer over the CURRENT (grown) corpus and
    rewrite the list assignments in place — the remediation for
    quantizer drift after many :func:`append_to_ivf_index` batches of a
    shifted distribution (appends keep the build-time centroids, so a
    dense new region either crowds one list or scatters across old list
    boundaries; both decay recall at fixed ``n_probe``).

    ``n_lists=None`` keeps the index's current list count; pass an int
    to re-size (e.g. the √n rule as the corpus grows).  With
    ``max_imbalance`` set, the rebuild is CONDITIONAL: if
    :func:`ivf_drift_stats`'s imbalance is at or below the threshold
    the index is left untouched and ``None`` is returned — the
    check-and-repair loop is then a single call.

    Returns the new centroid matrix (or ``None`` on a skipped rebuild).

    Scale shape: retraining samples ``train_sample`` vectors
    (hash-deterministic, same as the build), assignment is one map-only
    pass over the corpus, and the rewrite is one partitioned parquet
    write — inherently corpus-sized, which is why it is a triggered
    maintenance step, not part of the append path.  The corpus is
    eagerly ``localCheckpoint``ed before the overwrite (the write
    replaces the very files the plan reads); a production deployment on
    an object store would instead write ``lists_v{n}`` and flip a
    manifest pointer — same plan, different commit protocol.
    """
    if max_imbalance is not None:
        if ivf_drift_stats(spark, path)["imbalance"] <= max_imbalance:
            return None
    corpus = spark.read.parquet(f"{path}/lists").select(
        "vec_id", "embedding"
    )
    if n_lists is None:
        n_lists = spark.read.parquet(f"{path}/centroids").count()
    centroids, assigned = build_ivf_index(
        corpus,
        n_lists=n_lists,
        corpus_id="vec_id",
        corpus_vec="embedding",
        seed=seed,
        train_sample=train_sample,
    )
    assigned = assigned.localCheckpoint(eager=True)
    save_ivf_index(centroids, assigned, path)
    return centroids


def save_ivf_index(centroids: np.ndarray, assigned: DataFrame, path: str) -> None:
    """Persist the index: inverted lists as ``list_id``-partitioned parquet
    (so a probe touches only its directories — engine partition pruning)
    plus a small centroid table."""
    spark = assigned.sparkSession
    assigned.write.partitionBy("list_id").mode("overwrite").parquet(
        f"{path}/lists"
    )
    local_df(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "list_id long, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")


def load_ivf_index(spark, path: str) -> tuple[np.ndarray, DataFrame]:
    rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(), key=lambda r: r.list_id
    )
    centroids = np.array([list(r.centroid) for r in rows], dtype=np.float64)
    return centroids, spark.read.parquet(f"{path}/lists")


def ivf_search(
    centroids: np.ndarray,
    assigned: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 3,
    query_id: str = "query_id",
    query_vec: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Probe the ``n_probe`` nearest lists per query and exact-rerank.

    The set of probed lists is collected driver-side (bounded by
    ``n_lists`` values however many queries there are) and applied as an
    ``isin`` filter, so a partitioned on-disk index prunes to the probed
    directories at scan time — each query batch touches
    ~``n_probe/n_lists`` of the corpus.
    """
    check_col([query_id, query_vec], queries)
    n_probe = min(n_probe, len(centroids))

    @pandas_udf("array<long>")
    def probe_lists(vs: pd.Series) -> pd.Series:
        X = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        d2 = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d2, axis=1)[:, :n_probe]
        return pd.Series(list(order.astype(np.int64)))

    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv"),
        F.sqrt(fp_dot(F.col(query_vec), F.col(query_vec))).alias("__qn"),
        F.explode(probe_lists(F.col(query_vec))).alias("list_id"),
    )
    # probed lists come from a separate uncached projection: the probe UDF
    # runs twice (queries are small by contract), but nothing stays pinned
    # in executor memory across repeated searches on a long-lived session
    probed = sorted(
        r.list_id
        for r in queries.select(
            F.explode(probe_lists(F.col(query_vec))).alias("list_id")
        ).distinct().collect()
    )
    c = assigned.filter(F.col("list_id").isin(probed))

    joined = c.join(q, "list_id")
    if not include_self:
        joined = joined.filter(F.col("vec_id") != F.col("query_id"))
    scored = joined.withColumn(
        "cosine",
        F.try_divide(
            fp_dot(F.col("embedding"), F.col("__qv")), F.col("norm") * F.col("__qn")
        ),
    ).dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int | None = 16,
    n_probe: int = 3,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    seed: int = 42,
    train_sample: int = 10_000,
    include_self: bool = False,
) -> DataFrame:
    """One-shot IVF approximate top-k = :func:`build_ivf_index` +
    :func:`ivf_search` (build once / search many is the production shape —
    see save/load_ivf_index for the persistent, partition-pruned form)."""
    centroids, assigned = build_ivf_index(
        corpus, n_lists, corpus_id, corpus_vec, seed, train_sample
    )
    return ivf_search(
        centroids, assigned, queries, k, n_probe, query_id, query_vec,
        include_self,
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    label_col: str,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """kNN majority-vote label assignment over an embedding column —
    pseudo-labeling / auto-labeling for a training pipeline: each query
    vector takes the most common label among its ``k`` nearest labeled
    neighbors (exact cosine).

    Deterministic winner selection: most votes, then smallest best rank
    (the class owning the nearest neighbor wins ties), then label order —
    all integer comparisons, so the result is engine- and
    partitioning-independent and carries a SQL oracle.

    Scale: runs on :func:`cosine_topk_batched` — the labeled corpus never
    shuffles (map-side per-partition top-k; the ranking window sees
    ``partitions·nq·k`` candidates, not nc·nq scored pairs), the query
    batch ships as a broadcast variable, and the label rides through the
    kernel's ``carry_cols`` so there is **no nn→corpus re-join at all**.
    The vote aggregation shuffles only (query, label) pairs — ≤ k rows
    per query.  Swap the LSH/IVF variants upstream when even one corpus
    scan per query batch is too much.
    """
    check_col([corpus_id, corpus_vec, label_col], corpus)
    nn = cosine_topk_batched(
        corpus, queries, k=k, corpus_id=corpus_id, corpus_vec=corpus_vec,
        query_id=query_id, query_vec=query_vec, carry_cols=(label_col,),
    )
    votes = (
        nn.withColumnRenamed(label_col, "__lbl")
        .groupBy("query_id", "__lbl")
        .agg(
            F.count(F.lit(1)).alias("n_votes"),
            F.min("rank").alias("best_rank"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("best_rank").asc(), F.col("__lbl").asc()
    )
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "query_id",
            F.col("__lbl").alias("pred_label"),
            "n_votes",
            "best_rank",
        )
    )


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization of a float vector column — the
    compression step before shipping embeddings to an ANN index or a
    training shard (4× smaller than float32, 8× than float64).

    Per vector: ``scale = 127 / max|x|``, ``q_i = round(x_i · scale)``
    ∈ [−127, 127].  Pure JVM array expressions (no Python, no shuffle —
    a map-only stage that composes with any downstream partitioning).
    All-zero vectors get a NULL scale and NULL quantized values rather
    than a division blow-up.

    Returns the input plus ``q_<vec_col>`` (array<int>) and
    ``<vec_col>_scale`` (double).  The arithmetic is one promotion and
    one multiply per element — bit-reproducible across engines, which is
    how the ``emb_quantize`` query's DuckDB oracle replays it exactly.
    """
    check_col([id_col, vec_col], df)
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x))).cast("double")
    scale = F.lit(127.0) / F.nullif(amax, F.lit(0.0))
    # scale enters the element lambda via array_repeat (an ARGUMENT,
    # evaluated once per row) — a lambda body capturing `scale` directly
    # would re-evaluate the whole array_max chain per element (O(d²)/row;
    # see char_trigrams for the measured form of this trap)
    q = F.zip_with(
        v,
        F.array_repeat(scale, F.size(v)),
        lambda x, s: F.round(x.cast("double") * s).cast("int"),
    )
    return df.withColumn(f"{vec_col}_scale", scale).withColumn(
        f"q_{vec_col}", q
    )


def hard_negative_mining(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    corpus_label: str = "label",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    query_label: str = "label",
    batched: bool = True,
    max_labels: int = 256,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    (anchor), the top-k most-cosine-similar corpus rows whose label
    DIFFERS from the anchor's — the near-misses a contrastive or
    reranker objective learns the most from (easy negatives are random
    rows; hard ones are these).

    Output: (query_id, rank, vec_id, cosine, neg_label), deterministic
    ties (cosine desc, corpus id asc) on the fixed-point cosine of
    :func:`~..operators.dedup.fp_dot` — engine-reproducible, so a SQL
    oracle can replay it exactly.

    Two physical plans, identical results:

    - ``batched=True`` (default): one :func:`cosine_topk_batched` call
      per distinct query label, corpus pre-filtered to the other
      labels — the map-side partial top-k kernel, so each corpus
      partition emits ≤ |queries|·k candidate rows and the corpus never
      shuffles.  Costs one corpus scan per distinct query label; the
      label set is collected driver-side and bounded by ``max_labels``
      (contrastive label spaces are small by construction — raise the
      bound consciously if yours is not).
    - ``batched=False``: the whole-stage-codegen HOF plan — broadcast
      queries, label-mismatch filter BEFORE scoring, fixed-point
      cosine, ranking window.  Simpler plan, but the window shuffles
      |corpus|·|queries| scored pairs; the baseline the kernel is
      verified against.
    """
    check_col([corpus_id, corpus_vec, corpus_label], corpus)
    check_col([query_id, query_vec, query_label], queries)
    if batched:
        labels = [
            r[0]
            for r in queries.select(query_label).distinct().collect()
        ]
        if len(labels) > max_labels:
            raise ValueError(
                f"{len(labels)} distinct query labels exceeds "
                f"max_labels={max_labels}"
            )
        parts = []
        for lab in labels:
            # null-safe: a NULL query label is a real group (the
            # non-batched baseline keeps those queries via eqNullSafe),
            # so `== lit(None)` — which is NULL, i.e. drop — would make
            # the two plans disagree on null-labeled anchors
            sub_q = queries.filter(
                F.col(query_label).eqNullSafe(F.lit(lab))
            ).select(query_id, query_vec)
            sub_c = corpus.filter(
                ~F.col(corpus_label).eqNullSafe(F.lit(lab))
            )
            parts.append(
                cosine_topk_batched(
                    sub_c,
                    sub_q,
                    k=k,
                    corpus_id=corpus_id,
                    corpus_vec=corpus_vec,
                    query_id=query_id,
                    query_vec=query_vec,
                    include_self=True,  # labels differ ⇒ never self
                    carry_cols=(corpus_label,),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.withColumnRenamed(corpus_label, "neg_label")
    # spread the corpus side (guide §2.5) — see cosine_topk
    c = spread(corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_label).alias("neg_label"),
        F.col(corpus_vec).alias("__cv"),
        F.sqrt(fp_dot(F.col(corpus_vec), F.col(corpus_vec))).alias("__cn"),
    ))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_label).alias("__ql"),
        F.col(query_vec).alias("__qv"),
        F.sqrt(fp_dot(F.col(query_vec), F.col(query_vec))).alias("__qn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(~F.col("neg_label").eqNullSafe(F.col("__ql")))
        .withColumn(
            "cosine",
            F.try_divide(
                fp_dot(F.col("__cv"), F.col("__qv")),
                F.col("__cn") * F.col("__qn"),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine", "neg_label")
    )


def integer_dot_topn(
    corpus: DataFrame,
    queries: DataFrame,
    n: int = 20,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    fp_bits: int = 12,
) -> DataFrame:
    """Exact top-n retrieval by INTEGER dot product of once-quantized
    vectors (``floor(cast(x as double)·2^fp_bits)``) — the engine-
    replayable relevance stage for :func:`mmr_rerank`: every score is an
    exact int64 (fp_bits=12, |x|≤2, d=64 → |dot| ≤ 2³², inside the 2⁵³
    window where DuckDB's double ``list_inner_product`` is also exact,
    so the oracle replays bit for bit).

    Physical plan mirrors :func:`cosine_topk_batched`: queries collect
    driver-side (small/broadcast side by contract) and ride a broadcast
    numpy matrix; each corpus partition emits only its LOCAL top-n per
    query, so the final ranking window shuffles ``partitions·nq·n`` rows
    — the corpus never shuffles.  NULL / wrong-length vectors drop.

    Output: (query_id, rank, vec_id, rel_q) — rank 1..n by
    (rel_q desc, vec_id asc).
    """
    check_col([corpus_id, corpus_vec], corpus)
    check_col([query_id, query_vec], queries)
    from pyspark.sql.types import LongType

    spark = corpus.sparkSession
    scale = float(1 << fp_bits)
    qrows = [
        r for r in queries.select(query_id, query_vec).collect()
        if r[1] is not None
    ]
    out_schema = StructType([
        StructField("query_id", queries.schema[query_id].dataType),
        StructField("vec_id", corpus.schema[corpus_id].dataType),
        StructField("rel_q", LongType()),
    ])
    if not qrows:
        return (
            spark.createDataFrame([], out_schema)
            .withColumn("rank", F.lit(1))
            .select("query_id", "rank", "vec_id", "rel_q")
        )
    qids = [r[0] for r in qrows]
    Qq = np.floor(
        np.array([list(r[1]) for r in qrows], dtype=np.float64) * scale
    ).astype(np.int64)
    bc = spark.sparkContext.broadcast((qids, Qq))
    nq, dim = Qq.shape
    chunk_rows = max(1, 16_000_000 // max(nq * dim, 1))

    def kernel(it):
        qids_l, Qm = bc.value
        qarr = np.asarray(qids_l, dtype=object)
        for pdf in it:
            vecs = pdf.iloc[:, 1]
            ok = vecs.map(
                lambda v: v is not None and len(v) == dim
            ).to_numpy()
            pdf = pdf.iloc[ok]
            if len(pdf) == 0:
                continue
            C = np.floor(
                np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64) * scale
            ).astype(np.int64)
            cids = pdf.iloc[:, 0].to_numpy()
            for lo in range(0, len(C), chunk_rows):
                hi = min(lo + chunk_rows, len(C))
                dots = C[lo:hi] @ Qm.T  # int64-exact
                cch = cids[lo:hi]
                # local top-n per query, TIE-AWARE at the cutoff (exact
                # int64 ties are realistic with duplicate embeddings):
                # take the superset including boundary ties, then stable
                # sort by (dot desc, vec_id asc) — same contract as the
                # global window and the DuckDB oracle's ORDER BY.
                frames = []
                for j in range(nq):
                    col = dots[:, j]
                    if len(col) > n:
                        thresh = np.partition(col, len(col) - n)[len(col) - n]
                        idx = np.nonzero(col >= thresh)[0]
                    else:
                        idx = np.arange(len(col))
                    cand = pd.DataFrame({
                        "query_id": [qarr[j]] * len(idx),
                        "vec_id": cch[idx],
                        "rel_q": col[idx],
                    })
                    frames.append(cand.sort_values(
                        ["rel_q", "vec_id"], ascending=[False, True],
                        kind="mergesort",
                    ).head(n))
                if frames:
                    yield pd.concat(frames, ignore_index=True)

    # spread below the kernel (guide §2.5) — see cosine_topk_batched
    partials = spread(corpus.select(corpus_id, corpus_vec)).mapInPandas(
        kernel, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rel_q").desc(), F.col("vec_id").asc()
    )
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("query_id", "rank", "vec_id", "rel_q")
    )


def mmr_rerank(
    candidates: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rel_col: str = "rel_q",
    vec_col: str = "embedding",
    k: int = 10,
    lam_num: int = 7,
    lam_den: int = 3,
    fp_bits: int = 12,
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98):
    per-query greedy top-k that trades relevance against redundancy —
    pick ``argmax lam_num·rel − lam_den·max_{s∈S} sim(d, s)`` each
    round (sim = integer dot of the quantized vectors; S = already
    selected; first pick is pure relevance since S is empty).  The
    de-duplicating reranker for retrieval-augmented pipelines: a result
    page of ten near-identical passages has high relevance and near-zero
    marginal information.

    Scale contract: ``candidates`` is a BOUNDED per-query set (feed a
    top-N stage — :func:`integer_dot_topn`, BM25, or an ANN probe), so
    the greedy loop runs inside one ``applyInPandas`` group per query:
    millions of queries parallelize across the cluster, nothing beyond
    the candidate rows ever shuffles, and the O(N²) pair-dot matrix is
    N ≤ a few hundred per group.

    Determinism: ``rel_col`` must be integer-valued (fixed-point scores
    — integer dots, BM25 fixed-point); similarity uses once-quantized
    ``floor(cast(x as double)·2^fp_bits)`` int64 dots; score arithmetic
    is pure int64 with ties to the smallest id — the ENTIRE greedy
    trajectory replays as unrolled chained CTEs in DuckDB.

    Output: (query_col, pick, id_col, rel_q, score_q) — pick 1..k in
    selection order; score_q is the winning marginal score that round.
    """
    check_col([query_col, id_col, rel_col, vec_col], candidates)
    from pyspark.sql.types import IntegerType, LongType

    scale = float(1 << fp_bits)
    out_schema = StructType([
        StructField(query_col, candidates.schema[query_col].dataType),
        StructField("pick", IntegerType()),
        StructField(id_col, candidates.schema[id_col].dataType),
        StructField("rel_q", LongType()),
        StructField("score_q", LongType()),
    ])

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf[vec_col].notna()]
        if not len(pdf):
            return pd.DataFrame(
                {f.name: pd.Series([], dtype=object) for f in out_schema}
            )
        # deterministic candidate order: by id (ties in the greedy argmax
        # resolve to the smallest id via this ordering + argmax-first)
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        X = np.floor(
            np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * scale
        ).astype(np.int64)
        rel = pdf[rel_col].to_numpy().astype(np.int64)
        ids = pdf[id_col].to_numpy()
        nloc = len(pdf)
        dots = X @ X.T  # N² pair dots, N bounded by the top-N stage
        selected: list[int] = []
        # true (possibly NEGATIVE) max dot to the selected set — seeded
        # from the first pick's column, never clamped at 0, matching the
        # oracle's unclamped MAX(p.dot)
        maxdot = np.zeros(nloc, dtype=np.int64)
        remaining = np.ones(nloc, dtype=bool)
        picks, pick_scores = [], []
        for _ in range(min(k, nloc)):
            score = lam_num * rel - (
                lam_den * maxdot if selected else 0
            )
            score_masked = np.where(remaining, score, np.iinfo(np.int64).min)
            j = int(np.argmax(score_masked))  # first max = smallest id
            picks.append(j)
            pick_scores.append(int(score_masked[j]))
            remaining[j] = False
            if selected:
                maxdot = np.maximum(maxdot, dots[:, j])
            else:
                maxdot = dots[:, j].copy()
            selected.append(j)
        return pd.DataFrame({
            query_col: [pdf[query_col].iloc[0]] * len(picks),
            "pick": np.arange(1, len(picks) + 1, dtype=np.int32),
            id_col: ids[picks],
            "rel_q": rel[picks],
            "score_q": np.asarray(pick_scores, dtype=np.int64),
        })

    return (
        candidates.select(query_col, id_col, rel_col, vec_col)
        .groupBy(query_col)
        .applyInPandas(greedy, out_schema)
    )


__all__ = [
    "add_hyperplane_bucket",
    "cosine_topk",
    "cosine_topk_batched",
    "cosine_threshold_match",
    "hard_negative_mining",
    "hyperplane_lsh_topk",
    "build_ivf_index",
    "assign_to_ivf_lists",
    "append_to_ivf_index",
    "ivf_drift_stats",
    "rebalance_ivf_index",
    "save_ivf_index",
    "load_ivf_index",
    "integer_dot_topn",
    "ivf_search",
    "ivf_topk",
    "knn_classify",
    "mmr_rerank",
    "quantize_embeddings",
]
