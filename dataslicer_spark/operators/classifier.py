"""Distributed linear-classifier training — the quality-filter model stage
of an LLM data pipeline (CCNet/LLaMA-style corpora train a fastText
classifier and keep documents it scores as "high quality"; this module
provides the distributed-training shape with an exactly-verifiable
algorithm).

Batch perceptron, integer-exact: per epoch, every misclassified row
contributes ``y·x`` to a gradient sum; weights update once per epoch
(``w += lr · Σ y·x``).  With integer features and labels the whole
trajectory is int64 — order-independent sums, no floats anywhere — so
the n-epoch training run replays bit for bit in the DuckDB oracle
(chained CTEs), the same device as operators/kmeans.py.

Scale design mirrors every distributed SGD/L-BFGS implementation:

- weights broadcast to executors each epoch — here as literal
  expressions (d is small), so the epoch plan is scan → filter →
  partial aggregate, pure JVM whole-stage codegen, no Python, no
  shuffle beyond the d-column aggregate's final merge;
- the wire carries one d-vector per partition per epoch (map-side
  partial sums), never per-row gradients;
- the driver holds d ints — model state is microscopic;
- prediction is a map-only literal-weights projection.

Batch (not sequential) perceptron is the deliberate choice: classic
per-sample perceptron updates are order-dependent and cannot be
distributed or replayed; the batch variant is a parallel gradient step
on the perceptron criterion (Duda & Hart §5.5 "many-at-a-time"), loses
nothing for a filtering model, and is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import check_col

#: (name, builder) — integer surface features computable identically in
#: Spark and ANSI SQL (simple character classes only: Java regex and RE2
#: agree on these).  The bias constant is prepended by the trainer.
def text_feature_exprs(text: Column) -> dict[str, Column]:
    """Integer quality-surface features of a text column."""
    return {
        "f_len": F.length(text).cast("long"),
        "f_spaces": (
            F.length(text) - F.length(F.regexp_replace(text, " ", ""))
        ).cast("long"),
        "f_digits": F.length(F.regexp_replace(text, "[^0-9]", "")).cast("long"),
        "f_upper": F.length(F.regexp_replace(text, "[^A-Z]", "")).cast("long"),
        "f_punct": F.length(
            F.regexp_replace(text, "[^.,!?]", "")
        ).cast("long"),
    }


def substring_count(text: Column, pattern: str) -> Column:
    """Occurrences of a literal substring, as the portable
    ``(len(t) − len(replace_all(t, pat, ''))) / len(pat)`` identity —
    integer-exact and identical in Spark and ANSI SQL.  ``pattern`` must
    be regex-free (it is passed to ``regexp_replace`` verbatim)."""
    if not pattern or set(pattern) & set("\\^$.|?*+()[]{}"):
        raise ValueError(
            f"substring_count needs a literal pattern, got {pattern!r}"
        )
    diff = F.length(text) - F.length(F.regexp_replace(text, pattern, ""))
    return (diff / F.lit(len(pattern))).cast("long")


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the standard feature columns (map-only, JVM)."""
    check_col(text_col, df)
    out = df
    for name, expr in text_feature_exprs(F.col(text_col)).items():
        out = out.withColumn(name, expr)
    return out


def hashed_bow_features(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    dim: int = 64,
    prefix: str = "f",
) -> DataFrame:
    """The hashing trick (Weinberger et al., ICML 2009): whitespace
    tokens hash into ``dim`` count buckets — the fixed-width,
    vocabulary-free text representation fastText-style classifiers train
    on.  Returns (id_col, ``f0…f{dim−1}``) with int64 counts; documents
    with no tokens get all-zero rows.

    Slots come from md5 (not xxhash64) so any SQL engine replays them:
    ``conv(substr(md5(token),1,8),16,10) % dim``.  The plan is explode →
    ``groupBy(id).pivot(slot, [0..dim))`` — ONE count shuffle with
    map-side combine; the pivot values are pinned so no discovery pass
    runs.  At 100 TB the wire carries (id, slot) counts, never tokens.
    """
    check_col([id_col, text_col], df)
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("__tok"),
    ).filter(F.col("__tok") != "")
    slot = (
        F.conv(F.substring(F.md5(F.col("__tok")), 1, 8), 16, 10)
        .cast("long") % dim
    )
    counted = (
        toks.withColumn("__slot", slot)
        .groupBy(id_col)
        .pivot("__slot", list(range(dim)))
        .count()
    )
    renamed = counted.select(
        F.col(id_col),
        *[
            F.coalesce(F.col(f"`{j}`"), F.lit(0)).cast("long").alias(
                f"{prefix}{j}"
            )
            for j in range(dim)
        ],
    )
    return (
        df.select(id_col)
        .join(renamed, id_col, "left")
        .select(
            F.col(id_col),
            *[
                F.coalesce(F.col(f"{prefix}{j}"), F.lit(0)).alias(
                    f"{prefix}{j}"
                )
                for j in range(dim)
            ],
        )
    )


def _dot(weights: list[int], feature_cols: list[str]) -> Column:
    acc = F.lit(int(weights[0]))  # bias
    for w, c in zip(weights[1:], feature_cols):
        acc = acc + F.lit(int(w)) * F.col(c)
    return acc


def batch_perceptron_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_epochs: int = 3,
    lr: int | list[int] = 1,
    engine: str = "auto",
    init_weights: list[int] | None = None,
) -> list[int]:
    """Train; returns ``[w_bias, w_f1, …]`` ints.  ``init_weights``
    resumes from an existing model (the online/streaming update path —
    see streaming/train.py).

    ``label_col`` must hold ±1.  Rows with any NULL feature or label are
    ignored (mirrored by the oracle's WHERE).  One aggregate job per
    epoch; the input should be persisted by the caller when the source
    is expensive to re-scan.

    ``lr`` may be a per-epoch integer schedule (len == n_epochs): a
    decaying schedule (e.g. ``[16, 8, 4, 2, 1, 1]``) damps the
    batch-update zigzag the same way a decaying step size does in batch
    gradient descent, while every update stays integer-exact.

    ``engine``: the epoch gradient runs either as JVM aggregate
    expressions ('expr' — d+1 conditional sums, whole-stage codegen) or
    as an Arrow kernel computing per-partition partial gradients in one
    int64 matmul ('arrow').  Identical integer math, identical results.
    'auto' picks 'expr' for ≤16 features and 'arrow' beyond — wide
    feature sets (hashed BoW) otherwise pay a fresh compile of a
    (d+1)-aggregate expression EVERY epoch (new weight literals), which
    dominated a 64-feature fit at ~3 s/epoch vs ~0.3 s for the kernel.
    """
    check_col([label_col, *feature_cols], df)
    lrs = [int(lr)] * n_epochs if isinstance(lr, int) else [int(v) for v in lr]
    if len(lrs) != n_epochs:
        raise ValueError(
            f"lr schedule has {len(lrs)} entries for {n_epochs} epochs"
        )
    if engine not in ("auto", "expr", "arrow"):
        raise ValueError(f"unknown engine {engine!r}")
    use_arrow = (
        engine == "arrow"
        or (engine == "auto" and len(feature_cols) > 16)
    )
    cond = F.col(label_col).isNotNull()
    for c in feature_cols:  # column objects, not SQL text: names with
        cond = cond & F.col(c).isNotNull()  # spaces/dashes stay safe
    clean = df.filter(cond)
    if init_weights is None:
        w = [0] * (1 + len(feature_cols))
    else:
        if len(init_weights) != 1 + len(feature_cols):
            raise ValueError(
                f"init_weights has {len(init_weights)} entries for "
                f"{1 + len(feature_cols)} (bias + features)"
            )
        w = [int(v) for v in init_weights]
    if use_arrow:
        return _fit_arrow(clean, feature_cols, label_col, lrs, w)
    y = F.col(label_col)
    for step in lrs:
        miscls = (y * _dot(w, feature_cols)) <= 0
        aggs = [
            F.sum(F.when(miscls, y).otherwise(F.lit(0))).alias("g0")
        ] + [
            F.sum(
                F.when(miscls, y * F.col(c)).otherwise(F.lit(0))
            ).alias(f"g{j + 1}")
            for j, c in enumerate(feature_cols)
        ]
        row = clean.agg(*aggs).collect()[0]
        for j in range(len(w)):
            g = row[f"g{j}"]
            w[j] += step * int(g if g is not None else 0)
    return w


def _fit_arrow(
    clean: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lrs: list[int],
    w: list[int],
) -> list[int]:
    """Epoch loop with Arrow-kernel partial gradients: each partition
    reduces to one (d+1)-vector before the shuffle — identical int64
    math to the expression path (matmul of int64 never leaves numpy's
    exact integer domain)."""
    import numpy as np
    import pandas as pd

    src = clean.select(label_col, *feature_cols)
    d = len(feature_cols)
    for step in lrs:
        wa = np.asarray(w, dtype=np.int64)

        def grad(batches):
            g = np.zeros(d + 1, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = pdf[feature_cols].to_numpy(dtype=np.int64)
                y = pdf[label_col].to_numpy(dtype=np.int64)
                m = y * (wa[0] + X @ wa[1:]) <= 0
                g[0] += int(y[m].sum())
                g[1:] += (X[m] * y[m, None]).sum(axis=0)
            yield pd.DataFrame({"j": np.arange(d + 1), "g": g})

        rows = (
            src.mapInPandas(grad, "j int, g long")
            .groupBy("j")
            .agg(F.sum("g").alias("g"))
            .collect()
        )
        for r in rows:
            w[r["j"]] += step * int(r["g"])
    return w


def perceptron_predict(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[int],
    score_col: str = "score",
    pred_col: str = "pred",
) -> DataFrame:
    """Attach the integer margin and the ±1 prediction (0 margin → −1,
    matching the training rule's "≤ 0 is misclassified-as-negative").
    Map-only literal-weights plan."""
    check_col(feature_cols, df)
    score = _dot(weights, feature_cols)
    return df.withColumn(score_col, score).withColumn(
        pred_col,
        F.when(F.col(score_col) > 0, F.lit(1)).otherwise(F.lit(-1)),
    )


__all__ = [
    "text_feature_exprs",
    "substring_count",
    "hashed_bow_features",
    "add_text_features",
    "batch_perceptron_fit",
    "perceptron_predict",
]
