"""Dataset splitting & sampling for training pipelines (north-star
extension): deterministic hash-based train/val/test assignment and
token-budget document packing.

Both are pure Catalyst expressions — no shuffle for the split (a row-local
hash), one window pass for packing — and both are deterministic functions
of the DATA (not of partitioning, sampling seeds, or row order), which is
the property a reproducible training pipeline actually needs: re-running
the split on a re-partitioned, re-ordered copy of the corpus yields the
same assignment row-for-row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..utils import check_col


def add_split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[float] = (0.9, 0.05, 0.05),
    names: Sequence[str] = ("train", "val", "test"),
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic split assignment by content hash of the id.

    ``md5(salt || id)``'s first 8 hex digits → uniform uint32 → bucketed
    by cumulative weights (integer thresholds from
    :func:`split_thresholds` — exact boundaries, no float literal can
    drift between engines).  Stable across runs, partitionings, and
    engines (md5 is md5 everywhere — this has a DuckDB oracle, unlike
    ``randomSplit``); changing ``salt`` re-draws the assignment.  NULL
    ids get a NULL split (visible, not silently dumped into a bucket).
    """
    check_col(id_col, df)
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    expr: Column | None = None
    for t, name in zip(split_thresholds(weights), names[:-1]):
        cond = h < t
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(
        out_col,
        F.when(F.col(id_col).isNull(), F.lit(None).cast("string")).otherwise(expr),
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str] | str,
    n_per_stratum: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly ``min(n, stratum size)`` rows per stratum, deterministic.

    Rows are ranked inside each stratum by ``md5(salt || key)`` — a
    content hash, so the chosen subset is pseudo-random yet identical
    across runs, partitionings, and engines (unlike ``sampleBy``, which
    is per-partition Bernoulli: approximate counts AND row-order
    dependent).  One shuffle on the strata key; each task ranks its
    strata locally — no global sort, no driver.  ``salt`` re-draws.
    """
    if isinstance(strata_cols, str):
        strata_cols = [strata_cols]
    check_col([*strata_cols, key_col], df)
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(*strata_cols).orderBy(h)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def split_thresholds(
    weights: Sequence[float] = (0.9, 0.05, 0.05)
) -> list[int]:
    """The integer hash thresholds add_split uses (exported so oracles can
    embed the identical numbers)."""
    total = float(sum(weights))
    out, acc = [], 0.0
    for w in weights[:-1]:
        acc += w / total
        out.append(int(acc * (1 << 32)))
    return out


def pack_documents(
    df: DataFrame,
    id_col: str,
    token_col: str,
    max_tokens: int,
    order_cols: Sequence[str] | None = None,
    partition_cols: Sequence[str] = (),
    out_col: str = "pack_id",
) -> DataFrame:
    """Concatenate-then-chunk sequence packing: documents in a
    deterministic order are laid end-to-end and cut every ``max_tokens``
    tokens; ``pack_id`` = the chunk a document *starts* in.

    This is the standard LLM-pretraining packing (concatenation with
    boundary straddling), not bin packing — exact greedy first-fit needs
    sequential state, while this form is one window cumsum, shuffles once
    on ``partition_cols`` (empty = single global sequence; pass a shard
    key at scale), and is SQL-expressible, so it carries a DuckDB oracle.
    """
    check_col([id_col, token_col] + list(partition_cols), df)
    order = list(order_cols) if order_cols else [id_col]
    w = (
        Window.partitionBy(*partition_cols).orderBy(*order)
        if partition_cols
        else Window.partitionBy().orderBy(*order)
    )
    cum = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    start_offset = cum - F.col(token_col)
    # integer `div` (start_offset ≥ 0, so div == floor) — a double
    # division would drift past 2^53 cumulative tokens
    return (
        df.withColumn("__start_offset", start_offset)
        .withColumn(out_col, F.expr(f"__start_offset div {int(max_tokens)}"))
        .drop("__start_offset")
    )


__all__ = ["add_split", "split_thresholds", "pack_documents"]
