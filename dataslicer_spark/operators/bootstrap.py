"""Deterministic distributed bootstrap — confidence intervals for a mean
at data-lake scale, with a bit-exact SQL replay.

Classic bootstrap resampling (sample n rows with replacement, B times)
is impossible to distribute — it needs global coordinated sampling —
and impossible to verify — RNG streams differ per engine.  The
**Poissonized bootstrap** (Oza & Russell '01 online bagging; Kleiner et
al. '12 scalability analysis) fixes the first: for replicate b each row
independently receives a Poisson(1) multiplicity, which for large n is
distributionally equivalent to with-replacement resampling and needs no
coordination — a map-side weight per (row, replicate).

This module fixes the second: the Poisson draw is **hash-derived, not
RNG-derived** — a counter-based construction.  One
``md5(salt‖id‖':'‖g)`` digest is computed per (row, BLOCK of 3
replicates) and sliced into three independent 10-hex-char (40-bit)
uniforms — md5 is the per-row cost driver, so slicing cuts hash calls
3× vs one digest per replicate (measured 12.0 s → 7.3 s at B=64 on the
sf0.1 events table; the remaining cost is the B-slot explode + conv)
while the digest bits stay independent.  The
Poisson(1) inverse CDF is applied via integer thresholds
``floor(cumP(k)·16¹⁰)`` computed ONCE in Python and embedded as
literals in both engines — so every engine assigns every row the exact
same multiplicity in every replicate.  Values ride int64 fixed-point,
replicate sums are exact integers, each replicate mean is one double
division, and the percentile CI takes fixed order-statistic ranks of
the B deterministic means.  The whole procedure — weights, sums,
means, ranks — replays in DuckDB bit for bit.

Scale shape: the corpus is scanned ONCE; the replicate explosion is
map-only (each row emits ⌈B/3⌉ digests then B (b, w·v) terms straight
into a partial aggregate, so the wire carries ≤ B rows per partition,
never B·n); the ranking window walks B rows.  B is the knob: 64
replicates ≈ 22 md5 + 64 threshold lookups per row, zero extra scans.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..utils import check_col, spread

_HEX = 10
_SPAN = 16**_HEX  # 2^40
PER_DIGEST = 3  # 30 of md5's 32 hex chars → three 40-bit uniforms


def poisson1_thresholds(max_k: int = 7) -> list[int]:
    """Integer inverse-CDF cut points for Poisson(1) on a 40-bit uniform:
    multiplicity = first k with u < t[k], else ``max_k``.  Embedded as
    literals in both engines — the constants ARE the contract (their
    last-ulp placement is irrelevant as long as both sides use the same
    numbers; 2⁻⁴⁰ granularity is ~1e-12, irrelevant to CI quality).
    P(K > 7) ≈ 1e-5; the cap costs nothing statistically and bounds the
    weight column."""
    cum, ts = 0.0, []
    for k in range(max_k):
        cum += math.exp(-1) / math.factorial(k)
        ts.append(int(cum * _SPAN))
    return ts


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_replicates: int = 64,
    trim: int = 2,
    salt: str = "bs",
    fp_bits: int = 20,
) -> DataFrame:
    """One-row CI report: ``n_rows, mean, ci_lo, ci_hi, n_replicates``.

    ``mean`` is the exact fixed-point sample mean; ``ci_lo``/``ci_hi``
    are the (trim+1)-th smallest / largest of the ``n_replicates``
    bootstrap replicate means (trim=2, B=64 ≈ a 94% percentile
    interval).  NULL values and NULL ids are excluded; replicates that
    draw zero total weight (vanishingly rare beyond toy n) are dropped
    identically in both engines before ranking.

    Magnitude budget: ``Σ w·|v|·2^fp_bits`` must stay under 2⁶³ —
    weights are ≤ 7, so ≈ 2⁴²/scale rows of unit-scale values at the
    default fp_bits. Lower ``fp_bits`` for huge corpora.
    """
    check_col([value_col, id_col], df)
    if n_replicates < 2 * (trim + 1):
        raise ValueError("n_replicates too small for the requested trim")
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).cast("string").alias("__id"),
        F.floor(F.col(value_col).cast("double") * F.lit(float(1 << fp_bits)))
        .cast("long")
        .alias("__vq"),
    )

    full = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.try_divide(
            F.sum("__vq").cast("double"),
            (F.count(F.lit(1)) * F.lit(1 << fp_bits)).cast("double"),
        ).alias("mean"),
    ).withColumn("__k", F.lit(1))

    n_blocks = -(-n_replicates // PER_DIGEST)
    # The ⌈B/3⌉-digest explode + md5 is the per-row cost driver and runs
    # at the SCAN's parallelism: a single-file table scans as one task,
    # so the whole kernel held one core (guide §2.5 input skew; profiled
    # 7.4 s of an 8.6 s query in one 1-task stage at sf0.1).  spread()
    # round-robins to cluster width only when the scan is narrower —
    # a no-op on many-file tables at scale.
    blocks = spread(base).select(
        "__vq",
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("__g"),
        "__id",
    ).select(
        "__vq",
        "__g",
        F.md5(
            F.concat(
                F.lit(salt),
                F.col("__id"),
                F.lit(":"),
                F.col("__g").cast("string"),
            )
        ).alias("__h"),
    )
    ts = poisson1_thresholds()

    def weight(j: int) -> F.Column:
        u = F.conv(
            F.substring(F.col("__h"), 1 + _HEX * j, _HEX), 16, 10
        ).cast("long")
        w = F.lit(len(ts))
        for k in reversed(range(len(ts))):
            w = F.when(u < F.lit(ts[k]), F.lit(k)).otherwise(w)
        return w

    slots = F.array(
        *[
            F.struct(
                (F.col("__g") * PER_DIGEST + j).cast("int").alias("b"),
                weight(j).cast("long").alias("w"),
            )
            for j in range(PER_DIGEST)
        ]
    )
    rep = (
        blocks.select("__vq", F.explode(slots).alias("__s"))
        .select(
            "__vq",
            F.col("__s.b").alias("__b"),
            F.col("__s.w").alias("__w"),
        )
        .filter(F.col("__b") < n_replicates)
    )
    means = (
        rep.groupBy("__b")
        .agg(
            F.sum(F.col("__w") * F.col("__vq")).alias("__sw"),
            F.sum("__w").alias("__cnt"),
        )
        .filter(F.col("__cnt") > 0)
        .select(
            "__b",
            F.try_divide(
                F.col("__sw").cast("double"),
                (F.col("__cnt") * F.lit(1 << fp_bits)).cast("double"),
            ).alias("__m"),
        )
    )
    asc = Window.orderBy(F.col("__m").asc(), F.col("__b").asc())
    desc = Window.orderBy(F.col("__m").desc(), F.col("__b").desc())
    ranked = means.withColumn("__ra", F.row_number().over(asc)).withColumn(
        "__rd", F.row_number().over(desc)
    )
    ci = ranked.agg(
        F.max(
            F.when(F.col("__ra") == trim + 1, F.col("__m"))
        ).alias("ci_lo"),
        F.max(
            F.when(F.col("__rd") == trim + 1, F.col("__m"))
        ).alias("ci_hi"),
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
    ).withColumn("__k", F.lit(1))
    return full.join(ci, "__k").select(
        "n_rows", "mean", "ci_lo", "ci_hi", "n_replicates"
    )


__all__ = ["bootstrap_mean_ci", "poisson1_thresholds"]
