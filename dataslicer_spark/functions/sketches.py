"""Sketch-based approximate aggregates — the mergeable scale path for
statistics the exact operators (A5/A6) compute precisely at small SF.

At 100 TB, exact COUNT(DISTINCT) over a high-cardinality key is a full
shuffle of every distinct value; an HLL sketch is a few KB per group,
computed map-side and merged associatively — and *storable*: sketch per
partition/day once, union for any rollup later without rescanning
(``hll_partial_sketches`` + ``hll_merge``).  Same story for quantiles
(``percentile_approx``'s KLL-ish summaries) and heavy hitters
(``freqItems``).  All built-in JVM aggregates — no UDFs, full
whole-stage-codegen.

These are Spark-native sketches (Apache DataSketches HLL under the
hood); estimates are not bit-comparable to DuckDB's sketches, so the
driver check is rows-only — the error-bound contracts are pytest-verified
against the exact operators instead.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import check_col


def hll_distinct(
    df: DataFrame,
    cols: Sequence[str],
    group_cols: Sequence[str] = (),
    lg_config_k: int = 12,
) -> DataFrame:
    """Approximate distinct counts per group: ``n_<col>`` for each col.

    ``lg_config_k=12`` → ~1.6% relative standard error in 4 KB per
    sketch; the A6-exact twin is ``aggregates.distinct_stats``.
    """
    check_col(list(cols) + list(group_cols), df)
    aggs = [
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(c), F.lit(lg_config_k))
        ).alias(f"n_{c}")
        for c in cols
    ]
    return df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)


def hll_partial_sketches(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str],
    lg_config_k: int = 12,
) -> DataFrame:
    """Per-group binary HLL sketches (store these next to your rollups).

    The 100 TB pattern: sketch each ingest partition once; any later
    rollup (day → month, file → field) is ``hll_merge`` over the stored
    sketches — no rescan of the fact data.
    """
    check_col([col] + list(group_cols), df)
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_config_k)).alias(f"hll_{col}")
    )


def hll_merge(
    sketches: DataFrame,
    sketch_col: str,
    group_cols: Sequence[str] = (),
    out_col: str = "distinct_estimate",
) -> DataFrame:
    """Union stored sketches (associative, loss-free) → estimate."""
    check_col([sketch_col] + list(group_cols), sketches)
    agg = F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(out_col)
    return (
        sketches.groupBy(*group_cols).agg(agg) if group_cols else sketches.agg(agg)
    )


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: Sequence[float],
    group_cols: Sequence[str] = (),
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate quantiles per group (one pass, mergeable summaries);
    the exact twin is ``aggregates.iqr_by_bin``'s percentile calls.
    Guarantee: rank error ≤ n/accuracy."""
    check_col([col] + list(group_cols), df)
    agg = F.percentile_approx(
        F.col(col), F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    ).alias(f"q_{col}")
    return df.groupBy(*group_cols).agg(agg) if group_cols else df.agg(agg)


def frequent_items(
    df: DataFrame, cols: Sequence[str], support: float = 0.01
) -> DataFrame:
    """Heavy hitters per column (single-pass Karp-Papadimitriou-Shenker;
    may contain false positives — verify with an exact count over the
    candidate set, which is tiny)."""
    check_col(list(cols), df)
    return df.stat.freqItems(list(cols), support)


def kll_partial_sketches(
    df: DataFrame,
    col: str,
    group_cols: Sequence[str],
    k: int = 200,
) -> DataFrame:
    """Per-group binary KLL quantile sketches — the quantile analogue of
    :func:`hll_partial_sketches`: sketch each ingest partition once,
    answer any later quantile question over any rollup by merging the
    stored sketches, never rescanning the fact data.  ``k=200`` ≈ 1.65%
    one-sided rank error at 99% confidence (DataSketches KLL bound).

    The value column is cast to double (KLL sketches are type-specific;
    double covers the numeric columns this engine profiles)."""
    check_col([col] + list(group_cols), df)
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(
            F.col(col).cast("double"), F.lit(k)
        ).alias(f"kll_{col}")
    )


def kll_merge_quantiles(
    sketches: DataFrame,
    sketch_col: str,
    probabilities: Sequence[float],
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge stored KLL sketches (associative) and read out quantile
    estimates: one ``q_<p>`` column per requested probability.

    ``kll_sketch_merge_double`` is a pairwise scalar, so the stored
    sketches are gathered per group and folded — fine at rollup grain,
    where a group holds one sketch per source partition (days, files),
    each a few KB."""
    check_col([sketch_col] + list(group_cols), sketches)
    lst = F.collect_list(F.col(sketch_col))
    step0 = (
        sketches.groupBy(*group_cols).agg(lst.alias("__lst"))
        if group_cols
        else sketches.agg(lst.alias("__lst"))
    )
    arr = F.col("__lst")
    merged = F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    step1 = step0.select(*list(group_cols), merged.alias("__m"))
    outs = [
        F.kll_sketch_get_quantile_double(
            F.col("__m"), F.lit(float(p))
        ).alias(f"q_{str(p).replace('.', '_')}")
        for p in probabilities
    ]
    return step1.select(*list(group_cols), *outs)


def cms_frequency(
    df: DataFrame,
    col: str,
    probe_values: Sequence,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 1,
) -> list[tuple]:
    """Count-Min-Sketch point-frequency estimates for ``probe_values``
    of ``col`` — the companion to :func:`frequent_items`' heavy-hitter
    *identification* (CMS answers "how often does THIS value occur").

    One distributed pass: the JVM ``count_min_sketch`` aggregate builds
    a mergeable sketch map-side (Cormode-Muthukrishnan guarantee:
    estimate ≥ true count, overshoot ≤ ``eps·N`` with probability
    ``confidence``); the few-KB sketch bytes come back to the driver,
    where each probe is read out via the engine's own
    ``CountMinSketch.readFrom`` — no readout SQL function exists, and a
    bounded probe list is inherently driver-side.

    Returns ``[(value, estimate), ...]``.
    """
    check_col([col], df)
    row = df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(float(eps)), F.lit(float(confidence)),
            F.lit(seed),
        ).alias("cms_bytes")
    ).head()
    spark = df.sparkSession
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(row[0])
    )
    return [(v, int(cms.estimateCount(v))) for v in probe_values]


def theta_set_counts(
    df: DataFrame,
    col: str,
    flag_col: str,
    a_value,
    b_value,
) -> DataFrame:
    """Approximate distinct-set algebra between two segments: |A|, |B|,
    |A∪B|, |A∩B|, |A\\B| of ``col`` values where ``flag_col`` equals
    ``a_value`` / ``b_value`` — the audience-overlap question HLL cannot
    answer (HLL unions but never intersects; Theta sketches support all
    three set operations — Apache DataSketches, built into Spark 4).

    One pass: two ``theta_sketch_agg`` aggregates (map-side partial +
    merge, a few KB each), then scalar sketch algebra on the single
    result row.  Returns ``n_a, n_b, n_union, n_intersection, n_diff``
    (A-minus-B) as bigint estimates.
    """
    check_col([col, flag_col], df)
    c, fl = F.col(col), F.col(flag_col)
    sk = df.agg(
        F.theta_sketch_agg(F.when(fl == a_value, c)).alias("__sa"),
        F.theta_sketch_agg(F.when(fl == b_value, c)).alias("__sb"),
    )
    sa, sb = F.col("__sa"), F.col("__sb")
    return sk.select(
        F.theta_sketch_estimate(sa).alias("n_a"),
        F.theta_sketch_estimate(sb).alias("n_b"),
        F.theta_sketch_estimate(F.theta_union(sa, sb)).alias("n_union"),
        F.theta_sketch_estimate(F.theta_intersection(sa, sb)).alias(
            "n_intersection"
        ),
        F.theta_sketch_estimate(F.theta_difference(sa, sb)).alias("n_diff"),
    )


__all__ = [
    "hll_distinct",
    "hll_partial_sketches",
    "hll_merge",
    "approx_quantiles",
    "frequent_items",
    "kll_partial_sketches",
    "kll_merge_quantiles",
    "cms_frequency",
    "theta_set_counts",
]
