"""Exact second-moment statistics — Pearson correlation matrices whose
values replay bit for bit in an external engine.

Float Pearson is the textbook nondeterminism trap: Σx·y over doubles is
partitioning-dependent, so two runs of the same job — let alone two
engines — disagree in the last ulps.  Here every moment cell is EXACT:
values are quantized to integers once (``floor(v·scale)``, one IEEE
multiply+floor identical everywhere), linear sums ride int64, and the
quadratic sums (Σx², Σx·y) ride ``decimal(38,0)`` — Spark's decimal
aggregation is exact integer arithmetic (as is DuckDB's HUGEINT), so
order and partitioning cannot change a single digit.  Floats re-enter
only in the last projection:

    corr = double(n·Sxy − Sx·Sy) / (sqrt(double(n·Sxx − Sx²)) ·
                                    sqrt(double(n·Syy − Sy²)))

— three exact-integer→double conversions (round-to-nearest, identical
in every IEEE engine), two correctly-rounded sqrts, one multiply, one
divide, in a pinned order the SQL oracle mirrors.

Magnitude budget: quadratic cells live in 38 decimal digits, so
``n · (max|v|·scale)²`` must stay under ~10³⁸ — e.g. 10¹² rows of
values up to 10¹⁰ quantization units.  int64 linear cells need
``n · max|v|·scale < 2⁶³``.  The caller owns ``scale``.

Scale shape: ONE scan, ONE aggregate — k linear + k(k+1)/2 quadratic
cells per partition on the wire (map-side partial aggregation), a
1-row result exploded to the k(k−1)/2 pair rows.  Nothing else moves.
"""

from __future__ import annotations

from itertools import combinations
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import check_col


def corr_matrix(
    df: DataFrame,
    cols: Sequence[str],
    scale: float = 100.0,
) -> DataFrame:
    """Exact Pearson correlations for every pair of ``cols``.

    Rows with a NULL in ANY of ``cols`` are dropped (pairwise-complete
    would give each pair a different n — confusing and rarely wanted).
    Returns one row per unordered pair: ``var_x, var_y`` (names, in
    ``cols`` order), ``n``, and ``corr`` (NULL via ``try_divide`` when
    either variance is zero).
    """
    cs = list(cols)
    if len(cs) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    check_col(cs, df)

    cond = F.col(cs[0]).isNotNull()
    for c in cs[1:]:
        cond = cond & F.col(c).isNotNull()
    clean = df.filter(cond)
    q = {
        c: F.floor(F.col(c).cast("double") * F.lit(float(scale))).cast(
            "long"
        )
        for c in cs
    }
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).cast(dec).alias("n")]
    for c in cs:
        aggs.append(F.sum(q[c]).cast(dec).alias(f"s_{c}"))
    for a, b in combinations(cs, 2):
        aggs.append(
            F.sum(q[a].cast("decimal(19,0)") * q[b].cast("decimal(19,0)"))
            .cast(dec)
            .alias(f"p_{a}_{b}")
        )
    for c in cs:
        aggs.append(
            F.sum(q[c].cast("decimal(19,0)") * q[c].cast("decimal(19,0)"))
            .cast(dec)
            .alias(f"p_{c}_{c}")
        )
    cells = clean.agg(*aggs)

    pair_rows = []
    for a, b in combinations(cs, 2):
        num = (
            F.col("n") * F.col(f"p_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        ).cast("double")
        va = (
            F.col("n") * F.col(f"p_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        ).cast("double")
        vb = (
            F.col("n") * F.col(f"p_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        ).cast("double")
        pair_rows.append(
            F.struct(
                F.lit(a).alias("var_x"),
                F.lit(b).alias("var_y"),
                F.col("n").cast("long").alias("n"),
                F.try_divide(num, F.sqrt(va) * F.sqrt(vb)).alias("corr"),
            )
        )
    return cells.select(
        F.explode(F.array(*pair_rows)).alias("pair")
    ).select("pair.var_x", "pair.var_y", "pair.n", "pair.corr")


def benford_first_digit(
    df: DataFrame, value_col: str, scale: int = 100
) -> DataFrame:
    """First-significant-digit distribution of a value column vs
    Benford's law — the classic fabricated-data / unit-mixup detector
    for financial-style columns (naturally-grown magnitudes follow
    P(d) = log₁₀(1 + 1/d); synthetic or truncated data does not).

    Engine-exact digit extraction without float log10: values quantize
    to integers once (``floor(v·scale + 0.5)`` — half-up, identical
    everywhere, sidestepping Spark round-half-up vs DuckDB half-even),
    non-positive quantized values are dropped, and the first digit is
    the leading character of the INTEGER's decimal string (int64→string
    is engine-identical; float→string is not).  The Benford expectations
    enter as Python-computed double literals, so both engines compare
    against bit-identical constants.

    Plan: one scan → 9-row hash aggregate with map-side partials; the
    grand total is a broadcast 1-row aggregate re-joined to the 9-row
    histogram (the m3 pattern — the "nested loop" is 9×1).

    Output: ``digit`` (1–9, observed digits only), ``n``, ``frac``,
    ``benford`` (expected fraction), ``abs_dev``.
    """
    import math

    check_col([value_col], df)
    if scale <= 0:
        raise ValueError("scale must be positive")
    qi = F.floor(
        F.col(value_col).cast("double") * F.lit(float(scale)) + F.lit(0.5)
    ).cast("long")
    # digit extraction only AFTER the positivity filter: ANSI string→int
    # cast would throw on the '-' of a negative quantized value
    pos = df.select(qi.alias("__q")).filter(F.col("__q") > 0)
    digit = F.substring(F.col("__q").cast("string"), 1, 1).cast("int")
    hist = pos.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = hist.groupBy().agg(F.sum("n").alias("__total"))
    exp_map = F.create_map(
        *[
            c
            for d in range(1, 10)
            for c in (F.lit(d), F.lit(math.log10(1.0 + 1.0 / d)))
        ]
    )
    frac = F.col("n").cast("double") / F.col("__total").cast("double")
    out = hist.join(F.broadcast(total)).select(
        "digit",
        "n",
        frac.alias("frac"),
        exp_map[F.col("digit")].alias("benford"),
    )
    return out.withColumn("abs_dev", F.abs(F.col("frac") - F.col("benford")))


BENFORD_EXPECTED = {
    d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)
}


__all__ = ["corr_matrix", "benford_first_digit", "BENFORD_EXPECTED"]
