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


__all__ = ["corr_matrix"]
