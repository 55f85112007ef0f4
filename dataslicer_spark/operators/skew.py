"""Skew mitigation: salted aggregation and salted joins.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`, on in
:mod:`..session`), which splits skewed *join* partitions at runtime.  These
helpers cover what AQE can't:

- a single group key holding a large share of all rows makes one reducer
  the straggler for ``groupBy`` — :func:`salted_group_agg` splits each key
  into ``n_salts`` sub-groups (map-side key spread) and re-merges, turning
  one hot reducer into ``n_salts`` parallel ones;
- a shuffle join against a hot key where the dimension side is too big to
  broadcast — :func:`salted_join` replicates the small side per salt so
  the hot key's rows spread over ``n_salts`` tasks.

Both are algebraic rewrites: results are identical to the unsalted plan
(tests assert equality), only the partitioning changes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import check_col

# aggregate spec: out_name -> (kind, input column); kinds are the
# mergeable ones (partial result of the same kind re-aggregates exactly)
_MERGE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_group_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str | Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation with salted keys.

    ``aggs`` maps output name → (kind, column), kind ∈ {sum, count, min,
    max} (the decomposable aggregates; avg = sum/count at the call site).
    Stage 1 groups by (key…, salt) — the hot key's rows split across
    ``n_salts`` reducers; stage 2 merges the tiny partial table.

    The salt cycles 0..n_salts−1 within every scan partition
    (``monotonically_increasing_id % n``), so a hot key spreads evenly
    even when it is concentrated in few input partitions.
    """
    check_col(list(group_cols), df)
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    stage1 = salted.groupBy(*group_cols, "__salt").agg(
        *[
            _MERGE[kind][0](col).alias(name)
            for name, (kind, col) in aggs.items()
        ]
    )
    return stage1.groupBy(*group_cols).agg(
        *[
            _MERGE[kind][1](name).alias(name)
            for name, (kind, _col) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the small side replicated per salt.

    The big side gets a per-row salt; the small side is exploded to all
    ``n_salts`` values, so the join key becomes (key…, salt) and a hot
    key's rows land on ``n_salts`` different tasks.  Use when the small
    side exceeds the broadcast threshold but n_salts× replication is still
    cheap (classic skew-join rewrite).
    """
    keys = list(on)
    check_col(keys, big)
    check_col(keys, small)
    b = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, on=keys + ["__salt"], how=how).drop("__salt")


__all__ = ["salted_group_agg", "salted_join"]
