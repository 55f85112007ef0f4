"""Data-quality operators: table profiling and constraint validation
(north-star extension — the reference's only validation is ``check_col``
presence checks, ``df_utils.py:77-105``; a 100 TB lake needs asserted
invariants, not hope).

Scale design: profiling is ONE aggregate pass over the table (the
per-column distinct counts expand map-side and combine partially — no
per-column scans); uniqueness violations are a single groupBy;
referential orphans are one anti-join that broadcasts whichever side is
the dimension.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..utils import check_col


def profile_table(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column profile: row count, null count, exact distinct count.

    One aggregation job for all columns (Catalyst expands the distinct
    aggregates map-side; swap ``approx_count_distinct`` in at extreme
    widths).  Returns one row per column: ``(column, n_rows, n_nulls,
    n_distinct)`` — counts only, no value casts, so the output is
    engine-exact for any column type.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    check_col(cols, df)
    # positional internal aliases + df[c] references: arbitrary column
    # names (hyphens, spaces, quotes, dots) profile without SQL-identifier
    # games; only the escaped display literal carries the original name
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(df[c]).alias(f"__nn_{i}"))
        aggs.append(F.countDistinct(df[c]).alias(f"__nd_{i}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        "'{lit}', __n - __nn_{i}, __nd_{i}".format(
            lit=c.replace("\\", "\\\\").replace("'", "\\'"), i=i
        )
        for i, c in enumerate(cols)
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (col_name, n_nulls, n_distinct)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct")


def uniqueness_violations(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Key groups that break a uniqueness constraint: one row per
    duplicated key with its multiplicity (``n_rows > 1``)."""
    keys = list(key_cols)
    check_col(keys, df)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def referential_orphans(
    child: DataFrame,
    parent: DataFrame,
    fk_cols: Sequence[str],
    pk_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Child rows whose foreign key has no matching parent row (NULL FKs
    are not orphans — SQL FK semantics).  One anti-join; Catalyst
    broadcasts the parent side when it is dimension-sized."""
    fks = list(fk_cols)
    pks = list(pk_cols) if pk_cols is not None else fks
    if len(fks) != len(pks):
        raise ValueError("fk_cols and pk_cols must have equal length")
    check_col(fks, child)
    check_col(pks, parent)
    non_null = None
    for f_c in fks:
        c = F.col(f_c).isNotNull()
        non_null = c if non_null is None else (non_null & c)
    filtered = child.filter(non_null)
    pview = parent.select(*pks)
    cond = None
    for f_c, p_c in zip(fks, pks):
        c = filtered[f_c] == pview[p_c]
        cond = c if cond is None else (cond & c)
    return filtered.join(pview, cond, "left_anti")


def constraint_report(
    constraints: Sequence[tuple[str, DataFrame]],
) -> DataFrame:
    """Roll a set of named violation DataFrames into one report row per
    constraint: ``(constraint, n_violations)``.  Each violation frame is
    aggregated to a count before the union, so the report materializes
    |constraints| single-row aggregates — not the violations themselves."""
    if not constraints:
        raise ValueError("no constraints given")
    out = None
    for name, viol in constraints:
        row = viol.agg(
            F.count(F.lit(1)).alias("n_violations")
        ).select(F.lit(name).alias("constraint"), "n_violations")
        out = row if out is None else out.unionByName(row)
    return out


def key_skew_report(
    df: DataFrame,
    key_cols,
    top: int = 10,
) -> DataFrame:
    """Shuffle-key skew diagnostic: the ``top`` heaviest values of a
    prospective join/groupBy key with their row share — the number you
    read BEFORE deciding on salting (``operators/skew.py``) or AQE skew
    hints.  A key whose top value holds >1/parallelism of the rows will
    straggle one task at shuffle time regardless of cluster size.

    Output: (key, n, share, rank), heaviest first, deterministic ties
    (n desc, key asc).  Plan: ONE hash aggregate on the key (map-side
    partials), a 1-row broadcast total, distributed TakeOrdered — the
    full key histogram never sorts globally and never reaches the
    driver.
    """
    keys = list(key_cols)
    check_col(keys, df)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).select(
        F.concat_ws("|", *[F.col(k).cast("string") for k in keys]).alias(
            "key"
        ),
        "n",
    )
    total = df.count()
    heavy = counts.orderBy(F.col("n").desc(), F.col("key").asc()).limit(top)
    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    return (
        heavy.withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn(
            "share", F.col("n").cast("double") / F.lit(float(total))
        )
        .select("rank", "key", "n", "share")
    )


__all__ = [
    "profile_table",
    "uniqueness_violations",
    "referential_orphans",
    "constraint_report",
    "key_skew_report",
]
