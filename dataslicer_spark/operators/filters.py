"""Filter operators (SURVEY.md §2.2: P1, P3, P4, P5, P6).

Design: every "filter with rejected complement" verb in the reference
mutates in place and returns (or pretends to return — see §2.9 B4) the
complement.  Here each returns ``(kept, rejected)`` as two lazy DataFrames
over the same parent plan.  At scale both sides reuse one scan: Spark
evaluates the parent once per action, and the predicate is pushed into the
parquet reader for the ``kept`` side.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import check_col, query_df, translate_query_expr


def filter_with_complement(
    df: DataFrame, expr: str | Column, params: dict[str, Any] | None = None
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (matching, non-matching-or-null).

    Mirrors the reference's pattern of returning rejected rows
    (``objtable.py:386-409``, ``_objtable_methods.py:488``) — implemented
    correctly, unlike reference bug B4 where the rejected side was ``None``
    (``srcdf.py:612-613``).

    Null semantics: rows where the predicate is NULL land in ``rejected``
    (pandas ``query`` drops NaN comparisons from the kept set too).
    """
    cond = F.expr(translate_query_expr(expr, params)) if isinstance(expr, str) else expr
    kept = df.filter(cond)
    rejected = df.filter(~F.coalesce(cond, F.lit(False)))
    return kept, rejected


def trim_edges(
    df: DataFrame,
    dx: float,
    dy: float,
    xname: str = "xpos",
    yname: str = "ypos",
    xsize: float = 3072.0,
    ysize: float = 3080.0,
) -> tuple[DataFrame, DataFrame]:
    """P3 — keep sources in the detector interior.

    Reference: ``srcdf.trim_edges`` (srcdf.py:578-613) keeps
    ``dx < x < (xsize-dx) AND dy < y < (ysize-dy)``; detector constants
    ``3072×3080`` at srcdf.py:30.  Returns (kept, rejected) — the reference
    advertises the rejected set but returns None (bug B4); we implement the
    documented intent.
    """
    check_col([xname, yname], df)
    x, y = F.col(xname), F.col(yname)
    cond = (x > dx) & (x < xsize - dx) & (y > dy) & (y < ysize - dy)
    return filter_with_complement(df, cond)


def magnitude_bin_filter(
    df: DataFrame, col: str, lo: float = 17.5, hi: float = 18.5
) -> DataFrame:
    """P4 — keep rows inside a closed magnitude bin.

    Reference: two in-place drops at ``_objtable_methods.py:232-234``.
    """
    check_col(col, df)
    return df.filter((F.col(col) >= lo) & (F.col(col) <= hi))


def nonzero_error_filter(df: DataFrame, err_col: str) -> DataFrame:
    """P5 — drop rows with zero measurement error before regression
    (reference: srcdf.py:276-282)."""
    check_col(err_col, df)
    return df.filter(F.col(err_col) != 0)


def drop_unmatched(df: DataFrame, match_col: str) -> DataFrame:
    """P6 — drop rows whose (left-)join produced no match.

    Reference idiom: ``dropna(subset=['dist2ps1'])`` after a left merge
    (``_objtable_methods.py:102-105`` et al.), which converts the left join
    into an inner join.  At scale, prefer an inner join upfront — this verb
    exists for parity when the unmatched rows were needed first.
    """
    check_col(match_col, df)
    return df.filter(F.col(match_col).isNotNull())


__all__ = [
    "filter_with_complement",
    "trim_edges",
    "magnitude_bin_filter",
    "nonzero_error_filter",
    "drop_unmatched",
    "query_df",
]
