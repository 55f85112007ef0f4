"""Time-series resampling with forward-fill — regular-grid downsampling
of irregular event streams (north-star extension; the reference has no
temporal operators, SURVEY.md §2.11).

Composition, not a new kernel: per-key time grid (``sequence`` explode)
→ :func:`~dataslicer_spark.operators.asof.asof_join` back to the events.
Each grid point carries the latest observation at-or-before it, including
across empty buckets (forward fill).

Scale: the grid is |keys| × (span/step) rows — generated distributed
(explode of a per-key ``sequence``, no driver loop); the as-of join adds
one shuffle on the key.  Total: two key shuffles end-to-end, no
inequality-join fanout.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import check_col
from .asof import asof_join


def time_grid(
    df: DataFrame,
    ts_us_col: str,
    by_cols: Sequence[str],
    step_us: int,
) -> DataFrame:
    """Per-key regular grid: epoch-microsecond ticks every ``step_us``
    from the bucket of each key's first observation to the bucket of its
    last (inclusive — pandas ``.resample`` coverage).

    Grid ticks are ``floor(ts/step)*step`` multiples — engine-exact
    integer arithmetic (no timestamp rounding ambiguity)."""
    check_col([ts_us_col] + list(by_cols), df)
    spans = df.groupBy(*by_cols).agg(
        F.min(ts_us_col).alias("__lo"), F.max(ts_us_col).alias("__hi")
    )
    # bucket-align via pmod — exact for any int64 epoch including
    # pre-1970 negatives (both `%` and a double division would misalign:
    # `%` follows the dividend's sign, doubles round in the 2^50 range,
    # and engines disagree on int-division semantics).  The grid ends at
    # the bucket containing the last observation (pandas .resample
    # convention).
    start = F.col("__lo") - F.pmod(F.col("__lo"), F.lit(step_us))
    stop = F.col("__hi") - F.pmod(F.col("__hi"), F.lit(step_us))
    return spans.select(
        *by_cols,
        F.explode(
            F.sequence(start, stop, F.lit(step_us))
        ).alias("grid_ts"),
    )


def resample_ffill(
    df: DataFrame,
    ts_us_col: str,
    by_cols: Sequence[str],
    value_cols: Sequence[str],
    step_us: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Regular-grid forward-fill: for every key and grid tick, the value
    columns of the latest observation with ``ts <= tick``.

    Equivalent to pandas ``df.set_index(ts).groupby(keys).resample(step)
    .ffill()`` re-expressed as grid + as-of join."""
    check_col([ts_us_col] + list(by_cols) + list(value_cols), df)
    grid = time_grid(df, ts_us_col, by_cols, step_us).withColumnRenamed(
        "grid_ts", ts_us_col
    )
    right_cols = list(dict.fromkeys(
        list(by_cols) + [ts_us_col] + list(value_cols)
        + ([tiebreak_col] if tiebreak_col else [])
    ))
    out = asof_join(
        grid,
        df.select(*right_cols),
        ts_col=ts_us_col,
        by_cols=by_cols,
        value_cols=list(value_cols),
        tiebreak_col=tiebreak_col,
        matched_ts_name="obs_ts",
    )
    return out.withColumnRenamed(ts_us_col, "grid_ts")


__all__ = ["time_grid", "resample_ffill"]
