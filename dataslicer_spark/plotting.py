"""Diagnostic plot sinks — the reference workflow's terminal step.

The reference ends most analyses in matplotlib diagnostics saved through
``dataset_base.save_fig`` (dataset_base.py:72-96), e.g. the calibrated
magnitude histogram / error scatter in ``objtable.calmag``
(objtable.py:334-346) and the outlier-removal panels
(_objtable_methods.py:375-409).  Those plot a pandas DataFrame that is
already on the driver; here the frame is distributed, so every plot
goes through :func:`bounded_sample_pandas` first — the driver never
materializes more than ``max_rows`` rows no matter the corpus size
(the 100 TB rule: plots are sketches of the data, not the data).

matplotlib is import-gated (not installed in this container): the
sampling/plumbing is real and tested; rendering raises a clear
``NotImplementedError`` until the dependency is present.
"""

from __future__ import annotations

import logging
import os
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .utils import check_col

_LOG = logging.getLogger(__name__)


def _matplotlib():
    try:
        import matplotlib

        matplotlib.use("Agg")  # headless: never require a display
        import matplotlib.pyplot as plt

        return plt
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "diagnostic plots require matplotlib, which is not installed "
            "in this environment; `pip install matplotlib` to enable "
            "(the bounded sampling underneath is fully functional)"
        ) from e


def bounded_sample_df(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    max_rows: int = 100_000,
) -> DataFrame:
    """The capped-sample plan: order by a row-value hash and take the
    first ``max_rows`` — Spark plans a ``TakeOrderedAndProject`` (each
    executor keeps at most ``max_rows`` rows, the driver merges; no
    global sort, no full collect).  Hash order makes the subset
    pseudo-random yet deterministic across runs and partitionings, with
    no count-then-sample second job.  Column pruning happens before the
    hash, so the scan reads only the plotted columns."""
    if cols:
        check_col(list(cols), df)
        df = df.select(*cols)
    return df.orderBy(F.xxhash64(F.struct(*df.columns))).limit(max_rows)


def bounded_sample_pandas(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    max_rows: int = 100_000,
):
    """``toPandas()`` capped at ``max_rows`` driver rows, enforced
    DISTRIBUTEDLY via :func:`bounded_sample_df`."""
    return bounded_sample_df(df, cols, max_rows).toPandas()


def save_fig(fig, name: str, plot_dir: str | None = None, **savefig_kwargs):
    """Save a figure to ``plot_dir/name`` (reference
    ``dataset_base.save_fig``, dataset_base.py:72-96: falls back to the
    current directory with a warning when no plot dir is set)."""
    if plot_dir is None:
        _LOG.warning("plot directory not set; saving figure to current dir")
        plot_dir = "."
    os.makedirs(plot_dir, exist_ok=True)
    filename = os.path.join(plot_dir, name)
    _LOG.info("saving plot to %s", filename)
    fig.savefig(filename, **savefig_kwargs)
    return filename


def plot_histogram(
    df: DataFrame,
    col: str,
    bins: int = 100,
    name: str | None = None,
    plot_dir: str | None = None,
    max_rows: int = 100_000,
    xlabel: str | None = None,
) -> str:
    """Histogram diagnostic of one column (reference ``calmag``'s
    magnitude histogram, objtable.py:334-346) over a bounded sample."""
    pdf = bounded_sample_pandas(df, [col], max_rows)
    plt = _matplotlib()
    fig, ax = plt.subplots()
    ax.hist(pdf[col].dropna(), bins=bins)
    ax.set_xlabel(xlabel or col)
    ax.set_ylabel("count")
    fig.tight_layout()
    out = save_fig(fig, name or f"{col}_hist.png", plot_dir)
    plt.close(fig)
    return out


def plot_scatter(
    df: DataFrame,
    x_col: str,
    y_col: str,
    name: str | None = None,
    plot_dir: str | None = None,
    max_rows: int = 100_000,
    xlabel: str | None = None,
    ylabel: str | None = None,
) -> str:
    """Scatter diagnostic of two columns (reference ``calmag``'s
    magnitude-vs-error scatter, objtable.py:340-343) over a bounded
    sample."""
    pdf = bounded_sample_pandas(df, [x_col, y_col], max_rows)
    plt = _matplotlib()
    fig, ax = plt.subplots()
    ax.scatter(pdf[x_col], pdf[y_col], s=2)
    ax.set_xlabel(xlabel or x_col)
    ax.set_ylabel(ylabel or y_col)
    fig.tight_layout()
    out = save_fig(fig, name or f"{x_col}_{y_col}_scatter.png", plot_dir)
    plt.close(fig)
    return out


__all__ = [
    "bounded_sample_df",
    "bounded_sample_pandas",
    "save_fig",
    "plot_histogram",
    "plot_scatter",
]
