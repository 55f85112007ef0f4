"""S2/S3 — FITS table & header sources.

Reference: ``fits_to_df`` (df_utils.py:11-74) reads one binary-table
extension per file with column projection ('*' substring wildcards),
array-column keep/drop, an optional row filter applied per file, and
numeric downcasting; ``metadata.load_header_meta`` (metadata.py:106-175)
scans headers sequentially, skipping corrupted files.

Spark-first shape:

- **Tables** (big): ``binaryFile`` scan → ``mapInPandas`` parser — each
  executor parses whole FITS files from bytes, applies projection and the
  row filter *inside the reader* (the pushdown the reference hand-rolls),
  and emits Arrow batches.  Parallelism = files.
- **Headers** (tiny — one row per file): driver-side loop building a small
  DataFrame, exactly like the reference; corrupt files are skipped with a
  warning (PERMISSIVE-mode analogue).

astropy is not available in this environment, so the default parser is
gated behind an import-try; the Spark plumbing accepts any
``parser(bytes) -> pandas.DataFrame`` / ``header_fn(bytes) -> dict``, and
the tests exercise it with a deterministic synthetic parser.  Swapping in
astropy on a real deployment changes one argument, not the plan.
"""

from __future__ import annotations

import fnmatch
import glob as globmod
from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..utils import expand_wildcard_columns


def _astropy_table_parser(extension: int, keep_array_cols: bool):
    try:
        from astropy.io import fits  # type: ignore
    except ImportError as e:  # pragma: no cover - astropy absent here
        raise NotImplementedError(
            "astropy is not installed; pass an explicit parser(bytes)->DataFrame "
            "to read_fits_tables (the Spark plumbing is format-agnostic)"
        ) from e

    import io

    def parse(raw: bytes) -> pd.DataFrame:
        with fits.open(io.BytesIO(raw)) as hdul:  # pragma: no cover
            data = hdul[extension].data
            cols = {}
            for dc in data.columns:
                vals = data[dc.name]
                # endianness normalization (reference df_utils.py:66-68);
                # numpy-2-safe form (ndarray.newbyteorder was removed)
                vals = (
                    vals.byteswap().view(vals.dtype.newbyteorder())
                    if vals.dtype.byteorder == ">"
                    else vals
                )
                if vals.ndim > 1:
                    if keep_array_cols:
                        cols[dc.name] = list(vals)
                else:
                    cols[dc.name] = vals
            return pd.DataFrame(cols)

    return parse


def read_fits_tables(
    spark: SparkSession,
    path_glob: str,
    parser: Callable[[bytes], pd.DataFrame] | None = None,
    schema=None,
    extension: int = 1,
    select_columns: Sequence[str] | str = "all",
    select_rows: str | None = None,
    keep_array_cols: bool = False,
    path_col: str = "PATH",
) -> DataFrame:
    """Multi-file FITS table scan with reader-side projection & filter.

    Equivalent of the reference's per-file loop (objtable.py:54-113) as a
    distributed scan: ``binaryFile`` rows → parse → project (wildcards,
    df_utils.py:52-59) → row filter (df_utils.py:70-71) → provenance
    ``PATH`` column (S7).  ``schema`` is the output StructType (required —
    one file parsed up front can supply it; we don't silently infer to
    keep the scan single-pass).
    """
    if parser is None:
        parser = _astropy_table_parser(extension, keep_array_cols)
    if schema is None:
        raise ValueError(
            "schema is required (parse one file driver-side to derive it)"
        )
    if isinstance(select_columns, str):
        select_columns = [select_columns]
    want_all = list(select_columns) == ["all"]
    out_fields = [f.name for f in schema.fields]

    binary = spark.read.format("binaryFile").load(path_glob)

    def run(batches):
        for pdf in batches:
            for path, raw in zip(pdf["path"], pdf["content"]):
                t = parser(raw)
                if not want_all:
                    keep = expand_wildcard_columns(list(select_columns), list(t.columns))
                    t = t[keep]
                if select_rows:
                    t = t.query(select_rows)
                t = t.copy()
                t[path_col] = path
                yield t[[c for c in out_fields]]

    return binary.select("path", "content").mapInPandas(run, schema)


def read_fits_headers(
    spark: SparkSession,
    path_glob: str,
    header_fn: Callable[[str], dict] | None = None,
    header_keys: Sequence[str] | None = None,
) -> DataFrame:
    """S3 — per-file header scan → small metadata DataFrame.

    Driver-side loop (metadata is one row per file — tiny by construction,
    same choice as the reference metadata.py:145-158); wildcard key
    selection uses substring semantics (metadata.py:151) and corrupted
    files are skipped with a warning (metadata.py:156-157).
    """
    if header_fn is None:
        try:
            from astropy.io import fits  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "astropy is not installed; pass header_fn(path)->dict"
            ) from e

        def header_fn(path: str) -> dict:  # pragma: no cover
            return dict(fits.getheader(path, 0))

    records = []
    for path in sorted(globmod.glob(path_glob)):
        try:
            hdr = header_fn(path)
        except OSError as e:
            import warnings

            warnings.warn(f"skipping corrupted file {path}: {e}")
            continue
        if header_keys is not None:
            hdr = {
                k: v
                for k, v in hdr.items()
                if any(
                    (patt.replace("*", "") in k) if "*" in patt else k == patt
                    for patt in header_keys
                )
            }
        hdr["PATH"] = path
        records.append(hdr)
    return spark.createDataFrame(pd.DataFrame.from_records(records))


__all__ = ["read_fits_tables", "read_fits_headers"]
