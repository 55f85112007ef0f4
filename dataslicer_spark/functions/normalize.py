"""Text canonicalization: Unicode normalization + whitespace/control
cleanup — the first transform of every text pipeline.

Dedup, tokenization, and fingerprinting all assume canonical bytes:
``café`` as U+00E9 and ``café`` as ``e`` + U+0301 are distinct strings
to every hash in the engine while being the same text to every reader.
Web corpora mix the two freely (different editors, different CMSes), so
skipping normalization silently deflates duplicate detection and
inflates vocabulary size.

Spark has no built-in Unicode normalizer (the JVM's ``java.text.
Normalizer`` is not exposed as a SQL function), so the normalization
step is an Arrow-batched pandas UDF over pandas' ``str.normalize`` —
the one Python hop, placed FIRST so every downstream op stays JVM-side
on canonical text.  Whitespace collapse and control-char stripping are
plain JVM regexps.

The NFC form has an engine-independent oracle (DuckDB
``nfc_normalize``) — see ``txt_normalize`` in
``plans/extension_queries.py``; NFD/NFKC/NFKD are property-tested in
pytest against :mod:`unicodedata` directly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..utils import check_col

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def normalize_unicode(col: Column, form: str = "NFC") -> Column:
    """Unicode-normalize a string column (Arrow-batched; nulls pass
    through)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return _norm(col)


def clean_text(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    collapse_whitespace: bool = True,
    strip_control: bool = True,
    lowercase: bool = False,
) -> DataFrame:
    """Rewrite ``text_col`` canonicalized; adds ``was_changed``.

    Order matters: Unicode normalization first (the Python hop),
    then JVM regexps — control chars (C0/C1 minus ``\\t\\n\\r``, which
    become spaces via the whitespace collapse), whitespace runs → one
    space, outer trim, optional lowercase (after normalization, since
    NFKC can introduce case-carrying compatibility chars)."""
    check_col(text_col, df)
    t = F.col(text_col)
    out = normalize_unicode(t, form)
    if strip_control:
        out = F.regexp_replace(
            out, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]", ""
        )
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    if lowercase:
        out = F.lower(out)
    return df.withColumn("__clean", out).select(
        *[c for c in df.columns if c != text_col],
        F.col("__clean").alias(text_col),
        (~F.col("__clean").eqNullSafe(t)).alias("was_changed"),
    )


__all__ = ["normalize_unicode", "clean_text"]
