"""S9/S11 — external-service lookups as fetch-then-broadcast joins.

Reference patterns:

- ``metadata.load_IRSA_meta`` (metadata.py:17-86): collect the distinct
  EXPIDs, issue one ``expid IN (...)`` remote query, project, dedup, inner
  join — NOT a per-row lookup.
- ``PS1Cal_matching.match_to_PS1cal_fields`` (PS1Cal_matching.py:73-97):
  pre-filter the catalog by ``field IN (...)`` before matching (partition
  pruning on the dimension side).

Spark-first: both are one driver-side batch fetch (bounded by distinct-key
cardinality) turned into a broadcast inner join.  The anti-pattern this
replaces — the reference's per-row healpix cone search loop
(PS1Cal_matching.py:191-213) — is S10, deliberately not ported.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import check_col


def external_lookup_join(
    df: DataFrame,
    key_col: str,
    fetch: Callable[[list], "pd.DataFrame"],
    select_cols: Sequence[str] | None = None,
    how: str = "inner",
    max_keys: int = 1_000_000,
) -> DataFrame:
    """Enrich ``df`` from an external service keyed by ``key_col``.

    1. collect distinct keys (driver-side; bounded — raises over
       ``max_keys`` so a fact-table key can't flood the driver),
    2. ``fetch(keys)`` once → pandas (the service's ``IN (...)`` query),
    3. dedup on the key (reference metadata.py:82-83 — avoid join fanout),
    4. broadcast join back.
    """
    check_col(key_col, df)
    keys = [r[0] for r in df.select(key_col).distinct().collect()]
    if len(keys) > max_keys:
        raise ValueError(
            f"{len(keys)} distinct keys exceeds max_keys={max_keys}; "
            "partition the fetch or pre-aggregate"
        )
    fetched = fetch(keys)
    if select_cols is not None:
        keep = list(dict.fromkeys(list(select_cols) + [key_col]))
        fetched = fetched[keep]
    lookup = df.sparkSession.createDataFrame(fetched).dropDuplicates([key_col])
    overlap = (set(lookup.columns) & set(df.columns)) - {key_col}
    if overlap:
        lookup = lookup.drop(*overlap)
    return df.join(F.broadcast(lookup), on=key_col, how=how)


def prune_catalog_by_keys(
    catalog: DataFrame, df: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Dimension-side partition pruning: keep only catalog rows whose key
    combination occurs in ``df`` (the ``use='fieldid'`` strategy,
    PS1Cal_matching.py:68-95).  With the catalog partitioned by these
    keys on disk, Catalyst turns this into static partition pruning."""
    check_col(keys, catalog)
    check_col(keys, df)
    return catalog.join(
        F.broadcast(df.select(*keys).distinct()), on=list(keys), how="left_semi"
    )


__all__ = ["external_lookup_join", "prune_catalog_by_keys"]
