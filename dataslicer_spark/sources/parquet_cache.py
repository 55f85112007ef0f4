"""S6 — write-through result cache with column-aware invalidation.

Reference: ``dataset.load_metadata`` / ``load_objtable``
(dataset.py:54-149): on load, use the cached CSV if it exists and contains
the requested columns (wildcard-aware), else recompute from FITS and
rewrite the cache.  Spark-first: the cache medium is parquet (columnar,
splittable, schema-carrying — the gzip-CSV of this engine), and the
column check reads only parquet FOOTERS (schema), never data.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..utils import strlist_in_strlist


class ParquetCache:
    """Write-through parquet cache keyed by dataset name + tag.

    ``load_or_compute`` mirrors the reference's probe logic
    (dataset.py:76-93): cached result is reused unless ``force_reload``,
    missing, or lacking the requested columns (``'*'`` substring wildcards
    supported, df_utils.py:107-139 semantics).
    """

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir

    def path_for(self, name: str, tag: str) -> str:
        return os.path.join(self.cache_dir, f"{name}_{tag}.parquet")

    def load_or_compute(
        self,
        spark: SparkSession,
        name: str,
        tag: str,
        compute: Callable[[], DataFrame],
        required_columns: Sequence[str] | None = None,
        force_reload: bool = False,
    ) -> DataFrame:
        path = self.path_for(name, tag)
        if not force_reload and os.path.exists(path):
            cached = spark.read.parquet(path)
            if required_columns is None or strlist_in_strlist(
                list(required_columns), cached.columns
            ):
                return cached
        df = compute()
        df.write.mode("overwrite").parquet(path)
        # re-read so downstream plans scan the materialized cache, not the
        # original compute DAG
        return spark.read.parquet(path)


__all__ = ["ParquetCache"]
