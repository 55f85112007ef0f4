"""S11 concrete adapters — live external-archive fetchers shaped like the
reference's two real integrations, pluggable into
:func:`..sources.external.external_lookup_join`.

Reference patterns re-expressed:

- ``metadata.load_IRSA_meta`` (metadata.py:54-86): one ``ztfquery``
  metadata query ``expid+IN+(...)`` over the distinct exposure ids, a
  column projection (always re-adding the join key), dedup, then an
  inner merge.  Here the fetch half becomes :func:`irsa_metadata_fetcher`
  and the merge half is the existing broadcast ``external_lookup_join``.
- ``PS1Cal_matching.match_to_PS1cal_fields`` (PS1Cal_matching.py:73-97):
  one ``extcats``/Mongo ``find({'field': {'$in': fields}}, proj)`` over
  the distinct field ids of the dataset — :func:`extcats_catalog_fetcher`.

Both archives are optional, network-bound dependencies, so the client
objects are injectable: tests (and air-gapped runs) pass a recorded
fixture client; production passes nothing and the adapter import-gates
the real library with a clear error.  The contract for either client is
duck-typed to the reference's own call surface, so a genuine
``ztfquery.query.ZTFQuery()`` / ``extcats.CatalogQuery`` drops in
unchanged.

Scale shape: the fetch happens ONCE on the driver, bounded by the
distinct-key cardinality (``external_lookup_join`` enforces
``max_keys``), and the result broadcasts — the 100 TB fact table is
never shuffled and the archive is never queried per row (the per-row
cone-search loop at PS1Cal_matching.py:191-213 is the anti-pattern this
replaces).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame

from .external import external_lookup_join


def _require(module: str, hint: str) -> Any:
    import importlib

    try:
        return importlib.import_module(module)
    except ImportError as exc:  # pragma: no cover - dependency gate
        raise ImportError(
            f"{module} is required for this archive adapter ({hint}); "
            "install it or inject a client/fixture object instead"
        ) from exc


def irsa_metadata_fetcher(
    kind: str = "sci",
    key_col: str = "expid",
    columns: Sequence[str] | None = None,
    extra_sql: str | None = None,
    zquery: Any | None = None,
) -> Callable[[list], pd.DataFrame]:
    """Build a ``fetch(keys)`` callable that loads IRSA image metadata
    for a set of key values via a ``ztfquery``-shaped client.

    ``zquery`` is any object with ``load_metadata(kind=..., sql_query=
    ...)`` and a ``metatable`` pandas attribute — the exact surface the
    reference drives (metadata.py:55-66).  When ``None``, the real
    ``ztfquery.query.ZTFQuery()`` is constructed (import-gated).

    The SQL fragment mirrors the reference byte-for-byte:
    ``expid+IN+(1,2,3)`` with an optional ``and rcid+=+k``-style suffix
    via ``extra_sql`` (metadata.py:59-63).  ``columns`` projects the
    archive's wide metatable, always re-adding ``key_col`` so the join
    key survives (metadata.py:73-75).
    """

    def fetch(keys: list) -> pd.DataFrame:
        client = zquery
        if client is None:  # pragma: no cover - network path
            zq = _require("ztfquery", "IRSA metadata queries").query
            client = zq.ZTFQuery()
        key_list = ",".join(
            "%d" % k if isinstance(k, (int,)) else str(k) for k in keys
        )
        sql = f"{key_col}+IN+({key_list})"
        if extra_sql:
            sql = f"{sql} and {extra_sql}"
        client.load_metadata(kind=kind, sql_query=sql)
        meta = client.metatable
        if columns is not None:
            keep = list(dict.fromkeys(list(columns) + [key_col]))
            meta = meta[keep]
        # the reference also strips duplicated column labels before the
        # merge (metadata.py:84-85)
        meta = meta.loc[:, ~meta.columns.duplicated()]
        return meta.drop_duplicates()

    return fetch


def extcats_catalog_fetcher(
    key_col: str = "field",
    projection: dict | None = None,
    extra_query: dict | None = None,
    src_coll: Any | None = None,
    db_name: str = "ps1cal",
    coll_name: str = "srcs",
) -> Callable[[list], pd.DataFrame]:
    """Build a ``fetch(keys)`` callable that pulls calibrator rows from
    an ``extcats``-shaped Mongo catalog with one ``$in`` query.

    ``src_coll`` is any object with ``find(query, projection)``
    returning an iterable of dicts — the surface the reference drives on
    ``CatalogQuery.src_coll`` (PS1Cal_matching.py:92-95).  When ``None``,
    a real ``extcats.CatalogQuery`` is constructed (import-gated).

    The query is exactly the reference's shape:
    ``{key_col: {"$in": keys}, **extra_query}`` — e.g. pass
    ``extra_query={"rcid": {"$in": rcs}}`` to reproduce the field+RC
    double prefilter.  Mongo's ``_id`` is dropped (not a data column).
    """

    def fetch(keys: list) -> pd.DataFrame:
        coll = src_coll
        if coll is None:  # pragma: no cover - network path
            extcats = _require("extcats", "calibrator catalog queries")
            coll = extcats.CatalogQuery.CatalogQuery(
                db_name, coll_name
            ).src_coll
        query = {key_col: {"$in": list(keys)}}
        if extra_query:
            query.update(extra_query)
        rows = pd.DataFrame([doc for doc in coll.find(query, projection)])
        return rows.drop(columns=["_id"], errors="ignore")

    return fetch


def load_irsa_meta(
    df: DataFrame,
    key_col: str = "expid",
    columns: Sequence[str] | None = None,
    kind: str = "sci",
    zquery: Any | None = None,
    how: str = "inner",
) -> DataFrame:
    """End-to-end ``load_IRSA_meta`` (metadata.py:17-86) on Spark:
    distinct keys → one archive query → broadcast inner join."""
    return external_lookup_join(
        df,
        key_col,
        irsa_metadata_fetcher(
            kind=kind, key_col=key_col, columns=columns, zquery=zquery
        ),
        how=how,
    )


def match_ps1cal_fields(
    df: DataFrame,
    field_col: str = "fieldid",
    catalog_field_col: str = "field",
    projection: dict | None = None,
    extra_query: dict | None = None,
    src_coll: Any | None = None,
    how: str = "inner",
) -> DataFrame:
    """Field-level PS1 calibrator attach (PS1Cal_matching.py:73-97):
    the catalog rows for the dataset's fields broadcast-join back onto
    the frame; follow with ``operators/spatial.crossmatch_nearest`` for
    the per-source sky match the reference does with astropy.

    The dataset names the key ``FIELDID`` while the catalog indexes it
    as ``field`` (PS1Cal_matching.py:64,92) — the catalog is queried by
    ``catalog_field_col`` and the result renamed to ``field_col`` for
    the join."""
    inner = extcats_catalog_fetcher(
        key_col=catalog_field_col,
        projection=projection,
        extra_query=extra_query,
        src_coll=src_coll,
    )

    def fetch(keys: list) -> pd.DataFrame:
        return inner(keys).rename(columns={catalog_field_col: field_col})

    return external_lookup_join(df, field_col, fetch, how=how)


__all__ = [
    "irsa_metadata_fetcher",
    "extcats_catalog_fetcher",
    "load_irsa_meta",
    "match_ps1cal_fields",
]
