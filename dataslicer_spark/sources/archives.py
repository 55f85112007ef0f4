"""Concrete external-archive adapters for :func:`external_lookup_join`
(S11 end-to-end): the reference's two live connectors, re-shaped as
batch fetchers.

- IRSA exposure metadata via ``ztfquery`` — reference
  ``metadata.load_IRSA_meta`` (metadata.py:54-66): ONE
  ``expid+IN+(...)`` archive query for all distinct exposure ids, never
  a per-row lookup.
- PS1 calibrators from a MongoDB catalog via ``extcats``/``pymongo`` —
  reference ``PS1Cal_matching.match_to_PS1cal_fields``
  (PS1Cal_matching.py:92-95): one ``{'field': {'$in': fields}}`` query
  pre-filtered to the fields present in the data.

Both dependencies are import-gated (neither ships in this container);
the adapters accept an injectable client object — the reference's own
``ps1cal_query=None`` pattern (PS1Cal_matching.py:74-76) — so recorded
fixtures exercise the full fetch → broadcast-join path without the
network.  Each returns a ``fetch(keys) -> pandas.DataFrame`` closure for
``external_lookup_join``: the driver issues one bounded batch query and
Spark broadcast-joins the result back — the scale shape for a 100 TB
fact table against a remote service (distinct-key cardinality bounds
the fetch, `max_keys` bounds the driver).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd


def irsa_metadata_fetcher(
    kind: str = "sci",
    rcid: int | None = None,
    meta_cols: Sequence[str] | None = None,
    expid_col: str = "expid",
    zquery=None,
) -> Callable[[list], pd.DataFrame]:
    """Batch IRSA metadata fetch keyed by exposure id (metadata.py:54-86).

    ``zquery`` injects a prebuilt/fake ``ZTFQuery``-shaped object (needs
    ``load_metadata(kind=..., sql_query=...)`` and a ``metatable``
    pandas attribute); default constructs one from ``ztfquery``
    (import-gated)."""

    def fetch(keys: list) -> pd.DataFrame:
        zq = zquery
        if zq is None:
            try:
                from ztfquery import query as _zq
            except ImportError as e:
                raise NotImplementedError(
                    "IRSA metadata fetch requires the ztfquery package "
                    "(`pip install ztfquery`); pass zquery= to inject a "
                    "recorded fixture instead"
                ) from e
            zq = _zq.ZTFQuery()
        expids = ",".join("%d" % k for k in keys)
        sql = f"expid+IN+({expids})"
        if rcid is not None:
            sql += f" and rcid+=+{rcid}"
        zq.load_metadata(kind=kind, sql_query=sql)
        table = zq.metatable
        if meta_cols is not None:
            keep = list(dict.fromkeys(list(meta_cols) + ["expid"]))
            table = table[keep]
        # reference metadata.py:82-83: drop duplicated columns + rows
        table = table.loc[:, ~table.columns.duplicated()].drop_duplicates()
        if expid_col != "expid":
            table = table.rename(columns={"expid": expid_col})
        return table

    return fetch


def extcats_ps1cal_fetcher(
    rcids: Sequence[int] | None = None,
    projection: dict | None = None,
    src_coll=None,
    db_name: str = "ps1cal",
    coll_name: str = "srcs",
    field_col: str = "field",
) -> Callable[[list], pd.DataFrame]:
    """Batch PS1-calibrator fetch keyed by field id
    (PS1Cal_matching.py:88-97).

    ``src_coll`` injects any object with a Mongo-shaped
    ``find(query, projection)`` (e.g. a recorded fixture); default
    connects through ``extcats`` (import-gated).  ``rcids`` optionally
    narrows to the readout channels present in the data — the
    reference's ``{'field': {'$in': ...}, 'rcid': {'$in': ...}}``."""

    def fetch(keys: list) -> pd.DataFrame:
        coll = src_coll
        if coll is None:
            try:
                from extcats import CatalogQuery
            except ImportError as e:
                raise NotImplementedError(
                    "PS1 calibrator fetch requires the extcats package "
                    "(`pip install extcats`); pass src_coll= to inject a "
                    "recorded fixture instead"
                ) from e
            coll = CatalogQuery.CatalogQuery(
                db_name, coll_name, dbclient=None
            ).src_coll
        query = {field_col: {"$in": list(keys)}}
        if rcids is not None:
            query["rcid"] = {"$in": list(rcids)}
        rows = list(coll.find(query, projection))
        df = pd.DataFrame(rows)
        # Mongo's _id is not joinable/broadcastable payload
        return df.drop(columns=["_id"], errors="ignore")

    return fetch


def load_irsa_meta(
    df,
    expid_col: str = "expid",
    meta_cols: Sequence[str] | None = None,
    kind: str = "sci",
    rcid: int | None = None,
    zquery=None,
    how: str = "inner",
):
    """End-to-end ``load_IRSA_meta`` (metadata.py:17-86) on Spark:
    distinct exposure ids → ONE archive query → broadcast join back."""
    from .external import external_lookup_join

    return external_lookup_join(
        df,
        expid_col,
        irsa_metadata_fetcher(
            kind=kind, rcid=rcid, meta_cols=meta_cols,
            expid_col=expid_col, zquery=zquery,
        ),
        how=how,
    )


def match_ps1cal_fields(
    df,
    field_col: str = "fieldid",
    rcids: Sequence[int] | None = None,
    projection: dict | None = None,
    src_coll=None,
    how: str = "inner",
):
    """Field-level PS1 calibrator attach (PS1Cal_matching.py:73-97):
    the catalog rows for the dataset's fields broadcast-join back; the
    dataset names the key ``FIELDID`` while the catalog indexes
    ``field`` (PS1Cal_matching.py:64,92), so the fetch is renamed to
    ``field_col`` before the join.  Follow with
    ``operators/spatial.crossmatch_nearest`` for the per-source sky
    match the reference does with astropy."""
    from .external import external_lookup_join

    inner = extcats_ps1cal_fetcher(
        rcids=rcids, projection=projection, src_coll=src_coll,
        field_col="field",
    )

    def fetch(keys: list) -> pd.DataFrame:
        return inner(keys).rename(columns={"field": field_col})

    return external_lookup_join(df, field_col, fetch, how=how)


__all__ = [
    "irsa_metadata_fetcher",
    "extcats_ps1cal_fetcher",
    "load_irsa_meta",
    "match_ps1cal_fields",
]
