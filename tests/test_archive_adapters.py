"""Archive adapters (sources/archive_adapters.py) against recorded
fixture clients — the ztfquery / extcats call surfaces the reference
drives (metadata.py:54-86, PS1Cal_matching.py:73-97), replayed offline."""

from __future__ import annotations

import pandas as pd
import pytest

from dataslicer_spark.sources.archive_adapters import (
    extcats_catalog_fetcher,
    irsa_metadata_fetcher,
    load_irsa_meta,
    match_ps1cal_fields,
)


class FakeZTFQuery:
    """Recorded-fixture stand-in for ztfquery.query.ZTFQuery: one
    metadata table, filtered by the expid IN (...) fragment it is sent."""

    def __init__(self, table: pd.DataFrame):
        self._table = table
        self.metatable: pd.DataFrame | None = None
        self.calls: list[tuple[str, str]] = []

    def load_metadata(self, kind: str, sql_query: str) -> None:
        self.calls.append((kind, sql_query))
        inside = sql_query.split("(", 1)[1].split(")", 1)[0]
        keys = [int(k) for k in inside.split(",")]
        self.metatable = self._table[self._table["expid"].isin(keys)]


class FakeSrcColl:
    """Recorded-fixture stand-in for an extcats src_coll: list-of-dicts
    store answering find({key: {"$in": [...]}, ...}, projection)."""

    def __init__(self, docs: list[dict]):
        self._docs = docs
        self.queries: list[dict] = []

    def find(self, query: dict, projection=None):
        self.queries.append(query)

        def ok(doc):
            for col, cond in query.items():
                allowed = cond["$in"] if isinstance(cond, dict) else [cond]
                if doc.get(col) not in allowed:
                    return False
            return True

        for doc in self._docs:
            if ok(doc):
                if projection:
                    yield {k: doc[k] for k in projection if k in doc}
                else:
                    yield dict(doc)


@pytest.fixture()
def irsa_fixture() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "expid": [10, 11, 12, 12],
            "seeing": [1.1, 2.2, 3.3, 3.3],
            "airmass": [1.0, 1.2, 1.4, 1.4],
            "obsdate": ["a", "b", "c", "c"],
        }
    )


def test_irsa_fetcher_query_shape_and_projection(irsa_fixture):
    zq = FakeZTFQuery(irsa_fixture)
    fetch = irsa_metadata_fetcher(columns=["seeing"], zquery=zq)
    out = fetch([12, 10])
    # reference query fragment shape: expid+IN+(...) (metadata.py:59)
    assert zq.calls == [("sci", "expid+IN+(12,10)")]
    # projection keeps the join key and dedups (metadata.py:73-85)
    assert sorted(out.columns) == ["expid", "seeing"]
    assert len(out) == 2 and set(out["expid"]) == {10, 12}


def test_irsa_fetcher_extra_sql(irsa_fixture):
    zq = FakeZTFQuery(irsa_fixture)
    irsa_metadata_fetcher(extra_sql="rcid+=+5", zquery=zq)([10])
    assert zq.calls[0][1] == "expid+IN+(10) and rcid+=+5"


def test_load_irsa_meta_end_to_end(spark, irsa_fixture):
    zq = FakeZTFQuery(irsa_fixture)
    df = spark.createDataFrame(
        [(1, 10), (2, 12), (3, 12), (4, 99)], "src int, expid int"
    )
    out = load_irsa_meta(df, "expid", columns=["seeing"], zquery=zq)
    rows = {r.src: r.seeing for r in out.collect()}
    # inner join: expid 99 has no archive row (reference merge semantics)
    assert rows == {1: pytest.approx(1.1), 2: pytest.approx(3.3),
                    3: pytest.approx(3.3)}
    # ONE archive query for the whole frame, over distinct keys only
    assert len(zq.calls) == 1


def test_extcats_fetcher_in_query_and_id_drop():
    coll = FakeSrcColl(
        [
            {"_id": "x1", "field": 1, "rcid": 0, "ra": 1.0, "dec": 2.0},
            {"_id": "x2", "field": 1, "rcid": 1, "ra": 3.0, "dec": 4.0},
            {"_id": "x3", "field": 2, "rcid": 0, "ra": 5.0, "dec": 6.0},
        ]
    )
    fetch = extcats_catalog_fetcher(
        key_col="field", extra_query={"rcid": {"$in": [0]}}, src_coll=coll
    )
    out = fetch([1, 2])
    # reference query shape: {'field': {$in}, 'rcid': {$in}}
    # (PS1Cal_matching.py:92)
    assert coll.queries == [
        {"field": {"$in": [1, 2]}, "rcid": {"$in": [0]}}
    ]
    assert "_id" not in out.columns
    assert sorted(out["ra"]) == [1.0, 5.0]


def test_match_ps1cal_fields_broadcast_join(spark):
    coll = FakeSrcColl(
        [
            {"_id": "a", "field": 7, "g_mag": 15.0},
            {"_id": "b", "field": 8, "g_mag": 16.0},
        ]
    )
    df = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 9)], "src int, fieldid int"
    )
    out = match_ps1cal_fields(df, "fieldid", src_coll=coll)
    got = {(r.src, r.g_mag) for r in out.collect()}
    assert got == {(1, 15.0), (2, 15.0)}
    # the plan broadcasts the fetched dimension — fact side not shuffled
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_real_client_import_gate():
    fetch = irsa_metadata_fetcher()  # no injected client
    with pytest.raises(ImportError, match="ztfquery"):
        fetch([1])
    fetch2 = extcats_catalog_fetcher()
    with pytest.raises(ImportError, match="extcats"):
        fetch2([1])
