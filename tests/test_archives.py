"""S11 end-to-end: archive adapters (IRSA/ztfquery, PS1/extcats shapes)
through external_lookup_join against recorded fixtures — the full
fetch → dedup → broadcast-join path, no network, dependency import-gated."""

from __future__ import annotations

import pandas as pd
import pytest

from dataslicer_spark.sources.archives import (
    extcats_ps1cal_fetcher,
    irsa_metadata_fetcher,
)
from dataslicer_spark.sources.external import external_lookup_join


class _RecordedZTFQuery:
    """ZTFQuery-shaped fixture: records the sql_query, serves a canned
    metatable like IRSA's response (with a duplicated column and a
    duplicate row — metadata.py:82-83 requires both cleaned)."""

    def __init__(self):
        self.calls: list[str] = []
        base = pd.DataFrame(
            {
                "expid": [1, 2, 2, 3],
                "seeing": [1.1, 2.2, 2.2, 3.3],
                "airmass": [1.0, 1.2, 1.2, 1.5],
                "obsjd": [2458000.5, 2458001.5, 2458001.5, 2458002.5],
            }
        )
        self._table = pd.concat([base, base[["seeing"]]], axis=1)

    def load_metadata(self, kind="sci", sql_query=""):
        self.calls.append(f"{kind}:{sql_query}")
        self.metatable = self._table


class _RecordedMongoColl:
    """Mongo-collection-shaped fixture: .find(query, proj) serving the
    PS1Cal documents for the requested fields."""

    def __init__(self):
        self.queries: list[dict] = []
        self._docs = [
            {"_id": i, "field": f, "rcid": r, "ra": 10.0 * i, "dec": i / 2.0}
            for i, (f, r) in enumerate(
                [(101, 0), (101, 1), (102, 0), (103, 5)]
            )
        ]

    def find(self, query, projection=None):
        self.queries.append(query)
        fields = set(query["field"]["$in"])
        rcids = (
            set(query["rcid"]["$in"]) if "rcid" in query else None
        )
        for d in self._docs:
            if d["field"] in fields and (rcids is None or d["rcid"] in rcids):
                yield dict(d)


def test_irsa_adapter_end_to_end(spark):
    meta = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (3, "d")], "expid long, obsid string"
    )
    zq = _RecordedZTFQuery()
    fetch = irsa_metadata_fetcher(meta_cols=["seeing", "airmass"], zquery=zq)
    out = external_lookup_join(meta, "expid", fetch).toPandas()
    # one batch query with every distinct expid, IN-syntax like the ref
    assert len(zq.calls) == 1
    kind, sql = zq.calls[0].split(":", 1)
    assert kind == "sci" and sql.startswith("expid+IN+(")
    assert {int(x) for x in sql[len("expid+IN+(") : -1].split(",")} == {1, 2, 3}
    # projection kept only requested cols (+ key), dupes dropped, all 4
    # fact rows enriched (expid 3 appears twice → no fanout from dup rows)
    assert sorted(out.columns) == ["airmass", "expid", "obsid", "seeing"]
    assert len(out) == 4
    assert out.set_index("obsid")["seeing"].to_dict() == pytest.approx(
        {"a": 1.1, "b": 2.2, "c": 3.3, "d": 3.3}
    )


def test_irsa_adapter_rcid_narrowing():
    zq = _RecordedZTFQuery()
    irsa_metadata_fetcher(rcid=7, zquery=zq)([5, 6])
    assert zq.calls[0].endswith("and rcid+=+7")


def test_extcats_adapter_end_to_end(spark):
    srcs = spark.createDataFrame(
        [(0, 101), (1, 101), (2, 102), (3, 999)],
        "srcid long, field long",
    )
    coll = _RecordedMongoColl()
    fetch = extcats_ps1cal_fetcher(rcids=[0, 1], src_coll=coll)
    out = external_lookup_join(srcs, "field", fetch).toPandas()
    # one batch query, $in over the distinct fields + the rcid narrowing
    assert len(coll.queries) == 1
    assert set(coll.queries[0]["field"]["$in"]) == {101, 102, 999}
    assert coll.queries[0]["rcid"] == {"$in": [0, 1]}
    # inner join keeps only catalog-backed fields; _id never reaches Spark
    assert "_id" not in out.columns
    assert set(out["field"]) == {101, 102}
    # dedup on key: field 101 has 2 catalog rows → one survives, so the 2
    # fact rows with field 101 stay 2 rows (no fanout)
    assert len(out) == 3


def test_adapters_gate_on_missing_dependency():
    with pytest.raises(NotImplementedError, match="ztfquery"):
        irsa_metadata_fetcher()([1])
    with pytest.raises(NotImplementedError, match="extcats"):
        extcats_ps1cal_fetcher()([101])


def test_load_irsa_meta_end_to_end(spark):
    zq = _RecordedZTFQuery()
    from dataslicer_spark.sources.archives import load_irsa_meta

    df = spark.createDataFrame(
        [(10, 1), (20, 2), (21, 2), (30, 99)], "src int, expid int"
    )
    out = load_irsa_meta(df, "expid", meta_cols=["seeing"], zquery=zq)
    rows = {r.src: r.seeing for r in out.collect()}
    # inner join: expid 99 has no archive row; ONE fetch for the frame
    assert rows == {10: pytest.approx(1.1), 20: pytest.approx(2.2),
                    21: pytest.approx(2.2)}
    assert len(zq.calls) == 1


def test_add_irsa_meta_facade(spark):
    """SlicerFrame.add_IRSA_meta delegates to load_irsa_meta
    (srcdf.add_IRSA_meta, srcdf.py:108-135) — same recorded fixture,
    through the facade."""
    from dataslicer_spark.api import SlicerFrame

    zq = _RecordedZTFQuery()
    df = spark.createDataFrame(
        [(10, 1), (20, 2), (21, 2), (30, 99)], "src int, expid int"
    )
    out = SlicerFrame(df).add_IRSA_meta(
        "expid", meta_cols=["seeing"], zquery=zq
    )
    assert isinstance(out, SlicerFrame)
    rows = {r.src: r.seeing for r in out.df.collect()}
    assert rows == {10: pytest.approx(1.1), 20: pytest.approx(2.2),
                    21: pytest.approx(2.2)}
    assert len(zq.calls) == 1


def test_match_ps1cal_fields_renames_and_broadcasts(spark):
    coll = _RecordedMongoColl()
    from dataslicer_spark.sources.archives import match_ps1cal_fields

    df = spark.createDataFrame(
        [(1, 101), (2, 101), (3, 999)], "src int, fieldid int"
    )
    out = match_ps1cal_fields(
        df, "fieldid", rcids=[0], src_coll=coll
    )
    # catalog 'field' renamed to the dataset's 'fieldid'; rcid narrowed
    got = {(r.src, r.ra) for r in out.collect()}
    assert got == {(1, 0.0), (2, 0.0)}
    assert coll.queries[-1]["rcid"] == {"$in": [0]}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
