"""Smoke: every driver-contract query runs at sf0.001 and returns a
DataFrame with a stable, non-empty schema.  Catches breakage in any
queries() entry without waiting for the sf0.01 oracle pass."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

# the expensive composites are covered by their own end-to-end tests
SKIP = {"astro_flagship_pipeline"}

NAMES = [n for n in entrymod.queries() if n not in SKIP]


@pytest.mark.parametrize("name", NAMES)
def test_query_runs_at_sf0001(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF)
    assert len(df.schema.fields) > 0
    n = df.count()
    assert n >= 0
    # queries that should never be empty even at the smallest sf
    if name.startswith(("p", "f", "a", "w", "o4", "txt", "ev", "mm", "j1",
                        "j8_group_quantified_rejected", "j9")):
        assert n > 0, f"{name} returned 0 rows at sf0.001"


def test_oracle_sql_no_hugeint_columns():
    """DuckDB widens SUM(integer) to HUGEINT (int128); Spark stays BIGINT.
    Values match but the driver's value-hash serializes the physical type,
    so any HUGEINT output column flags hash_match=false (round-2 red row
    txt_token_stats).  Guard: every oracle's output schema must be free of
    int128 — authors must CAST(SUM(...) AS BIGINT)."""
    import os

    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        path = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    bad = {}
    for name, sql in entrymod.oracle_sql().items():
        desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        huge = [(c, ty) for c, ty, *_ in desc
                if "INT128" in ty.upper() or "HUGEINT" in ty.upper()]
        if huge:
            bad[name] = huge
    assert not bad, f"oracle SQL returns HUGEINT columns: {bad}"


def test_oracle_keys_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every non-oracle query is a documented engine-specific op:
    # mm's fake codec is PCG-seeded numpy; the astro pipeline
    # contains DBSCAN/Jenks (no SQL twin); sk_hll_stats is the
    # sketch-only scale path (estimates are engine-specific — its
    # value-hash oracle rides on sk_hll_certify)
    rows_only = set(qs) - set(oracles)
    assert rows_only <= {
        "astro_flagship_pipeline", "mm_image_features", "sk_hll_stats",
    }
