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


def test_oracle_keys_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every non-oracle query is a documented engine-specific op
    rows_only = set(qs) - set(oracles)
    assert rows_only <= {
        "dd_minhash_lsh", "dd_simhash", "sim_topk_lsh", "sim_topk_ivf",
        "astro_flagship_pipeline", "mm_image_features", "sk_hll_stats",
    }
