"""Edit-distance self-join (operators/fuzzy.py): brute-force parity on
planted typo families, completeness of the delete-1 neighborhood for
every edit kind (substitution / insertion / deletion), exclusion of
distance-2 pairs, and plan shape (equi-join, no cartesian)."""

from __future__ import annotations

import itertools

import pandas as pd
import pytest

from dataslicer_spark.operators.fuzzy import edit_distance_self_join


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


NAMES = [
    "alpha-centauri",   # base
    "alpha-centauri",   # exact duplicate (dist 0)
    "alpha-centavri",   # substitution (dist 1)
    "alpha-centauri2",  # insertion at end (dist 1)
    "alpha-centaur",    # deletion (dist 1)
    "alpha-centvari",   # transposition = dist 2 in levenshtein — excluded
    "beta-pictoris",    # unrelated
    "xalpha-centauri",  # insertion at front (dist 1)
    "",                 # empty string edge case
    "a",                # dist 1 from empty
]


@pytest.fixture(scope="module")
def names_df(spark):
    pdf = pd.DataFrame({"nid": range(len(NAMES)), "name": NAMES})
    return spark.createDataFrame(pdf), pdf


def test_brute_force_parity(names_df):
    df, pdf = names_df
    out = edit_distance_self_join(df, "nid", "name", max_dist=1)
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in out.collect()
    }
    expect = {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(
            zip(pdf.nid, pdf.name), 2
        )
        if _lev(a, b) <= 1
    }
    assert got == expect
    # sanity: every edit kind present, transposition excluded
    assert (0, 2, 1) in got and (0, 3, 1) in got and (0, 4, 1) in got
    assert (0, 7, 1) in got and (8, 9, 1) in got and (0, 1, 0) in got
    assert not any(a == 0 and b == 5 for a, b, _ in got)


def test_no_cartesian_in_plan(names_df):
    df, _ = names_df
    plan = (
        edit_distance_self_join(df, "nid", "name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan


def test_max_dist_validation(names_df):
    df, _ = names_df
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_self_join(df, "nid", "name", max_dist=2)
