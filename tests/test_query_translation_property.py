"""Hypothesis property tests: the pandas-dialect → Spark SQL expression
translator must agree with pandas ``DataFrame.query`` on generated
predicates (P1 is the reference's workhorse — dataset_base.py:198-230)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataslicer_spark.utils import translate_query_expr

COLS = ["a", "b", "c"]


@st.composite
def simple_predicates(draw):
    """Conjunctions/disjunctions of comparisons, chained comparisons, and
    @param references over integer columns a, b, c."""
    terms = []
    params = {}
    for i in range(draw(st.integers(1, 3))):
        kind = draw(st.sampled_from(["cmp", "chain", "param"]))
        col = draw(st.sampled_from(COLS))
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "==", "!="]))
        v = draw(st.integers(-5, 15))
        if kind == "cmp":
            terms.append(f"{col} {op} {v}")
        elif kind == "chain":
            lo = draw(st.integers(-5, 5))
            hi = draw(st.integers(6, 15))
            o1 = draw(st.sampled_from(["<", "<="]))
            o2 = draw(st.sampled_from(["<", "<="]))
            terms.append(f"{lo} {o1} {col} {o2} {hi}")
        else:
            pname = f"p{i}"
            params[pname] = v
            terms.append(f"{col} {op} @{pname}")
    joiner = draw(st.sampled_from([" and ", " or "]))
    return joiner.join(terms), params


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(simple_predicates(), st.integers(0, 2**31 - 1))
def test_translator_matches_pandas_query(pred_params, seed):
    expr, params = pred_params
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({c: rng.integers(-10, 20, 40) for c in COLS})

    expect = pdf.query(expr, local_dict=params)
    sql = translate_query_expr(expr, params)
    # pandas can't parse the SQL-style uppercase AND the translator emits
    # for chained comparisons (Spark accepts it); lowercase only for the
    # pandas-side evaluation
    got = pdf.query(sql.replace(" AND ", " and "))
    pd.testing.assert_frame_equal(
        expect.reset_index(drop=True), got.reset_index(drop=True)
    )


SPARK_CASES = [
    ("a < 5 and b >= 2", {}),
    ("0 < a < 10 or c == 3", {}),
    ("a != @x and 2 <= b <= 12", {"x": 7}),
    ("c > @lo and c < @hi", {"lo": -2, "hi": 9}),
    ("not (a > 5) and b < 14", {}),
    ("a in @lst", {"lst": [1, 2, 3, 8]}),
]


def test_translator_matches_spark_filter(spark):
    """The same predicates agree between pandas.query and Spark filter
    (hypothesis drives the pandas equivalence above; a fixed sample
    drives the cross-engine check — session fixtures and @given don't
    mix)."""
    rng = np.random.default_rng(123)
    pdf = pd.DataFrame({c: rng.integers(-10, 20, 200) for c in COLS})
    sdf = spark.createDataFrame(pdf)
    from dataslicer_spark.utils import query_df

    for expr, params in SPARK_CASES:
        expect = pdf.query(expr, local_dict=params).sort_values(COLS)
        got = (
            query_df(sdf, expr, params).toPandas().sort_values(COLS)
        )
        pd.testing.assert_frame_equal(
            expect.reset_index(drop=True), got.reset_index(drop=True),
            check_dtype=False,
        )
