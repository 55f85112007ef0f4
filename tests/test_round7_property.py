"""Hypothesis property tests for the round-7 operators: each is checked
against an independent pure-python reference on generated inputs.
Example counts are small (Spark round-trips are ~1 s each) but the
generators hit the hazardous regions: duplicate scores across bucket
boundaries, delete-then-insert change orders, md5 thresholds at the
fraction edges."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _md5_u32(salt: str, key) -> int:
    return int(
        hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16
    )


# --------------------------------------------------------- token budget

@st.composite
def budget_cases(draw):
    n = draw(st.integers(5, 60))
    # few distinct scores → many ties, the bucket-boundary hazard
    scores = draw(
        st.lists(
            st.sampled_from([0.25, 0.5, 0.5, 0.75, 1.0]),
            min_size=n, max_size=n,
        )
    )
    toks = draw(st.lists(st.integers(0, 9), min_size=n, max_size=n))
    budget = draw(st.integers(0, 200))
    return list(zip(range(n), scores, toks)), budget


@given(budget_cases())
@SET
def test_token_budget_property(spark, case):
    from dataslicer_spark.operators.sampling import token_budget_select

    rows, budget = case
    df = spark.createDataFrame(
        rows, "id int, score double, tok int"
    ).repartition(5)
    got = {
        (r.id, r.cum_tokens)
        for r in token_budget_select(
            df, "score", "tok", "id", budget, n_buckets=4
        ).collect()
    }
    # python reference: walk (score desc, id asc), keep while cum<=budget
    ref, cum = set(), 0
    for i, s, t in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += t
        if cum > budget:
            break
        ref.add((i, cum))
    assert got == ref


# ------------------------------------------------------------------ cdc

@st.composite
def changelog_cases(draw):
    snap_keys = draw(st.lists(st.integers(0, 9), unique=True, max_size=6))
    n_changes = draw(st.integers(0, 12))
    ops = draw(
        st.lists(
            st.tuples(
                st.integers(0, 11),          # key (some beyond snapshot)
                st.sampled_from(["I", "U", "D"]),
                st.integers(-99, 99),        # value
            ),
            min_size=n_changes, max_size=n_changes,
        )
    )
    return snap_keys, ops


@given(changelog_cases())
@SET
def test_apply_changelog_property(spark, case):
    from dataslicer_spark.operators.scd import apply_changelog

    snap_keys, ops = case
    snap_rows = [(k, float(k * 10)) for k in snap_keys]
    chg_rows = [
        (k, seq, op, float(v)) for seq, (k, op, v) in enumerate(ops)
    ]
    snap = spark.createDataFrame(
        snap_rows, "k int, val double"
    ) if snap_rows else spark.createDataFrame([], "k int, val double")
    chg = spark.createDataFrame(
        chg_rows, "k int, seq int, op string, val double"
    ) if chg_rows else spark.createDataFrame(
        [], "k int, seq int, op string, val double"
    )
    got = {
        r.k: r.val
        for r in apply_changelog(
            snap, chg, ["k"], "seq", "op", ["val"]
        ).collect()
    }
    # python reference: latest change per key wins
    state = {k: float(k * 10) for k in snap_keys}
    latest: dict[int, tuple[str, float]] = {}
    for k, seq, op, v in chg_rows:
        latest[k] = (op, v)  # seq increases with position
    for k, (op, v) in latest.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == state


# -------------------------------------------------------- epoch mixture

@given(
    st.integers(1, 40),                      # docs per source
    st.floats(10.0, 2000.0),                 # budget a
    st.floats(0.5, 3.0),                     # max epochs
)
@SET
def test_epoch_mixture_exact_md5_replay(spark, n, budget, cap):
    from dataslicer_spark.operators.sampling import epoch_mixture

    rows = [(i, "a", 5) for i in range(n)]
    df = spark.createDataFrame(rows, "id int, source string, tok int")
    got = sorted(
        (r.id, r.epoch)
        for r in epoch_mixture(
            df, "source", "tok", "id", {"a": budget},
            max_epochs=cap, salt="px",
        ).collect()
    )
    toks = 5 * n
    rate = min(cap, budget / float(toks))
    n_full = int(math.floor(rate))
    thr = int(math.floor((rate - math.floor(rate)) * 4294967296.0))
    ref = []
    for i in range(n):
        copies = n_full + (1 if _md5_u32("px", i) < thr else 0)
        ref.extend((i, e) for e in range(copies))
    assert got == sorted(ref)


# ----------------------------------------------------------- paragraphs

@st.composite
def para_docs(draw):
    vocab = ["a", "b", "c", "d", "e"]
    n = draw(st.integers(0, 50))
    return " ".join(
        draw(st.lists(st.sampled_from(vocab), min_size=n, max_size=n))
    )


@given(para_docs(), st.integers(2, 8), st.floats(0.2, 1.0))
@SET
def test_paragraph_filter_property(spark, text, para, thr):
    from dataslicer_spark.functions.text import paragraph_quality_filter

    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    row = paragraph_quality_filter(
        df, "doc_id", para_tokens=para,
        min_distinct_ratio=thr, min_para_tokens=2,
    ).collect()[0]
    toks = text.split() if text.strip() else []
    paras = [toks[i:i + para] for i in range(0, len(toks), para)]
    good = [
        p for p in paras
        if len(p) >= 2 and len(set(p)) / len(p) >= thr
    ]
    assert row.n_paras == len(paras)
    assert row.n_kept_paras == len(good)
    assert row.filtered_text == " ".join(w for p in good for w in p)
