"""Round-7 operators: token-budget selection, hard-negative mining,
phrase search, CDC merge, paragraph-granular quality filter."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dataslicer_spark.functions.text import paragraph_quality_filter
from dataslicer_spark.operators.retrieval import phrase_search
from dataslicer_spark.operators.sampling import token_budget_select
from dataslicer_spark.operators.scd import apply_changelog
from dataslicer_spark.operators.similarity import hard_negative_mining


# ---------------------------------------------------------------- budget

def test_token_budget_matches_global_window(spark):
    random.seed(11)
    rows = [
        (i, round(random.random() * 5, 3), random.randint(0, 25))
        for i in range(1200)
    ]
    df = spark.createDataFrame(rows, "id int, score double, tok int")
    df = df.repartition(9)
    for budget in (0, 900, 6000, 10**9):
        got = {
            (r.id, r.cum_tokens)
            for r in token_budget_select(
                df, "score", "tok", "id", budget, n_buckets=8
            ).collect()
        }
        w = Window.orderBy(
            F.col("score").desc(), F.col("id").asc()
        ).rowsBetween(Window.unboundedPreceding, 0)
        ref = {
            (r.id, r.cum)
            for r in df.withColumn("cum", F.sum("tok").over(w))
            .filter(F.col("cum") <= budget)
            .collect()
        }
        assert got == ref


def test_token_budget_ties_share_bucket(spark):
    # many identical scores straddling any quantile boundary: ties must
    # stay within one bucket so bucket order refines row order
    rows = [(i, 1.0 if i % 2 else 2.0, 10) for i in range(400)]
    df = spark.createDataFrame(rows, "id int, score double, tok int")
    got = {
        r.id
        for r in token_budget_select(
            df, "score", "tok", "id", 2500, n_buckets=16
        ).collect()
    }
    # 200 docs at score 2.0 (2000 tokens) + the first 50 odd ids
    evens = {i for i in range(400) if i % 2 == 0}
    odds = sorted(i for i in range(400) if i % 2)[:50]
    assert got == evens | set(odds)


def test_token_budget_null_and_validation(spark):
    df = spark.createDataFrame(
        [(1, None, 5), (2, 1.0, None), (3, 1.0, 5)],
        "id int, score double, tok int",
    )
    out = token_budget_select(df, "score", "tok", "id", 100, n_buckets=4)
    assert [r.id for r in out.collect()] == [3]
    with pytest.raises(ValueError):
        token_budget_select(df, "score", "tok", "id", -1)


# ---------------------------------------------------------- hard negatives

def test_hard_negatives_paths_agree_and_exclude_own_label(spark, sf_dir):
    import os

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    a = hard_negative_mining(emb, q, k=4, batched=True)
    b = hard_negative_mining(emb, q, k=4, batched=False)
    ka = {(r.query_id, r.rank, r.vec_id, r.neg_label) for r in a.collect()}
    kb = {(r.query_id, r.rank, r.vec_id, r.neg_label) for r in b.collect()}
    assert ka == kb and len(ka) == 8 * 4
    labels = {r.query_id: r.label for r in q.collect()}
    assert all(labels[t[0]] != t[3] for t in ka)


def test_hard_negatives_label_bound(spark):
    df = spark.createDataFrame(
        [(i, [1.0, float(i)], i) for i in range(5)],
        "vec_id int, embedding array<float>, label int",
    )
    q = df.selectExpr("vec_id as query_id", "embedding", "label")
    with pytest.raises(ValueError, match="max_labels"):
        hard_negative_mining(df, q, k=1, max_labels=2)


def test_hard_negatives_null_labels_agree_across_paths(spark):
    # NULL is a real label group: a null-labeled anchor must mine from
    # all non-null-labeled corpus rows in BOTH physical plans (the
    # batched path used == lit(None), which silently dropped it)
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], None),
            (1, [0.9, 0.1], "a"),
            (2, [0.8, 0.2], "a"),
            (3, [0.7, 0.3], "b"),
            (4, [0.6, 0.4], None),
        ],
        "vec_id int, embedding array<float>, label string",
    )
    q = df.filter(F.col("vec_id").isin(0, 1)).selectExpr(
        "vec_id as query_id", "embedding", "label"
    )
    a = hard_negative_mining(df, q, k=3, batched=True)
    b = hard_negative_mining(df, q, k=3, batched=False)
    ka = {(r.query_id, r.rank, r.vec_id) for r in a.collect()}
    kb = {(r.query_id, r.rank, r.vec_id) for r in b.collect()}
    assert ka == kb
    # anchor 0 (NULL label) mines the three labeled rows, never 4 (NULL)
    assert {t[2] for t in ka if t[0] == 0} == {1, 2, 3}
    # anchor 1 ("a") mines b + the two NULLs, never 2 ("a")
    assert {t[2] for t in ka if t[0] == 1} == {0, 3, 4}


# ---------------------------------------------------------------- phrase

def test_phrase_search_counts_positions(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "b a b a b"), (3, "c c c")],
        "doc_id long, text string",
    )
    got = {
        (r.id, r.n_matches, r.first_pos)
        for r in phrase_search(df, ["a", "b"]).collect()
    }
    assert got == {(1, 2, 0), (2, 2, 1)}
    # overlapping occurrences count individually; single-term phrase
    got3 = {
        (r.id, r.n_matches, r.first_pos)
        for r in phrase_search(df, ["b", "a", "b"]).collect()
    }
    assert got3 == {(2, 2, 0)}
    single = {
        (r.id, r.n_matches) for r in phrase_search(df, ["c"]).collect()
    }
    assert single == {(1, 1), (3, 3)}
    with pytest.raises(ValueError):
        phrase_search(df, [])


# ------------------------------------------------------------------- cdc

def test_apply_changelog_merge_semantics(spark):
    snap = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k int, val double"
    )
    changes = spark.createDataFrame(
        [
            (1, 1, "U", 11.0),  # update, superseded
            (1, 2, "U", 12.0),  # latest -> val 12
            (2, 5, "D", 0.0),   # delete key 2
            (4, 1, "I", 40.0),  # insert new key
            (5, 1, "I", 50.0),
            (5, 2, "D", 0.0),   # inserted then deleted -> absent
        ],
        "k int, seq int, op string, val double",
    )
    out = {
        r.k: r.val
        for r in apply_changelog(
            snap, changes, ["k"], "seq", "op", ["val"]
        ).collect()
    }
    assert out == {1: 12.0, 3: 30.0, 4: 40.0}


def test_apply_changelog_no_changes_passthrough(spark):
    snap = spark.createDataFrame([(1, 10.0)], "k int, val double")
    empty = spark.createDataFrame([], "k int, seq int, op string, val double")
    assert [
        (r.k, r.val)
        for r in apply_changelog(
            snap, empty, ["k"], "seq", "op", ["val"]
        ).collect()
    ] == [(1, 10.0)]


# ------------------------------------------------------------- paragraphs

def test_paragraph_filter_drops_repetitive_block(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e a a a a a"), (2, ""), (3, "x y")],
        "doc_id int, text string",
    )
    rows = {
        r.doc_id: r
        for r in paragraph_quality_filter(
            df,
            "doc_id",
            para_tokens=5,
            min_distinct_ratio=0.6,
            min_para_tokens=3,
        ).collect()
    }
    assert rows[1].filtered_text == "a b c d e"
    assert (rows[1].n_paras, rows[1].n_kept_paras) == (2, 1)
    assert rows[2].n_paras == 0 and rows[2].filtered_text == ""
    # short tail below min_para_tokens never survives
    assert rows[3].n_paras == 1 and rows[3].n_kept_paras == 0


def test_paragraph_filter_is_map_only(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    out = paragraph_quality_filter(df, "doc_id", para_tokens=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan


def test_paragraph_filter_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError):
        paragraph_quality_filter(df, "doc_id", para_tokens=0)


# ---------------------------------------------------------- epoch mixture

def test_epoch_mixture_rates_and_epochs(spark):
    rows = [(i, "a" if i < 100 else "b", 10) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, source string, tok int")
    # a: 1000 tokens, budget 2500 -> rate 2.5 (cap 3.0): 2 full + half
    # b: 1000 tokens, budget 400 -> rate 0.4: hash-thinned, epoch 0 only
    out = hard = None
    from dataslicer_spark.operators.sampling import epoch_mixture

    out = epoch_mixture(
        df, "source", "tok", "id", {"a": 2500.0, "b": 400.0},
        max_epochs=3.0, salt="s",
    )
    pdf = out.toPandas()
    a = pdf[pdf.source == "a"]
    b = pdf[pdf.source == "b"]
    # every 'a' row appears at least twice (epochs 0,1), some thrice
    per_a = a.groupby("id").size()
    assert per_a.min() == 2 and per_a.max() == 3
    assert set(a.epoch) == {0, 1, 2}
    # expected 'a' copies = 250; binomial(100, .5) noise around 250
    assert 220 <= len(a) <= 280
    # 'b' rows appear at most once, ~40%
    assert b.groupby("id").size().max() == 1
    assert set(b.epoch) == {0}
    assert 20 <= len(b) <= 60
    # deterministic under repartitioning
    again = epoch_mixture(
        df.repartition(7), "source", "tok", "id",
        {"a": 2500.0, "b": 400.0}, max_epochs=3.0, salt="s",
    ).toPandas()
    assert sorted(map(tuple, pdf[["id", "epoch"]].values.tolist())) == \
        sorted(map(tuple, again[["id", "epoch"]].values.tolist()))


def test_epoch_mixture_epoch_cap_and_validation(spark):
    df = spark.createDataFrame([(1, "a", 10)], "id int, source string, tok int")
    from dataslicer_spark.operators.sampling import epoch_mixture

    # budget far above max_epochs*tokens: rate pinned at the cap
    out = epoch_mixture(df, "source", "tok", "id", {"a": 1e9}, max_epochs=2.0)
    assert sorted(r.epoch for r in out.collect()) == [0, 1]
    with pytest.raises(ValueError, match="absent"):
        epoch_mixture(df, "source", "tok", "id", {"zzz": 10.0})
    with pytest.raises(ValueError):
        epoch_mixture(df, "source", "tok", "id", {})
    with pytest.raises(ValueError):
        epoch_mixture(df, "source", "tok", "id", {"a": 1.0}, max_epochs=0)


def test_epoch_mixture_zero_or_null_token_sum_raises(spark):
    from dataslicer_spark.operators.sampling import epoch_mixture

    # a present source whose token total is 0 (or all-NULL) cannot be
    # upsampled to any positive budget — must raise naming the source,
    # not ZeroDivisionError / TypeError
    zero = spark.createDataFrame(
        [(1, "a", 0), (2, "a", 0)], "id int, source string, tok int"
    )
    with pytest.raises(ValueError, match="zero/NULL.*'a'|'a'.*zero"):
        epoch_mixture(zero, "source", "tok", "id", {"a": 100.0})
    nulls = spark.createDataFrame(
        [(1, "a", None)], "id int, source string, tok int"
    )
    with pytest.raises(ValueError, match="zero/NULL"):
        epoch_mixture(nulls, "source", "tok", "id", {"a": 100.0})
