"""ExactSubstr span dedup (operators/span_dedup.py): brute-force
parity, keep-one-copy guarantee, and no-op on duplicate-free corpora."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.span_dedup import (
    duplicated_spans,
    remove_duplicated_spans,
    span_dedup_stats,
)


def _brute(rows: list[tuple[int, str]], k: int):
    """Reference implementation: dict-of-lists first-occurrence scan."""
    toks = {i: t.split() for i, t in rows if t.strip()}
    first: dict[tuple, tuple] = {}
    occs = []  # duplicate occurrences (id, pos)
    for i in sorted(toks):
        t = toks[i]
        for p in range(len(t) - k + 1):
            w = tuple(t[p : p + k])
            if w in first:
                occs.append((i, p))
            else:
                first[w] = (i, p)
    covered: dict[int, set[int]] = {}
    for i, p in occs:
        covered.setdefault(i, set()).update(range(p, p + k))
    spans: dict[int, list[tuple[int, int]]] = {}
    for i, cov in covered.items():
        merged, run = [], sorted(cov)
        s = e = run[0]
        for x in run[1:]:
            if x <= e + 1:
                e = x
            else:
                merged.append((s, e))
                s = e = x
        merged.append((s, e))
        spans[i] = merged
    clean = {}
    for i, t in ((i, t) for i, t in rows):
        tk = toks.get(i, [])
        cov = covered.get(i, set())
        clean[i] = " ".join(
            w for j, w in enumerate(tk) if j not in cov
        ) if t.strip() else t
    return spans, clean


def _corpus(seed=7, n_docs=40, vocab=12, length=30, k=5, n_plant=9):
    """Random word salad over a SMALL vocab (so genuine k-window repeats
    occur by chance) + a planted boilerplate prefix in n_plant docs."""
    rng = random.Random(seed)
    words = [f"w{j}" for j in range(vocab)]
    boiler = " ".join(f"b{j}" for j in range(k + 3))
    rows = []
    for i in range(n_docs):
        body = " ".join(rng.choice(words) for _ in range(length))
        rows.append((i, (boiler + " " + body) if i % (n_docs // n_plant) == 0 else body))
    rows.append((n_docs, ""))  # empty doc must survive as-is
    return rows


@pytest.mark.parametrize("k", [3, 5])
def test_brute_force_parity(spark, k):
    rows = _corpus(k=k)
    df = spark.createDataFrame(rows, "doc_id int, text string")
    want_spans, want_clean = _brute(rows, k)

    got_spans: dict[int, list[tuple[int, int]]] = {}
    for r in duplicated_spans(df, "doc_id", k=k).collect():
        got_spans.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_end)
        )
    assert {i: sorted(v) for i, v in got_spans.items()} == want_spans
    assert want_spans  # the planted boilerplate actually collided

    got_clean = {
        r.doc_id: r.text
        for r in remove_duplicated_spans(df, "doc_id", k=k).collect()
    }
    assert got_clean == want_clean

    stats = {
        r.doc_id: (r.dup_spans, r.dup_tokens)
        for r in span_dedup_stats(df, "doc_id", k=k).collect()
    }
    for i, merged in want_spans.items():
        assert stats[i] == (
            len(merged),
            sum(e - s + 1 for s, e in merged),
        )
    for i in set(stats) - set(want_spans):
        assert stats[i] == (0, 0)


def test_exactly_one_copy_survives(spark):
    rows = _corpus(k=5, n_plant=8)
    df = spark.createDataFrame(rows, "doc_id int, text string")
    boiler = " ".join(f"b{j}" for j in range(8))
    out = remove_duplicated_spans(df, "doc_id", k=5)
    keepers = out.filter(F.col("text").contains(boiler)).collect()
    assert len(keepers) == 1
    assert keepers[0].doc_id == 0  # smallest (doc, pos) wins


def test_no_duplicates_is_a_noop(spark):
    rows = [(i, " ".join(f"u{i}_{j}" for j in range(20))) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    assert duplicated_spans(df, "doc_id", k=4).count() == 0
    out = {r.doc_id: r.text for r in remove_duplicated_spans(df, "doc_id", k=4).collect()}
    assert out == dict(rows)


def test_stats_and_scrub_agree(spark, sf_dir):
    import os

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .limit(200)
    )
    corpus = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 "), F.col("text")),
        ).otherwise(F.col("text")).alias("text"),
    )
    joined = span_dedup_stats(corpus, "doc_id", k=6).join(
        remove_duplicated_spans(corpus, "doc_id", k=6).select(
            "doc_id", "n_removed_tokens"
        ),
        "doc_id",
    )
    assert joined.filter(
        F.col("dup_tokens") != F.col("n_removed_tokens")
    ).count() == 0
    assert joined.filter(F.col("dup_tokens") > 0).count() >= 30


def test_bad_k(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError):
        duplicated_spans(df, "doc_id", k=1)
