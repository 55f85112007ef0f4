"""Distributed BPE tokenizer training (operators/bpe.py)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.operators.bpe import (
    SPACE_MARK,
    bpe_apply,
    bpe_fit,
)


def _py_prepare(text, max_chars):
    return " " + "".join(c + " " for c in text[:max_chars].replace(" ", SPACE_MARK))


def _py_fit(texts, n_merges, max_chars):
    """Independent replay of the documented algorithm (string-replace
    merge semantics, count-desc/pair-asc tie-break)."""
    strs = [_py_prepare(t, max_chars) for t in texts if t is not None]
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for s in strs:
            toks = s.strip().split(" ")
            for x, y in zip(toks, toks[1:]):
                counts[f"{x} {y}"] += 1
        if not counts:
            raise ValueError("exhausted")
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best.split(" ")
        strs = [s.replace(f" {a} {b} ", f" {a}{b} ") for s in strs]
    return merges, strs


@pytest.fixture(scope="module")
def corpus(spark):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog",
        "the the the",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return texts, df


def test_fit_matches_python_replay(corpus):
    texts, df = corpus
    want, strs = _py_fit(texts, 5, 64)
    got = bpe_fit(df, "text", n_merges=5, max_chars=64)
    assert got == want
    # tokenization matches the replay too
    out = bpe_apply(df.filter(F.col("text").isNotNull()), got, max_chars=64)
    got_toks = {
        r.doc_id: list(r.bpe_tokens) for r in out.collect()
    }
    for i, s in enumerate(strs):
        assert got_toks[i] == s.strip().split(" ")


def test_fit_partitioning_invariance(corpus):
    _, df = corpus
    a = bpe_fit(df, "text", n_merges=3, max_chars=64)
    b = bpe_fit(df.repartition(7), "text", n_merges=3, max_chars=64)
    assert a == b


def test_repeated_run_semantics_documented(spark):
    # leftmost non-overlapping replace: boundary space is consumed, so
    # "a a a a" + merge (a,a) -> "aa a a", NOT canonical BPE's "aa aa"
    df = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    out = bpe_apply(df, ["a a"], max_chars=16).collect()[0]
    assert list(out.bpe_tokens) == ["aa", "a", "a"]


def test_spaces_become_space_mark(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = bpe_apply(df, [], max_chars=16).collect()[0]
    assert list(out.bpe_tokens) == ["a", SPACE_MARK, "b"]
    assert out.n_bpe_tokens == 3


def test_exhausted_corpus_raises(spark):
    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exhausted"):
        bpe_fit(df, "text", n_merges=5, max_chars=16)


def test_merge_learns_frequent_pair_first(corpus):
    _, df = corpus
    merges = bpe_fit(df, "text", n_merges=1, max_chars=64)
    # 'the' appears 8 times → 't h' or 'h e' dominates; exact winner is
    # pinned by the replay test; here just assert it involves t/h/e
    assert set(merges[0].split(" ")) <= {"t", "h", "e"}


def test_save_load_roundtrip(corpus, tmp_path):
    from dataslicer_spark.operators.bpe import load_merges, save_merges

    _, df = corpus
    merges = bpe_fit(df, "text", n_merges=2, max_chars=64)
    p = str(tmp_path / "tok" / "merges.json")
    save_merges(merges, p)
    assert load_merges(p) == merges
    # a reloaded table tokenizes identically
    a = bpe_apply(df, merges, "text", max_chars=64).select("bpe_tokens")
    b = bpe_apply(df, load_merges(p), "text", max_chars=64).select("bpe_tokens")
    assert [r.bpe_tokens for r in a.collect()] == [r.bpe_tokens for r in b.collect()]


def test_load_rejects_malformed(tmp_path):
    import json

    from dataslicer_spark.operators.bpe import load_merges

    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"version": 1, "merges": ["nospace"]}))
    with pytest.raises(ValueError, match="malformed"):
        load_merges(str(p))
