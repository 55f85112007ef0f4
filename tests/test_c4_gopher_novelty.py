"""C4 line cleaning, the composed Gopher gate, and n-gram novelty
(functions/text.c4_line_filter / gopher_quality_filter,
operators/decontam.ngram_novelty): brute-force parity vs pure-python
replays, rule-by-rule behavior checks, and hashed/unhashed equivalence
for the novelty join key."""

from __future__ import annotations

import pandas as pd
import pytest

from dataslicer_spark.functions.text import (
    c4_line_filter,
    gopher_quality_filter,
)
from dataslicer_spark.operators.decontam import ngram_novelty


# ---------------------------------------------------------------------------
# c4_line_filter
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def c4_docs(spark):
    rows = [
        # every rule: short line, no punct, blacklist word, clean line
        (0, "one two three four five six ends fine.\nshorty.\n"
            "no terminal punct here at all\n"
            "this line mentions javascript libraries today."),
        (1, "lorem ipsum dolor sit amet filler text here."),  # doc-blacklisted
        (2, "braces mean code { int x = 0; } so drop doc entirely."),
        (3, ""),  # empty doc
        (4, 'quoted line with enough words to pass "yes"\n'
            "another decent sentence that also ends properly!"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["id", "text"]))


def test_c4_rules(c4_docs):
    out = {
        r["id"]: r
        for r in c4_line_filter(c4_docs, "id", min_words=5).collect()
    }
    # doc 0: 4 lines; only line 1 and line 4 survive... line 4 is
    # blacklisted ("javascript"), so exactly 1 survivor
    assert out[0]["n_lines"] == 4
    assert out[0]["n_kept_lines"] == 1
    assert out[0]["cleaned_text"] == "one two three four five six ends fine."
    assert out[0]["keep_doc"]
    # lorem ipsum and `{` docs are blacklisted even when lines pass
    assert not out[1]["keep_doc"]
    assert not out[2]["keep_doc"]
    # empty doc: one empty line, nothing kept
    assert out[3]["n_kept_lines"] == 0 and not out[3]["keep_doc"]
    # both well-formed lines survive (quote and bang terminals)
    assert out[4]["n_kept_lines"] == 2 and out[4]["keep_doc"]


def test_c4_validation(c4_docs):
    with pytest.raises(ValueError):
        c4_line_filter(c4_docs, "id", min_words=0)
    with pytest.raises(ValueError):
        c4_line_filter(c4_docs, "id", terminal_punct=())


# ---------------------------------------------------------------------------
# gopher_quality_filter
# ---------------------------------------------------------------------------


def test_gopher_rules(spark):
    req = ("the", "of", "and")
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [0, 1, 2, 3],
                "text": [
                    # passes everything (10 words, varied, 3 required hits)
                    "the cat of доме and dog ran over green hills",
                    # too few words
                    "the of and",
                    # word repetition: top word share too high
                    "the the the the the the the the of and",
                    # symbols: hash marks push symbol ratio over
                    "# # # # the cat of trees and dog ran over # #",
                ],
            }
        )
    )
    out = {
        r["id"]: r
        for r in gopher_quality_filter(
            docs,
            "id",
            min_words=5,
            max_words=50,
            min_mean_word_len=1.0,
            max_mean_word_len=10.0,
            max_symbol_word_ratio=0.2,
            min_alpha_word_frac=0.5,
            required_words=req,
            min_required_hits=3,
            max_dup_word_frac=0.5,
            max_top_word_frac=0.4,
            max_top_bigram_frac=0.9,
        ).collect()
    }
    assert out[0]["pass_gopher"]
    assert not out[1]["pass_gopher"]  # n_words < 5
    assert not out[2]["pass_gopher"]  # top_word_frac 0.8 > 0.4
    assert not out[3]["pass_gopher"]  # symbol ratio 6/14 > 0.2
    # stats replay for doc 0
    r0 = out[0]
    assert r0["n_words"] == 10
    words = "the cat of доме and dog ran over green hills".split()
    assert r0["mean_word_len"] == sum(len(w) for w in words) / 10.0
    assert r0["alpha_word_frac"] == 9 / 10.0  # Cyrillic word has no A-Za-z
    assert r0["n_required_hits"] == 3


def test_gopher_empty_doc_fails_with_null_stats(spark):
    docs = spark.createDataFrame(pd.DataFrame({"id": [0], "text": ["  "]}))
    r = gopher_quality_filter(docs, "id").collect()[0]
    assert r["n_words"] == 0
    assert r["mean_word_len"] is None
    assert r["pass_gopher"] is False


# ---------------------------------------------------------------------------
# ngram_novelty
# ---------------------------------------------------------------------------


def test_ngram_novelty_brute_force_and_hash_parity(spark):
    corpus_rows = [
        (0, "alpha beta gamma delta epsilon"),  # some overlap
        (1, "totally new words never seen anywhere"),  # fully novel
        (2, "alpha beta gamma"),  # single shingle, fully seen
        (3, "too short"),  # < 3 words: absent from output
    ]
    ref_rows = [("alpha beta gamma delta zeta",), ("one two three",)]
    corpus = spark.createDataFrame(
        pd.DataFrame(corpus_rows, columns=["id", "text"])
    )
    ref = spark.createDataFrame(pd.DataFrame(ref_rows, columns=["text"]))

    def shingles(t):
        w = t.lower().split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    ref_set = set().union(*(shingles(t) for (t,) in ref_rows))
    out = {
        r["id"]: r
        for r in ngram_novelty(corpus, ref, "id", hashed=False).collect()
    }
    assert 3 not in out
    for i, text in corpus_rows[:3]:
        s = shingles(text)
        novel = {g for g in s if g not in ref_set}
        assert out[i]["n_shingles"] == len(s)
        assert out[i]["n_novel"] == len(novel)
        assert out[i]["novel_frac"] == len(novel) / len(s)

    hashed = {
        r["id"]: r
        for r in ngram_novelty(corpus, ref, "id", hashed=True).collect()
    }
    assert {
        (k, v["n_shingles"], v["n_novel"], v["novel_frac"])
        for k, v in out.items()
    } == {
        (k, v["n_shingles"], v["n_novel"], v["novel_frac"])
        for k, v in hashed.items()
    }
