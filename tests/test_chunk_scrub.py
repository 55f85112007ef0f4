"""chunk_documents / scrub_pii (functions/text.py) and dedup_against
(operators/dedup.py): brute-force parity and invariants."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataslicer_spark.functions.text import chunk_documents, scrub_pii
from dataslicer_spark.operators.dedup import dedup_against


def _ref_chunks(text: str, chunk: int, stride: int):
    toks = text.strip().split()
    if not toks:
        return []
    out, i = [], 0
    while True:
        win = toks[i * stride : i * stride + chunk]
        out.append((i, i * stride, len(win), " ".join(win)))
        if i * stride + chunk >= len(toks):
            break
        i += 1
    return out


@pytest.mark.parametrize("chunk,stride", [(4, 3), (5, 5), (3, 1), (100, 10)])
def test_chunk_documents_matches_reference(spark, chunk, stride):
    texts = [
        "a b c d e f g h i j",
        "one two three",
        "x",
        "",
        "  padded   spacing   here   now  ",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_start, r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(
            df, "doc_id", chunk_tokens=chunk, stride_tokens=stride
        ).collect()
    }
    want = {
        (i, cid): (start, n, txt)
        for i, t in enumerate(texts)
        for cid, start, n, txt in _ref_chunks(t, chunk, stride)
    }
    assert got == want


def test_chunk_documents_tail_coverage(spark):
    # every token index must be covered by at least one chunk
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": [" ".join(str(i) for i in range(23))]})
    )
    rows = chunk_documents(df, "doc_id", chunk_tokens=8, stride_tokens=6).collect()
    covered = set()
    for r in rows:
        covered |= set(range(r.chunk_start, r.chunk_start + r.n_chunk_tokens))
    assert covered == set(range(23))


def test_chunk_documents_validates_params(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["a"]}))
    with pytest.raises(ValueError, match="positive"):
        chunk_documents(df, "doc_id", chunk_tokens=0)
    # stride past the window would leave token gaps -> rejected
    with pytest.raises(ValueError, match="stride_tokens"):
        chunk_documents(df, "doc_id", chunk_tokens=2, stride_tokens=8)


def test_scrub_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "mail a.b+c@x-corp.io and d@e.org now",
                    "server 192.168.0.1 acct 123456789012 ok",
                    "clean text with short 1234 number",
                ],
            }
        )
    )
    out = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert (out[0].n_email, out[0].n_ip, out[0].n_number) == (2, 0, 0)
    assert out[0].scrubbed == "mail <EMAIL> and <EMAIL> now"
    assert (out[1].n_email, out[1].n_ip, out[1].n_number) == (0, 1, 1)
    assert out[1].scrubbed == "server <IP> acct <NUMBER> ok"
    assert (out[2].n_email, out[2].n_ip, out[2].n_number) == (0, 0, 0)
    assert out[2].scrubbed == out[2].text


def test_dedup_against_partitions_new_corpus(spark):
    ref = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["shared doc", "ref only"]})
    )
    new = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 11, 12],
                # 10 matches ref after whitespace/case normalization
                "text": ["  SHARED   doc ", "brand new", "another fresh one"],
            }
        )
    )
    fresh, dropped = dedup_against(new, ref, "doc_id")
    assert {r.doc_id for r in fresh.collect()} == {11, 12}
    assert {r.doc_id for r in dropped.collect()} == {10}
    # fresh keeps the original columns
    assert set(fresh.columns) == {"doc_id", "text"}
