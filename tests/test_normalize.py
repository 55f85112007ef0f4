"""Unicode canonicalization (functions/normalize.py): parity with
unicodedata across forms, idempotence, null/edge handling."""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

from dataslicer_spark.functions.normalize import clean_text, normalize_unicode

SAMPLES = [
    "café résumé",      # NFD accents
    "café",                          # precomposed
    "ﬁle ① ½",             # ligature fi, circled 1, vulgar 1/2 (NFKC-sensitive)
    "ascii only",
    "", "   ",
    "mixeḑ́ marks",
]


@pytest.mark.parametrize("form", ["NFC", "NFD", "NFKC", "NFKD"])
def test_parity_with_unicodedata(spark, form):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)] + [(99, None)],
        "id int, text string",
    )
    got = {
        r.id: r.out
        for r in df.select(
            "id", normalize_unicode(F.col("text"), form).alias("out")
        ).collect()
    }
    for i, s in enumerate(SAMPLES):
        assert got[i] == unicodedata.normalize(form, s)
    assert got[99] is None


def test_clean_text_pipeline(spark):
    rows = [
        (1, "café   double  spaces"),
        (2, "bell\x07char\x00and\x1fcontrols"),
        (3, "  outer  "),
        (4, "unchanged"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r.id: (r.text, r.was_changed) for r in clean_text(df).collect()}
    assert got[1] == ("café double spaces", True)
    assert got[2] == ("bellcharandcontrols", True)
    assert got[3] == ("outer", True)
    assert got[4] == ("unchanged", False)
    assert got[5] == (None, False)


def test_idempotent(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "id int, text string"
    )
    once = clean_text(df)
    twice = clean_text(once.select("id", "text"))
    assert twice.filter(F.col("was_changed")).count() == 0


def test_lowercase_after_nfkc(spark):
    # U+212A KELVIN SIGN → NFKC → 'K' → lowercase 'k'
    df = spark.createDataFrame([(1, "Kelvin")], "id int, text string")
    out = clean_text(df, form="NFKC", lowercase=True).collect()[0]
    assert out.text == "kelvin"


def test_bad_form_rejected(spark):
    with pytest.raises(ValueError):
        normalize_unicode(F.col("x"), "NFX")


def test_columns_preserved(spark):
    df = spark.createDataFrame(
        [(1, "a", 3.0)], "id int, text string, w double"
    )
    out = clean_text(df)
    assert set(out.columns) == {"id", "text", "w", "was_changed"}
